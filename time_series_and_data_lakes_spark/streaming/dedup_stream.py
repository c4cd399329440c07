"""Streaming exact deduplication — the continuous-ingest counterpart of
:func:`..operators.dedup.exact_dedup`.

A training-data ingest stream re-delivers records (producer retries,
at-least-once sources, backfill overlap); deduplicating at ingest keeps the
store append-only AND unique without periodic rewrite jobs. Two bounds are
offered, both watermark-scoped so state never grows with stream length:

- :func:`dedup_stream_by_id` — drop re-deliveries of the same record id.
  State is the id set inside the watermark horizon; Spark's
  ``dropDuplicatesWithinWatermark`` evicts ids once the watermark passes
  them, so the guarantee is "exactly once within the lateness bound" — the
  right contract for retry/duplicate storms, which are always temporally
  local.
- :func:`dedup_stream_by_content` — same, keyed by a content hash (md5 of
  the payload columns), catching at-the-source duplicates that carry fresh
  ids (double uploads, mirrored crawls).

At 100 TB-scale ingest the state store is RocksDB per partition; the
watermark bound keeps per-key state a single timestamp, and eviction is
incremental — no full-store distinct, ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_by_id(
    stream: DataFrame,
    id_cols: list[str],
    time_col: str = "time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first delivery of each id inside the watermark horizon.
    ``id_cols`` is required — like ``content_cols`` below, there is no
    domain-neutral default."""
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def dedup_stream_by_content(
    stream: DataFrame,
    content_cols: list[str],
    time_col: str = "time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first record for each content fingerprint inside the
    watermark horizon. The fingerprint is the md5 of the canonicalized
    (null-tagged, unit-separated) content columns — md5-of-content exactly
    as :func:`..operators.dedup.exact_dedup` keys its batch groups, so
    stream and batch agree on what "duplicate" means."""
    fp = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in content_cols]
        )
    )
    out = (
        stream.withColumn("__content_fp", fp)
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["__content_fp"])
    )
    return out.drop("__content_fp")
