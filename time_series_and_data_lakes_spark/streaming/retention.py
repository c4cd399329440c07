"""Retention tiering: Timestream's memory/magnetic stores as table ops
(SURVEY.md S7/T11).

Reference: raw table = 24 h memory + 7 d magnetic, CEP table = 24 h + 30 d
(`cdk/time_series_and_data_lakes/time_series_and_data_lakes_stack.py:42-61`).
Spark mapping: the "memory store" is the cached hot window (recent
partitions); the magnetic bound is a TTL job dropping expired ``date``
partitions. On Delta this is ``DELETE WHERE time < now()-retention`` +
``VACUUM``; on the container's plain-Parquet store the same contract is
partition-directory removal, which is metadata-only (no rewrite) because the
store partitions by date.
"""

from __future__ import annotations

import datetime as dt
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def expire_partitions(store_path: str, cutoff_date: dt.date) -> list[str]:
    """Drop store partitions older than ``cutoff_date`` (magnetic-store TTL).

    Works on the layout written by the ingest sink:
    ``{store}/measure_name=*/date=YYYY-MM-DD/``. Returns removed paths.
    """
    removed = []
    for date_dir in Path(store_path).glob("measure_name=*/date=*"):
        date_str = date_dir.name.split("=", 1)[1]
        if dt.date.fromisoformat(date_str) < cutoff_date:
            shutil.rmtree(date_dir)
            removed.append(str(date_dir))
    return removed


def cache_hot_window(
    spark: SparkSession, store_path: str, since_date: dt.date
) -> DataFrame:
    """The "memory store": cache the recent partitions so ago()-style
    recency queries (P5/P7) serve from memory."""
    df = spark.read.parquet(store_path).filter(f"date >= DATE'{since_date.isoformat()}'")
    df.cache()
    return df


def compact_partitions(
    spark: SparkSession,
    store_path: str,
    target_file_bytes: int = 128 << 20,
    min_files: int = 4,
) -> list[str]:
    """Compact small files inside each leaf partition (the micro-batch
    ingest's small-files debt — Delta's OPTIMIZE, done directly on the
    parquet store).

    Streaming appends one file set per micro-batch, so a day-old partition
    holds hundreds of KB-scale files; at 100 TB that destroys scan
    parallelism bookkeeping (one task per tiny file) and parquet footer
    reads start to dominate. Each leaf with >= ``min_files`` files is
    rewritten into ``ceil(bytes / target_file_bytes)`` files. The rewrite
    goes to a sibling temp dir first and is swapped in with two renames, so
    a crash leaves either the old or the new file set, never a mix.
    Returns the compacted partition paths.

    Compact cold partitions only (run after the ingest watermark passes) —
    the swap is not transactional against a concurrent writer to the SAME
    leaf; Delta/Iceberg make this fully ACID at cluster scale.
    """
    compacted = []
    for leaf in sorted(Path(store_path).glob("measure_name=*/date=*")):
        files = [f for f in leaf.glob("*.parquet") if f.is_file()]
        if len(files) < min_files:
            continue
        total = sum(f.stat().st_size for f in files)
        n_out = max(1, -(-total // target_file_bytes))
        if len(files) <= n_out:
            continue
        tmp = leaf.with_name(leaf.name + ".__compact_tmp")
        old = leaf.with_name(leaf.name + ".__compact_old")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        # leaf-dir read: partition values live in the directory name and
        # are re-derived on read; the rewrite preserves the leaf layout.
        spark.read.parquet(str(leaf)).repartition(int(n_out)).write.mode(
            "overwrite"
        ).parquet(str(tmp))
        leaf.rename(old)
        tmp.rename(leaf)
        shutil.rmtree(old)
        compacted.append(str(leaf))
    return compacted
