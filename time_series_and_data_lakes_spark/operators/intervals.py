"""Bucketed range (interval) join: match point rows into interval rows.

Spark has no native band/interval join — a naive ``points JOIN intervals ON
t BETWEEN s AND e`` plans as a (broadcast) nested-loop over the full pair
space. The scalable formulation blocks both sides by a fixed-width time
bucket (the same trick Databricks' range-join optimization and KDB's window
joins use):

- each point lands in exactly ONE bucket (``floor(t / width)``),
- each interval explodes to the buckets it overlaps (``sequence(floor(s /
  width), floor(e / width))`` — bounded by interval_length / width + 1),
- the join is then an EQUI join on (keys…, bucket) followed by the exact
  ``BETWEEN`` filter, so it shuffles hash-partitioned buckets instead of
  nested-looping, and every qualifying (point, interval) pair is produced
  exactly once (the point's single bucket is necessarily one of the
  interval's buckets).

At 100 TB: one shuffle per side keyed by (keys, bucket); duplication factor
is the interval-length/width ratio (caller picks ``bucket_s`` near the
typical interval length); hot buckets fall to AQE skew-join splitting. All
arithmetic is integer epoch-microseconds — exact, ANSI-safe, and
bit-reproducible in any oracle engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_width_us(bucket_s: float) -> int:
    """Derived bucket width, validated at construct time: a fractional
    bucket_s in (0, 1) passes a `<= 0` check but rounds to a ZERO width —
    the mid-job ANSI DIVIDE_BY_ZERO (or, ANSI off, all-null buckets and a
    silently empty join) this guard exists to reject early. round(), not
    int(): truncation turns float representation error into an off-by-one
    width (int(4.1 * 1_000_000) == 4_099_999 — ADVICE r8; pinned by
    tests/test_sessions_asof.py)."""
    width_us = round(bucket_s * 1_000_000)
    if width_us <= 0:
        raise ValueError(f"bucket_s must be a positive number of seconds, got {bucket_s}")
    return width_us


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    interval_start: str,
    interval_end: str,
    keys: Sequence[str] = (),
    bucket_s: int = 86_400,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``interval_start <= point_time <= interval_end`` (inclusive bounds),
    optionally also matching equi ``keys``. Timestamp columns on both
    sides; helper columns are dropped from the result.
    """
    width_us = bucket_width_us(bucket_s)
    p = points.withColumn("__t_us", F.unix_micros(F.col(point_time))).withColumn(
        "__bucket", F.floor(F.col("__t_us") / F.lit(width_us))
    )
    iv = (
        intervals.withColumn("__s_us", F.unix_micros(F.col(interval_start)))
        .withColumn("__e_us", F.unix_micros(F.col(interval_end)))
        # an INVERTED interval (end < start) can never match the BETWEEN
        # filter, but unfiltered it would feed sequence() a start > stop
        # pair, which generates a DESCENDING bucket list — spurious join
        # candidates, and for a wildly inverted pair an array long enough
        # to fail the job. Null bounds drop here too (null >= null is
        # not-true), matching explode(null)'s behavior.
        .filter(F.col("__e_us") >= F.col("__s_us"))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col("__s_us") / F.lit(width_us)),
                    F.floor(F.col("__e_us") / F.lit(width_us)),
                )
            ),
        )
    )
    joined = p.join(iv, on=[*keys, "__bucket"], how="inner").filter(
        F.col("__t_us").between(F.col("__s_us"), F.col("__e_us"))
    )
    return joined.drop("__t_us", "__s_us", "__e_us", "__bucket")
