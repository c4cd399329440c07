"""Skew-handling utilities for the 100 TB posture.

AQE's skew-join splitting (enabled in the session factory) covers joins; the
remaining hot spot is a grouped aggregation with a pathological key (one
sensor emitting orders of magnitude more readings). :func:`salted_agg`
implements the standard two-phase rewrite: salt the key, partially aggregate
per (key, salt), then merge — turning one giant partition into ``salt_buckets``
parallel ones at the cost of a second (tiny) shuffle.

Only aggregations with a decomposable merge (sum/count/min/max and things
built from them, e.g. avg = sum/count) are expressible this way; that covers
every aggregate the reference queries use (SURVEY.md §2.4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_expr, merge_fn) per supported aggregate
_MERGES = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name → (function, input column) with function in
    {sum, count, min, max, avg}. avg is decomposed into sum+count and
    re-divided after the merge, so results equal the direct aggregation.

    The salt is a DETERMINISTIC function of row content (xxhash64 over
    every column): a nondeterministic salt (monotonically_increasing_id,
    rand) re-salts rows differently when a lost shuffle-map task is
    recomputed after some reducers already fetched its output — rows then
    double-count or vanish from the partial aggregates (the classic
    SPARK-23207 hazard). Identical duplicate rows share a salt, which
    only concentrates exact duplicates, not a hot key's distinct rows.
    """
    if salt_buckets < 1:
        raise ValueError(f"salt_buckets must be >= 1, got {salt_buckets}")
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)),
    )

    partials: list[Column] = []
    finals: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partials += [F.sum(col).alias(f"__s_{out}"), F.count(col).alias(f"__c_{out}")]
            finals.append((F.sum(f"__s_{out}") / F.sum(f"__c_{out}")).alias(out))
        elif fn in _MERGES:
            partial, merge = _MERGES[fn]
            partials.append(partial(col).alias(f"__p_{out}"))
            finals.append(merge(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported aggregate {fn!r}")

    phase1 = salted.groupBy(*keys, "__salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)
