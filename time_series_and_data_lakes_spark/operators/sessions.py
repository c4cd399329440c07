"""Sessionization and as-of joins — the two time-series operators every
store-side user reaches for next (SURVEY.md §2.3 notes the as-of join as
the batch analogue of the LOCF alignment; sessionization is the gap-based
dual of the fixed ``bin``).

Both are single-exchange window compositions — no Python, no driver loops —
and both have exact DuckDB-oracle formulations (the same window algebra for
sessions; native ``ASOF LEFT JOIN`` for the join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from time_series_and_data_lakes_spark.operators.timeseries import _interval_micros


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str = "time",
    gap: str = "INTERVAL 30 MINUTES",
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when the
    time since the previous event exceeds ``gap``. Classic lag + cumulative
    sum — one exchange on the keys, O(1) state per row.

    A NULL-time row cannot be sessionized and is dropped — unfiltered it
    seeds a phantom session in Spark (nulls-first) and glues onto the
    final session in DuckDB (r10 find)."""
    gap_us = _interval_micros(gap)
    df = df.filter(F.col(time_col).isNotNull())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(time_col)
    prev_t = F.lag(F.col(time_col)).over(w)
    new_session = (
        prev_t.isNull()
        | ((F.unix_micros(F.col(time_col)) - F.unix_micros(prev_t)) > gap_us)
    ).cast("bigint")
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_time: str = "time",
    right_time: str = "time",
    right_values: Sequence[str] = (),
    suffix: str = "",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row's values
    at the greatest ``right_time`` <= ``left_time`` within the same key
    (null when no prior right row — LEFT semantics).

    Distributed formulation: union both sides tagged, one window pass with
    ``last(..., ignorenulls)`` carrying the matched right ROW forward as a
    single struct, keep left rows — one exchange + one sort sized |L|+|R|,
    the canonical shuffle-minimal as-of. The struct is what makes the
    semantics exact: carrying each value column separately would skip a
    matched row's legitimately-NULL value (``ignorenulls`` operates per
    column) and could stitch one output row from DIFFERENT right rows;
    the struct is null-or-whole-row, so the matched row's own NULLs come
    through — exactly DuckDB's ``ASOF LEFT JOIN ... ON l.t >= r.t``.
    Right rows order before left rows at equal timestamps, so the match
    is inclusive (>=). Right (key, time) pairs must be unique —
    pre-aggregate the right side, otherwise the carried value is
    order-nondeterministic.

    Right rows with a NULL key or NULL time are dropped up front (r9
    review find, runtime-confirmed vs DuckDB): the ASOF predicate
    ``l.k = r.k AND l.t >= r.t`` can never match them, but unfiltered
    they leak through the union-window formulation — partitionBy groups
    NULL keys together (matching null-key LEFT rows SQL equality never
    matches), and a NULL time sorts FIRST, so its struct would be carried
    to every left row preceding any real right row. Null-key/null-time
    LEFT rows are kept and attach nothing, per LEFT semantics.
    """

    right_values = list(right_values)
    right = right.filter(F.col(right_time).isNotNull())
    for k in keys:
        right = right.filter(F.col(k).isNotNull())
    left_cols = [c for c in left.columns]
    out_left = [c for c in left_cols if c not in keys and c != left_time]
    clashes = {f"{c}{suffix}" for c in right_values} & set(
        list(keys) + [left_time] + out_left
    )
    if clashes:
        raise ValueError(
            f"asof_join output names {sorted(clashes)} collide with left "
            "columns — pass suffix= to disambiguate"
        )
    if not right_values:  # nothing to attach: the join is the left side
        return left.select(*keys, left_time, *out_left)
    r_struct_t = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_values]
    )
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_l"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols if c not in keys],
        F.lit(None).cast(r_struct_t).alias("__r"),
    )
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_l"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left_cols
            if c not in keys
        ],
        F.struct(*[F.col(c).alias(c) for c in right_values]).alias("__r"),
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy("__t", "__is_l")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_side.unionByName(r_side).select(
        *keys,
        "__t",
        "__is_l",
        *[F.col(f"__l_{c}") for c in left_cols if c not in keys],
        F.last("__r", ignorenulls=True).over(w).alias("__rm"),
    )
    return carried.filter(F.col("__is_l") == 1).select(
        *keys,
        F.col("__t").alias(left_time),
        *[F.col(f"__l_{c}").alias(c) for c in out_left],
        *[F.col("__rm")[c].alias(f"{c}{suffix}") for c in right_values],
    )
