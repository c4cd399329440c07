"""Every catalog query hash-matches its DuckDB oracle at the smoke scale
factor — the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from time_series_and_data_lakes_spark import queries as Q
from tests.oracle_util import assert_matches_oracle

ORACLE_BACKED = sorted(set(Q.QUERIES) & set(Q.ORACLES))


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_query_matches_oracle(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, sf_dir, Q.ORACLES[name], name)


def test_every_query_has_runnable_plan(spark, sf_dir):
    for name, fn in Q.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name


def test_approx_distinct_within_rsd_of_exact(spark, sf_dir):
    # The HLL sketch query is rows-only checked by the driver; bound its
    # error against the exact distinct counts here (rsd=0.02 → allow 3σ).
    approx = {
        r["l_returnflag"]: r
        for r in Q.QUERIES["approx_distinct_parts"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in Q.QUERIES["distinct_part_suppliers"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a["approx_parts"] - e["n_parts"]) <= 0.06 * e["n_parts"]
        assert abs(a["approx_suppliers"] - e["n_suppliers"]) <= 0.06 * e["n_suppliers"]


def test_bounded_fold_caps_oversized_key(spark):
    # VERDICT_r4 item 4: a key whose history exceeds the fold bound must be
    # pruned to its most recent max_points BEFORE the collect — the fold
    # then runs over exactly that suffix (verified against a hand-computed
    # EWMA over the kept tail).
    import datetime as dt

    from pyspark.sql import functions as F

    from time_series_and_data_lakes_spark.queries import _EWMA_ALPHA, _bounded_obs

    n, cap = 500, 100
    rows = [
        ("big", dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), float(i % 37))
        for i in range(n)
    ] + [("small", dt.datetime(2024, 1, 1), 5.0)]
    obs = spark.createDataFrame(
        rows, "sensor_id string, time timestamp, temperature double"
    )
    bounded = _bounded_obs(obs, max_points=cap)
    counts = {r["sensor_id"]: r["n"] for r in bounded.groupBy("sensor_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big": cap, "small": 1}

    arr = F.array_sort(F.collect_list(F.struct(F.col("time"), F.col("temperature"))))
    ewma = F.aggregate(
        arr,
        F.lit(None).cast("double"),
        lambda acc, p: F.when(acc.isNull(), p["temperature"]).otherwise(
            F.lit(_EWMA_ALPHA) * p["temperature"] + F.lit(1 - _EWMA_ALPHA) * acc
        ),
    )
    got = {
        r["sensor_id"]: r["v"]
        for r in bounded.groupBy("sensor_id").agg(ewma.alias("v")).collect()
    }
    acc = None
    for i in range(n - cap, n):  # most recent `cap` observations of "big"
        x = float(i % 37)
        acc = x if acc is None else _EWMA_ALPHA * x + (1 - _EWMA_ALPHA) * acc
    assert got["big"] == acc
    assert got["small"] == 5.0
