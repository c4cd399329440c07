"""Semantic probes for sessionization and the as-of join (independent of
the expression-identical oracles)."""

from __future__ import annotations

import datetime as dt

from time_series_and_data_lakes_spark.operators.sessions import asof_join, sessionize


def _t(m: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_sessionize_gap_boundaries(spark):
    rows = [
        ("a", _t(0)),
        ("a", _t(10)),   # 10 min gap -> same session (gap=30)
        ("a", _t(41)),   # 31 min gap -> new session
        ("a", _t(70)),   # 29 min -> same
        ("b", _t(5)),    # separate key -> own session numbering
    ]
    df = spark.createDataFrame(rows, "k string, time timestamp")
    got = {
        (r["k"], r["time"]): r["session_id"]
        for r in sessionize(df, ["k"], "time", gap="INTERVAL 30 MINUTES").collect()
    }
    assert got == {
        ("a", _t(0)): 1,
        ("a", _t(10)): 1,
        ("a", _t(41)): 2,
        ("a", _t(70)): 2,
        ("b", _t(5)): 1,
    }
    # exact-gap boundary: 30:00 is NOT a new session (strictly greater only)
    df2 = spark.createDataFrame([("a", _t(0)), ("a", _t(30))], "k string, time timestamp")
    sids = {r["session_id"] for r in sessionize(df2, ["k"], "time", gap="INTERVAL 30 MINUTES").collect()}
    assert sids == {1}


def test_asof_join_backward_inclusive_left(spark):
    left = spark.createDataFrame(
        [("a", _t(5), 100), ("a", _t(20), 200), ("a", _t(0), 300), ("b", _t(9), 400)],
        "k string, time timestamp, left_val long",
    )
    right = spark.createDataFrame(
        [("a", _t(1), 1.0), ("a", _t(5), 2.0), ("a", _t(15), 3.0)],
        "k string, time timestamp, price double",
    )
    out = {
        (r["k"], r["time"]): (r["left_val"], r["price"])
        for r in asof_join(left, right, ["k"], right_values=["price"]).collect()
    }
    assert out[("a", _t(0))] == (300, None)      # before any right row -> null
    assert out[("a", _t(5))] == (100, 2.0)       # inclusive: equal time matches
    assert out[("a", _t(20))] == (200, 3.0)      # latest right <= 20
    assert out[("b", _t(9))] == (400, None)      # key with no right rows
    assert len(out) == 4                          # left row count preserved
