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


def test_asof_join_matched_row_nulls_come_through_whole(spark):
    """ASOF semantics carry the MATCHED row, nulls and all: a per-column
    ignorenulls carry would skip a matched row's legitimately-NULL value
    (returning a stale older row's value) and could stitch one output row
    from DIFFERENT right rows. DuckDB 'ASOF LEFT JOIN' returns NULL here —
    verified divergence before the struct fix."""
    import pytest

    left = spark.createDataFrame(
        [("k", _t(3))], "k string, time timestamp"
    )
    right = spark.createDataFrame(
        [("k", _t(1), 10.0, "old"), ("k", _t(2), None, "new")],
        "k string, time timestamp, v double, tag string",
    )
    (row,) = asof_join(left, right, ["k"], right_values=["v", "tag"]).collect()
    # the t=2 row matched: its NULL v comes through, and tag comes from the
    # SAME row (not v=10.0 from t=1 paired with tag='new' from t=2)
    assert row["v"] is None and row["tag"] == "new"

    # output-name collision with a left column is rejected, not emitted as
    # an ambiguous duplicate column
    left2 = spark.createDataFrame([("k", _t(3), 1.0)], "k string, time timestamp, v double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left2, right, ["k"], right_values=["v"])
    out = asof_join(left2, right, ["k"], right_values=["v"], suffix="_r")
    assert set(out.columns) == {"k", "time", "v", "v_r"}


def test_asof_join_null_right_attrs_match_nothing(spark):
    """r9 review find, runtime-confirmed vs DuckDB ASOF LEFT JOIN: a right
    row with a NULL key or NULL time can never satisfy
    ``l.k = r.k AND l.t >= r.t``, but unfiltered it leaked through the
    union-window formulation — partitionBy groups NULL keys (Spark
    attached 200.0 to the null-key left row where DuckDB returns NULL),
    and a NULL right time sorts FIRST, so its struct was carried to every
    left row preceding any real right row."""
    left = spark.createDataFrame(
        [(1, _t(1), "early"), (1, _t(5), "late"), (None, _t(6), "nullkey")],
        "k bigint, time timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, None, 100.0), (None, _t(0), 200.0), (1, _t(2), 300.0)],
        "k bigint, time timestamp, val double",
    )
    out = {
        r["ev"]: r["val"]
        for r in asof_join(left, right, ["k"], right_values=["val"]).collect()
    }
    # early (t=1) precedes the only real right row (t=2): the NULL-time
    # right row must NOT be carried into it
    # nullkey: SQL equality never matches NULL = NULL
    assert out == {"early": None, "late": 300.0, "nullkey": None}
    # null-time LEFT rows are kept and attach nothing (l.t >= r.t UNKNOWN)
    left2 = spark.createDataFrame([(1, None, "nulltime")], "k bigint, time timestamp, ev string")
    (row,) = asof_join(left2, right, ["k"], right_values=["val"]).collect()
    assert row["ev"] == "nulltime" and row["val"] is None


def test_range_join_inclusive_bounds_and_bucket_spans(spark):
    from time_series_and_data_lakes_spark.operators.intervals import range_join

    # bucket_s=60: interval B spans 3 buckets; points sit exactly on the
    # inclusive start/end bounds and on bucket edges.
    points = spark.createDataFrame(
        [("k1", _t(0)), ("k1", _t(1)), ("k1", _t(2.5)), ("k1", _t(3)),
         ("k1", _t(3.001)), ("k2", _t(1))],
        "key string, t timestamp",
    )
    intervals = spark.createDataFrame(
        [("k1", "A", _t(0), _t(1)), ("k1", "B", _t(1), _t(3)), ("k2", "C", _t(2), _t(9))],
        "key string, iv string, s timestamp, e timestamp",
    )
    got = range_join(points, intervals, "t", "s", "e", keys=["key"], bucket_s=60)
    pairs = sorted((r["iv"], r["t"].minute, r["t"].second) for r in got.collect())
    assert pairs == [
        ("A", 0, 0),   # point at inclusive start
        ("A", 1, 0),   # point at inclusive end
        ("B", 1, 0),   # same point, second interval
        ("B", 2, 30),  # interior, mid-bucket
        ("B", 3, 0),   # inclusive end on a bucket edge
    ]  # t(3.001) is outside B; k2's point t(1) is before C


def test_range_join_inverted_and_null_intervals_drop_cheaply(spark):
    # an inverted interval (end < start) can never satisfy the BETWEEN
    # filter, but pre-fix it fed sequence() a start > stop pair — a
    # DESCENDING bucket list that produced spurious join candidates (and,
    # wildly inverted, an array big enough to fail the job). It must be
    # filtered BEFORE the explode; null bounds drop the same way.
    from time_series_and_data_lakes_spark.operators.intervals import range_join

    points = spark.createDataFrame(
        [("k", _t(1)), ("k", _t(2))], "key string, t timestamp"
    )
    intervals = spark.createDataFrame(
        [
            ("k", "ok", _t(0), _t(3)),
            ("k", "inv", _t(3), _t(0)),  # inverted
            ("k", "null_e", _t(0), None),
            ("k", "wild", _t(500_000_000), _t(0)),  # ~10^7 buckets if exploded
        ],
        "key string, iv string, s timestamp, e timestamp",
    )
    got = range_join(points, intervals, "t", "s", "e", keys=["key"], bucket_s=60)
    assert sorted(r["iv"] for r in got.collect()) == ["ok", "ok"]


def test_range_join_pairs_are_unique(spark):
    from time_series_and_data_lakes_spark.operators.intervals import range_join

    # An interval spanning many buckets must still match each point once.
    points = spark.createDataFrame([("k", _t(m)) for m in range(10)], "key string, t timestamp")
    intervals = spark.createDataFrame([("k", _t(0), _t(9))], "key string, s timestamp, e timestamp")
    got = range_join(points, intervals, "t", "s", "e", keys=["key"], bucket_s=60)
    assert got.count() == 10
    assert got.select("t").distinct().count() == 10


def test_range_join_cep_invariant(spark, sf_dir):
    from pyspark.sql import functions as F

    from time_series_and_data_lakes_spark import queries as Q
    from time_series_and_data_lakes_spark.operators.intervals import range_join

    # With no padding, the readings inside the match window are exactly the
    # matched rows: A + B{1..5} + C = non_errors + 2. `elapsed` is truncated
    # to whole seconds (reference semantics), so close the window at
    # elapsed+1s-1µs to re-include C; the fixture's minimum inter-reading
    # gap (~46 s) guarantees no extra reading can slip in.
    cep = Q.f2_cep_match_recognize(spark, sf_dir)
    iv = cep.select(
        "sensor_id", "event_time", "non_errors",
        F.col("event_time").alias("w_start"),
        F.timestamp_micros(
            F.unix_micros("event_time") + (F.col("elapsed") + 1) * 1_000_000 - 1
        ).alias("w_end"),
    )
    obs = Q.sensor_obs(spark, sf_dir).select("sensor_id", "time")
    counts = (
        range_join(obs, iv, "time", "w_start", "w_end", keys=["sensor_id"])
        .groupBy("sensor_id", "event_time", "non_errors")
        .agg(F.count("*").alias("n"))
    )
    rows = counts.collect()
    assert rows, "expected CEP matches in the fixture"
    for r in rows:
        assert r["n"] == int(r["non_errors"]) + 2, r


def test_range_join_rejects_nonpositive_bucket(spark):
    import pytest

    from time_series_and_data_lakes_spark.operators.intervals import range_join

    pts = spark.createDataFrame([("k", _t(1))], "k string, t timestamp")
    ivs = spark.createDataFrame(
        [("k", _t(0), _t(2))], "k string, s timestamp, e timestamp"
    )
    # 1e-9 int-truncates to a ZERO microsecond width — must be rejected at
    # construct time, not surface as a mid-job ANSI DIVIDE_BY_ZERO
    for bad in (0, -60, 1e-9):
        with pytest.raises(ValueError, match="bucket_s"):
            range_join(pts, ivs, "t", "s", "e", keys=["k"], bucket_s=bad)
    # fractional seconds above one microsecond are a valid width
    assert range_join(pts, ivs, "t", "s", "e", keys=["k"], bucket_s=0.5).count() == 1
    # the derived width ROUNDS the fractional request: 4.1 s must yield an
    # exact 4100000 us bucket, not int-truncation's 4099999 (ADVICE r8 —
    # its 0.3 example happens to float-round UP; 4.1 sits below)
    from time_series_and_data_lakes_spark.operators.intervals import bucket_width_us

    assert bucket_width_us(4.1) == 4_100_000 != int(4.1 * 1_000_000)
    assert range_join(pts, ivs, "t", "s", "e", keys=["k"], bucket_s=4.1).count() == 1
