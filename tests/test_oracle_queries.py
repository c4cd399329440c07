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


def test_g9_ohlc_oracle_parity_under_duplicate_timestamps(spark, tmp_path):
    # ADVICE_r4: open/close must be deterministic when a sensor carries
    # duplicate timestamps — both engines break the tie on the value.
    # Synthetic fixture: the first/last instants each hold two readings.
    import datetime as dt

    from tests.oracle_util import assert_matches_oracle
    from tests.test_cep import _write_synthetic_events

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        # key 1: duplicate first and last instants
        (1, t0, 1, "ok", 20.0),
        (2, t0, 1, "ok", 10.0),                                   # open = 10 (min value at min ts)
        (3, t0 + dt.timedelta(hours=1), 1, "ok", 99.0),
        (4, t0 + dt.timedelta(hours=2), 1, "ok", 40.0),
        (5, t0 + dt.timedelta(hours=2), 1, "ok", 30.0),           # close = 40 (max value at max ts)
        # key 2: single reading
        (6, t0, 2, "ok", 55.0),
    ]
    sf_dir = _write_synthetic_events(tmp_path, rows)
    out = Q.QUERIES["g9_ohlc_per_sensor"](spark, sf_dir)
    got = {r["sensor_id"]: r for r in out.collect()}
    assert (got[1]["open"], got[1]["high"], got[1]["low"], got[1]["close"]) == (
        10.0, 99.0, 10.0, 40.0,
    )
    assert (got[2]["open"], got[2]["close"]) == (55.0, 55.0)
    assert_matches_oracle(out, sf_dir, Q.ORACLES["g9_ohlc_per_sensor"], "g9_dup_ts")


def test_q16_null_supplier_links_match_not_in_semantics(spark, tmp_path):
    # round-8 review: SQL NOT IN drops NULL-suppkey links via three-valued
    # logic (flagged set non-empty), while a plain left-anti join keeps
    # them — a part whose links are ALL null then mints a phantom
    # zero-count group on the Spark side only. Both engines now exclude
    # null links unconditionally.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle_util import assert_matches_oracle

    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], pa.int64()),
                "p_brand": pa.array(["Brand#1", "Brand#2"]),
                "p_type": pa.array(["STANDARD", "STANDARD"]),
                "p_size": pa.array([9, 9], pa.int32()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([10, 20, 30], pa.int64()),
                "s_acctbal": pa.array([100.0, -5.0, 50.0]),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 1, 1, 1, 2], pa.int64()),
                # part 1: one flagged link, one NULL link, two real ones;
                # part 2: ONLY a null link — must not appear at all
                "l_suppkey": pa.array([10, 20, None, 30, None], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = Q.QUERIES["tpch_q16_supplier_count"](spark, str(tmp_path))
    rows = out.collect()
    assert [(r["p_brand"], r["supplier_cnt"]) for r in rows] == [("Brand#1", 2)]
    assert_matches_oracle(
        out, str(tmp_path), Q.ORACLES["tpch_q16_supplier_count"], "q16_null_links"
    )


def test_q16_null_flagged_key_empties_not_in_on_both_engines(spark, tmp_path):
    # round-9 sweep: the DUAL of the null-link hazard — a NULL s_suppkey
    # INSIDE the flagged set makes `x NOT IN (…)` UNKNOWN for every x
    # (SQL three-valued logic), so the oracle returns ZERO rows, while a
    # plain equality anti join would ignore the null flagged row and keep
    # everything. The engine's anti-join condition carries
    # `OR s_suppkey IS NULL` to reproduce the poisoning.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle_util import assert_matches_oracle

    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1], pa.int64()),
                "p_brand": pa.array(["Brand#1"]),
                "p_type": pa.array(["STANDARD"]),
                "p_size": pa.array([9], pa.int32()),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                # the flagged (s_acctbal < 0) set = {20, NULL} — poisoned
                "s_suppkey": pa.array([10, 20, None], pa.int64()),
                "s_acctbal": pa.array([100.0, -5.0, -7.0]),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 1], pa.int64()),
                "l_suppkey": pa.array([10, 30], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = Q.QUERIES["tpch_q16_supplier_count"](spark, str(tmp_path))
    assert out.collect() == []
    assert_matches_oracle(
        out, str(tmp_path), Q.ORACLES["tpch_q16_supplier_count"], "q16_poisoned_not_in"
    )


def test_distinct_pair_count_skips_null_components_on_both_engines(spark, tmp_path):
    # round-8 review: Spark's multi-arg countDistinct skips rows where ANY
    # column is NULL, while DuckDB's bare row-value count(DISTINCT (a,b))
    # counts (NULL, x) as a distinct non-null struct — runtime-confirmed
    # 2 vs 4 on this fixture before the oracle gained its FILTER clause.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle_util import assert_matches_oracle

    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array(["R"] * 4),
                "l_partkey": pa.array([1, 1, None, 2], pa.int64()),
                "l_suppkey": pa.array([1, None, 2, 2], pa.int64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    out = Q.QUERIES["distinct_part_suppliers"](spark, str(tmp_path))
    row = out.collect()[0]
    assert (row["n_parts"], row["n_suppliers"], row["n_part_supp"], row["n_rows"]) == (
        2, 2, 2, 4,
    )
    assert_matches_oracle(
        out, str(tmp_path), Q.ORACLES["distinct_part_suppliers"], "distinct_null_pairs"
    )


def test_q13_null_custkey_customers_merge_to_one_group(spark, tmp_path):
    # round-9 sweep: the oracle's inner GROUP BY c_custkey treats NULLs as
    # equal, so ALL null-custkey customers collapse into ONE zero-order
    # group — one row per customer ROW diverged (28 vs 1 custdist).
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle_util import assert_matches_oracle

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, None, None, None], pa.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 101], pa.int64()),
                "o_custkey": pa.array([1, 1], pa.int64()),
                "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"]),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = Q.QUERIES["tpch_q13_order_count_distribution"](spark, str(tmp_path))
    # cust 1 -> c_count 2; the three NULL customers -> ONE c_count-0 group
    assert {(r["c_count"], r["custdist"]) for r in out.collect()} == {(2, 1), (0, 1)}
    assert_matches_oracle(
        out,
        str(tmp_path),
        Q.ORACLES["tpch_q13_order_count_distribution"],
        "q13_null_custkeys",
    )


def test_q13_null_orderkeys_count_zero_on_both_engines(spark, tmp_path):
    # round-8 review: the oracle's outer-join form counts non-null order
    # keys (count(o_orderkey)), so a NULL-orderkey order row that matches a
    # customer must contribute 0 — count(*) on the Spark side counted it.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle_util import assert_matches_oracle

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())}),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                # cust 1: two real orders + one NULL-orderkey row (counts 2);
                # cust 2: ONLY a NULL-orderkey row (counts 0, like cust 3).
                "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
                "o_orderkey": pa.array([100, 101, None, None], pa.int64()),
                "o_orderpriority": pa.array(["1-URGENT"] * 4),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = Q.QUERIES["tpch_q13_order_count_distribution"](spark, str(tmp_path))
    assert {(r["c_count"], r["custdist"]) for r in out.collect()} == {(2, 1), (0, 2)}
    assert_matches_oracle(
        out,
        str(tmp_path),
        Q.ORACLES["tpch_q13_order_count_distribution"],
        "q13_null_orderkeys",
    )


def test_q21_null_suppkey_late_lines_do_not_inflate_numwait(spark, tmp_path):
    # round-8 review: a NULL-suppkey late line never joins supplier in the
    # oracle's l1 iteration (and never blocks its NOT EXISTS — the <>
    # comparison is UNKNOWN), so it must not count toward numwait or
    # disqualify the order's sole late supplier.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle_util import assert_matches_oracle

    day = 86_400_000_000  # one day in microseconds
    ts = pa.timestamp("us")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([500], pa.int64()),
                "o_orderstatus": pa.array(["F"]),
                "o_orderdate": pa.array([0], ts),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([500] * 4, pa.int64()),
                # supplier 10: two late lines; supplier 20: on time (makes
                # the order multi-supplier); NULL suppkey: late — ignored.
                "l_suppkey": pa.array([10, 10, 20, None], pa.int64()),
                "l_shipdate": pa.array([100 * day, 95 * day, day, 120 * day], ts),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([10, 20], pa.int64()),
                "s_name": pa.array(["Supp#10", "Supp#20"]),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    out = Q.QUERIES["tpch_q21_sole_late_suppliers"](spark, str(tmp_path))
    assert [(r["s_name"], r["numwait"]) for r in out.collect()] == [("Supp#10", 2)]
    assert_matches_oracle(
        out, str(tmp_path), Q.ORACLES["tpch_q21_sole_late_suppliers"], "q21_null_supp"
    )


def test_ewma_oracle_parity_at_fold_cap(spark, tmp_path):
    # End-to-end cap parity: a key with more observations than
    # _FOLD_MAX_POINTS — including duplicate timestamps near the cap
    # boundary — must produce the SAME bounded fold in Spark and DuckDB.
    import datetime as dt

    from tests.oracle_util import assert_matches_oracle
    from tests.test_cep import _write_synthetic_events
    from time_series_and_data_lakes_spark.queries import _FOLD_MAX_POINTS

    t0 = dt.datetime(2020, 1, 1)
    n = _FOLD_MAX_POINTS + 200
    rows = [
        # duplicate timestamps every 7th row (i and i+1 share an instant)
        (i, t0 + dt.timedelta(seconds=(i - i % 7 if i % 7 == 1 else i)), 1,
         "ok", float((i * 37) % 101))
        for i in range(n)
    ]
    sf_dir = _write_synthetic_events(tmp_path, rows)
    out = Q.QUERIES["analytics_ewma"](spark, sf_dir)
    (row,) = out.collect()
    assert row["n_obs"] == _FOLD_MAX_POINTS  # capped, not the full history
    assert_matches_oracle(out, sf_dir, Q.ORACLES["analytics_ewma"], "ewma_cap")


def test_analytics_null_measurements_skip_not_reset(spark, tmp_path):
    # A null measurement is NO observation — the fold family must skip it
    # (like SQL aggregates), never restart the smoother (EWMA's null-seeded
    # accumulator did) or zero-clamp the drift state (CUSUM's greatest()
    # did). Parity alone can't prove the semantics (a bug written into both
    # sides still matches — see the verify recipe), so assert the EWMA
    # value equals a Python fold over the NON-NULL values, then gate the
    # whole value-bearing family against the oracles on the same fixture.
    import datetime as dt

    from tests.oracle_util import assert_matches_oracle
    from tests.test_cep import _write_synthetic_events
    from time_series_and_data_lakes_spark.queries import _EWMA_ALPHA

    t0 = dt.datetime(2024, 5, 1)
    vals = [12.0, None, 15.0, 18.0, None, None, 21.0, 9.0, None, 30.0]
    rows = [
        (i + 100 * uid, t0 + dt.timedelta(minutes=5 * i), uid,
         "ok" if i % 3 else "error", v)
        for uid in (1, 2)
        for i, v in enumerate(vals)
    ]
    sf_dir = _write_synthetic_events(tmp_path, rows)

    out = Q.QUERIES["analytics_ewma"](spark, sf_dir)
    got = {r["sensor_id"]: r for r in out.collect()}
    acc = None
    for x in vals:
        if x is None:
            continue
        acc = x if acc is None else _EWMA_ALPHA * x + (1 - _EWMA_ALPHA) * acc
    assert got[1]["n_obs"] == sum(v is not None for v in vals)
    assert got[1]["ewma_temperature"] == acc  # bit-exact same fold chain

    for name in (
        "analytics_ewma",
        "analytics_holt",
        "analytics_cusum",
        "analytics_lttb_downsample",
        "analytics_anomaly_zscore",
        "analytics_moving_window",
        "g9_ohlc_per_sensor",
        "g5_binned_percentiles",
    ):
        assert_matches_oracle(
            Q.QUERIES[name](spark, sf_dir), sf_dir, Q.ORACLES[name], f"{name}_nulls"
        )
