"""Generative cross-engine parity for the exact-decimal aggregation contract.

Round-9 sweep find: Spark casts double→DECIMAL by rounding the SHORTEST
DECIMAL REPR half-up, DuckDB by rounding the BINARY value — a true 6-dp
product cast to DECIMAL(18,4) sat on exact half-points on 330/60k lineitem
rows and diverged by one ulp of scale. The fix (tpch_q1 et al.) casts each
expression at its EXACT scale so the cast never rounds, sums in decimal,
and rounds once in decimal space.

The dirty sweep pins that on fixed data at three scales; this test explores
the boundary space generatively: random 2-dp prices/discounts/taxes are
exactly the population whose 4/6-dp products land on rounding half-points,
plus null sprinkles for the aggregate null contract.
"""

from __future__ import annotations

import datetime as dt
import os

from hypothesis import given, settings, strategies as st

import __spark_entry__ as entry

from tests.oracle_util import assert_matches_oracle

# 2-dp positive money/rate values — the TPC-H shapes whose products hit
# exact decimal half-points at the next scale down
_price = st.integers(min_value=90_000, max_value=10_500_000).map(lambda c: c / 100)
_rate = st.integers(min_value=0, max_value=11).map(lambda c: c / 100)
_qty = st.integers(min_value=100, max_value=5_500).map(lambda c: c / 100)

_row = st.tuples(
    st.one_of(st.none(), _qty),
    st.one_of(st.none(), _price),
    st.one_of(st.none(), _rate),
    st.one_of(st.none(), _rate),
    st.sampled_from(["A", "N", "R"]),
    st.sampled_from(["F", "O"]),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_row, min_size=1, max_size=60))
def test_q1_decimal_sums_match_oracle_on_random_boundaries(spark, tmp_path_factory, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path_factory.mktemp("q1_prop"))
    ship = dt.datetime(1997, 6, 1)
    pq.write_table(
        pa.table(
            {
                "l_quantity": pa.array([r[0] for r in rows], pa.float64()),
                "l_extendedprice": pa.array([r[1] for r in rows], pa.float64()),
                "l_discount": pa.array([r[2] for r in rows], pa.float64()),
                "l_tax": pa.array([r[3] for r in rows], pa.float64()),
                "l_returnflag": pa.array([r[4] for r in rows]),
                "l_linestatus": pa.array([r[5] for r in rows]),
                "l_shipdate": pa.array([ship] * len(rows), pa.timestamp("us")),
            }
        ),
        os.path.join(sf, "lineitem.parquet"),
    )
    name = "tpch_q1_pricing_summary"
    assert_matches_oracle(
        entry.queries()[name](spark, sf), sf, entry.oracle_sql()[name], name
    )

    # Per-row cast parity, checked directly: at the EXACT scale (6dp for
    # the 2dp x 2dp x 2dp product) the double->DECIMAL cast never rounds,
    # so both engines must agree on every row. A regression to a coarser
    # scale (the round-9 bug: DECIMAL(18,4)) rounds true half-points and
    # diverges on ~1% of random 2dp rows — the rounded SUMS above would
    # absorb most of those, so this is the high-power check.
    import duckdb

    from pyspark.sql import functions as F

    charge = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    ).cast("decimal(18,6)")
    got = [
        r["c"]
        for r in spark.read.parquet(os.path.join(sf, "lineitem.parquet"))
        .select(charge.alias("c"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            "SELECT CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)"
            " AS DECIMAL(18,6))"
            f" FROM read_parquet('{os.path.join(sf, 'lineitem.parquet')}')"
        ).fetchall()
    ]
    con.close()
    assert got == want


# --- q9 profit shape: the (18,4) cast is exact ONLY under the integral-
# quantity data contract -------------------------------------------------
#
# profit = l_extendedprice*(1-l_discount) - p_retailprice*0.1*l_quantity.
# The first term is a true 4-dp value; the second is 3-dp (2-dp retail x
# 0.1) times quantity — 3-dp ONLY while quantity is integral, so the
# DECIMAL(18,4) cast in tpch_q9_profit_by_nation never rounds. A
# fractional 2-dp quantity makes the term 5-dp and the cast rounds true
# half-points, where the engines disagree (Spark rounds the shortest
# decimal repr, DuckDB the binary value): measured 24/90 divergent rows on
# a 2-dp grid. These tests pin both halves: the contract on the shipped
# data, and the exact-scale parity that is the remedy if it ever breaks.

_int_qty = st.integers(min_value=1, max_value=55).map(float)


def test_q9_quantity_integrality_contract():
    # The driver generator ships integral l_quantity at every SF. If this
    # ever fails, tpch_q9's DECIMAL(18,4) profit cast starts rounding
    # 5-dp values and diverges from the oracle — widen it to (18,5).
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01"):
        n = con.execute(
            "SELECT count(*) FROM"
            f" read_parquet('/root/testdata/{sf}/lineitem.parquet')"
            " WHERE l_quantity != floor(l_quantity)"
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} fractional l_quantity rows break q9's (18,4) cast"
    con.close()


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(_price, _rate, _price, st.one_of(_int_qty, st.none())),
        min_size=1,
        max_size=60,
    )
)
def test_q9_profit_cast_parity_under_integral_quantities(spark, rows):
    import duckdb

    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "p double, d double, r double, q double")
    profit = (
        F.col("p") * (F.lit(1.0) - F.col("d"))
        - F.col("r") * F.lit(0.1) * F.col("q")
    ).cast("decimal(18,4)")
    got = [x["c"] for x in df.select(profit.alias("c")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(? * (1.0 - ?) - ? * 0.1 * ? AS DECIMAL(18,4))", list(t)
        ).fetchone()[0]
        for t in rows
    ]
    con.close()
    assert got == want


def test_q9_cast_rounds_and_diverges_on_fractional_quantities(spark):
    # Power check: the integrality contract is load-bearing. On fractional
    # 2-dp quantities the (18,4) cast provably diverges between engines,
    # while the exact 5-dp scale stays bit-identical — the remedy the
    # contract test's failure message prescribes.
    import duckdb

    from pyspark.sql import functions as F

    rows = [
        (p, d, r, q)
        for p in (1000.25, 937.17, 1500.55)
        for d in (0.03, 0.07)
        for r in (101.15, 333.35, 907.25)
        for q in (1.25, 2.75, 3.15, 7.45, 12.35)
    ]
    df = spark.createDataFrame(rows, "p double, d double, r double, q double")
    raw = F.col("p") * (F.lit(1.0) - F.col("d")) - F.col("r") * F.lit(0.1) * F.col("q")
    got = df.select(
        raw.cast("decimal(18,4)").alias("c4"), raw.cast("decimal(18,5)").alias("c5")
    ).collect()
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(? * (1.0 - ?) - ? * 0.1 * ? AS DECIMAL(18,4)),"
            "       CAST(? * (1.0 - ?) - ? * 0.1 * ? AS DECIMAL(18,5))",
            list(t) + list(t),
        ).fetchone()
        for t in rows
    ]
    con.close()
    divergent_4dp = sum(1 for g, w in zip(got, want) if g["c4"] != w[0])
    assert divergent_4dp > 0, "grid no longer exercises (18,4) half-points"
    assert all(g["c5"] == w[1] for g, w in zip(got, want))
