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
