"""Explicit error-bound gates for the two approximate-by-design queries.

``g5b_approx_percentiles`` and ``approx_distinct_parts`` can never have an
exact cross-engine oracle (sketch internals are engine-specific), so the
driver records them rows-only. These tests ARE their correctness gate, and
they state the bound asserted (VERDICT_r3 item 6):

- HLL++ distinct counts run with ``rsd=0.02``; the estimate must sit within
  3 standard deviations (6%) of the exact distinct count.
- ``percentile_approx`` runs at Spark's default accuracy 10000, a rank-error
  guarantee of ``eps = 1/10000``: the returned value must be an actual
  column value whose rank is within ``eps*n`` of the target rank. We assert
  rank distance <= ceil(2*eps*n) + 2 (2x the guarantee plus two positions of
  tie/boundary slack) — at these group sizes that means near-exact.

Parameterized over sf0.01 (the driver's gate scale) and sf0.1 (the bench
scale) so the bounds are not an artifact of one data size.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from pyspark.sql import functions as F
from time_series_and_data_lakes_spark import queries as Q

SCALES = [d for d in ("/root/testdata/sf0.01", "/root/testdata/sf0.1") if os.path.isdir(d)]


@pytest.mark.parametrize("sf", SCALES)
def test_approx_distinct_within_3sigma_of_exact(spark, sf):
    approx = {
        r["l_returnflag"]: r
        for r in Q.QUERIES["approx_distinct_parts"](spark, sf).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in Q.QUERIES["distinct_part_suppliers"](spark, sf).collect()
    }
    assert set(approx) == set(exact)
    for flag, e in exact.items():
        a = approx[flag]
        # rsd=0.02 -> 3 sigma = 6%
        assert abs(a["approx_parts"] - e["n_parts"]) <= 0.06 * e["n_parts"], (sf, flag)
        assert abs(a["approx_suppliers"] - e["n_suppliers"]) <= 0.06 * e["n_suppliers"], (sf, flag)


@pytest.mark.parametrize("sf", SCALES)
def test_approx_percentile_within_rank_error(spark, sf):
    got = (
        Q.QUERIES["g5b_approx_percentiles"](spark, sf)
        .select(
            F.unix_timestamp("time_bin").alias("bin_s"), "p90_approx", "p75_approx"
        )
        .collect()
    )
    # exact per-bin sorted values, same epoch-floor day binning as time_bin
    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT (epoch(ts)::BIGINT // 86400) * 86400 AS bin_s,
               list_sort(list(value)) AS vals
        FROM '{sf}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    exact = {r[0]: r[1] for r in rows}
    assert {r["bin_s"] for r in got} == set(exact)

    eps = 1.0 / 10000.0  # percentile_approx default accuracy
    for r in got:
        vals = exact[r["bin_s"]]
        n = len(vals)
        slack = math.ceil(2 * eps * n) + 2
        for q, col in ((0.9, "p90_approx"), (0.75, "p75_approx")):
            target = q * (n - 1)
            lo = vals[max(0, math.floor(target) - slack)]
            hi = vals[min(n - 1, math.ceil(target) + slack)]
            assert lo <= r[col] <= hi, (sf, r["bin_s"], col, r[col], lo, hi)
            # the sketch returns an actual element of the column
            assert r[col] in vals, (sf, r["bin_s"], col)
