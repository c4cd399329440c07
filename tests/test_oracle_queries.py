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
