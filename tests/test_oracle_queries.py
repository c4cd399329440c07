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
