"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the engine's query catalog
(time_series_and_data_lakes_spark.queries) for the DuckDB-oracle
correctness gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from time_series_and_data_lakes_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (`timestream-queries/queries.txt:2-19`) on sf0.001."""
    return Q.q1_flagship_interpolate(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
