"""Catalog registration ≈ the Glue-crawler hop (SURVEY.md S10).

The reference crawls the lake bucket, infers schemas, and registers tables in
a Glue database (`dags/timestream-airflow-glue-demo.py:100-112`). In Spark
the same contract is schema inference at read + catalog/table registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def crawl_and_register(
    spark: SparkSession,
    path: str,
    table: str,
    fmt: str = "parquet",
    infer_csv_schema: bool = True,
) -> DataFrame:
    """Read ``path`` with schema inference and register it as a temp view
    (single-session catalog; ``saveAsTable`` on a real metastore)."""
    if fmt == "csv":
        df = (
            spark.read.option("header", True)
            .option("inferSchema", infer_csv_schema)
            .csv(path)
        )
    else:
        df = spark.read.format(fmt).load(path)
    df.createOrReplaceTempView(table)
    return df
