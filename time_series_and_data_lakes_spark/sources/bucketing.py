"""Bucketed table layout — co-located joins and aggregations at rest.

Every fact-fact join and keyed aggregation pays a hash exchange unless the
data is already partitioned by the key ON DISK. Spark's answer is bucketed
tables (`bucketBy` — the catalog records bucket count + columns, every file
belongs to one bucket of `hash(key) % n`): two tables bucketed on the join
key with the same bucket count join with ZERO exchanges, and a groupBy on
the bucket column aggregates with zero exchanges. At 100 TB this moves the
shuffle cost of the hot join key from every query to a one-time write —
the lakehouse layout decision the reference's Glue/Athena side would call
a partitioned+bucketed table.

The write contract: bucketed tables must go through ``saveAsTable`` (the
bucket spec lives in the catalog, not in parquet); plain ``.parquet(path)``
writes would silently lose the bucketing. ``sortBy`` within buckets
additionally removes the per-bucket sort from sort-merge joins.

Plan properties (zero exchanges on bucket-aligned joins/aggs, bucket count
respected) are asserted by ``tests/test_plans.py``, not just claimed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    sort_cols: list[str] | str | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) parquet table
    registered in the session catalog.

    ``num_buckets`` sizes the parallelism floor of downstream bucket-local
    plans — pick roughly (table size / target partition size) at the
    LARGEST consumer; all tables that join on the key must share the count
    (mismatched counts fall back to a shuffle on one side).
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (``spark.table`` —
    reading the parquet files by path would drop the co-location)."""
    return spark.table(table)
