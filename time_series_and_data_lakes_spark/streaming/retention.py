"""Retention tiering: Timestream's memory/magnetic stores as table ops
(SURVEY.md S7/T11).

Reference: raw table = 24 h memory + 7 d magnetic, CEP table = 24 h + 30 d
(`cdk/time_series_and_data_lakes/time_series_and_data_lakes_stack.py:42-61`).
Spark mapping: the "memory store" is the cached hot window (recent
partitions); the magnetic bound is a TTL job dropping expired ``date``
partitions. On Delta this is ``DELETE WHERE time < now()-retention`` +
``VACUUM``; on the container's plain-Parquet store the same contract is
partition-directory removal, which is metadata-only (no rewrite) because the
store partitions by date.
"""

from __future__ import annotations

import datetime as dt
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def expire_partitions(store_path: str, cutoff_date: dt.date) -> list[str]:
    """Drop store partitions older than ``cutoff_date`` (magnetic-store TTL).

    Works on the layout written by the ingest sink:
    ``{store}/measure_name=*/date=YYYY-MM-DD/``. Returns removed paths.
    """
    removed = []
    for date_dir in Path(store_path).glob("measure_name=*/date=*"):
        date_str = date_dir.name.split("=", 1)[1]
        if dt.date.fromisoformat(date_str) < cutoff_date:
            shutil.rmtree(date_dir)
            removed.append(str(date_dir))
    return removed


def cache_hot_window(
    spark: SparkSession, store_path: str, since_date: dt.date
) -> DataFrame:
    """The "memory store": cache the recent partitions so ago()-style
    recency queries (P5/P7) serve from memory."""
    df = spark.read.parquet(store_path).filter(f"date >= DATE'{since_date.isoformat()}'")
    df.cache()
    return df
