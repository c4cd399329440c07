"""Lake-side CSV external tables and views (SURVEY.md §2.1 S11/S12).

The reference declares its dimension CSVs as Athena external tables with
OpenCSVSerde + ``skip.header.line.count=1`` (`README.md:359-378,389-406`) and
layers a view over the enrichment join (`README.md:430-444`). Spark gives
both natively: header-aware CSV readers and temp views / catalog tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CUSTOMER_DATA_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.StringType()),
        T.StructField("company_name", T.StringType()),
        T.StructField("contact_person", T.StringType()),
        T.StructField("contract_type", T.StringType()),
    ]
)

SENSOR_MAPPING_SCHEMA = T.StructType(
    [
        T.StructField("sensor_id", T.StringType()),
        T.StructField("customer_id", T.StringType()),
    ]
)


def read_headered_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """Headered, quoted CSV — all-string typing unless a schema is given,
    matching the Athena DDL's all-``string`` declarations. ``infer=True``
    mimics the Glue-crawler hop (S10) instead."""
    reader = spark.read.option("header", True).option("quote", '"')
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def register_view(df: DataFrame, name: str) -> None:
    """``CREATE OR REPLACE VIEW`` ≡ temp view over any DataFrame (S12)."""
    df.createOrReplaceTempView(name)
