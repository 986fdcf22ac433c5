"""Loaders for the driver-generated testdata tables.

Tables (one parquet each, see /root/repo/TESTDATA.md):
  region nation customer supplier part orders lineitem events documents
  embeddings

``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it as a long (with
``spark.sql.legacy.parquet.nanosAsLong``) and we convert via integer
division to microseconds — the same truncation DuckDB applies when it
reads nanos into its microsecond TIMESTAMP, so both engines see
identical values.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import apply_runtime_confs

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos -> micros by floor division (matches DuckDB truncation),
        # then a timezone-naive timestamp.
        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    apply_runtime_confs(spark)
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (lazy, zero-copy)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
