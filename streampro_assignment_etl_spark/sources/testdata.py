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


def load_tables(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    apply_runtime_confs(spark)
    names = only if only is not None else TESTDATA_TABLES
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, only: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Register testdata tables as temp views (lazy, zero-copy).

    ``only`` restricts registration to the named tables: each view
    costs a parquet footer read + a catalog call at plan-build time
    (~0.3 s for all ten, r19 measurement), so SQL-path queries that
    reference one or two tables pass exactly those."""
    tables = load_tables(spark, sf_dir, only)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
