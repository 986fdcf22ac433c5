"""Typed schema registry: single source of truth for pipeline reads/writes.

Spark-first counterpart of the reference's trusted-schema registry
(/root/reference/src/utils/schema_registry.py:3-62): per-table
``StructType`` + partition columns + storage location suffix + landing
format. Unlike the reference — whose write path ignores its own
registry and lets pandas infer dtypes (SURVEY §1.2) — every read here
applies ``spark.read.schema(...)`` so there is no inference drift
between files, dates, or engines.

Reference quirk preserved on purpose: ``timestamp``/``signup_date``
stay VARCHAR in trusted StreamPro tables (the analytics do string
surgery on them, SURVEY §1.3/§1.4).

A second registry describes the driver testdata tables so the same
pipeline can round-trip them (used by the oracle-checked
``pipeline_*_roundtrip`` queries).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass(frozen=True)
class TableSchema:
    """One pipeline-managed table: how to parse it and where it lives."""

    name: str  # trusted table name, e.g. "trusted_users"
    struct: T.StructType  # parse schema for the landing/raw file (no partition col)
    partition_cols: tuple[str, ...] = ("ingestion_date",)
    location_suffix: str = ""  # trusted/<suffix>/; defaults to name minus zone prefix
    fmt: str = "csv"  # landing file format: "csv" | "jsonl"

    @property
    def suffix(self) -> str:
        return self.location_suffix or self.name.split("_", 1)[-1]

    def with_partitions(self) -> T.StructType:
        """Full trusted schema incl. partition columns (string-typed)."""
        fields = list(self.struct.fields) + [
            T.StructField(c, T.StringType()) for c in self.partition_cols
        ]
        return T.StructType(fields)


def _s(*cols: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in cols])


# StreamPro trusted tables, column-for-column and type-for-type from
# /root/reference/src/utils/schema_registry.py:3-62 (ingestion_date is
# modeled as the partition column, not a data column).
STREAMPRO_TABLES: dict[str, TableSchema] = {
    t.name: t
    for t in (
        TableSchema(
            "trusted_users",
            _s(
                ("user_id", T.StringType()),
                ("signup_date", T.StringType()),
                ("subscription_tier", T.StringType()),
                ("age_group", T.StringType()),
                ("gender", T.StringType()),
            ),
            fmt="csv",
        ),
        TableSchema(
            "trusted_videos",
            _s(
                ("video_id", T.StringType()),
                ("title", T.StringType()),
                ("genre", T.StringType()),
                ("duration_seconds", T.IntegerType()),
                ("patent_id", T.StringType()),
            ),
            fmt="csv",
        ),
        TableSchema(
            "trusted_devices",
            _s(
                ("device", T.StringType()),
                ("os", T.StringType()),
                ("model", T.StringType()),
                ("os_version", T.DecimalType(3, 1)),
            ),
            fmt="csv",
        ),
        TableSchema(
            "trusted_events",
            _s(
                ("timestamp", T.StringType()),
                ("account_id", T.StringType()),
                ("video_id", T.StringType()),
                ("user_id", T.StringType()),
                ("event_name", T.StringType()),
                ("value", T.DecimalType(2, 1)),
                ("device", T.StringType()),
                ("app_version", T.StringType()),
                ("device_os", T.StringType()),
                ("network_type", T.StringType()),
                ("ip", T.StringType()),
                ("country", T.StringType()),
                ("session_id", T.StringType()),
            ),
            fmt="jsonl",
        ),
    )
}


# Driver testdata tables the roundtrip correctness queries push through
# the same pipeline (schemas match /root/testdata parquet; `ts` lands as
# a string — same timestamps-as-VARCHAR trusted model as the reference).
TESTDATA_TABLES: dict[str, TableSchema] = {
    t.name: t
    for t in (
        TableSchema(
            "trusted_customer",
            _s(
                ("c_custkey", T.LongType()),
                ("c_name", T.StringType()),
                ("c_nationkey", T.IntegerType()),
                ("c_acctbal", T.DoubleType()),
                ("c_mktsegment", T.StringType()),
            ),
            fmt="csv",
        ),
        TableSchema(
            "trusted_events",
            _s(
                ("event_id", T.LongType()),
                ("ts", T.StringType()),
                ("user_id", T.LongType()),
                ("event_type", T.StringType()),
                ("value", T.DoubleType()),
                ("props", T.StringType()),
            ),
            fmt="jsonl",
        ),
    )
}


def get_schema(name: str, registry: dict[str, TableSchema] | None = None) -> TableSchema:
    reg = registry or STREAMPRO_TABLES
    if name not in reg:
        raise ValueError(f"Unknown trusted table: {name}")
    return reg[name]


def all_tables(registry: dict[str, TableSchema] | None = None) -> list[str]:
    return list((registry or STREAMPRO_TABLES).keys())
