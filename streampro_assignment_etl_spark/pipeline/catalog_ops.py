"""Catalog / DDL surface (SURVEY §2.1 S11–S15).

Spark-catalog counterpart of the reference's DuckDB + Trino DDL clients
(/root/reference/src/connect/duckdb_client.py:121-382,
trino_client.py:78-214) and DDL builders
(src/utils/schema_registry.py:89-129):

* S11 CTAS — ``CREATE TABLE … USING parquet AS SELECT`` / ``saveAsTable``
* S12 external partitioned tables — typed DDL from the schema registry,
  Hive-style partition discovery via ``MSCK REPAIR TABLE``
* S13 views over files / VALUES
* S14 introspection — ``spark.catalog`` (tableExists, listTables, …)
* S15 stats — ``ANALYZE TABLE … COMPUTE STATISTICS`` + a stats bundle

Everything routes through the session catalog, so it works identically
against the in-memory catalog (tests), a Hive metastore, or any V2
catalog plugged into ``spark.sql.catalog.*`` on a real cluster. At
100 TB the load-bearing pieces are partition discovery (partition
pruning needs registered partitions) and column statistics (CBO join
reordering / broadcast decisions need NDV + size estimates).
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession

from .schemas import TableSchema

log = logging.getLogger("streampro.pipeline.catalog")


def _q(name: str) -> str:
    """Quote a (possibly dotted) identifier."""
    return ".".join(f"`{p}`" for p in name.split("."))


# -- S11: CTAS --------------------------------------------------------------
def create_table_as_select(
    spark: SparkSession, table_name: str, select_query: str, location: str | None = None
) -> bool:
    """CTAS (≙ duckdb_client.py:160-170; Trino CTAS with external_location,
    trino_client.py:104-132). ``location`` makes it an external table."""
    try:
        loc = f" LOCATION '{location}'" if location else ""
        spark.sql(
            f"CREATE TABLE {_q(table_name)} USING parquet{loc} AS {select_query}"
        )
        return True
    except Exception as exc:  # noqa: BLE001 — bool contract, like the reference
        log.error("CTAS %s failed: %s", table_name, exc)
        return False


def create_table_from_parquet(
    spark: SparkSession, table_name: str, parquet_path: str
) -> bool:
    """Materializing copy (≙ duckdb_client.py:121-139). Prefer
    ``create_view_from_parquet`` — a view scans nothing until queried."""
    drop_table(spark, table_name)
    return create_table_as_select(
        spark, table_name, f"SELECT * FROM parquet.`{parquet_path}`"
    )


def save_as_table(df: DataFrame, table_name: str, mode: str = "overwrite") -> None:
    """DataFrame-native CTAS."""
    df.write.mode(mode).format("parquet").saveAsTable(table_name)


# -- S12: external / partitioned tables -------------------------------------
def build_external_table_ddl(schema: TableSchema, location: str, table_name: str | None = None) -> str:
    """Typed external-table DDL from the registry (≙ build_table_ddl,
    schema_registry.py:89-112; trino_client.py:78-102). Partition columns
    are declared via PARTITIONED BY and excluded from the column list."""
    name = table_name or schema.name
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in schema.with_partitions().fields
    )
    # USING-table DDL: partition columns appear typed in the column list
    # and by name in PARTITIONED BY (Spark datasource-table form).
    partitioned = (
        " PARTITIONED BY (" + ", ".join(f"`{c}`" for c in schema.partition_cols) + ")"
        if schema.partition_cols
        else ""
    )
    return (
        f"CREATE TABLE IF NOT EXISTS {_q(name)} ({cols}) "
        f"USING PARQUET{partitioned} LOCATION '{location}'"
    )


def register_external_table(
    spark: SparkSession,
    schema: TableSchema,
    location: str,
    table_name: str | None = None,
    recover_partitions: bool = True,
) -> str:
    """Create the external table and discover its Hive-layout partitions.
    Without recovery the catalog sees zero partitions and every query
    returns empty — the Spark analog of Trino's ``system.sync_partition_
    metadata``."""
    name = table_name or schema.name
    spark.sql(build_external_table_ddl(schema, location, name))
    if recover_partitions and schema.partition_cols:
        spark.sql(f"MSCK REPAIR TABLE {_q(name)}")
    return name


# -- S13: views -------------------------------------------------------------
def create_view_from_parquet(spark: SparkSession, view_name: str, parquet_path: str) -> bool:
    """Lazy view over parquet (≙ duckdb_client.py:141-159 — "more memory
    efficient", which is automatic here: temp views are unmaterialized)."""
    try:
        spark.read.parquet(parquet_path).createOrReplaceTempView(view_name)
        return True
    except Exception as exc:  # noqa: BLE001
        log.error("view %s failed: %s", view_name, exc)
        return False


def create_values_view(
    spark: SparkSession, view_name: str, rows: list[tuple], schema: TableSchema
) -> None:
    """VALUES-backed view (≙ build_view_ddl, schema_registry.py:115-129)."""
    spark.createDataFrame(rows, schema.struct).createOrReplaceTempView(view_name)


# -- S14: introspection ------------------------------------------------------
def table_exists(spark: SparkSession, table_name: str) -> bool:
    return spark.catalog.tableExists(table_name)


def view_exists(spark: SparkSession, view_name: str) -> bool:
    try:
        t = spark.catalog.getTable(view_name)
    except Exception:  # noqa: BLE001 — not found
        return False
    return t.tableType in ("VIEW", "TEMPORARY")


def list_tables(spark: SparkSession) -> list[str]:
    return sorted(
        t.name for t in spark.catalog.listTables() if t.tableType != "VIEW" and not t.isTemporary
    )


def list_views(spark: SparkSession) -> list[str]:
    return sorted(
        t.name for t in spark.catalog.listTables() if t.tableType == "VIEW" or t.isTemporary
    )


def get_table_schema(spark: SparkSession, table_name: str) -> list[dict[str, str]]:
    """(≙ duckdb_client.py:246-269) column/type/nullable bundle."""
    return [
        {"column": c.name, "type": c.dataType, "nullable": "YES" if c.nullable else "NO"}
        for c in spark.catalog.listColumns(table_name)
    ]


def drop_table(spark: SparkSession, table_name: str) -> bool:
    try:
        spark.sql(f"DROP TABLE IF EXISTS {_q(table_name)}")
        return True
    except Exception:  # noqa: BLE001
        return False


def drop_view(spark: SparkSession, view_name: str) -> bool:
    spark.catalog.dropTempView(view_name)
    try:
        spark.sql(f"DROP VIEW IF EXISTS {_q(view_name)}")
        return True
    except Exception:  # noqa: BLE001
        return False


# -- S15: stats / ANALYZE ----------------------------------------------------
def analyze_table(spark: SparkSession, table_name: str, columns: bool = True) -> bool:
    """ANALYZE (≙ duckdb_client.py:271-279, trino_client.py:206-214).
    Column stats feed Spark's CBO (NDV, min/max, null counts) — the
    statistics DuckDB gathers implicitly, made explicit."""
    try:
        spark.sql(f"ANALYZE TABLE {_q(table_name)} COMPUTE STATISTICS")
        if columns:
            spark.sql(
                f"ANALYZE TABLE {_q(table_name)} COMPUTE STATISTICS FOR ALL COLUMNS"
            )
        return True
    except Exception as exc:  # noqa: BLE001
        log.warning("analyze %s failed: %s", table_name, exc)
        return False


def show_partitions(spark: SparkSession, table_name: str) -> list[str]:
    """(≙ SHOW PARTITIONS, trino_client.py:198-204)."""
    return [r[0] for r in spark.sql(f"SHOW PARTITIONS {_q(table_name)}").collect()]


def get_table_stats(spark: SparkSession, table_name: str) -> dict[str, Any]:
    """Row-count + schema + 5-row sample bundle
    (≙ duckdb_client.py:360-382)."""
    df = spark.table(table_name)
    sample: list[Row] = df.limit(5).collect()
    return {
        "table": table_name,
        "row_count": df.count(),
        "schema": get_table_schema(spark, table_name),
        "sample": [r.asDict() for r in sample],
    }


# -- bucketed tables (co-located joins) --------------------------------------
def save_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally sorted) managed table.

    Two tables bucketed on the same keys with the same bucket count
    join WITHOUT a shuffle (and without even a sort, if sorted): the
    scan partitions are already co-located by key hash. This is the
    pre-paid-shuffle strategy for repeatedly-joined 100 TB fact tables;
    the plan-shape test pins the no-Exchange join."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
