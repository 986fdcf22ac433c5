"""Catalog/DDL surface tests (SURVEY §2.1 S11–S15) — spark.catalog round-trips."""

from __future__ import annotations

import pytest

from streampro_assignment_etl_spark.pipeline import STREAMPRO_TABLES
from streampro_assignment_etl_spark.pipeline import catalog_ops as C
from streampro_assignment_etl_spark.pipeline.schemas import TESTDATA_TABLES

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _clean(spark):
    yield
    for t in ("ctas_orders", "ext_customer", "mat_customer"):
        C.drop_table(spark, t)
    for v in ("v_customer", "v_values"):
        C.drop_view(spark, v)


# -- S11: CTAS ---------------------------------------------------------------
@pytest.mark.fast
def test_ctas_and_save_as_table(spark, tmp_path):
    assert C.create_view_from_parquet(spark, "v_customer", f"{SF}/customer.parquet")
    ok = C.create_table_as_select(
        spark,
        "ctas_orders",
        "SELECT c_mktsegment, COUNT(*) AS n FROM v_customer GROUP BY c_mktsegment",
        location=str(tmp_path / "ctas_orders"),
    )
    assert ok
    assert C.table_exists(spark, "ctas_orders")
    n = spark.table("ctas_orders").count()
    assert n == spark.table("v_customer").select("c_mktsegment").distinct().count()
    # CTAS into an existing table must fail cleanly (bool, no raise).
    assert not C.create_table_as_select(spark, "ctas_orders", "SELECT 1 AS x")


def test_create_table_from_parquet(spark):
    assert C.create_table_from_parquet(spark, "mat_customer", f"{SF}/customer.parquet")
    assert spark.table("mat_customer").count() > 0


# -- S12: external partitioned table ----------------------------------------
def test_external_partitioned_table(spark, tmp_path):
    # Build a partitioned trusted layout via the pipeline write path.
    schema = TESTDATA_TABLES["trusted_customer"]
    loc = str(tmp_path / "trusted_customer")
    df = spark.read.parquet(f"{SF}/customer.parquet")
    from pyspark.sql import functions as F

    for d in ("2025-09-09", "2025-09-10"):
        df.withColumn("ingestion_date", F.lit(d)).write.mode("append").partitionBy(
            "ingestion_date"
        ).parquet(loc)

    ddl = C.build_external_table_ddl(schema, loc, "ext_customer")
    assert "PARTITIONED BY (`ingestion_date`)" in ddl
    assert "`ingestion_date` string" in ddl
    assert "USING PARQUET" in ddl

    C.register_external_table(spark, schema, loc, "ext_customer")
    parts = C.show_partitions(spark, "ext_customer")
    assert parts == ["ingestion_date=2025-09-09", "ingestion_date=2025-09-10"]

    # Partition pruning: a date filter must read one partition's rows.
    one = spark.table("ext_customer").filter("ingestion_date = '2025-09-09'")
    assert one.count() == df.count()
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "2025-09-09" in plan  # partition filter reached the scan


# -- S13: views --------------------------------------------------------------
def test_values_view(spark):
    schema = STREAMPRO_TABLES["trusted_devices"]
    from decimal import Decimal

    C.create_values_view(
        spark,
        "v_values",
        [("mobile", "iOS", "iPhone X", Decimal("14.6"))],
        schema,
    )
    row = spark.table("v_values").collect()[0]
    assert row["os"] == "iOS"
    assert str(row["os_version"]) == "14.6"


# -- S14: introspection ------------------------------------------------------
def test_introspection(spark, tmp_path):
    C.create_view_from_parquet(spark, "v_customer", f"{SF}/customer.parquet")
    C.create_table_as_select(
        spark, "ctas_orders", "SELECT 1 AS x", location=str(tmp_path / "t")
    )
    assert C.table_exists(spark, "ctas_orders")
    assert not C.table_exists(spark, "no_such_table")
    assert C.view_exists(spark, "v_customer")
    assert not C.view_exists(spark, "ctas_orders")
    assert "ctas_orders" in C.list_tables(spark)
    assert "v_customer" in C.list_views(spark)
    cols = C.get_table_schema(spark, "ctas_orders")
    assert cols == [{"column": "x", "type": "int", "nullable": "YES"}]


# -- S15: stats --------------------------------------------------------------
def test_analyze_and_stats(spark, tmp_path):
    C.create_view_from_parquet(spark, "v_customer", f"{SF}/customer.parquet")
    C.create_table_as_select(
        spark,
        "ctas_orders",
        "SELECT * FROM v_customer",
        location=str(tmp_path / "stats_t"),
    )
    assert C.analyze_table(spark, "ctas_orders")
    # Stats are in the catalog: CBO can now see rowCount.
    desc = spark.sql("DESCRIBE EXTENDED ctas_orders").collect()
    stats_rows = [r for r in desc if r[0] == "Statistics"]
    assert stats_rows and "rows" in stats_rows[0][1]

    bundle = C.get_table_stats(spark, "ctas_orders")
    assert bundle["row_count"] == spark.table("v_customer").count()
    assert len(bundle["sample"]) == 5
    assert any(c["column"] == "c_custkey" for c in bundle["schema"])


# -- bucketed co-located join ------------------------------------------------
def test_bucketed_join_has_no_shuffle(spark):
    """Same-bucketed tables join shuffle-free: the bucket layout is the
    pre-paid shuffle."""
    from streampro_assignment_etl_spark.plans import plan_string, shuffle_count

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    try:
        C.save_bucketed_table(cust, "b_cust", ["c_custkey"], 4, sort_cols=["c_custkey"])
        C.save_bucketed_table(
            orders.withColumnRenamed("o_custkey", "c_custkey"),
            "b_orders",
            ["c_custkey"],
            4,
            sort_cols=["c_custkey"],
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_cust").join(spark.table("b_orders"), "c_custkey")
            plan = plan_string(joined)
            assert "SortMergeJoin" in plan
            assert shuffle_count(joined) == 0  # co-located: no Exchange at all
            n = joined.count()
            # Same result as the plain (shuffled) join.
            plain = cust.join(
                orders.withColumnRenamed("o_custkey", "c_custkey"), "c_custkey"
            )
            assert n == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        C.drop_table(spark, "b_cust")
        C.drop_table(spark, "b_orders")
