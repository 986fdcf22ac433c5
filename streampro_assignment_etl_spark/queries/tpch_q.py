"""Multi-way-join analytics (TPC-H Q3/Q5 shapes) over the testdata star
schema — the join-ordering / broadcast-planning stress queries the
StreamPro workload doesn't reach (its dims are 3 tiny tables).

Scale notes: both queries join the two fact tables (orders ⋈ lineitem,
the only fact-fact shuffle) and broadcast everything else; Catalyst
orders the dim filters first so the fact shuffle carries pre-filtered
rows. The plans are the canonical "would this survive 100x" check —
AQE decides broadcast vs shuffle per-dim from runtime sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..sources.testdata import load_table
from .catalog import query

_CUT = "1998-06-01"


@query(
    "shipping_priority",
    tags=("R8", "R4", "R17", "tpch-q3"),
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '{_CUT}'
  AND l_shipdate  > TIMESTAMP '{_CUT}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, order_date, l_orderkey
LIMIT 10
""",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, two date filters straddling a cut,
    revenue rollup, top-10. customer(filtered) broadcasts; the only
    shuffle is orders⋈lineitem on orderkey + the final rollup."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(_CUT).cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(_CUT).cast("timestamp_ntz")
    )
    one = F.lit(1).cast("decimal(12,2)")
    revenue = F.sum(dec("l_extendedprice", 2, 12) * (one - dec("l_discount", 2, 12)))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(revenue.cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), "order_date", "l_orderkey")
        .limit(10)
    )


@query(
    "local_supplier_volume",
    tags=("R8", "R4", "tpch-q5"),
    oracle="""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with the classic same-nation
    customer/supplier constraint; region filter prunes nation, which
    prunes supplier — all dims broadcast, one fact-fact shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(12,2)")
    revenue = F.sum(dec("l_extendedprice", 2, 12) * (one - dec("l_discount", 2, 12)))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "order_priority_late_ship",
    extra=True,  # tpch breadth; EXISTS family driver row is subquery_membership
    tags=("R4", "tpch-q4", "exists"),
    oracle=f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
  AND o.o_orderdate <  TIMESTAMP '1998-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def order_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted to the testdata columns): orders in a
    quarter with at least one line shipped after the order date, counted
    per priority. The correlated EXISTS plans as a left semi join on
    orderkey with the date residual — no row multiplication from
    multi-line orders."""
    from ..sources.testdata import register_views

    register_views(spark, sf_dir, only=("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-04-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "large_volume_customer",
    extra=True,  # tpch breadth; IN-over-aggregate subquery variant
    tags=("R4", "R12", "tpch-q18"),
    oracle="""
SELECT c.c_name, o.o_orderkey,
       CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM customer c, orders o, lineitem l
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey
                       HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
  AND c.c_custkey = o.o_custkey
  AND o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
ORDER BY o_totalprice DESC, o.o_orderkey
LIMIT 20
""",
)
def large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: the IN-over-grouped-HAVING subquery (large
    orders by total quantity) joined back through customer. Catalyst
    plans the subquery as an aggregate feeding a left semi join — the
    fact table aggregates once, never per outer row."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 2, 12)).alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", dec("o_totalprice", 2, 12).cast("double").alias("o_totalprice"))
        .agg(F.sum(dec("l_quantity", 2, 12)).cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )
