"""Additive relational surface beyond the reference (SURVEY §2.5).

The reference workload has no set operations, grouping sets, semi/anti
joins, or EXISTS subqueries — but an engine its users migrate onto
should (SURVEY lists them as the additive north-star surface). Each is
declared with a DuckDB oracle like the core inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_table, register_views
from .catalog import query


# ---------------------------------------------------------------------------
# Set operations: UNION / INTERSECT / EXCEPT (all DISTINCT-flavored).
# ---------------------------------------------------------------------------
@query(
    "set_ops_customer_nations",
    tags=("set-ops",),
    oracle="""
WITH buyers AS (
  SELECT DISTINCT c.c_nationkey AS nationkey
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
), sellers AS (
  SELECT DISTINCT s_nationkey AS nationkey FROM supplier
)
SELECT 'both' AS side, nationkey FROM (SELECT nationkey FROM buyers INTERSECT SELECT nationkey FROM sellers)
UNION ALL
SELECT 'buyer_only' AS side, nationkey FROM (SELECT nationkey FROM buyers EXCEPT SELECT nationkey FROM sellers)
UNION ALL
SELECT 'seller_only' AS side, nationkey FROM (SELECT nationkey FROM sellers EXCEPT SELECT nationkey FROM buyers)
ORDER BY side, nationkey
""",
)
def set_ops_customer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one result: nations that buy,
    sell, or both. Set ops plan as hash aggregates + joins — map-side
    partial dedup keeps the shuffles key-width only."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    buyers = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    sellers = supp.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = buyers.intersect(sellers).select(F.lit("both").alias("side"), "nationkey")
    b_only = buyers.exceptAll(sellers).distinct().select(
        F.lit("buyer_only").alias("side"), "nationkey"
    )
    s_only = sellers.exceptAll(buyers).distinct().select(
        F.lit("seller_only").alias("side"), "nationkey"
    )
    return both.unionAll(b_only).unionAll(s_only).orderBy("side", "nationkey")


# ---------------------------------------------------------------------------
# GROUPING SETS / ROLLUP with grouping() discriminators.
# ---------------------------------------------------------------------------
@query(
    "rollup_order_priorities",
    extra=True,  # grouping-sets family has driver rows via cube_returnflag_status + hypertable_rollup
    tags=("grouping-sets",),
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status, priority
""",
)
def rollup_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (status, priority) with COALESCE'd subtotal labels.
    Spark plans one Expand + single aggregate — no per-granularity
    rescan. (No NULL key values exist in these columns, so COALESCE
    marks exactly the rollup subtotals in both engines.)"""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).
# ---------------------------------------------------------------------------
@query(
    "semi_anti_customers",
    extra=True,  # merged into subquery_membership
    tags=("semi-join", "anti-join"),
    oracle="""
SELECT 'with_orders' AS bucket, COUNT(*) AS n_customers,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key,
       CAST(MAX(c_custkey) AS BIGINT) AS max_key
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'without_orders' AS bucket, COUNT(*) AS n_customers,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key,
       CAST(MAX(c_custkey) AS BIGINT) AS max_key
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY bucket
""",
)
def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI / LEFT ANTI joins — the EXISTS/NOT EXISTS physical
    forms: probe side streams, no row multiplication, build side can
    broadcast. The `distinct orders` trap (exploding matches) never
    arises."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    cond = cust.c_custkey == orders.o_custkey

    def bucket(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").alias("min_key"),
            F.max("c_custkey").alias("max_key"),
        ).select(F.lit(label).alias("bucket"), "n_customers", "min_key", "max_key")

    semi = bucket(cust.join(orders, cond, "left_semi"), "with_orders")
    anti = bucket(cust.join(orders, cond, "left_anti"), "without_orders")
    return semi.unionAll(anti).orderBy("bucket")


# ---------------------------------------------------------------------------
# IN / NOT IN subqueries via the SQL path (planned as semi/anti too).
# ---------------------------------------------------------------------------
@query(
    "in_subquery_parts",
    extra=True,  # merged into subquery_membership
    tags=("semi-join", "subquery"),
    oracle="""
SELECT p_type, COUNT(*) AS n_parts
FROM part
WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
GROUP BY p_type
ORDER BY p_type
""",
)
def in_subquery_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery through spark.sql — Catalyst rewrites it to a left
    semi join; the subquery's filter pushes to the lineitem scan."""
    register_views(spark, sf_dir, only=("part", "lineitem"))
    return spark.sql(
        """
        SELECT p_type, COUNT(*) AS n_parts
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)
        GROUP BY p_type
        ORDER BY p_type
        """
    )


# ---------------------------------------------------------------------------
# Window-function breadth: lag/lead, running aggregates, rank family.
# ---------------------------------------------------------------------------
@query(
    "window_functions_suite",
    tags=("window",),
    oracle="""
SELECT o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       strftime(LAG(o_orderdate) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d') AS prev_order_date,
       CAST(LEAD(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS next_price
FROM orders
WHERE o_custkey < 20
ORDER BY o_custkey, order_seq
""",
)
def window_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window breadth beyond ROW_NUMBER: RANK, running SUM with an
    explicit ROWS frame, LAG/LEAD — one WindowExec pass since every
    function shares the (partition, order) spec."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 20)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price = F.col("o_totalprice").cast("decimal(12,2)")
    return (
        orders.select(
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            price.cast("double").alias("price"),
            F.rank().over(w).alias("order_seq"),
            F.sum(price).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            .alias("running_total"),
            F.date_format(F.lag("o_orderdate").over(w), "yyyy-MM-dd").alias("prev_order_date"),
            F.lead(price).over(w).cast("double").alias("next_price"),
        )
        .orderBy("o_custkey", "order_seq")
    )


# ---------------------------------------------------------------------------
# As-of join (operators/asof.py) — DuckDB's native ASOF JOIN is the oracle.
# ---------------------------------------------------------------------------
@query(
    "asof_last_view_before_click",
    tags=("asof-join", "timeseries"),
    oracle="""
WITH clicks AS (
  SELECT event_id AS click_id, user_id, ts
  FROM events WHERE event_type = 'click' AND user_id < 10
),
views_ranked AS (
  SELECT user_id, ts, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'view'
),
views1 AS (SELECT user_id, ts, value FROM views_ranked WHERE rn = 1)
SELECT c.click_id,
       c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       CAST(v.value AS DOUBLE) AS last_view_value,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_view_ts
FROM clicks c ASOF LEFT JOIN views1 v
  ON c.user_id = v.user_id AND c.ts >= v.ts
ORDER BY c.click_id
""",
)
def asof_last_view_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's most recent at-or-before view event —
    the classic as-of join, via the linear union+window operator
    (operators/asof.py) against DuckDB's native ASOF JOIN as oracle.
    Equal-ts view duplicates are deduped (max event_id) first; both
    engines then have a deterministic unique match."""
    from pyspark.sql.window import Window as W

    from ..operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 10)).select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    vr = W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    views = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(vr))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    joined = asof_join_backward(clicks, views, "user_id", "ts", ["value"])
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", fmt).alias("click_ts"),
        F.col("value").cast("double").alias("last_view_value"),
        F.date_format("matched_ts", fmt).alias("last_view_ts"),
    ).orderBy("click_id")


# ---------------------------------------------------------------------------
# Stream-stream interval join, batch form (streaming/stream_join.py).
# The SAME builder runs the live stream-stream join (withWatermark is
# a no-op in batch) — this entry hash-gates the plan's semantics; the
# pytest family pins the streamed run bit-equal to this batch form.
# ---------------------------------------------------------------------------
@query(
    "view_click_attribution_interval",
    extra=True,  # asof family driver row is asof_last_view_before_click
    tags=("stream-join", "interval-join", "timeseries", "streaming-batch-twin"),
    oracle="""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click' AND user_id < 10
),
views AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts, value AS view_value
  FROM events WHERE event_type = 'view'
)
SELECT c.user_id,
       c.click_id,
       strftime(c.click_ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       v.view_id,
       strftime(v.view_ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
       CAST(v.view_value AS DOUBLE) AS view_value
FROM clicks c JOIN views v
  ON c.user_id = v.user_id
 AND v.view_ts >= c.click_ts - INTERVAL 30 MINUTE
 AND v.view_ts <= c.click_ts
ORDER BY c.click_id, v.view_id
""",
)
def view_click_attribution_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→click attribution within a 30-minute horizon — the batch
    oracle form of the stream-stream interval join
    (``streaming/stream_join.view_click_attribution``): every (click,
    view) pair of the same user where the view precedes the click by
    at most the horizon. The streaming run of the identical builder is
    pinned bit-equal in tests/test_streaming.py; here DuckDB replays
    the interval join over the events table."""
    from ..streaming.stream_join import view_click_attribution

    ev = load_table(spark, sf_dir, "events").withColumn("ts_event", F.col("ts"))
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 10))
    views = ev.filter(F.col("event_type") == "view")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        view_click_attribution(clicks, views, horizon="30 minutes")
        .select(
            "user_id",
            "click_id",
            F.date_format("click_ts", fmt).alias("click_ts"),
            "view_id",
            F.date_format("view_ts", fmt).alias("view_ts"),
            F.col("view_value").cast("double").alias("view_value"),
        )
        .orderBy("click_id", "view_id")
    )


@query(
    "attributed_view_counts_hourly",
    extra=True,
    tags=("stream-join", "interval-join", "chained-stateful", "streaming-batch-twin"),
    oracle="""
WITH clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click' AND user_id < 10
),
views AS (
  SELECT user_id, event_id AS view_id, ts AS view_ts
  FROM events WHERE event_type = 'view'
),
pairs AS (
  SELECT c.user_id, c.click_id, c.click_ts
  FROM clicks c JOIN views v
    ON c.user_id = v.user_id
   AND v.view_ts >= c.click_ts - INTERVAL 30 MINUTE
   AND v.view_ts <= c.click_ts
)
SELECT strftime(date_trunc('hour', click_ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       user_id,
       CAST(COUNT(*) AS BIGINT) AS n_attributed_views,
       CAST(COUNT(DISTINCT click_id) AS BIGINT) AS n_clicks
FROM pairs
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def attributed_view_counts_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the CHAINED stateful pipeline (stream-stream
    interval join → windowed aggregation;
    ``streaming/stream_join.attributed_view_counts``): per (hourly
    click window, user), attributed-view count and exact distinct
    clicks. ``exact_clicks=True`` is the batch-only mode — streaming
    aggregation cannot do exact distincts, so the live pipeline serves
    approx_count_distinct and THIS entry hash-gates everything else in
    the chain (join semantics, epoch-aligned window bucketing, count
    plumbing) against DuckDB. The streamed pipeline itself is pinned
    equal to the batch builder in tests/test_streaming.py."""
    from ..streaming.stream_join import attributed_view_counts

    ev = load_table(spark, sf_dir, "events").withColumn("ts_event", F.col("ts"))
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 10))
    views = ev.filter(F.col("event_type") == "view")
    return attributed_view_counts(
        clicks, views, horizon="30 minutes", window="1 hour", exact_clicks=True
    ).orderBy("window_start", "user_id")


# ---------------------------------------------------------------------------
# Hypertable-style rollup: one pass, multiple time granularities
# (the continuous-aggregate pattern from timeseries stores).
# ---------------------------------------------------------------------------
@query(
    "hypertable_rollup",
    tags=("hypertable", "grouping-sets", "timeseries"),
    oracle="""
WITH b AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket_hour,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket_day,
         value
  FROM events
  WHERE user_id < 5
)
SELECT COALESCE(bucket_day, 'ALL') AS bucket_day,
       COALESCE(bucket_hour, 'ALL') AS bucket_hour,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM b
GROUP BY GROUPING SETS ((bucket_day, bucket_hour, event_type),
                        (bucket_day, event_type),
                        (event_type))
ORDER BY bucket_day, bucket_hour, event_type
""",
)
def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hourly, daily, and total
    rollups of the event stream in ONE aggregation (grouping sets →
    single Expand, no per-granularity rescan) — the batch form of what
    a timeseries store maintains incrementally. At scale the output
    becomes the materialized serving table for dashboard queries."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    b = ev.select(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket_hour"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("bucket_day"),
        "value",
    )
    return (
        b.groupingSets(
            [
                ["bucket_day", "bucket_hour", "event_type"],
                ["bucket_day", "event_type"],
                ["event_type"],
            ],
            "bucket_day",
            "bucket_hour",
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.coalesce("bucket_day", F.lit("ALL")).alias("bucket_day"),
            F.coalesce("bucket_hour", F.lit("ALL")).alias("bucket_hour"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("bucket_day", "bucket_hour", "event_type")
    )


# ---------------------------------------------------------------------------
# Consolidated driver entry (round 3): EXISTS / NOT EXISTS / IN in one
# SQL-path query — Catalyst rewrites all three to left semi/anti joins
# (merges `semi_anti_customers` + `in_subquery_parts`, kept above as
# EXTRAS with the explicit DataFrame left_semi/left_anti forms).
# ---------------------------------------------------------------------------
_MEMBERSHIP_SQL = """
SELECT 'with_orders' AS bucket, COUNT(*) AS n_customers,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key,
       CAST(MAX(c_custkey) AS BIGINT) AS max_key
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'without_orders' AS bucket, COUNT(*) AS n_customers,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key,
       CAST(MAX(c_custkey) AS BIGINT) AS max_key
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT 'big_spenders' AS bucket, COUNT(*) AS n_customers,
       CAST(MIN(c_custkey) AS BIGINT) AS min_key,
       CAST(MAX(c_custkey) AS BIGINT) AS max_key
FROM customer c
WHERE c.c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
ORDER BY bucket
"""


@query(
    "subquery_membership",
    tags=("semi-join", "anti-join", "subquery"),
    oracle=_MEMBERSHIP_SQL,
)
def subquery_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS, NOT EXISTS, and IN membership subqueries in one result —
    the identical SQL text runs on both engines; Catalyst plans the
    three branches as left semi / left anti / left semi joins (probe
    side streams, no row multiplication, build side broadcast-able),
    and the IN branch's o_totalprice filter pushes to the orders scan."""
    register_views(spark, sf_dir, only=("customer", "orders"))
    return spark.sql(_MEMBERSHIP_SQL)


# ---------------------------------------------------------------------------
# Forward as-of join (EXTRA): the "next event at-or-after" direction,
# mirroring the driver-checked backward form.
# ---------------------------------------------------------------------------
@query(
    "asof_next_view_after_click",
    extra=True,  # asof family driver row is asof_last_view_before_click
    tags=("asof-join", "timeseries"),
    oracle="""
WITH clicks AS (
  SELECT event_id AS click_id, user_id, ts
  FROM events WHERE event_type = 'click' AND user_id < 10
),
views_ranked AS (
  SELECT user_id, ts, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'view'
),
views1 AS (SELECT user_id, ts, value FROM views_ranked WHERE rn = 1)
SELECT c.click_id,
       c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       CAST(v.value AS DOUBLE) AS next_view_value,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS next_view_ts
FROM clicks c ASOF LEFT JOIN views1 v
  ON c.user_id = v.user_id AND c.ts <= v.ts
ORDER BY c.click_id
""",
)
def asof_next_view_after_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's EARLIEST at-or-after view event —
    the forward as-of join (operators/asof.asof_join_forward) against
    DuckDB's native forward ASOF (`c.ts <= v.ts`) as oracle. Same
    linear union+window plan as the backward form; equal-ts view
    duplicates deduped (max event_id) first."""
    from pyspark.sql.window import Window as W

    from ..operators.asof import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 10)).select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    vr = W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    views = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("rn", F.row_number().over(vr))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    joined = asof_join_forward(clicks, views, "user_id", "ts", ["value"])
    return joined.select(
        "click_id",
        "user_id",
        F.date_format("ts", fmt).alias("click_ts"),
        F.col("value").cast("double").alias("next_view_value"),
        F.date_format("matched_ts", fmt).alias("next_view_ts"),
    ).orderBy("click_id")
