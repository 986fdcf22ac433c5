"""Reshaping + time-series + semi-structured surface.

Additive breadth beyond the reference workload (SURVEY §2.5): PIVOT,
CUBE, calendar gap-filling, JSON extraction from string columns, and a
bucketed ("binned") interval self-join — the equi-join rewrite that
makes range joins shuffle-partitionable at 100 TB. Every query carries
a DuckDB oracle like the core inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec_sum
from ..sources.testdata import load_table
from .catalog import query

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ---------------------------------------------------------------------------
# PIVOT: long→wide with an explicit value list (one-pass plan).
# ---------------------------------------------------------------------------
@query(
    "pivot_event_type_daily",
    tags=("pivot", "reshape"),
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(12,2)) END) AS DOUBLE) AS view,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
ORDER BY day
""",
)
def pivot_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily value totals pivoted into one column per event type.

    The pivot value list is passed explicitly so Spark plans a single
    aggregation (no extra distinct-values job) — mandatory at scale,
    where the implicit-list form adds a full scan + collect. Decimal
    sums keep the hash order-independent (functions/exact.py).
    """
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).cast("double"))
    )
    counts = (
        ev.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return wide.join(counts, "day").orderBy("day")


# ---------------------------------------------------------------------------
# CUBE: all 2^k grouping combinations in one Expand + aggregate.
# ---------------------------------------------------------------------------
@query(
    "cube_returnflag_status",
    tags=("grouping-sets", "cube"),
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid, returnflag, linestatus
""",
)
def cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with a GROUPING() discriminator.

    Spark plans one Expand (4 grouping combinations) feeding a single
    partial+final hash aggregate — the row multiplication happens
    map-side pre-combine, so the shuffle carries only group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("bigint")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "gid",
            "n_items",
            "sum_qty",
            "sum_price",
        )
        .orderBy("gid", "returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# Calendar gap-fill: dense date spine via sequence() — no driver loop.
# ---------------------------------------------------------------------------
@query(
    "gapfill_user_daily",
    extra=True,  # spine-join family locally tested; hypertable_rollup carries the timeseries driver row
    tags=("timeseries", "gapfill"),
    oracle="""
WITH span AS (
  SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0,
         CAST(MAX(date_trunc('day', ts)) AS DATE) AS d1
  FROM events
),
spine AS (
  SELECT u.user_id, CAST(g.d AS DATE) AS day
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 8) u
  CROSS JOIN (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS d FROM span) g
),
actual AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         COUNT(*) AS n
  FROM events
  WHERE user_id < 8 AND event_type = 'purchase'
  GROUP BY 1, 2
)
SELECT s.user_id,
       strftime(s.day, '%Y-%m-%d') AS day,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_purchases
FROM spine s LEFT JOIN actual a ON s.user_id = a.user_id AND s.day = a.day
ORDER BY s.user_id, day
""",
)
def gapfill_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily purchase counts: a generated date spine
    (sequence+explode — distributed, no driver-side calendar loop)
    cross-joined with the user dimension, left-joined to actuals,
    missing days filled with 0. The spine side is tiny (users × days)
    and broadcast; the actuals aggregate shuffles only (user, day)."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.date_trunc("day", "ts")).cast("date").alias("d0"),
        F.max(F.date_trunc("day", "ts")).cast("date").alias("d1"),
    )
    users = ev.filter(F.col("user_id") < 8).select("user_id").distinct()
    spine = (
        users.crossJoin(F.broadcast(span))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    actual = (
        ev.filter((F.col("user_id") < 8) & (F.col("event_type") == "purchase"))
        .groupBy("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        spine.join(actual, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_purchases"),
        )
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# JSON extraction from a string column (events.props is a JSON blob).
# ---------------------------------------------------------------------------
@query(
    "json_props_extract",
    tags=("json", "semi-structured"),
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
WHERE props IS NOT NULL
GROUP BY 1
ORDER BY k_bucket
""",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path extraction from a JSON string column via get_json_object —
    JVM-side (Jackson), no Python round-trip. At scale the better move
    is parsing once to a typed struct (from_json + schema) and storing
    columnar; this query is the exploratory form that precedes it."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("k_bucket")
    )


# ---------------------------------------------------------------------------
# Binned interval self-join — the scale-path rewrite of a range join.
# ---------------------------------------------------------------------------
@query(
    "range_join_binned",
    tags=("range-join", "scale-path"),
    oracle="""
SELECT p.user_id,
       COUNT(*) AS n_pairs,
       COUNT(DISTINCT p.event_id) AS n_purchases_with_errors
FROM events p
JOIN events e
  ON p.user_id = e.user_id
 AND p.event_type = 'purchase'
 AND e.event_type = 'error'
 AND e.ts >= p.ts - INTERVAL 10 MINUTE
 AND e.ts < p.ts
GROUP BY p.user_id
ORDER BY p.user_id
""",
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Errors within the 10 minutes preceding each purchase, per user —
    executed as a BUCKETED EQUI-JOIN, not a theta join.

    A naive `e.ts BETWEEN p.ts - 10min AND p.ts` join has no equi-key
    beyond user_id, so every hot user devolves to a per-key cartesian.
    The scale path bins both sides into 10-minute epochs: an error can
    only precede a purchase from the same or the next bin, so the
    purchase side expands to its two candidate bins (array+explode, 2×
    row cost) and joins on (user_id, bin) — a plain shuffled hash join
    whose key cardinality grows with time, immune to hot users — with
    the exact timestamp predicate left as a residual filter. Each
    qualifying pair matches exactly one candidate bin, so no dedup
    pass is needed.
    """
    width = 600  # seconds, = the query's look-back interval
    ev = load_table(spark, sf_dir, "events")
    bin_col = (F.unix_timestamp("ts") / width).cast("bigint")

    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id"),
        F.col("ts").alias("e_ts"),
        bin_col.alias("bin"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
            bin_col.alias("p_bin"),
        )
        .withColumn("bin", F.explode(F.array(F.col("p_bin") - 1, F.col("p_bin"))))
    )
    pairs = purchases.join(errors, ["user_id", "bin"]).filter(
        (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
        & (F.col("e_ts") < F.col("p_ts"))
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("p_id").alias("n_purchases_with_errors"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Correlated LATERAL join: per-row dependent subquery with its own LIMIT.
# ---------------------------------------------------------------------------
@query(
    "lateral_top_orders",
    extra=True,  # decorrelated top-k family has driver rows via sort_nulls_last + window_functions_suite
    tags=("lateral", "correlated-subquery"),
    oracle="""
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) t
WHERE c.c_custkey < 20
ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
""",
)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via a correlated LATERAL subquery —
    the dependent-join form of top-k-per-group. Catalyst decorrelates
    it into a window/group-limit over one shuffled join rather than
    re-executing the inner query per outer row (which is what makes
    LATERAL safe at scale; raw values pass through, no float
    re-aggregation)."""
    from ..sources.testdata import register_views

    register_views(spark, sf_dir, only=("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey < 20
        ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
        """
    )


# ---------------------------------------------------------------------------
# Typed JSON parsing (EXTRA): the production form json_props_extract's
# docstring points to — parse the string column ONCE into a typed
# struct with from_json + explicit schema, then work columnar. One
# Jackson parse per row feeding every downstream field access, vs
# one get_json_object parse per PATH per row in the exploratory form.
# ---------------------------------------------------------------------------
@query(
    "json_props_typed",
    extra=True,  # json family driver row is json_props_extract
    tags=("json", "semi-structured", "from_json"),
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       COUNT(*) AS n_events,
       COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL THEN 1 END) AS n_unparsed,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
WHERE props IS NOT NULL
GROUP BY 1
ORDER BY k_bucket NULLS FIRST
""",
)
def json_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props parsed once to a typed struct via from_json with an
    explicit schema (no schema inference scan); every downstream
    reference reads the struct field. Unparseable payloads surface as
    NULL structs counted explicitly — the quarantine-style accounting a
    typed parse should carry. At scale this frame is what you'd persist
    columnar so later queries never touch JSON text again."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    schema = T.StructType([T.StructField("k", T.LongType())])
    typed = ev.select(F.from_json("props", schema).alias("p"))
    k = F.col("p.k")
    return (
        typed.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(k.isNull(), 1)).alias("n_unparsed"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy(F.col("k_bucket").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# UNPIVOT / melt — the reshape inverse of the pivot above.
# ---------------------------------------------------------------------------
@query(
    "unpivot_returnflag_metrics",
    extra=True,  # reshape family driver row is pivot_event_type_daily
    tags=("reshape", "unpivot", "melt"),
    oracle="""
WITH agg AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sum_disc,
         CAST(COUNT(*) AS DOUBLE) AS n_items
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, metric, value
FROM (
  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
  UNION ALL
  SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
  UNION ALL
  SELECT l_returnflag, 'n_items', n_items FROM agg
)
ORDER BY l_returnflag, metric
""",
)
def unpivot_returnflag_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long melt via the native ``DataFrame.unpivot`` (Spark's
    UNPIVOT clause — plans as an Expand node, one pass, NOT a
    self-union that would rescan the input once per metric; the oracle's
    UNION ALL over a CTE is the portable spelling of the same result).
    Decimal sums keep the melted values order-independent; every metric
    is cast to one common DOUBLE type because UNPIVOT requires (and a
    long format implies) a single value column type."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dec_sum("l_quantity", 2).alias("sum_qty"),
        dec_sum("l_discount", 2).alias("sum_disc"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return agg.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_disc", "n_items"], "metric", "value"
    ).orderBy("l_returnflag", "metric")


# ---------------------------------------------------------------------------
# SCD Type-2 dimension history from a change log — the warehouse verb
# the reference's ETL implies but never implements (its MERGE surface
# is SCD-1 latest-wins; streaming/events_stream.run_stream_upsert is
# this repo's SCD-1). Consecutive equal values collapse into one
# validity interval; the current row carries a NULL valid_to.
# ---------------------------------------------------------------------------
@query(
    "scd2_user_type_history",
    extra=True,  # warehouse family; catalog/pipeline rows carry the driver surface
    tags=("scd2", "dimension", "warehouse", "window"),
    oracle="""
WITH src AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) AS ts_us
  FROM events
),
runs AS (
  SELECT user_id, event_type, ts_us,
         lag(event_type) OVER w AS prev_type
  FROM src
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
starts AS (
  SELECT user_id, event_type AS status, ts_us AS valid_from_us
  FROM runs
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, status, valid_from_us,
       lead(valid_from_us) OVER w2 AS valid_to_us,
       lead(valid_from_us) OVER w2 IS NULL AS is_current
FROM starts
WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from_us)
ORDER BY user_id, valid_from_us
""",
)
def scd2_user_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history built in bulk from a change log: each user's
    event-type stream collapses into validity intervals — a row per
    RUN of consecutive equal values, ``valid_from``/``valid_to`` as
    exact epoch microseconds (the integer form that hash-matches
    across engines; see ``gap_sessionize``), and ``is_current`` on the
    open interval. This is the initial-load path of a slowly-changing
    dimension; the per-batch maintenance path is the SCD-1
    ``run_stream_upsert`` plus this rebuild over affected keys.

    Scale shape: both windows partition by the dimension KEY — no
    global window anywhere, so every user's history sorts inside its
    own hash partition (skew = the hottest single key's change count,
    which is what SCD-2 costs on any engine). The run-start filter
    drops the change log to interval grain BEFORE the second window,
    so lead() runs over runs, not raw events."""
    # ts is TIMESTAMP_NTZ; the UTC-session cast → unix_micros is the
    # exact integer-microsecond idiom shared with gap_sessionize.
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("change_id"),
        F.col("event_type").alias("status"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return scd2_from_log(ev, "change_id").orderBy("user_id", "valid_from_us")


# ---------------------------------------------------------------------------
# SCD Type-2 incremental maintenance: apply a change batch to an
# existing SCD-2 table without rebuilding the whole dimension — the
# per-batch path the bulk builder's docstring defers to ("the per-batch
# maintenance path is ... this rebuild over affected keys").
# ---------------------------------------------------------------------------
_SCD2_CUTOFF_US = 1_705_795_200_000_000  # 2024-01-21 00:00:00 UTC


def scd2_from_log(log: DataFrame, tiebreak_col: str) -> DataFrame:
    """Collapse a (user_id, status, ts_us, <tiebreak>) change log into
    SCD-2 validity intervals — the shared run-collapse algebra of the
    bulk builder and the incremental apply. Both windows partition by
    the dimension key (no global window; see scd2_user_type_history)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_us", tiebreak_col)
    runs = log.withColumn("prev_type", F.lag("status").over(w))
    starts = runs.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("status"))
    ).select("user_id", "status", F.col("ts_us").alias("valid_from_us"))
    w2 = Window.partitionBy("user_id").orderBy("valid_from_us")
    return (
        starts.withColumn("valid_to_us", F.lead("valid_from_us").over(w2))
        .withColumn("is_current", F.col("valid_to_us").isNull())
    )


def scd2_apply_changes(existing: DataFrame, changes: DataFrame) -> DataFrame:
    """Merge a change batch into an SCD-2 dimension table: rebuild the
    history of AFFECTED keys only from (their existing run starts ∪ the
    new changes), pass every untouched key through verbatim.

    ``existing``: (user_id, status, valid_from_us, valid_to_us,
    is_current); ``changes``: (user_id, status, ts_us, change_id).
    Semantics handled by construction, because affected keys re-derive
    from a merged log rather than patching intervals in place:

    * unseen keys insert their full new history;
    * a change equal to the key's current open status COLLAPSES into
      the open interval (no spurious row, the same consecutive-equal
      rule as the bulk builder);
    * a status flip closes the open interval at the change ts;
    * an OUT-OF-ORDER backfill (ts earlier than the open interval's
      start, even earlier than closed intervals) splices correctly —
      the case in-place UPDATE-style merges silently corrupt.

    Contract: at most one change per (user_id, ts_us) across existing ∪
    batch (the bulk builder's own ordering assumption); reconstructed
    log entries carry tiebreak −1 so they sort ahead of any batch
    change at an equal ts.

    Convergence-to-bulk contract (hypothesis-pinned, twice refined by
    falsifying examples): the table records run STARTS only, so
    information already collapsed away cannot be resurrected. Two
    distinct loss modes exist — a continuation collapsed WITHIN a
    batch is lost to any later backfill landing inside its run, and a
    run start collapsed ACROSS batches (same status flanking a time
    gap) is lost to any later batch landing inside that gap.
    Sequential applies therefore converge to the bulk build when the
    batches are TIME-CONTIGUOUS blocks arriving in a SPAN-ADJACENT
    order: each batch lands entirely after or entirely before
    everything applied so far (append, or full backfill — the applied
    span stays one contiguous window). That is exactly the shape
    file-landing waves have. A batch that lands strictly INSIDE the
    covered span still yields the correct history with respect to the
    RECORDED intervals (the mid-interval splice case, unit-pinned); it
    simply cannot resurrect what the record never kept — the same
    answer any SCD-2 store can give.

    Scale shape: ``affected`` is a distinct over the BATCH (KB-scale,
    broadcast); untouched rows move through one broadcast anti-join
    with no shuffle of the dimension; only affected keys' history —
    batch-proportional, not dimension-proportional — enters the window
    rebuild. With the dimension stored bucketed on user_id the
    anti-join/join pair is also co-located.
    """
    affected = changes.select("user_id").distinct()
    untouched = existing.join(F.broadcast(affected), "user_id", "left_anti")
    old_log = existing.join(F.broadcast(affected), "user_id").select(
        "user_id",
        "status",
        F.col("valid_from_us").alias("ts_us"),
        F.lit(-1).cast("long").alias("change_id"),
    )
    new_log = changes.select(
        "user_id", "status", "ts_us", F.col("change_id").cast("long")
    )
    rebuilt = scd2_from_log(old_log.unionByName(new_log), "change_id")
    return untouched.unionByName(rebuilt)


@query(
    "scd2_apply_changes_converges",
    # Promoted to the driver window in round 14 (VERDICT r13 #3): the
    # SCD-2 incremental-apply convergence gate (slot freed by
    # left_join_null_handling's demotion).
    tags=("scd2", "dimension", "warehouse", "incremental"),
    oracle="""
WITH src AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) AS ts_us
  FROM events
),
runs AS (
  SELECT user_id, event_type, ts_us,
         lag(event_type) OVER w AS prev_type
  FROM src
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
starts AS (
  SELECT user_id, event_type AS status, ts_us AS valid_from_us
  FROM runs
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, status, valid_from_us,
       lead(valid_from_us) OVER w2 AS valid_to_us,
       lead(valid_from_us) OVER w2 IS NULL AS is_current
FROM starts
WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from_us)
ORDER BY user_id, valid_from_us
""",
)
def scd2_apply_changes_converges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental path, gated by CONVERGENCE: initial-load the
    dimension from events before 2024-01-21, apply everything after as
    one change batch, and the result must hash-equal the bulk rebuild
    over ALL events — which is exactly what the oracle computes. The
    cutoff leaves both halves non-trivial at every test SF (new keys
    insert, existing keys extend/flip, same-status continuations
    collapse), so the equality exercises every merge case at once."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.col("event_type").alias("status"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    old = ev.filter(F.col("ts_us") < _SCD2_CUTOFF_US).select(
        "user_id", "status", "ts_us", F.col("event_id").alias("change_id")
    )
    initial = scd2_from_log(old, "change_id")
    changes = ev.filter(F.col("ts_us") >= _SCD2_CUTOFF_US).select(
        "user_id", "status", "ts_us", F.col("event_id").alias("change_id")
    )
    return scd2_apply_changes(initial, changes).orderBy(
        "user_id", "valid_from_us"
    )


def scd2_pit_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts_us",
    how: str = "left",
    dim_cols: tuple[str, ...] = ("status",),
) -> DataFrame:
    """Reusable point-in-time join: each fact row picks up the SCD-2
    history row valid at its timestamp (``valid_from ≤ ts < valid_to``,
    open interval = NULL ``valid_to``). The scale shape is the one
    ``scd2_point_in_time_enrich`` documents — equi-join on the
    dimension KEY with the interval predicate as a join residual (a
    Type-2 dimension is bounded by keys × change rate; broadcast under
    threshold, hash-shuffle on the key above it; never a bin join for
    key×interval). ``how='left'`` keeps facts with no valid interval
    (NULL dim columns) — dimension gaps must not drop facts, matching
    ``enriched_events_stream``. Both sides are plan-aliased so shared
    lineage (facts and dim derived from one frame) stays unambiguous.

    This is the batch face ``run_pit_enriched_stream`` re-applies per
    micro-batch against the LIVE dimension table
    (streaming/events_stream.py)."""
    d = dim.select(
        F.col(key).alias("_d_key"),
        "valid_from_us",
        "valid_to_us",
        *[F.col(c) for c in dim_cols],
    ).alias("_d")
    f = facts.alias("_f")
    cond = (
        (F.col(f"_f.{key}") == F.col("_d._d_key"))
        & (F.col(f"_f.{ts_col}") >= F.col("_d.valid_from_us"))
        & (
            F.col("_d.valid_to_us").isNull()
            | (F.col(f"_f.{ts_col}") < F.col("_d.valid_to_us"))
        )
    )
    return f.join(d, cond, how).drop("_d_key")


@query(
    "scd2_point_in_time_enrich",
    extra=True,  # warehouse family
    tags=("scd2", "dimension", "asof", "warehouse"),
    oracle="""
WITH src AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
runs AS (
  SELECT user_id, event_type, ts_us,
         lag(event_type) OVER w AS prev_type
  FROM src
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
starts AS (
  SELECT user_id, event_type AS status, ts_us AS valid_from_us
  FROM runs WHERE prev_type IS NULL OR prev_type <> event_type
),
dim AS (
  SELECT user_id, status, valid_from_us,
         lead(valid_from_us) OVER w2 AS valid_to_us
  FROM starts
  WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from_us)
),
enriched AS (
  SELECT f.user_id, f.event_id, f.event_type, d.status
  FROM src f JOIN dim d
    ON f.user_id = d.user_id
   AND f.ts_us >= d.valid_from_us
   AND (d.valid_to_us IS NULL OR f.ts_us < d.valid_to_us)
)
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN status = event_type THEN 1 ELSE 0 END) AS BIGINT)
         AS n_consistent
FROM enriched
GROUP BY status
ORDER BY status
""",
)
def scd2_point_in_time_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) enrichment of a fact stream against the
    SCD-2 dimension: each event joins the history row VALID AT ITS
    TIMESTAMP (``valid_from ≤ ts < valid_to``, open interval = NULL
    valid_to) — the lookup every fact table does against a Type-2
    dimension, and the reason Type-2 exists at all.

    Built-in self-audit: this dimension was derived FROM the events,
    so an event's as-of status must equal its own event_type —
    ``n_consistent == n_events`` per status by construction, and any
    interval-boundary off-by-one (closed vs half-open, a classic PIT
    bug) breaks the equality loudly before it breaks the hash.

    Scale shape: equi-join on the dimension KEY first (user_id), the
    interval predicate rides along as a join residual — each fact row
    meets only its own key's handful of history rows, never a
    cross-interval scan. A Type-2 dimension is bounded by (keys ×
    change rate); at 100 TB facts the join broadcasts the dimension
    when it fits and hash-shuffles on user_id when it doesn't — both
    plans keep the interval check residual-only. Never bin-join here:
    `range_join_binned` exists for interval×interval; key×interval is
    an equi-join with a residual.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("change_id"),
        F.col("event_type").alias("status"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    # dim and fact both derive from ev — disjoint column names sidestep
    # the self-join lineage ambiguity
    dim = scd2_from_log(ev, "change_id").select(
        F.col("user_id").alias("d_user_id"),
        F.col("status").alias("status"),
        "valid_from_us",
        "valid_to_us",
    )
    fact = ev.select(
        F.col("user_id").alias("f_user_id"),
        F.col("status").alias("event_type"),
        F.col("ts_us").alias("f_ts_us"),
    )
    enriched = fact.join(
        dim,
        (F.col("f_user_id") == F.col("d_user_id"))
        & (F.col("f_ts_us") >= F.col("valid_from_us"))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("f_ts_us") < F.col("valid_to_us"))
        ),
    )
    return (
        enriched.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("status") == F.col("event_type"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_consistent"),
        )
        .orderBy("status")
    )
