"""The reference's analytics workload (StreamPro Q1–Q3 + session
exploration, /root/reference/src/notebooks/analysis.ipynb) re-expressed
over the driver testdata `events` table.

The reference encodes sessions in strings — `user_{id}_sess_{day}_{sub}`
— and defines "first session" as lexicographic MIN(session_id) (SURVEY
§1.4: load-bearing, deliberately quirky semantics). We synthesize the
same encoding from `events.ts` (day index since 2024-01-01, sub = hour)
so the quirk (e.g. '..._sess_10_0' < '..._sess_2_0') is preserved and
oracle-checkable.

Analog mapping (testdata has no videos/devices dims):
  watch_time event  -> event_type = 'view', value = seconds watched
  genre             -> 'g' || (props json key k % 4)
  device_os         -> 'os' || (k % 2);  app_version -> 'v' || (k % 3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import dec
from ..sources.testdata import load_table
from .catalog import query

_D = "decimal(12,2)"

# ---- shared fragments ------------------------------------------------------

# DuckDB-side sessionized events CTE (kept textually tiny so each oracle
# query stays self-contained for the driver).
SESS_SQL = """
sess AS (
  SELECT *,
         'user_' || CAST(user_id AS VARCHAR) || '_sess_' ||
         CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS VARCHAR) ||
         '_' || CAST(hour(ts) AS VARCHAR) AS session_id
  FROM events
)
"""

UFS_SQL = """
user_first_sessions AS (
  SELECT user_id,
         MIN(session_id) AS first_session_id,
         strftime(MIN(ts), '%Y-%m-%d') AS first_session_date
  FROM sess
  GROUP BY user_id
)
"""


def sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + synthesized string session_id (reference session encoding,
    notebook cell 6 ipynb:278-280)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "session_id",
        F.concat(
            F.lit("user_"),
            F.col("user_id").cast("string"),
            F.lit("_sess_"),
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).cast("string"),
            F.lit("_"),
            F.hour("ts").cast("string"),
        ),
    )


def first_sessions(sess: DataFrame) -> DataFrame:
    """Per-user lexicographic-MIN first session (cell 10; SURVEY §1.4)."""
    return sess.groupBy("user_id").agg(
        F.min("session_id").alias("first_session_id"),
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("first_session_date"),
    )


def sessionized_with_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized events with per-user first-session columns attached via
    an unordered window — the single-pass session DAG (SURVEY §4).

    Instead of materializing `user_first_sessions` and joining it back
    into every metric CTE (the reference's 5-CTE shape, which on Spark
    costs one events scan + user_id shuffle PER metric), a
    ``Window.partitionBy(user_id)`` computes MIN(session_id)/MIN(ts)
    in-place. Every downstream metric then becomes a conditional
    aggregation over this one frame:

    * one parquet scan + ONE user_id shuffle total (branches share the
      identical scan→window exchange, so Spark's ReuseExchange dedupes
      them in the physical plan);
    * follow-up ``groupBy(user_id)`` needs no new shuffle — the window
      output is already hash-partitioned by user_id.

    At 100 TB this turns Q1/Q3 into scan → shuffle → fold, which is the
    minimum possible for per-user session semantics.
    """
    w = Window.partitionBy("user_id")
    return (
        sessionized(spark, sf_dir)
        .withColumn("first_session_id", F.min("session_id").over(w))
        .withColumn(
            "first_session_date", F.date_format(F.min("ts").over(w), "yyyy-MM-dd")
        )
    )


def _genre(col):
    """Genre analog from the props JSON payload: 'g' || (k % 4)."""
    k = F.get_json_object(col, "$.k").cast("int")
    return F.concat(F.lit("g"), (k % 4).cast("string"))


# ---------------------------------------------------------------------------
# Q1 — first-session watch-time conversion (cell 10).
# ---------------------------------------------------------------------------
@query(
    "sp_q1_first_session_conversion",
    headline=True,
    tags=("R4", "R5", "R6", "R9", "R11", "R13", "R20", "F4", "F6", "F7"),
    oracle=f"""
WITH {SESS_SQL.strip()},
users AS (SELECT DISTINCT user_id FROM events),
{UFS_SQL.strip()},
first_session_watch_times AS (
  SELECT ufs.user_id, ufs.first_session_id,
         CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_watch_time
  FROM user_first_sessions ufs
  INNER JOIN sess e
    ON ufs.user_id = e.user_id AND ufs.first_session_id = e.session_id
  WHERE e.event_type = 'view' AND e.value IS NOT NULL AND e.value > 0
  GROUP BY ufs.user_id, ufs.first_session_id
)
SELECT
  COUNT(DISTINCT u.user_id) AS total_users,
  COUNT(DISTINCT f.user_id) AS users_with_watch_time,
  COUNT(DISTINCT CASE WHEN f.total_watch_time >= 30 THEN f.user_id END) AS users_with_30_plus,
  ROUND(100.0 * COUNT(DISTINCT CASE WHEN f.total_watch_time >= 30 THEN f.user_id END)
        / NULLIF(COUNT(DISTINCT u.user_id), 0), 2) AS pct_reaching_30_seconds
FROM users u
LEFT JOIN first_session_watch_times f ON u.user_id = f.user_id
""",
)
def sp_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Q1 (notebook cell 10): % of users reaching >=30s watch
    time in their lexicographic-first session.

    Single-pass plan: the oracle's users/ufs/fswt CTE joins collapse to
    one windowed frame + one groupBy(user_id) fold (see
    ``sessionized_with_first``) — the join keys are all user_id, every
    user appears in `sess`, and SUM over an inner-join group equals the
    conditional SUM (NULL when no row qualifies, so non-NULL-ness marks
    join membership)."""
    s = sessionized_with_first(spark, sf_dir)
    qualifies = (
        (F.col("session_id") == F.col("first_session_id"))
        & (F.col("event_type") == "view")
        & F.col("value").isNotNull()
        & (F.col("value") > 0)
    )
    per_user = s.groupBy("user_id").agg(
        F.sum(F.when(qualifies, dec("value", 2, 12)))
        .cast("double")
        .alias("total_watch_time")
    )
    watched = F.count(F.when(F.col("total_watch_time").isNotNull(), 1))
    converted = F.count(F.when(F.col("total_watch_time") >= 30, 1))
    total = F.count(F.lit(1))  # per_user is one row per distinct user
    return per_user.agg(
        total.alias("total_users"),
        watched.alias("users_with_watch_time"),
        converted.alias("users_with_30_plus"),
        F.round(F.lit(100.0) * converted / F.nullif(total, F.lit(0)), 2).alias(
            "pct_reaching_30_seconds"
        ),
    )


# ---------------------------------------------------------------------------
# Q2 — dominant-genre second-session retention (cell 15: 5 CTEs, theta
# join with 3-day horizon, ROW_NUMBER dominant pick).
# ---------------------------------------------------------------------------
@query(
    "sp_q2_dominant_genre_retention",
    headline=True,
    tags=("R10", "R13", "R14", "R15", "F1", "F3", "F5", "F6"),
    oracle=f"""
WITH {SESS_SQL.strip()},
{UFS_SQL.strip()},
first_session_genre_watch AS (
  SELECT ufs.user_id,
         'g' || CAST(CAST(json_extract_string(e.props, '$.k') AS INTEGER) % 4 AS VARCHAR) AS genre,
         CAST(SUM(CASE WHEN e.event_type = 'view' THEN CAST(e.value AS DECIMAL(12,2))
                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS genre_watch_time
  FROM user_first_sessions ufs
  INNER JOIN sess e
    ON ufs.user_id = e.user_id AND ufs.first_session_id = e.session_id
  GROUP BY 1, 2
),
user_dominant_genres AS (
  SELECT user_id, genre AS dominant_genre, genre_watch_time
  FROM (
    SELECT user_id, genre, genre_watch_time,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY genre_watch_time DESC, genre) AS rn
    FROM first_session_genre_watch
  )
  WHERE rn = 1
),
subsequent_activity AS (
  SELECT ufs.user_id,
         CAST(SUM(CASE WHEN e.event_type = 'view' THEN CAST(e.value AS DECIMAL(12,2))
                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS subsequent_watch_time,
         COUNT(DISTINCT e.session_id) AS subsequent_sessions
  FROM user_first_sessions ufs
  INNER JOIN sess e
    ON ufs.user_id = e.user_id
   AND e.session_id > ufs.first_session_id
   AND strftime(e.ts, '%Y-%m-%d') <=
       strftime(CAST(ufs.first_session_date AS DATE) + INTERVAL 3 DAY, '%Y-%m-%d')
  GROUP BY ufs.user_id
)
SELECT udg.dominant_genre,
       COUNT(DISTINCT udg.user_id) AS users_with_dominant_genre,
       COUNT(DISTINCT sa.user_id) AS users_returned,
       ROUND(100.0 * COUNT(DISTINCT sa.user_id) / COUNT(DISTINCT udg.user_id), 1) AS return_rate_pct,
       ROUND(CAST(SUM(CAST(udg.genre_watch_time AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(udg.genre_watch_time), 1) AS avg_dominant_genre_first_watch_time,
       ROUND(CAST(SUM(CAST(sa.subsequent_watch_time AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(sa.subsequent_watch_time), 1) AS avg_subsequent_watch_time,
       ROUND(CAST(SUM(sa.subsequent_sessions) AS DOUBLE)
             / COUNT(sa.subsequent_sessions), 1) AS avg_subsequent_sessions
FROM user_dominant_genres udg
LEFT JOIN subsequent_activity sa ON udg.user_id = sa.user_id
GROUP BY udg.dominant_genre
ORDER BY avg_subsequent_watch_time DESC NULLS LAST, udg.dominant_genre
""",
)
def sp_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Q2 (cell 15): which dominant first-session genre drives
    the best retention within a 3-day horizon. The horizon join is the
    reference's theta join — equi on user_id, residual `session_id >` and
    date-string `<=` predicates (ipynb:1230-1236)."""
    # Single-pass via GROUPING SETS: the oracle's fsgw (user, genre) and
    # sa (user) CTEs fold into ONE aggregation over the windowed frame —
    # filter to the union of first-session and horizon rows, Expand x2,
    # aggregate both grains at once — and a second fold to user grain
    # merges both slices without any self-join or persist: one events
    # scan, one user_id window shuffle, one straight-line agg chain.
    s = sessionized_with_first(spark, sf_dir)
    zero = F.lit(0).cast(_D)
    is_first = F.col("session_id") == F.col("first_session_id")
    in_horizon = (F.col("session_id") > F.col("first_session_id")) & (
        F.date_format(F.col("ts"), "yyyy-MM-dd")
        <= F.date_add(F.to_date(F.col("first_session_date")), 3).cast("string")
    )
    base = s.filter(is_first | in_horizon).select(
        "user_id",
        _genre(F.col("props")).alias("genre"),
        is_first.alias("is_first"),
        "event_type",
        "value",
        "session_id",
    )
    first_view = F.col("is_first") & (F.col("event_type") == "view")
    subs_view = (~F.col("is_first")) & (F.col("event_type") == "view")
    gs = (
        base.groupingSets([["user_id", "genre"], ["user_id"]], "user_id", "genre")
        .agg(
            # NULL iff the group holds no first-session rows — exactly the
            # oracle fsgw's inner-join membership.
            F.sum(
                F.when(first_view, dec("value", 2, 12)).otherwise(
                    F.when(F.col("is_first"), zero)
                )
            )
            .cast("double")
            .alias("genre_watch_time"),
            # NULL iff no horizon rows — the oracle sa's membership.
            F.sum(
                F.when(subs_view, dec("value", 2, 12)).otherwise(
                    F.when(~F.col("is_first"), zero)
                )
            )
            .cast("double")
            .alias("subsequent_watch_time"),
            F.countDistinct(F.when(~F.col("is_first"), F.col("session_id"))).alias(
                "subs_sessions_raw"
            ),
            F.grouping("genre").alias("gid"),
        )
    )
    # ONE aggregate folds the oracle's udg (dominant genre, gid=0 slice)
    # AND sa (horizon metrics, gid=1 slice) to user grain — no self-join
    # of gs at all. The previous udg⋈sa left join looked cheap but
    # DeduplicateRelations re-ids one side's subtree, the re-id'd branch
    # missed the persisted gs cache, and the "broadcast" side silently
    # re-executed the whole events pipeline (second scan + window +
    # grouping sets). With a single consumer chain gs needs no persist
    # either. Semantics: min_by skips rows whose ordering struct is NULL
    # (non-gid0 / NULL-gwt rows) and yields NULL when none qualify
    # (user dropped, = the oracle's fsgw inner-join membership); every
    # user has exactly one gid=1 row, picked by max(when(gid=1, ...)).
    # The min_by struct(-gwt, genre) tie-break is the oracle's
    # ROW_NUMBER ordering exactly (IEEE negation is exact).
    gid0 = (F.col("gid") == 0) & F.col("genre_watch_time").isNotNull()
    gid1 = F.col("gid") == 1
    per_user = (
        gs.groupBy("user_id")
        .agg(
            F.min_by(
                F.struct("genre", "genre_watch_time"),
                F.when(
                    gid0,
                    F.struct(
                        (-F.col("genre_watch_time")).alias("_n"),
                        F.col("genre").alias("_g"),
                    ),
                ),
            ).alias("_top"),
            F.max(
                F.when(gid1, F.struct("subsequent_watch_time", "subs_sessions_raw"))
            ).alias("_sa"),
        )
        .filter(F.col("_top").isNotNull())
    )

    has_sa = F.col("_sa.subs_sessions_raw") > 0
    merged = per_user.select(
        "user_id",
        F.col("_top.genre").alias("dominant_genre"),
        F.col("_top.genre_watch_time").alias("genre_watch_time"),
        F.col("_sa.subsequent_watch_time").alias("subsequent_watch_time"),
        F.when(has_sa, F.col("user_id")).alias("sa_user_id"),
        F.when(has_sa, F.col("_sa.subs_sessions_raw")).alias("subsequent_sessions"),
    )

    def dec_mean(col: str, digits: int = 1):
        return F.round(
            F.sum(F.col(col).cast("decimal(18,4)")).cast("double") / F.count(col), digits
        )

    return (
        merged.groupBy("dominant_genre")
        .agg(
            F.countDistinct("user_id").alias("users_with_dominant_genre"),
            F.countDistinct("sa_user_id").alias("users_returned"),
            F.round(
                F.lit(100.0) * F.countDistinct("sa_user_id") / F.countDistinct("user_id"), 1
            ).alias("return_rate_pct"),
            dec_mean("genre_watch_time").alias("avg_dominant_genre_first_watch_time"),
            dec_mean("subsequent_watch_time").alias("avg_subsequent_watch_time"),
            F.round(
                F.sum("subsequent_sessions").cast("double") / F.count("subsequent_sessions"), 1
            ).alias("avg_subsequent_sessions"),
        )
        .orderBy(F.col("avg_subsequent_watch_time").desc_nulls_last(), "dominant_genre")
    )


# ---------------------------------------------------------------------------
# Q3 — device/app-version drop-off outliers, composite score folded into
# SQL (cells 20–22; the pandas post-processing P2 becomes a cross join
# with the overall benchmark row, SURVEY §2.4).
# ---------------------------------------------------------------------------
_Q3_METRIC_CTES = f"""
WITH {SESS_SQL.strip()},
{UFS_SQL.strip()},
user_device_info AS (
  SELECT DISTINCT ufs.user_id,
         'os' || CAST(CAST(json_extract_string(e.props, '$.k') AS INTEGER) % 2 AS VARCHAR) AS device_os,
         'v'  || CAST(CAST(json_extract_string(e.props, '$.k') AS INTEGER) % 3 AS VARCHAR) AS app_version
  FROM user_first_sessions ufs
  INNER JOIN sess e
    ON ufs.user_id = e.user_id AND ufs.first_session_id = e.session_id
),
first_session_watch_times AS (
  SELECT ufs.user_id,
         CAST(SUM(CASE WHEN e.event_type = 'view' THEN CAST(e.value AS DECIMAL(12,2))
                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS first_session_watch_time
  FROM user_first_sessions ufs
  INNER JOIN sess e
    ON ufs.user_id = e.user_id AND ufs.first_session_id = e.session_id
  GROUP BY ufs.user_id
),
user_session_counts AS (
  SELECT user_id, COUNT(DISTINCT session_id) AS total_sessions
  FROM sess GROUP BY user_id
),
day1_retention AS (
  SELECT ufs.user_id,
         CASE WHEN COUNT(DISTINCT e.session_id) > 0 THEN 1 ELSE 0 END AS returned_day1
  FROM user_first_sessions ufs
  LEFT JOIN sess e
    ON ufs.user_id = e.user_id
   AND e.session_id > ufs.first_session_id
   AND strftime(e.ts, '%Y-%m-%d') =
       strftime(CAST(ufs.first_session_date AS DATE) + INTERVAL 1 DAY, '%Y-%m-%d')
  GROUP BY ufs.user_id
),
combo_metrics AS (
  SELECT udi.device_os, udi.app_version,
         COUNT(DISTINCT udi.user_id) AS total_users,
         ROUND(100.0 * COUNT(DISTINCT CASE WHEN usc.total_sessions = 1 THEN udi.user_id END)
               / COUNT(DISTINCT udi.user_id), 1) AS single_session_rate_pct,
         ROUND(100.0 * COUNT(DISTINCT CASE WHEN fswt.first_session_watch_time < 5 THEN udi.user_id END)
               / COUNT(DISTINCT udi.user_id), 1) AS low_watch_time_rate_pct,
         ROUND(100.0 * COUNT(DISTINCT CASE WHEN dr.returned_day1 = 0 THEN udi.user_id END)
               / COUNT(DISTINCT udi.user_id), 1) AS no_day1_return_rate_pct
  FROM user_device_info udi
  LEFT JOIN first_session_watch_times fswt ON udi.user_id = fswt.user_id
  LEFT JOIN user_session_counts usc ON udi.user_id = usc.user_id
  LEFT JOIN day1_retention dr ON udi.user_id = dr.user_id
  GROUP BY udi.device_os, udi.app_version
  HAVING COUNT(DISTINCT udi.user_id) >= 5
),
overall AS (
  SELECT ROUND(100.0 * COUNT(DISTINCT CASE WHEN usc.total_sessions = 1 THEN ufs.user_id END)
               / COUNT(DISTINCT ufs.user_id), 1) AS overall_single_session_rate,
         ROUND(100.0 * COUNT(DISTINCT CASE WHEN fswt.first_session_watch_time < 5 THEN ufs.user_id END)
               / COUNT(DISTINCT ufs.user_id), 1) AS overall_low_watch_rate,
         ROUND(100.0 * COUNT(DISTINCT CASE WHEN dr.returned_day1 = 0 THEN ufs.user_id END)
               / COUNT(DISTINCT ufs.user_id), 1) AS overall_no_day1_rate
  FROM user_first_sessions ufs
  LEFT JOIN first_session_watch_times fswt ON ufs.user_id = fswt.user_id
  LEFT JOIN user_session_counts usc ON ufs.user_id = usc.user_id
  LEFT JOIN day1_retention dr ON ufs.user_id = dr.user_id
)
"""

_Q3_FINAL = """
SELECT cm.device_os, cm.app_version, cm.total_users,
       cm.single_session_rate_pct, cm.low_watch_time_rate_pct, cm.no_day1_return_rate_pct,
       ROUND(0.4 * (cm.single_session_rate_pct - o.overall_single_session_rate)
           + 0.3 * (cm.low_watch_time_rate_pct - o.overall_low_watch_rate)
           + 0.3 * (cm.no_day1_return_rate_pct - o.overall_no_day1_rate), 2) AS composite_drop_off_score
FROM combo_metrics cm CROSS JOIN overall o
ORDER BY composite_drop_off_score DESC, cm.device_os, cm.app_version
"""


@query(
    "sp_q3_dropoff_outliers",
    headline=True,
    tags=("R2", "R7", "R11", "R12", "R13", "R19", "P2"),
    oracle=_Q3_METRIC_CTES + _Q3_FINAL,
)
def sp_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference Q3 (cells 20–22): drop-off outliers by (device_os,
    app_version) with the pandas composite-score post-processing folded
    into the plan as a broadcast cross join against the 1-row overall
    benchmark (SURVEY §2.4 P2)."""
    s = sessionized_with_first(spark, sf_dir)
    zero = F.lit(0).cast(_D)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    is_first = F.col("session_id") == F.col("first_session_id")
    day1 = (F.col("session_id") > F.col("first_session_id")) & (
        F.date_format(F.col("ts"), "yyyy-MM-dd")
        == F.date_add(F.to_date(F.col("first_session_date")), 1).cast("string")
    )

    # The oracle's udi/fswt/usc/dr CTEs (4 scans + 4 user_id shuffles in
    # the naive translation) fold into ONE groupBy(user_id) over the
    # windowed frame: all four are per-user reductions, and the window
    # already co-partitioned the data by user_id (no extra shuffle).
    # Join-membership equivalences: every user has >=1 first-session
    # event, so the fswt/udi inner joins keep all users; dr's
    # LEFT-JOIN-then-COUNT>0 is MAX(day1-match indicator).
    per_user = s.groupBy("user_id").agg(
        F.sum(F.when(is_first & (F.col("event_type") == "view"), dec("value", 2, 12)).otherwise(F.when(is_first, zero)))
        .cast("double")
        .alias("first_session_watch_time"),
        F.countDistinct("session_id").alias("total_sessions"),
        F.max(F.when(day1, 1).otherwise(0)).alias("returned_day1"),
        F.collect_set(
            F.when(
                is_first,
                F.struct(
                    F.concat(F.lit("os"), (k % 2).cast("string")).alias("device_os"),
                    F.concat(F.lit("v"), (k % 3).cast("string")).alias("app_version"),
                ),
            )
        ).alias("first_session_combos"),
    )
    # ^ user-grain (events-count ÷ ~sessions·events rows). No persist:
    # round 6 folded the combo AND overall branches into ONE grouping-
    # sets aggregate below, so this frame has a single consumer chain —
    # one events scan, one user_id shuffle, no cached-frame reuse to
    # get trapped by (see sp_q2's DeduplicateRelations note).

    uid = F.col("user_id")
    total = F.countDistinct(uid)
    single_r = F.round(
        F.lit(100.0) * F.countDistinct(F.when(F.col("total_sessions") == 1, uid)) / total, 1
    )
    low_r = F.round(
        F.lit(100.0) * F.countDistinct(F.when(F.col("first_session_watch_time") < 5, uid)) / total,
        1,
    )
    noret_r = F.round(
        F.lit(100.0) * F.countDistinct(F.when(F.col("returned_day1") == 0, uid)) / total, 1
    )

    # udi exploded back to (user, device_os, app_version) grain — a user
    # can carry several combos in their first session; collect_set
    # already deduplicated per user. The oracle's combo_metrics AND
    # overall CTEs fold into ONE grouping-sets aggregate over this
    # frame: every rate is a countDistinct(user) ratio, and distinct
    # aggregation is explosion-invariant (a user duplicated across
    # combo rows still counts once in the () slice), so the global
    # slice equals the oracle's user-grain overall bit-for-bit. Every
    # user has >=1 first-session event by construction, so no user is
    # lost to an empty combo set. This halves the passes over the
    # user-grain frame (one Expand instead of two aggregations) and
    # drops the persist + broadcast cross join.
    exploded = per_user.select(
        "user_id",
        "total_sessions",
        "first_session_watch_time",
        "returned_day1",
        F.explode("first_session_combos").alias("combo"),
    ).select(
        "*",
        F.col("combo.device_os").alias("device_os"),
        F.col("combo.app_version").alias("app_version"),
    )
    gs = exploded.groupingSets(
        [["device_os", "app_version"], []], "device_os", "app_version"
    ).agg(
        total.alias("total_users"),
        single_r.alias("single_session_rate_pct"),
        low_r.alias("low_watch_time_rate_pct"),
        noret_r.alias("no_day1_return_rate_pct"),
        F.grouping_id().alias("_gid"),
    )
    # The 1-row overall slice (_gid=3) rides to every combo row through
    # an unpartitioned window over this tiny post-agg frame (combos+1
    # rows) — no second pass over gs, no join.
    w = Window.partitionBy()
    ov = lambda c: F.max(F.when(F.col("_gid") == 3, F.col(c))).over(w)  # noqa: E731
    score = F.round(
        F.lit(0.4) * (F.col("single_session_rate_pct") - ov("single_session_rate_pct"))
        + F.lit(0.3) * (F.col("low_watch_time_rate_pct") - ov("low_watch_time_rate_pct"))
        + F.lit(0.3) * (F.col("no_day1_return_rate_pct") - ov("no_day1_return_rate_pct")),
        2,
    )
    return (
        gs.withColumn("composite_drop_off_score", score)
        .filter((F.col("_gid") == 0) & (F.col("total_users") >= 5))
        .select(
            "device_os",
            "app_version",
            "total_users",
            "single_session_rate_pct",
            "low_watch_time_rate_pct",
            "no_day1_return_rate_pct",
            "composite_drop_off_score",
        )
        .orderBy(F.desc("composite_drop_off_score"), "device_os", "app_version")
    )


# ---------------------------------------------------------------------------
# Session exploration queries (cells 7/8/9/13/19).
# ---------------------------------------------------------------------------
@query(
    "sp_session_overview",
    tags=("R4", "R5", "R16", "R17", "F1", "F4", "F8"),
    oracle=f"""
WITH {SESS_SQL.strip()}
SELECT user_id,
       COUNT(DISTINCT session_id) AS total_sessions,
       MIN(session_id) AS first_session,
       MAX(session_id) AS last_session,
       MAX(CAST(split_part(session_id, '_', 4) AS INTEGER)) + 1 AS active_days
FROM sess
GROUP BY user_id
ORDER BY total_sessions DESC, user_id
LIMIT 10
""",
)
def sp_session_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell 7: per-user session stats, incl. MIN/MAX on VARCHAR (F8,
    lexicographic in both engines) and split_part day extraction (F1)."""
    sess = sessionized(spark, sf_dir)
    return (
        sess.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("total_sessions"),
            F.min("session_id").alias("first_session"),
            F.max("session_id").alias("last_session"),
            (F.max(F.split_part(F.col("session_id"), F.lit("_"), F.lit(4)).cast("int")) + 1).alias(
                "active_days"
            ),
        )
        .orderBy(F.desc("total_sessions"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "sp_daily_patterns",
    tags=("R4", "R7", "R18", "F1", "F2"),
    oracle=f"""
WITH {SESS_SQL.strip()}
SELECT split_part(session_id, '_', 1) || '_' || split_part(session_id, '_', 2) AS user_key,
       split_part(session_id, '_', 4) AS day_index,
       COUNT(DISTINCT session_id) AS sessions_per_day,
       string_agg(split_part(session_id, '_', 5), ',' ORDER BY session_id, event_id) AS sub_session_indices
FROM sess
WHERE user_id < 10
GROUP BY 1, 2
HAVING COUNT(DISTINCT session_id) > 1
ORDER BY 1, CAST(day_index AS INTEGER)
""",
)
def sp_daily_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell 8: ordinal GROUP BY + HAVING + ordered GROUP_CONCAT, with the
    user id rebuilt from session_id via split_part || (F1/F2). event_id
    added to the concat sort for total cross-engine determinism."""
    sess = sessionized(spark, sf_dir).filter(F.col("user_id") < 10)
    part = lambda n: F.split_part(F.col("session_id"), F.lit("_"), F.lit(n))  # noqa: E731
    return (
        sess.groupBy(
            F.concat(part(1), F.lit("_"), part(2)).alias("user_key"),
            part(4).alias("day_index"),
        )
        .agg(
            F.countDistinct("session_id").alias("sessions_per_day"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("session_id"), F.col("event_id"), part(5).alias("sub")))
                    ),
                    lambda s: s["sub"],
                ),
                ",",
            ).alias("sub_session_indices"),
        )
        .filter(F.col("sessions_per_day") > 1)
        .orderBy("user_key", part(4).cast("int"))
        .drop("session_id")
    )


@query(
    "sp_session_timeline",
    extra=True,  # projection/sort/limit family has driver rows via sort_nulls_last + sp_session_overview
    tags=("R3", "R6", "F1", "F4"),
    oracle=f"""
WITH {SESS_SQL.strip()}
SELECT session_id,
       split_part(session_id, '_', 4) AS day_index,
       split_part(session_id, '_', 5) AS sub_session,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS event_count,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS watch_events,
       CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(12,2))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS total_watch_time
FROM sess
WHERE user_id = 1
GROUP BY 1, 2, 3
ORDER BY CAST(day_index AS INTEGER), CAST(sub_session AS INTEGER)
""",
)
def sp_session_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell 9: one user's session timeline with conditional aggregation
    and timestamps rendered as strings (the reference stores timestamps
    as strings in the trusted zone, SURVEY §1.3)."""
    sess = sessionized(spark, sf_dir).filter(F.col("user_id") == 1)
    part = lambda n: F.split_part(F.col("session_id"), F.lit("_"), F.lit(n))  # noqa: E731
    zero = F.lit(0).cast(_D)
    return (
        sess.groupBy(
            "session_id", part(4).alias("day_index"), part(5).alias("sub_session")
        )
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            F.count(F.lit(1)).alias("event_count"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("watch_events"),
            F.sum(F.when(F.col("event_type") == "view", dec("value", 2, 12)).otherwise(zero))
            .cast("double")
            .alias("total_watch_time"),
        )
        .orderBy(F.col("day_index").cast("int"), F.col("sub_session").cast("int"))
    )


@query(
    "sp_genre_overview",
    extra=True,  # plain agg family has driver rows via join_dims_rollup + sp_event-level entries
    tags=("R4", "R5", "R16"),
    oracle="""
SELECT 'g' || CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 4 AS VARCHAR) AS genre,
       COUNT(*) AS event_count,
       COUNT(DISTINCT user_id) AS users_exposed
FROM events
GROUP BY 1
ORDER BY users_exposed DESC, genre
""",
)
def sp_genre_overview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell 13 analog: exposure counts by genre (JSON-derived)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(_genre(F.col("props")).alias("genre"))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.countDistinct("user_id").alias("users_exposed"),
        )
        .orderBy(F.desc("users_exposed"), "genre")
    )


@query(
    "sp_event_type_distribution",
    extra=True,  # R12 scalar subquery has a driver row via scalar_subquery_pct
    tags=("R12", "R4", "F7"),
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS unique_users,
       ROUND(100.0 * COUNT(DISTINCT user_id)
             / (SELECT COUNT(DISTINCT user_id) FROM events), 1) AS user_pct
FROM events
GROUP BY event_type
ORDER BY unique_users DESC, event_type
""",
)
def sp_event_type_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell 19 analog: distribution with a scalar-subquery denominator."""
    from ..sources.testdata import register_views

    register_views(spark, sf_dir, only=("events",))
    # CAST(100 AS DOUBLE): Spark's bare 100.0 literal is DECIMAL(4,1).
    return spark.sql(
        """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS unique_users,
               ROUND(CAST(100 AS DOUBLE) * COUNT(DISTINCT user_id)
                     / (SELECT COUNT(DISTINCT user_id) FROM events), 1) AS user_pct
        FROM events
        GROUP BY event_type
        ORDER BY unique_users DESC, event_type
        """
    )


# ---------------------------------------------------------------------------
# F9/P3 — parameterized drill-down into the worst combo (cell 23,
# ipynb:3180: interpolated `WHERE device_os = '{worst_combo[...]}'`).
# ---------------------------------------------------------------------------
_DRILL_SQL = """
WITH affected AS (
  SELECT DISTINCT user_id
  FROM sess_first_v
  WHERE session_id = first_session_id
    AND concat('os', CAST(CAST(get_json_object(props, '$.k') AS INT) % 2 AS STRING)) = :os
    AND concat('v',  CAST(CAST(get_json_object(props, '$.k') AS INT) % 3 AS STRING)) = :ver
),
per_user AS (
  SELECT s.user_id,
         COUNT(DISTINCT s.session_id) AS total_sessions,
         CAST(SUM(CASE WHEN s.session_id = s.first_session_id AND s.event_type = 'view'
                       THEN CAST(s.value AS DECIMAL(12,2))
                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS fs_watch
  FROM sess_first_v s JOIN affected a ON s.user_id = a.user_id
  GROUP BY s.user_id
)
SELECT CAST(:os AS STRING) AS device_os,
       CAST(:ver AS STRING) AS app_version,
       COUNT(*) AS affected_users,
       CAST(SUM(CASE WHEN total_sessions = 1 THEN 1 ELSE 0 END) AS BIGINT) AS single_session_users,
       ROUND(CAST(SUM(CAST(fs_watch AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 2) AS avg_first_session_watch_time,
       ROUND(CAST(SUM(total_sessions) AS DOUBLE) / COUNT(*), 2) AS avg_total_sessions
FROM per_user
"""

_DRILL_ORACLE = _Q3_METRIC_CTES + """
, worst AS (
  SELECT cm.device_os, cm.app_version
  FROM combo_metrics cm CROSS JOIN overall o
  ORDER BY ROUND(0.4 * (cm.single_session_rate_pct - o.overall_single_session_rate)
             + 0.3 * (cm.low_watch_time_rate_pct - o.overall_low_watch_rate)
             + 0.3 * (cm.no_day1_return_rate_pct - o.overall_no_day1_rate), 2) DESC,
           cm.device_os, cm.app_version
  LIMIT 1
),
swf AS (
  SELECT s.*, ufs.first_session_id
  FROM sess s JOIN user_first_sessions ufs ON s.user_id = ufs.user_id
),
affected AS (
  SELECT DISTINCT s.user_id
  FROM swf s, worst w
  WHERE s.session_id = s.first_session_id
    AND 'os' || CAST(CAST(json_extract_string(s.props, '$.k') AS INTEGER) % 2 AS VARCHAR) = w.device_os
    AND 'v'  || CAST(CAST(json_extract_string(s.props, '$.k') AS INTEGER) % 3 AS VARCHAR) = w.app_version
),
per_user AS (
  SELECT s.user_id,
         COUNT(DISTINCT s.session_id) AS total_sessions,
         CAST(SUM(CASE WHEN s.session_id = s.first_session_id AND s.event_type = 'view'
                       THEN CAST(s.value AS DECIMAL(12,2))
                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS fs_watch
  FROM swf s JOIN affected a ON s.user_id = a.user_id
  GROUP BY s.user_id
)
SELECT (SELECT device_os FROM worst) AS device_os,
       (SELECT app_version FROM worst) AS app_version,
       COUNT(*) AS affected_users,
       CAST(SUM(CASE WHEN total_sessions = 1 THEN 1 ELSE 0 END) AS BIGINT) AS single_session_users,
       ROUND(CAST(SUM(CAST(fs_watch AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 2) AS avg_first_session_watch_time,
       ROUND(CAST(SUM(total_sessions) AS DOUBLE) / COUNT(*), 2) AS avg_total_sessions
FROM per_user
"""


@query(
    "sp_drilldown_worst_combo",
    tags=("F9", "P3", "R3", "R12"),
    oracle=_DRILL_ORACLE,
)
def sp_drilldown_worst_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-23 analog: pick the worst (device_os, app_version) combo from
    Q3's ranking driver-side (`df.first()` — P3) and drill into its
    affected users via a PARAMETERIZED `spark.sql(sql, args=...)` query
    (F9 — named parameters instead of the reference's f-string
    interpolation, which was SQL-injection-shaped). The oracle derives
    the worst combo in pure SQL; equality also re-proves Q3's ranking.

    The sessionized-with-first frame feeds BOTH passes (Q3's ranking,
    then the drill's two references to ``sess_first_v``), so it is
    persisted for the duration of the query (same-run reuse, released
    by the harness via ``release_persisted`` — r19 verdict #8): the
    events scan + session synthesis + user_id window run once instead
    of three times. Spark's CacheManager matches ``sp_q3``'s internal
    build of the identical analyzed subtree against the cache."""
    from pyspark.storagelevel import StorageLevel

    from .catalog import track_persist

    swf = track_persist(
        sessionized_with_first(spark, sf_dir), StorageLevel.MEMORY_AND_DISK
    )
    worst = sp_q3(spark, sf_dir).first()  # P3: worst_combo = df.iloc[0]
    swf.createOrReplaceTempView("sess_first_v")
    # At tiny scale the HAVING >= 5 gate can leave no combos; NULL params
    # match nothing, mirroring the oracle's empty `worst` CTE (its scalar
    # subqueries go NULL and the aggregates run over zero users).
    return spark.sql(
        _DRILL_SQL,
        args={
            "os": worst["device_os"] if worst else None,
            "ver": worst["app_version"] if worst else None,
        },
    )


# ---------------------------------------------------------------------------
# Verbatim-dialect gate (round 3): ONE SQL text, written in the
# reference's DuckDB dialect, runs on BOTH engines — DuckDB executes it
# as the oracle, Spark executes it through functions/dialect.py's
# string-rewrite shim. A hash match is a hard driver gate on the shim
# itself (DATE_ADD+INTERVAL quirk, VARCHAR casts, DATE_DIFF), not just
# on hand-matched twin queries. Structure mirrors notebook cell 15's Q2
# (CTE chain, lexicographic first session, 3-day horizon theta join,
# ROW_NUMBER dominant pick) over the events analog.
# ---------------------------------------------------------------------------
_VERBATIM_Q2 = """
WITH sess AS (
    SELECT *,
           'user_' || CAST(user_id AS VARCHAR) || '_sess_' ||
           CAST(DATE_DIFF('day', CAST('2024-01-01' AS DATE), CAST(ts AS DATE)) AS VARCHAR) ||
           '_' || CAST(hour(ts) AS VARCHAR) AS session_id
    FROM events
),
user_first_sessions AS (
    SELECT user_id, MIN(session_id) as first_session_id,
           SUBSTRING(CAST(MIN(ts) AS VARCHAR), 1, 10) as first_session_date
    FROM sess GROUP BY user_id
),
first_session_type_value AS (
    SELECT ufs.user_id, e.event_type,
           SUM(CASE WHEN e.value IS NOT NULL THEN CAST(e.value AS DOUBLE) ELSE 0 END) as type_value
    FROM user_first_sessions ufs
    INNER JOIN sess e
        ON ufs.user_id = e.user_id AND ufs.first_session_id = e.session_id
    GROUP BY ufs.user_id, e.event_type
),
user_dominant_types AS (
    SELECT user_id, event_type as dominant_type, type_value
    FROM (
        SELECT user_id, event_type, type_value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY type_value DESC, event_type) as rn
        FROM first_session_type_value
    ) ranked WHERE rn = 1
),
subsequent_activity AS (
    SELECT ufs.user_id,
           SUM(CASE WHEN e.value IS NOT NULL THEN CAST(e.value AS DOUBLE) ELSE 0 END) as subsequent_value,
           COUNT(DISTINCT e.session_id) as subsequent_sessions
    FROM user_first_sessions ufs
    INNER JOIN sess e
        ON ufs.user_id = e.user_id
        AND e.session_id > ufs.first_session_id
        AND SUBSTRING(CAST(e.ts AS VARCHAR), 1, 10) <= CAST(DATE_ADD(CAST(ufs.first_session_date AS DATE), INTERVAL 3 DAY) AS VARCHAR)
    GROUP BY ufs.user_id
)
SELECT udt.dominant_type,
       COUNT(DISTINCT udt.user_id) as users_with_dominant_type,
       COUNT(DISTINCT sa.user_id) as users_returned,
       ROUND(CAST(100.0 AS DOUBLE) * COUNT(DISTINCT sa.user_id) / COUNT(DISTINCT udt.user_id), 1) as return_rate_pct,
       ROUND(AVG(udt.type_value), 1) as avg_dominant_first_value,
       ROUND(AVG(sa.subsequent_value), 1) as avg_subsequent_value,
       ROUND(AVG(CAST(sa.subsequent_sessions AS DOUBLE)), 1) as avg_subsequent_sessions
FROM user_dominant_types udt
LEFT JOIN subsequent_activity sa ON udt.user_id = sa.user_id
GROUP BY udt.dominant_type
ORDER BY avg_subsequent_value DESC NULLS LAST, udt.dominant_type
"""


@query(
    "sp_q2_verbatim_dialect",
    tags=("R10", "R13", "R14", "R15", "F3", "F4", "F5", "dialect-shim"),
    oracle=_VERBATIM_Q2,
)
def sp_q2_verbatim_dialect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-dialect SQL executed UNMODIFIED through the shim
    (functions/dialect.run_duckdb_sql) — the exact text DuckDB runs as
    the oracle. Gates the DATE_ADD(d, INTERVAL n DAY)->TIMESTAMP quirk
    reproduction (the horizon bound renders as 'YYYY-MM-DD 00:00:00',
    which sorts AFTER every bare 'YYYY-MM-DD' substring — faithfully
    quirky, not fixed), the bare-VARCHAR cast mapping, and the
    DATE_DIFF argument-order flip, against the driver's value hash.
    The curated-plan twin is ``sp_q2_dominant_genre_retention``;
    tests/test_reference_parity.py additionally proves the notebook's
    literal Q1/Q2/Q3 texts on a StreamPro-schema fixture."""
    from ..functions.dialect import run_duckdb_sql
    from ..sources.testdata import register_views

    register_views(spark, sf_dir, only=("events",))
    return run_duckdb_sql(spark, _VERBATIM_Q2)
