"""Reference-workload parity: the notebook's VERBATIM Q1/Q2/Q3 SQL
(analysis.ipynb cells 10/15/20) runs through the dialect shim on Spark
and must match DuckDB executing the original over identical
pipeline-produced trusted data.

This is the "a user of the reference could switch" proof: same files,
same SQL, same answers — including the DATE_ADD-returns-TIMESTAMP
day-1-retention quirk, reproduced rather than fixed.

Fixture design notes: event values are dyadic rationals (multiples of
0.5) so double sums are order-exact across engines, and per-user genre
totals are constructed distinct so ROW_NUMBER's untie'd ORDER BY can't
flap. Result comparison is sorted-set-of-rows (the notebook's final
ORDER BY keys tie across rows).
"""

from __future__ import annotations

import json

import duckdb
import pytest

from streampro_assignment_etl_spark.functions.dialect import run_duckdb_sql
from streampro_assignment_etl_spark.pipeline import (
    LakeStorage,
    LandingToRawProcessor,
    RawToTrustedProcessor,
)

DATE = "2025-09-09"
GENRES = ["Action", "Drama", "Comedy"]

Q1_SQL = """
WITH user_first_sessions AS (
    SELECT user_id, MIN(session_id) as first_session_id
    FROM trusted_events GROUP BY user_id
),
first_session_watch_times AS (
    SELECT ufs.user_id, ufs.first_session_id,
           SUM(CAST(e.value AS DOUBLE)) as total_watch_time
    FROM user_first_sessions ufs
    INNER JOIN trusted_events e
        ON ufs.user_id = e.user_id AND ufs.first_session_id = e.session_id
    WHERE e.event_name = 'watch_time' AND e.value IS NOT NULL AND e.value > 0
    GROUP BY ufs.user_id, ufs.first_session_id
)
SELECT
    COUNT(DISTINCT u.user_id) as total_users,
    COUNT(DISTINCT fswt.user_id) as users_with_watch_time,
    COUNT(DISTINCT CASE WHEN fswt.total_watch_time >= 30 THEN fswt.user_id END) as users_with_30_plus,
    ROUND(100.0 * COUNT(DISTINCT CASE WHEN fswt.total_watch_time >= 30 THEN fswt.user_id END) / NULLIF(COUNT(DISTINCT u.user_id), 0), 2) as pct_reaching_30_seconds
FROM trusted_users u
LEFT JOIN first_session_watch_times fswt ON u.user_id = fswt.user_id
"""

Q2_SQL = """
WITH user_first_sessions AS (
    SELECT e.user_id, MIN(e.session_id) as first_session_id,
           SUBSTRING(MIN(e.timestamp), 1, 10) as first_session_date
    FROM trusted_events e GROUP BY e.user_id
),
first_session_genre_watch AS (
    SELECT ufs.user_id, v.genre,
           SUM(CASE WHEN e.event_name = 'watch_time' THEN CAST(e.value AS DOUBLE) ELSE 0 END) as genre_watch_time
    FROM user_first_sessions ufs
    INNER JOIN trusted_events e
        ON ufs.user_id = e.user_id AND ufs.first_session_id = e.session_id
    INNER JOIN trusted_videos v ON e.video_id = v.video_id
    GROUP BY ufs.user_id, v.genre
),
user_dominant_genres AS (
    SELECT user_id, genre as dominant_genre, genre_watch_time
    FROM (
        SELECT user_id, genre, genre_watch_time,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY genre_watch_time DESC) as rn
        FROM first_session_genre_watch
    ) WHERE rn = 1
),
subsequent_activity AS (
    SELECT ufs.user_id,
           SUM(CASE WHEN e.event_name = 'watch_time' THEN CAST(e.value AS DOUBLE) ELSE 0 END) as subsequent_watch_time,
           COUNT(DISTINCT e.session_id) as subsequent_sessions
    FROM user_first_sessions ufs
    INNER JOIN trusted_events e
        ON ufs.user_id = e.user_id
        AND e.session_id > ufs.first_session_id
        AND SUBSTRING(e.timestamp, 1, 10) <= CAST(DATE_ADD(CAST(ufs.first_session_date AS DATE), INTERVAL 3 DAY) AS VARCHAR)
    GROUP BY ufs.user_id
)
SELECT udg.dominant_genre,
       COUNT(DISTINCT udg.user_id) as users_with_dominant_genre,
       COUNT(DISTINCT sa.user_id) as users_returned,
       ROUND(100.0 * COUNT(DISTINCT sa.user_id) / COUNT(DISTINCT udg.user_id), 1) as return_rate_pct,
       ROUND(AVG(udg.genre_watch_time), 1) as avg_dominant_genre_first_watch_time,
       ROUND(AVG(sa.subsequent_watch_time), 1) as avg_subsequent_watch_time,
       ROUND(AVG(sa.subsequent_sessions), 1) as avg_subsequent_sessions,
       ROUND(AVG(sa.subsequent_watch_time) * AVG(sa.subsequent_sessions), 1) as engagement_quality_score
FROM user_dominant_genres udg
LEFT JOIN subsequent_activity sa ON udg.user_id = sa.user_id
GROUP BY udg.dominant_genre
ORDER BY avg_subsequent_watch_time DESC NULLS LAST
"""

Q3_SQL = """
WITH user_first_sessions AS (
    SELECT user_id, MIN(session_id) as first_session_id,
           SUBSTRING(MIN(timestamp), 1, 10) as first_session_date
    FROM trusted_events GROUP BY user_id
),
user_device_info AS (
    SELECT DISTINCT ufs.user_id, e.device_os, e.app_version
    FROM user_first_sessions ufs
    INNER JOIN trusted_events e
        ON ufs.user_id = e.user_id AND ufs.first_session_id = e.session_id
),
first_session_watch_times AS (
    SELECT ufs.user_id,
           SUM(CASE WHEN e.event_name = 'watch_time' THEN CAST(e.value AS DOUBLE) ELSE 0 END) as first_session_watch_time
    FROM user_first_sessions ufs
    INNER JOIN trusted_events e
        ON ufs.user_id = e.user_id AND ufs.first_session_id = e.session_id
    GROUP BY ufs.user_id
),
user_session_counts AS (
    SELECT user_id, COUNT(DISTINCT session_id) as total_sessions
    FROM trusted_events GROUP BY user_id
),
day1_retention AS (
    SELECT ufs.user_id,
           CASE WHEN COUNT(DISTINCT e.session_id) > 0 THEN 1 ELSE 0 END as returned_day1
    FROM user_first_sessions ufs
    LEFT JOIN trusted_events e
        ON ufs.user_id = e.user_id
        AND e.session_id > ufs.first_session_id
        AND SUBSTRING(e.timestamp, 1, 10) = CAST(DATE_ADD(CAST(ufs.first_session_date AS DATE), INTERVAL 1 DAY) AS VARCHAR)
    GROUP BY ufs.user_id
)
SELECT udi.device_os, udi.app_version,
       COUNT(DISTINCT udi.user_id) as total_users,
       COUNT(DISTINCT CASE WHEN usc.total_sessions = 1 THEN udi.user_id END) as users_single_session,
       ROUND(100.0 * COUNT(DISTINCT CASE WHEN usc.total_sessions = 1 THEN udi.user_id END) / COUNT(DISTINCT udi.user_id), 1) as single_session_rate_pct,
       COUNT(DISTINCT CASE WHEN fswt.first_session_watch_time < 5 THEN udi.user_id END) as users_low_watch_time,
       ROUND(100.0 * COUNT(DISTINCT CASE WHEN fswt.first_session_watch_time < 5 THEN udi.user_id END) / COUNT(DISTINCT udi.user_id), 1) as low_watch_time_rate_pct,
       COUNT(DISTINCT CASE WHEN dr.returned_day1 = 0 THEN udi.user_id END) as users_no_day1_return,
       ROUND(100.0 * COUNT(DISTINCT CASE WHEN dr.returned_day1 = 0 THEN udi.user_id END) / COUNT(DISTINCT udi.user_id), 1) as no_day1_return_rate_pct,
       ROUND(AVG(fswt.first_session_watch_time), 1) as avg_first_session_watch_time,
       ROUND(AVG(usc.total_sessions), 1) as avg_total_sessions
FROM user_device_info udi
LEFT JOIN first_session_watch_times fswt ON udi.user_id = fswt.user_id
LEFT JOIN user_session_counts usc ON udi.user_id = usc.user_id
LEFT JOIN day1_retention dr ON udi.user_id = dr.user_id
GROUP BY udi.device_os, udi.app_version
HAVING COUNT(DISTINCT udi.user_id) >= 5
ORDER BY single_session_rate_pct DESC
"""


def _gen_fixture(tmp):
    """24 users × 4 (os, version) combos; dyadic watch values; distinct
    per-user genre totals; varied return patterns."""
    users, events = [], []
    for u in range(24):
        os_ = ["iOS", "Android"][u % 2]
        ver = ["2.0.0", "2.0.1"][(u // 2) % 2]
        users.append(f"user_{u},2025-01-0{u % 9 + 1},Free,26-35,Female")
        base = {
            "account_id": f"acc_{u}",
            "user_id": f"user_{u}",
            "device": "mobile",
            "app_version": ver,
            "device_os": os_,
            "network_type": "wifi",
            "ip": "10.0.0.1",
            "country": "US",
        }
        # First session: one watch event per genre, distinct totals.
        for gi in range(3):
            events.append(
                {
                    **base,
                    "timestamp": f"2025-09-09 0{u % 8 + 1}:1{gi}:00",
                    "video_id": f"video_{gi + 1}",
                    "event_name": "watch_time",
                    "value": 0.5 + 0.5 * ((3 * u + 5 * gi) % 19),
                    "session_id": f"user_{u}_sess_1_0",
                }
            )
        # A NULL-value play event (NULL handling path).
        events.append(
            {
                **base,
                "timestamp": f"2025-09-09 0{u % 8 + 1}:20:00",
                "video_id": "video_1",
                "event_name": "play",
                "value": None,
                "session_id": f"user_{u}_sess_1_0",
            }
        )
        if u % 3 == 0:  # next-day session (inside the 3-day horizon)
            events.append(
                {
                    **base,
                    "timestamp": "2025-09-10 09:00:00",
                    "video_id": "video_2",
                    "event_name": "watch_time",
                    "value": 4.5,
                    "session_id": f"user_{u}_sess_2_0",
                }
            )
        elif u % 3 == 1:  # late session (outside the horizon)
            events.append(
                {
                    **base,
                    "timestamp": "2025-09-14 09:00:00",
                    "video_id": "video_3",
                    "event_name": "watch_time",
                    "value": 6.0,
                    "session_id": f"user_{u}_sess_6_0",
                }
            )
    (tmp / "data").mkdir()
    (tmp / "data" / f"users_{DATE}.csv").write_text(
        "user_id,signup_date,subscription_tier,age_group,gender\n"
        + "\n".join(users)
        + "\n"
    )
    (tmp / "data" / f"videos_{DATE}.csv").write_text(
        "video_id,title,genre,duration_seconds,patent_id\n"
        + "\n".join(
            f"video_{i + 1},Title {i + 1},{g},1800,patent_1" for i, g in enumerate(GENRES)
        )
        + "\n"
    )
    (tmp / "data" / f"events_{DATE}.jsonl").write_text(
        "\n".join(json.dumps(e) for e in events) + "\n"
    )


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refparity")
    _gen_fixture(tmp)
    lk = LakeStorage(tmp / "lake")
    lk.ensure_zones()
    lk.seed_landing(tmp / "data")
    assert LandingToRawProcessor(lk, DATE).run().is_success
    assert RawToTrustedProcessor(spark, lk, DATE).run().is_success
    return lk


@pytest.fixture(scope="module")
def oracle_con(lake):
    con = duckdb.connect()
    for t in ("users", "videos", "events"):
        con.execute(
            f"CREATE VIEW trusted_{t} AS SELECT * FROM "
            f"read_parquet('{lake.trusted_path(t)}/*/*.parquet')"
        )
    return con


def _norm(rows):
    """Exact value comparison with numeric-type normalization: Spark's
    `100.0` literal is DECIMAL(4,1) (so its ROUND returns Decimal) where
    DuckDB yields DOUBLE — same values, different Python types."""
    import decimal

    return sorted(
        tuple(float(c) if isinstance(c, (decimal.Decimal, int, float)) else c for c in r)
        for r in rows
    )


@pytest.mark.parametrize(
    "sql", [Q1_SQL, Q2_SQL, Q3_SQL], ids=["q1_cell10", "q2_cell15", "q3_cell20"]
)
def test_notebook_query_parity(spark, lake, oracle_con, sql):
    for t in ("users", "videos", "events"):
        spark.read.parquet(lake.trusted_path(t)).createOrReplaceTempView(f"trusted_{t}")
    got = _norm(run_duckdb_sql(spark, sql).collect())
    want = _norm(oracle_con.execute(sql).fetchall())
    assert got == want
    assert len(got) > 0
