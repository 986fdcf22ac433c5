"""Dialect-shim tests: string rewrites + a differential run of the
reference's own notebook SQL (cells 8 / 21 constructs) through the shim
on Spark vs the original on DuckDB over identical trusted data."""

from __future__ import annotations


import json

import duckdb
import pytest

from streampro_assignment_etl_spark.functions.dialect import (
    duckdb_to_spark_sql,
    rewrite_date_add_interval,
    rewrite_group_concat,
    run_duckdb_sql,
)
from streampro_assignment_etl_spark.pipeline import (
    LakeStorage,
    LandingToRawProcessor,
    RawToTrustedProcessor,
)

pytestmark = pytest.mark.fast  # whole module: cheap invariants, per-commit lane

# -- string-level rewrites ---------------------------------------------------


def test_rewrite_group_concat_ordered():
    sql = "SELECT GROUP_CONCAT(SPLIT_PART(session_id, '_', 5) ORDER BY session_id) AS x FROM t"
    out = rewrite_group_concat(sql)
    assert "GROUP_CONCAT" not in out
    assert "array_sort(collect_list(struct(session_id AS _k0, SPLIT_PART(session_id, '_', 5) AS _gc)))" in out
    assert out.endswith("AS x FROM t")


def test_rewrite_date_add_interval():
    sql = "CAST(DATE_ADD(CAST(d AS DATE), INTERVAL 3 DAY) AS VARCHAR)"
    out = duckdb_to_spark_sql(sql)
    # TIMESTAMP cast reproduces DuckDB's DATE_ADD-returns-TIMESTAMP
    # quirk ('... AS VARCHAR' then renders '2025-09-12 00:00:00').
    assert out == "CAST(CAST(date_add(CAST(d AS DATE), 3) AS TIMESTAMP) AS STRING)"
    # Spark-form date_add untouched
    assert rewrite_date_add_interval("date_add(d, 3)") == "date_add(d, 3)"
    # A DuckDB-form DATE_ADD nested INSIDE a Spark-form call's arguments
    # is still rewritten (the skip path advances past the match token
    # only, not past the outer call's closing paren).
    nested = "DATE_ADD(DATE_ADD(d, INTERVAL 2 DAY), 5)"
    assert (
        rewrite_date_add_interval(nested)
        == "DATE_ADD(CAST(date_add(d, 2) AS TIMESTAMP), 5)"
    )


def test_rewrite_handles_nested_and_multiple():
    sql = "SELECT DATE_ADD(x, INTERVAL 1 DAY), GROUP_CONCAT(a ORDER BY b, c) FROM t"
    out = duckdb_to_spark_sql(sql)
    assert "CAST(date_add(x, 1) AS TIMESTAMP)" in out
    assert "struct(b AS _k0, c AS _k1, a AS _gc)" in out


def test_rewrite_tokens_inside_string_literals_untouched():
    """Round-6 review finding: the entry-point searches were quote-blind,
    so a rewrite token INSIDE a string literal anchored the paren
    surgery mid-literal and crashed on valid SQL. Tokens in literals
    must pass through byte-identical; real tokens around them still
    rewrite."""
    sql = "SELECT DATE_ADD(d, INTERVAL 2 DAY) AS a, 'DATE_ADD(' AS lit FROM t"
    out = duckdb_to_spark_sql(sql)
    assert "'DATE_ADD(' AS lit" in out
    assert "CAST(date_add(d, 2) AS TIMESTAMP)" in out

    sql = "SELECT GROUP_CONCAT(a ORDER BY b) AS g, 'GROUP_CONCAT(' AS lit FROM t"
    out = duckdb_to_spark_sql(sql)
    assert "'GROUP_CONCAT(' AS lit" in out
    assert "array_join" in out and "GROUP_CONCAT(a" not in out

    # A separator literal containing the token must not re-anchor the
    # loop on its own output.
    sql = "SELECT GROUP_CONCAT(a, 'GROUP_CONCAT(' ORDER BY b) FROM t"
    out = rewrite_group_concat(sql)
    assert out.count("array_join") == 1 and "'GROUP_CONCAT('" in out

    sql = "SELECT DATE_DIFF('day', a, b) AS n, 'DATE_DIFF(' AS lit FROM t"
    out = duckdb_to_spark_sql(sql)
    assert "'DATE_DIFF(' AS lit" in out and "datediff(b, a)" in out

    sql = "SELECT CAST(x AS VARCHAR) AS s, 'AS VARCHAR)' AS lit FROM t"
    out = duckdb_to_spark_sql(sql)
    assert "'AS VARCHAR)' AS lit" in out and "CAST(x AS STRING)" in out


# -- differential: reference notebook SQL on Spark (shimmed) vs DuckDB -------

DATE = "2025-09-09"

# The reference's cell-8 daily-patterns query, verbatim constructs
# (analysis.ipynb cell 8; GROUP_CONCAT ... ORDER BY is the dialect gap).
CELL8_SQL = """
SELECT
    SPLIT_PART(session_id, '_', 1) || '_' || SPLIT_PART(session_id, '_', 2) as user_key,
    SPLIT_PART(session_id, '_', 4) as day_index,
    COUNT(DISTINCT session_id) as sessions_per_day,
    GROUP_CONCAT(SPLIT_PART(session_id, '_', 5) ORDER BY session_id) as sub_session_indices
FROM trusted_events
WHERE user_id IN ('user_1', 'user_2', 'user_3')
GROUP BY 1, 2
HAVING COUNT(DISTINCT session_id) > 1
ORDER BY 1, CAST(day_index AS INTEGER)
"""

# The reference's cell-21 day1_retention CTE, verbatim constructs
# (DATE_ADD ... INTERVAL + CAST AS VARCHAR are the dialect gaps).
CELL21_SQL = """
WITH user_first_sessions AS (
    SELECT user_id,
           MIN(session_id) as first_session_id,
           SUBSTRING(MIN(timestamp), 1, 10) as first_session_date
    FROM trusted_events
    GROUP BY user_id
)
SELECT ufs.user_id,
       CASE WHEN COUNT(DISTINCT e.session_id) > 0 THEN 1 ELSE 0 END as returned_day1
FROM user_first_sessions ufs
LEFT JOIN trusted_events e
    ON ufs.user_id = e.user_id
    AND e.session_id > ufs.first_session_id
    AND SUBSTRING(e.timestamp, 1, 10) = CAST(DATE_ADD(CAST(ufs.first_session_date AS DATE), INTERVAL 1 DAY) AS VARCHAR)
GROUP BY ufs.user_id
ORDER BY ufs.user_id
"""


def _event(user, sess, ts, name="watch_time", value=5.0):
    return {
        "timestamp": ts,
        "account_id": f"acc_{user}",
        "video_id": "video_1",
        "user_id": f"user_{user}",
        "event_name": name,
        "value": value,
        "device": "mobile",
        "app_version": "2.0.1",
        "device_os": "iOS",
        "network_type": "wifi",
        "ip": "10.0.0.1",
        "country": "US",
        "session_id": f"user_{user}_sess_{sess}",
    }


EVENTS = [
    # user_1: two sessions on day 1, one on day 2 (multi-session day +
    # day-1 return for the retention CTE).
    _event(1, "1_0", "2025-09-09 08:00:00"),
    _event(1, "1_0", "2025-09-09 08:10:00"),
    _event(1, "1_1", "2025-09-09 12:00:00"),
    _event(1, "2_0", "2025-09-10 09:00:00"),
    # user_2: two sessions day 1 only (multi-session, no return).
    _event(2, "1_0", "2025-09-09 10:00:00"),
    _event(2, "1_1", "2025-09-09 11:00:00"),
    # user_3: single session (filtered by HAVING; no return).
    _event(3, "1_0", "2025-09-09 13:00:00"),
]


@pytest.fixture(scope="module")
def trusted(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dialect")
    lake = LakeStorage(tmp / "lake")
    lake.ensure_zones()
    (tmp / "data").mkdir()
    (tmp / "data" / f"events_{DATE}.jsonl").write_text(
        "\n".join(json.dumps(e) for e in EVENTS) + "\n"
    )
    lake.seed_landing(tmp / "data")
    assert LandingToRawProcessor(lake, DATE).run().is_success
    from streampro_assignment_etl_spark.pipeline.schemas import STREAMPRO_TABLES

    reg = {"trusted_events": STREAMPRO_TABLES["trusted_events"]}
    assert RawToTrustedProcessor(spark, lake, DATE, registry=reg).run().is_success
    return lake.trusted_path("events")


@pytest.mark.parametrize("sql", [CELL8_SQL, CELL21_SQL], ids=["cell8", "cell21"])
def test_notebook_sql_matches_duckdb(spark, trusted, sql):
    spark.read.parquet(trusted).createOrReplaceTempView("trusted_events")
    got = sorted(tuple(r) for r in run_duckdb_sql(spark, sql).collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW trusted_events AS SELECT * FROM read_parquet('{trusted}/*/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want
    assert len(got) > 0
