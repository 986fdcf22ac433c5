"""Semantics pins for the reshape/warehouse surface beyond the sf0.01
differential (test_oracle_parity.py)."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from streampro_assignment_etl_spark.queries import EXTRAS

pytestmark = pytest.mark.fast  # whole module: cheap invariants, per-commit lane

SF = "/root/testdata/sf0.01"


def test_scd2_intervals_tile_and_reconstruct(spark):
    """SCD-2 structural invariants: per user the validity intervals
    tile exactly (each valid_to equals the next valid_from), exactly
    one open current row exists, no two consecutive intervals carry
    the same status (runs collapsed) — and an as-of lookup through the
    intervals reconstructs every raw event's type."""
    hist = (
        EXTRAS["scd2_user_type_history"].builder(spark, SF).toPandas()
    )
    for uid, g in hist.groupby("user_id"):
        g = g.sort_values("valid_from_us").reset_index(drop=True)
        assert g["is_current"].sum() == 1
        assert g["is_current"].iloc[-1]  # the open interval is last
        # tiling: valid_to == next valid_from, NULL only on the last
        assert g["valid_to_us"].iloc[:-1].tolist() == g["valid_from_us"].iloc[1:].tolist()
        # runs collapsed: consecutive statuses differ
        assert (g["status"].iloc[:-1].values != g["status"].iloc[1:].values).all()

    # as-of reconstruction on a sample of raw events
    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        )
        .filter(F.col("user_id") % 7 == 0)
        .toPandas()
    )
    by_user = {uid: g.sort_values("valid_from_us") for uid, g in hist.groupby("user_id")}
    for r in ev.itertuples(index=False):
        g = by_user[r.user_id]
        live = g[
            (g["valid_from_us"] <= r.ts_us)
            & (g["valid_to_us"].isna() | (g["valid_to_us"] > r.ts_us))
        ]
        assert len(live) == 1 and live["status"].iloc[0] == r.event_type, r


# ---------------------------------------------------------------------------
# SCD-2 incremental apply: the four merge cases, pinned individually
# (the sf differential pins convergence-to-bulk in aggregate).
# ---------------------------------------------------------------------------
def test_scd2_apply_changes_merge_cases(spark):
    from streampro_assignment_etl_spark.queries.reshape import (
        scd2_apply_changes,
        scd2_from_log,
    )

    log = spark.createDataFrame(
        [
            # u1: closed A, open B — will flip to C
            (1, "A", 100, 1), (1, "B", 200, 2),
            # u2: open A — will receive a SAME-status continuation
            (2, "A", 100, 3),
            # u3: untouched — must pass through verbatim
            (3, "A", 100, 4), (3, "B", 300, 5),
            # u5: closed A then B — will receive an OUT-OF-ORDER backfill
            (5, "A", 100, 6), (5, "B", 400, 7),
        ],
        ["user_id", "status", "ts_us", "change_id"],
    )
    existing = scd2_from_log(log, "change_id")
    changes = spark.createDataFrame(
        [
            (1, "C", 300, 10),   # flip: closes u1's open B at 300
            (2, "A", 500, 11),   # continuation: collapses, no new row
            (4, "X", 50, 12),    # unseen key: full insert
            (5, "C", 250, 13),   # backfill BETWEEN A and B: splices A|C|B
        ],
        ["user_id", "status", "ts_us", "change_id"],
    )
    out = {
        (r.user_id, r.valid_from_us): (r.status, r.valid_to_us, r.is_current)
        for r in scd2_apply_changes(existing, changes).collect()
    }
    assert out == {
        (1, 100): ("A", 200, False),
        (1, 200): ("B", 300, False),
        (1, 300): ("C", None, True),     # flip closed the open interval
        (2, 100): ("A", None, True),     # continuation collapsed silently
        (3, 100): ("A", 300, False),     # untouched history verbatim
        (3, 300): ("B", None, True),
        (4, 50): ("X", None, True),      # unseen key inserted
        (5, 100): ("A", 250, False),     # backfill spliced mid-history:
        (5, 250): ("C", 400, False),     #   A truncated at 250, C inserted,
        (5, 400): ("B", None, True),     #   B re-anchored after it
    }


def test_scd2_point_in_time_self_consistency(spark):
    """The PIT join's built-in audit: the dimension derives from the
    events, so every event's as-of status must equal its own type —
    any half-open-interval boundary bug breaks this before the hash."""
    rows = EXTRAS["scd2_point_in_time_enrich"].builder(spark, SF).collect()
    assert rows
    assert all(r.n_events == r.n_consistent for r in rows), rows
    # and the join is total: every event finds exactly one interval
    total = sum(r.n_events for r in rows)
    assert total == spark.read.parquet(f"{SF}/events.parquet").count()
