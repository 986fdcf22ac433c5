"""Semantics pins for the reshape/warehouse surface beyond the sf0.01
differential (test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streampro_assignment_etl_spark.queries import EXTRAS

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
