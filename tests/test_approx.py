"""Accuracy-bound tests for the approximate-aggregate scale paths
(functions/approx.py) against their exact anchors."""

from __future__ import annotations

from pyspark.sql import functions as F

from streampro_assignment_etl_spark.functions.approx import (
    approx_distinct_by,
    approx_quantiles_by,
)

SF = "/root/testdata/sf0.01"


def test_approx_quantiles_close_to_exact(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    approx = {
        r["lang"]: (r["q_50"], r["q_90"])
        for r in approx_quantiles_by(docs, ["lang"], "n_chars", [0.5, 0.9]).collect()
    }
    exact = {
        r["lang"]: (r["m"], r["p90"])
        for r in docs.groupBy("lang")
        .agg(
            F.expr("percentile(n_chars, 0.5)").alias("m"),
            F.expr("percentile(n_chars, 0.9)").alias("p90"),
        )
        .collect()
    }
    for lang, (m, p90) in exact.items():
        am, a90 = approx[lang]
        assert abs(am - m) <= 0.05 * m, (lang, am, m)
        assert abs(a90 - p90) <= 0.05 * p90, (lang, a90, p90)


def test_approx_distinct_close_to_exact(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    approx = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct_by(events, ["event_type"], "user_id").collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    for et, d in exact.items():
        assert abs(approx[et] - d) <= max(3, 0.1 * d), (et, approx[et], d)
