"""Differential tests: every declared query must match its DuckDB oracle
exactly (this mirrors the driver's t2 gate at sf0.01)."""

from __future__ import annotations

import pytest

from streampro_assignment_etl_spark.oracle import run_differential
from streampro_assignment_etl_spark.queries import EXTRAS, REGISTRY

ALL_QUERIES = {**REGISTRY, **EXTRAS}
ORACLE_QUERIES = sorted(n for n, s in ALL_QUERIES.items() if s.oracle)

# Fast-lane representatives (pytest -m fast — VERDICT r15 #4): one
# query per operator family, so a per-commit run exercises the whole
# differential stack (builder → Spark plan → DuckDB oracle → hash
# compare) without the full 149-query sweep. The full suite still runs
# every query — the marker only ADDS these to the fast lane.
FAST_REPRESENTATIVES = {
    "pricing_summary",                  # hash aggregation
    "theta_range_join",                 # join family
    "sp_q2_dominant_genre_retention",   # CTE/window workload
    "scalar_subquery_pct",              # subqueries
    "dedup_fuzzy_minhash",              # fuzzy dedup
    "dedup_fingerprints",               # exact dedup
    "similarity_topk_cosine",           # similarity serving
    "similarity_ann_ivf",               # ANN index path
    "language_id_confusion",            # text analytics
    "tfidf_top_terms",                  # corpus statistics
    "sequence_packing",                 # training-data reshape
    "decontaminate_eval_overlap",       # decontamination
    "stratified_sample_by_lang",        # sampling
    "release_diff_summary",             # release/lineage (round 16)
    # round 17 (VERDICT r16 #7): every driver-window family must have a
    # fast representative — the invariant test below fails collection
    # of a new family without one
    "pagerank_event_transitions",       # graph/iterative
    "pipeline_file_roundtrips",         # ingestion pipeline (S1-S10)
    "catalog_ctas_roundtrip",           # catalog DDL (S11-S15)
    "multimodal_feature_stats",         # multimodal mapInPandas
    "streaming_windowed_counts",        # structured streaming
    "set_ops_customer_nations",         # set operations
    "asof_last_view_before_click",      # as-of join / timeseries
    "hypertable_rollup",                # grouping-sets / rollup / cube
    "subquery_membership",              # semi/anti-join subqueries
    "pivot_event_type_daily",           # pivot/reshape
    "json_props_extract",               # semi-structured JSON
    "range_join_binned",                # binned range join
    "scd2_apply_changes_converges",     # SCD-2 dimension lifecycle
}


@pytest.mark.fast
def test_fast_lane_covers_every_registry_family():
    """VERDICT r16 #7: the fast lane rots silently as operator families
    are added. Invariant: every driver-window (REGISTRY) query shares
    at least one tag with some fast-lane representative — a new family
    landing without a fast differential fails HERE at the moment it is
    registered, not three rounds later. Fix by adding one rep to
    FAST_REPRESENTATIVES (or tagging the query into an existing
    family, if that is genuinely what it is)."""
    unknown = sorted(n for n in FAST_REPRESENTATIVES if n not in ALL_QUERIES)
    assert not unknown, f"fast reps not registered: {unknown}"
    no_oracle = sorted(
        n for n in FAST_REPRESENTATIVES if not ALL_QUERIES[n].oracle
    )
    assert not no_oracle, f"fast reps without oracles: {no_oracle}"
    fast_tags = {t for n in FAST_REPRESENTATIVES for t in ALL_QUERIES[n].tags}
    uncovered = sorted(
        (n, REGISTRY[n].tags)
        for n, s in REGISTRY.items()
        if not (set(s.tags) & fast_tags)
    )
    assert not uncovered, (
        f"driver-window families with no fast-lane representative: "
        f"{uncovered}"
    )


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.fast)
        if n in FAST_REPRESENTATIVES
        else n
        for n in ORACLE_QUERIES
    ],
)
def test_query_matches_oracle(spark, sf_smoke, name):
    results = run_differential(spark, sf_smoke, names=[name])
    problems = results[name]
    assert not problems, "\n".join(str(p) for p in problems)


# Heavier extras whose candidate generation / key skew only becomes
# non-trivial above toy scale: re-verify at the driver's sf0.01 (the
# full REGISTRY∪EXTRAS sweep above stays at sf0.001 for suite speed —
# the DRIVER gate covers REGISTRY at sf0.01, this covers the extras
# that would otherwise never see that scale in CI).
SCALE_UP_EXTRAS = [
    "dedup_containment_rare_shingle",
    "lm_bigram_perplexity",
    "heavy_hitters_terms",
    "span_dedup_reconstruct",
    "inverted_index_postings",
    "incremental_dedup_against_corpus",
    "incremental_fuzzy_dedup_vs_store",
    "quality_classifier_scores",
    "source_vocab_overlap",
    "training_shuffle_interleave",
    # round 14: the σ-flagging arm only sees non-trivial spread above
    # toy scale
    "unigram_logprob_quality",
]


@pytest.mark.parametrize(
    "name", [n for n in SCALE_UP_EXTRAS if n in ALL_QUERIES and ALL_QUERIES[n].oracle]
)
def test_extra_matches_oracle_at_driver_scale(spark, sf_correct, name):
    results = run_differential(spark, sf_correct, names=[name])
    problems = results[name]
    assert not problems, "\n".join(str(p) for p in problems)


def test_rows_only_queries_run(spark, sf_smoke):
    """Queries without an oracle must at least execute and return a
    stable schema."""
    for name, spec in REGISTRY.items():
        if spec.oracle:
            continue
        df = spec.builder(spark, sf_smoke)
        assert df.columns, name
        df.limit(5).collect()
