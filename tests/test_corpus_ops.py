"""Corpus-op edge cases beyond the sf0.01 differential (which runs in
test_oracle_parity.py): adversarial text shapes for the span-dedup
reconstruction, where Spark and DuckDB string semantics could plausibly
diverge (empty docs, boundary span counts, multi-space runs, trailing
separators, whole-doc and within-doc repeats)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from streampro_assignment_etl_spark.queries import EXTRAS

# Exactly _SPAN_WORDS-aligned and ragged word counts, built on the
# operator's k=8.
W8 = "w1 w2 w3 w4 w5 w6 w7 w8"
ADVERSARIAL_DOCS = [
    (0, W8 + " " + W8.replace("w", "x")),          # exactly 2 spans
    (1, W8 + " tail1 tail2"),                      # ragged 2-word tail; first span dup of doc 0's
    (2, W8 + " " + W8.replace("w", "x")),          # whole-doc repeat of doc 0 → disappears
    (3, "solo"),                                   # < k words, one tiny span
    (4, W8.replace("w", "y") + " " + W8.replace("w", "y")),  # repeats ITS OWN first span (pos 1 cut)
    (5, ""),                                       # empty text → single "" span
    (6, ""),                                       # second empty doc → disappears
    (7, "a  b   c"),                               # multi-space runs (empty-string words)
    (8, "a b c "),                                 # trailing separator
    (9, "  leading"),                              # leading separators
]


def _value_hash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return hashlib.md5(
        "\n".join(
            sorted(repr(tuple(r)) for r in pdf.itertuples(index=False, name=None))
        ).encode()
    ).hexdigest()


@pytest.fixture()
def adversarial_sf(spark, tmp_path):
    """A documents.parquet of adversarial texts shaped like the
    testdata table, usable as an sf_dir by builders and as a DuckDB
    view by oracles."""
    # Sources straddle the incremental-dedup corpus/batch split
    # (src<10 = corpus, src>=10 = arrival batch).
    df = spark.createDataFrame(
        [
            (doc_id, text, "en", "src2" if doc_id < 5 else "src12", len(text))
            for doc_id, text in ADVERSARIAL_DOCS
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.mark.fast
def test_span_dedup_cross_engine_on_adversarial_text(spark, adversarial_sf):
    spec = EXTRAS["span_dedup_reconstruct"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_sf}/documents.parquet/*.parquet')"
    )
    sdf = spec.builder(spark, adversarial_sf).toPandas()
    odf = con.execute(spec.oracle).df()
    assert _value_hash(sdf) == _value_hash(odf)

    got = {int(r.doc_id): (int(r.kept_spans), r.text_dedup) for r in sdf.itertuples()}
    # Whole-doc repeat and the second empty doc vanish entirely.
    assert 2 not in got and 6 not in got
    # Doc 0 keeps both spans verbatim.
    assert got[0] == (2, W8 + " " + W8.replace("w", "x"))
    # Doc 1's first span was already claimed by doc 0; the ragged tail
    # survives alone.
    assert got[1] == (1, "tail1 tail2")
    # Doc 4's self-repeated span is cut once.
    assert got[4] == (1, W8.replace("w", "y"))
    # One of the two empty docs holds the "" span.
    assert got[5] == (1, "")
    # Separator runs reconstruct exactly (empty-string words preserved).
    assert got[7][1] == "a  b   c"
    assert got[8][1] == "a b c "
    assert got[9][1] == "  leading"


def test_incremental_dedup_cross_engine_on_adversarial_text(spark, adversarial_sf):
    """The incremental dedup's fingerprint normalization (whitespace
    collapse + lower) must agree across engines on the same adversarial
    shapes — multi-space docs 7/8 normalize to DIFFERENT fingerprints
    ('a b c' vs 'a b c ' keeps its trailing space collapsed to one)."""
    spec = EXTRAS["incremental_dedup_against_corpus"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_sf}/documents.parquet/*.parquet')"
    )
    sdf = spec.builder(spark, adversarial_sf).toPandas()
    odf = con.execute(spec.oracle).df()
    assert _value_hash(sdf) == _value_hash(odf)


# ---------------------------------------------------------------------------
# Epoch shuffle: rank-computable builder ≡ global-window oracle anchor.
# ---------------------------------------------------------------------------
def _keyed(spark, n, seed="42"):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.md5(F.concat(F.col("id").cast("string"), F.lit(f":{seed}"))).alias("hkey"),
    )


@pytest.mark.parametrize("n,n_partitions", [(500, 32), (500, 7), (500, 1), (3, 8), (0, 4)])
def test_epoch_shuffle_scale_safe_equals_global_window(spark, n, n_partitions):
    """The partition-offset builder must be BIT-EQUAL to the literal
    ``row_number() OVER (ORDER BY hkey, doc_id)`` it replaces — across
    n_partitions shapes including n_partitions=1, more partitions than
    rows (empty ranges), and the empty frame."""
    from streampro_assignment_etl_spark.queries.catalog import release_persisted
    from streampro_assignment_etl_spark.queries.corpus_ops import (
        epoch_shuffle_positions,
    )

    keyed = _keyed(spark, n)
    try:
        fast = epoch_shuffle_positions(keyed, n_partitions=n_partitions).collect()
        anchor = epoch_shuffle_positions(keyed, use_global_window=True).collect()
    finally:
        release_persisted()
    assert fast == anchor
    # pos is a permutation 0..n-1 and the shard is round-robin.
    assert [r["pos"] for r in fast] == list(range(n))
    assert all(r["worker_shard"] == r["pos"] % 8 for r in fast)


def test_epoch_shuffle_query_matches_literal_window_on_adversarial_docs(
    spark, adversarial_sf
):
    """The registered extra (scale-safe default) still replays the
    DuckDB global-window oracle bit-for-bit on a fixture frame."""
    spec = EXTRAS["training_shuffle_interleave"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_sf}/documents.parquet/*.parquet')"
    )
    from streampro_assignment_etl_spark.queries.catalog import release_persisted

    try:
        sdf = spec.builder(spark, adversarial_sf).toPandas()
    finally:
        release_persisted()
    odf = con.execute(spec.oracle).df()
    assert _value_hash(sdf) == _value_hash(odf)


def test_epoch_shuffle_plan_has_no_global_window(spark):
    """The scale guarantee itself: every Window node in the default
    plan is partitioned by pid — no single-task whole-corpus sort."""
    import re

    from streampro_assignment_etl_spark.queries.catalog import release_persisted
    from streampro_assignment_etl_spark.queries.corpus_ops import (
        epoch_shuffle_positions,
    )

    try:
        df = epoch_shuffle_positions(_keyed(spark, 100), n_partitions=8)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        release_persisted()
    windows = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert windows, "expected a per-partition window in the plan"
    assert all(spec.lstrip().startswith("pid") for spec in windows), plan


def test_inverted_index_max_df_cap_bounds_posting_rows(spark):
    """A stopword present in EVERY doc must be dropped by the capped
    builder before its corpus-sized posting row exists, while rarer
    terms keep identical postings to the uncapped index."""
    from streampro_assignment_etl_spark.queries.corpus_ops import (
        build_inverted_index,
    )

    docs = spark.createDataFrame(
        [(i, f"the term{i} shared") for i in range(10)], ["doc_id", "text"]
    )  # 'the' + 'shared' in 10/10 docs, each termN in 1
    capped = {r["term"]: r for r in build_inverted_index(docs).collect()}
    full = {r["term"]: r for r in build_inverted_index(docs, None).collect()}

    assert "the" in full and full["the"]["df"] == 10
    assert "the" not in capped and "shared" not in capped  # df 10 > floor(0.5*10)=5
    assert max(r["df"] for r in capped.values()) <= 5
    for t in capped:
        assert capped[t]["postings"] == full[t]["postings"]


# ---------------------------------------------------------------------------
# Scale-path variants pinned against their oracle-anchored forms.
# ---------------------------------------------------------------------------
def test_hashed_span_key_equals_string_key(spark, adversarial_sf):
    """build_span_dedup(hash_span_key=True) — xxhash64 window key — must
    reproduce the string-keyed anchor bit-for-bit on the adversarial
    fixture AND the sf0.001 documents."""
    from streampro_assignment_etl_spark.queries.corpus_ops import build_span_dedup
    from streampro_assignment_etl_spark.sources.testdata import load_table

    for docs in (
        spark.read.parquet(f"{adversarial_sf}/documents.parquet"),
        load_table(spark, "/root/testdata/sf0.001", "documents"),
    ):
        hashed = build_span_dedup(docs, hash_span_key=True).collect()
        anchor = build_span_dedup(docs, hash_span_key=False).collect()
        assert hashed == anchor


def test_span_intervals_merge_adjacent_and_overlapping_passages(spark):
    """VERDICT r12 Next #4 pins: (a) a run of adjacent duplicate spans
    reports as ONE maximal interval, not per-span rows; (b) two
    duplicated passages copied back-to-back (the overlapping/abutting
    case) collapse into ONE interval covering both; (c) passages
    separated by novel text stay two intervals; (d) hashed and
    string-keyed forms agree; (e) the surviving text equals
    build_span_dedup's — the merge changes the AUDIT, never the cut."""
    from streampro_assignment_etl_spark.queries.corpus_ops import (
        build_span_dedup,
        span_dup_intervals,
    )

    def sp(tag, n):  # n exact 8-word spans with a distinguishing tag
        return " ".join(f"{tag}{i}w{j}" for i in range(n) for j in range(8))

    pass_a, pass_b = sp("a", 3), sp("b", 2)  # 3-span and 2-span passages
    novel = sp("n", 1)
    rows = [
        (0, pass_a),                                   # source of A
        (1, pass_b),                                   # source of B
        # A then B back-to-back: 5 adjacent dup spans -> ONE interval
        (2, pass_a + " " + pass_b),
        # A, novel, B: two intervals split by the novel span
        (3, pass_a + " " + novel + " " + pass_b),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["doc_id"], r["start_pos"], r["end_pos"], r["n_spans"])
        for r in span_dup_intervals(docs, hash_span_key=False).collect()
    ]
    assert got == [
        (2, 0, 4, 5),  # the abutting passages merged into one 5-span cut
        (3, 0, 2, 3),  # A
        (3, 4, 5, 2),  # B, after the kept novel span at pos 3
    ]
    # hashed key form identical
    assert got == [
        (r["doc_id"], r["start_pos"], r["end_pos"], r["n_spans"])
        for r in span_dup_intervals(docs, hash_span_key=True).collect()
    ]
    # cut_text is exactly the passages that were removed
    cuts = {
        (r["doc_id"], r["start_pos"]): r["cut_text"]
        for r in span_dup_intervals(docs, hash_span_key=False).collect()
    }
    assert cuts[(2, 0)] == pass_a + " " + pass_b
    assert cuts[(3, 0)] == pass_a and cuts[(3, 4)] == pass_b
    # reconstruction unchanged: survivors == build_span_dedup's
    kept = {
        r["doc_id"]: r["text_dedup"]
        for r in build_span_dedup(docs, hash_span_key=False).collect()
    }
    assert 2 not in kept  # every span of doc 2 was a duplicate
    assert kept[3] == novel


def test_span_intervals_tile_with_survivors_on_real_corpus(spark):
    """Cross-operator consistency on the sf0.001 documents: for every
    doc, the cut intervals are disjoint, position-ordered, and
    span-count-accounted — kept_spans (build_span_dedup) + Σ n_spans
    (span_dup_intervals) == the doc's total span count — so the two
    views of the same dedup pass tile exactly, with no span counted
    twice or dropped by the island merge."""
    from pyspark.sql import functions as F

    from streampro_assignment_etl_spark.queries.corpus_ops import (
        _SPAN_WORDS,
        build_span_dedup,
        span_dup_intervals,
    )
    from streampro_assignment_etl_spark.sources.testdata import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    total = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.ceil(F.size(F.split("text", " ")) / _SPAN_WORDS).cast("long").alias("n"),
        ).collect()
    }
    kept = {
        r["doc_id"]: r["kept_spans"]
        for r in build_span_dedup(docs, hash_span_key=False).collect()
    }
    cut: dict[int, list] = {}
    for r in span_dup_intervals(docs, hash_span_key=False).collect():
        cut.setdefault(r["doc_id"], []).append(
            (r["start_pos"], r["end_pos"], r["n_spans"])
        )
    assert cut, "fixture has no duplicated spans — tiling check is vacuous"
    for d, n in total.items():
        c = sum(x[2] for x in cut.get(d, []))
        assert kept.get(d, 0) + c == n, (d, kept.get(d, 0), c, n)
        ivs = sorted(cut.get(d, []))
        for (s1, e1, k1), (s2, e2, k2) in zip(ivs, ivs[1:]):
            assert e1 < s2 - 1 or (e1 < s2), (d, ivs)  # disjoint, ordered
        for s, e, k in ivs:
            assert e - s + 1 == k  # contiguous runs exactly
        # maximality: two adjacent intervals would have merged
        for (s1, e1, _), (s2, e2, _) in zip(ivs, ivs[1:]):
            assert s2 > e1 + 1, (d, ivs)


def test_broadcast_model_classifier_equals_literal_and_broadcasts(spark):
    """build_quality_scores(broadcast_model=True) — the 2^20-bucket
    weight-table path — is bit-equal to the literal-array form, and its
    plan joins via BroadcastHashJoin (model ships once per executor,
    no shuffle before the doc aggregate)."""
    from streampro_assignment_etl_spark.queries.corpus_ops import (
        _CLS_WEIGHTS,
        build_quality_scores,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma" * (i % 3 + 1)) for i in range(50)],
        ["doc_id", "text"],
    )
    bcast = build_quality_scores(docs, _CLS_WEIGHTS, broadcast_model=True)
    lit = build_quality_scores(docs, _CLS_WEIGHTS, broadcast_model=False)
    assert bcast.collect() == lit.collect()

    plan = bcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_incremental_dedup_bucketed_corpus_scan_has_no_exchange(spark, tmp_path):
    """The co-located incremental dedup: the corpus fingerprint table is
    bucketed on fingerprint, so its scan satisfies the anti-join's
    distribution — ONLY the batch side exchanges. Results equal the
    plain anti-join."""
    from pyspark.sql import functions as F

    from streampro_assignment_etl_spark.pipeline import catalog_ops as C
    from streampro_assignment_etl_spark.queries.corpus_ops import (
        incremental_dedup_vs_bucketed_corpus,
    )

    corpus_fps = spark.createDataFrame(
        [(f"fp{i:03d}",) for i in range(200)], ["fingerprint"]
    )
    batch = spark.createDataFrame(
        [(1000 + i, f"fp{i:03d}") for i in range(150, 250)],
        ["doc_id", "fingerprint"],
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        C.save_bucketed_table(corpus_fps, "corpus_fps_t", ["fingerprint"], 4,
                              sort_cols=["fingerprint"])
        got = incremental_dedup_vs_bucketed_corpus(spark, batch, "corpus_fps_t")
        plain = (
            batch.join(corpus_fps, "fingerprint", "left_anti")
            .select("doc_id", "fingerprint")
            .orderBy("doc_id")
        )
        assert got.collect() == plain.collect()
        assert got.count() == 50  # fp200..fp249 are new

        plan = got._jdf.queryExecution().executedPlan().toString()
        # AQE renders the final AND the initial plan; assert on the
        # final section only.
        plan = plan.split("== Initial Plan ==")[0]
        # Exactly ONE data exchange (the batch side); the bucketed scan
        # reads its 4 buckets directly. (The top-level orderBy adds a
        # rangepartitioning exchange — excluded by counting only
        # hashpartitioning exchanges.)
        import re

        hash_exchanges = re.findall(r"Exchange hashpartitioning", plan)
        assert len(hash_exchanges) == 1, plan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS corpus_fps_t")


def test_per_source_topn_two_phase_equals_single_window(spark):
    """The skew-safe two-phase top-N must keep EXACTLY the rows of the
    literal per-source window — including under ties on n_chars and a
    mega-source spread across many input partitions."""
    from streampro_assignment_etl_spark.queries.corpus_ops import per_source_topn

    rows = [(i, "mega", 100 - (i % 7)) for i in range(500)]  # heavy ties
    rows += [(1000 + i, f"s{i % 5}", 50 + i) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"]).repartition(16)

    fast = sorted(tuple(r) for r in per_source_topn(docs, n=10).collect())
    anchor = sorted(tuple(r) for r in per_source_topn(docs, n=10, scale_safe=False).collect())
    assert fast == anchor
    assert sum(1 for r in fast if r[1] == "mega") == 10


def test_lateness_block_decomposition_equals_global_window(spark):
    """watermark_lateness_profile's two-level running max must equal the
    literal global window on a frame engineered so late events straddle
    block boundaries (the case the decomposition could get wrong)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # 5000 events, ts mostly increasing but every 13th event arrives
    # ~2 blocks worth of ids late; _LATENESS_BLOCK=1000 → 5 blocks.
    rows = []
    for i in range(5000):
        ts_off = i - (2500 if i % 13 == 0 else 0)
        rows.append((i, "e%d" % (i % 3), ts_off))
    df = spark.createDataFrame(rows, ["event_id", "event_type", "off"]).select(
        "event_id",
        "event_type",
        F.expr("timestampadd(SECOND, off, TIMESTAMP_NTZ'2024-01-01 00:00:00')").alias(
            "ts"
        ),
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="lateness_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")

    from streampro_assignment_etl_spark.queries.streaming_q import (
        watermark_lateness_profile,
    )

    got = {r["event_type"]: tuple(r) for r in watermark_lateness_profile(spark, d).collect()}

    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, 0)
    lat = F.floor(
        (
            F.unix_micros(F.max("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        )
        / 1_000_000
    )
    anchor_df = (
        df.withColumn("_run_max", F.max("ts").over(w))
        .withColumn("_late_s", lat)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("_run_max") > F.col("ts"), 1).otherwise(0)).alias(
                "n_late"
            ),
            F.max("_late_s").alias("max_lateness_sec"),
            F.sum("_late_s").alias("total_lateness_sec"),
        )
        .select(
            "event_type",
            "n_events",
            "n_late",
            F.round(F.col("n_late").cast("double") / F.col("n_events"), 6).alias(
                "late_rate"
            ),
            "max_lateness_sec",
            "total_lateness_sec",
        )
    )
    anchor = {r["event_type"]: tuple(r) for r in anchor_df.collect()}
    assert got == anchor
    assert sum(r[2] for r in got.values()) > 300  # the planted late events


@pytest.mark.parametrize("block", [1, 37, 1000])
def test_lateness_profile_block_invariant(spark, block):
    """build_lateness_profile must give identical results for ANY block
    size — one-row blocks, odd sizes, and a single whole-corpus block
    (which degenerates to the literal global window)."""
    from pyspark.sql import functions as F

    from streampro_assignment_etl_spark.queries.streaming_q import (
        build_lateness_profile,
    )

    rows = [
        (i, "e%d" % (i % 2), i - (700 if i % 11 == 0 else 0)) for i in range(800)
    ]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "off"]).select(
        "event_id",
        "event_type",
        F.expr("timestampadd(SECOND, off, TIMESTAMP_NTZ'2024-01-01 00:00:00')").alias(
            "ts"
        ),
    )
    got = sorted(tuple(r) for r in build_lateness_profile(df, block=block).collect())
    anchor = sorted(tuple(r) for r in build_lateness_profile(df, block=10**9).collect())
    assert got == anchor


def test_bpe_encode_ids_exact(spark):
    """bpe_encode on a tiny corpus: ids are frequency-ranked (dense
    from 0, ties lexicographic), sequences follow document word order,
    and one-char words — excluded from TRAINING (they cannot pair) —
    still encode as single-symbol tokens."""
    from streampro_assignment_etl_spark.queries.corpus_ops import (
        _bpe_learn_rules,
        bpe_encode,
        bpe_token_id_table,
    )

    docs = spark.createDataFrame(
        [(1, "abab ab a"), (2, "ab abab")], "doc_id long, text string"
    )
    learned = _bpe_learn_rules(docs, 1)
    # pair (a,b) dominates: freq(abab)=2 contributes 2 each + freq(ab)=3
    assert [(r[1], r[2]) for r in learned] == [("a", "b")]
    rules = [(r[1], r[2]) for r in learned]

    ids = {
        r["token"]: (r["tid"], r["n"])
        for r in bpe_token_id_table(docs, rules).collect()
    }
    # token counts over ALL words: ab appears 2x alone + 2x2 inside
    # abab = 6; a alone once.
    assert ids["ab"] == (0, 6)
    assert ids["a"] == (1, 1)

    enc = {
        r["doc_id"]: list(r["token_ids"]) for r in bpe_encode(docs, rules).collect()
    }
    assert enc == {1: [0, 0, 0, 1], 2: [0, 0, 0]}


def test_dsir_weights_prefer_target_domain(spark):
    """DSIR's importance weights must actually DO data selection: on the
    sf0.01 fixture with lang='en' as the target domain, en docs carry a
    higher mean per-token log-likelihood ratio than non-en docs, and the
    Gumbel-top-k quarter over-samples the target domain accordingly."""
    out = (
        EXTRAS["dsir_importance_resample"]
        .builder(spark, "/root/testdata/sf0.01")
        .toPandas()
    )
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").toPandas()
    m = out.merge(docs[["doc_id", "lang"]], on="doc_id")
    m["per_tok"] = m["sum_llr"] / m["n_tokens"]
    en = m[m["lang"] == "en"]
    rest = m[m["lang"] != "en"]
    assert en["per_tok"].mean() > rest["per_tok"].mean()
    # selection: at least the K=ceil(n/4) Gumbel-top-k rows, and the
    # sampler over-selects high-weight docs (the lang-level shift is
    # below the Gumbel noise floor on this fixture — langs share most
    # hashed-unigram mass — so the pin is weight-level, not lang-level)
    n = len(m)
    assert m["sampled"].sum() >= -(-n // 4)
    assert m[m["sampled"]]["sum_llr"].mean() > m[~m["sampled"]]["sum_llr"].mean()


def test_bpe_fertility_merges_compress_every_lang(spark):
    """Fertility is only meaningful if the learned merges actually
    compress: with zero merges every char is a token (fertility =
    chars/word, chars_per_token = 1); after the k learned merges each
    lang must sit strictly below that ceiling — and the en-trained
    merges compress en at least as well as the corpus average."""
    rows = (
        EXTRAS["bpe_fertility_by_lang"]
        .builder(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert len(rows) == 5  # en/de/es/fr/zh fixture langs
    for r in rows:
        assert r["n_tokens"] < r["n_chars"]  # some merge applied
        assert r["chars_per_token"] > 1.0
        assert r["fertility"] < r["n_chars"] / r["n_words"]  # below ceiling


# ---------------------------------------------------------------------------
# Positional phrase search: adjacency, overlap, and repeated-term edges.
# ---------------------------------------------------------------------------
def test_phrase_search_adjacency_and_overlap(spark):
    from streampro_assignment_etl_spark.queries.corpus_ops import (
        phrase_match_positions,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b c a b"),        # "a b" twice (pos 0, 3); no "b a" (b->c, b->end)
            (1, "a c b"),            # terms present, NOT adjacent -> no match
            (2, "x x x"),            # repeated-term "x x": overlapping at 0 and 1
            (3, "a b"),              # exact-doc phrase, boundary match at 0
            (4, "b a b a"),          # "a b" at pos 1; "b a" at 0 and 2
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.phrase, r.doc_id): (r.n_matches, r.first_pos)
        for r in phrase_match_positions(
            spark, docs, ("a b", "b a", "x x")
        ).collect()
    }
    assert got == {
        ("a b", 0): (2, 0),
        ("a b", 3): (1, 0),
        ("a b", 4): (1, 1),
        ("b a", 4): (2, 0),
        ("x x", 2): (2, 0),  # overlapping occurrences both count
    }


def test_quoted_span_requires_exact_consecutive_match(spark):
    """The quoted-span gate is positional: a training doc with one
    word changed inside the span, or the span's words shuffled, must
    NOT match; a verbatim quotation anywhere in the doc must."""
    from streampro_assignment_etl_spark.queries.catalog import EXTRAS as _E

    span = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = spark.createDataFrame(
        [
            (0, span + " tail words here"),            # eval doc (0 % 7 == 0)
            (1, "prefix " + span + " suffix"),         # verbatim quote -> flag
            (2, "prefix s1 s2 s3 s4 XX s6 s7 s8 end"), # one word off -> no
            (3, "s8 s7 s6 s5 s4 s3 s2 s1"),            # all words, wrong order
            (4, span + " " + span),                    # quotes it twice
        ],
        ["doc_id", "text"],
    )
    docs.createOrReplaceTempView("___qspan_docs")
    from streampro_assignment_etl_spark.queries.corpus_ops import (
        decontaminate_quoted_spans,
    )
    import streampro_assignment_etl_spark.queries.corpus_ops as co

    # drive the builder body directly on the fixture frame
    orig = co.load_table
    try:
        co.load_table = lambda spark_, sf_, name_: docs
        got = {
            r.doc_id: (r.n_quoted_spans, r.n_eval_docs)
            for r in decontaminate_quoted_spans(spark, "ignored").collect()
        }
    finally:
        co.load_table = orig
    assert got == {1: (1, 1), 4: (2, 1)}, got


def test_unigram_quality_flags_alien_vocabulary_doc(spark, tmp_path):
    """unigram_logprob_quality (round 14): a doc written in vocabulary
    the corpus has never seen scores far below the corpus baseline and
    is the ONLY doc flagged; ordinary docs sharing the common
    vocabulary are not. Uses a synthetic sf_dir so the semantic claim
    is pinned on a known corpus, not just hash-gated on testdata."""
    common = [f"w{i}" for i in range(30)]
    rows = [
        (i, "srcA" if i % 2 else "srcB",
         " ".join(common[(i + j) % 30] for j in range(40)))
        for i in range(40)
    ]
    rows.append((99, "srcB", " ".join(f"zx{j}q" for j in range(40))))
    spark.createDataFrame(rows, ["doc_id", "source", "text"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    from streampro_assignment_etl_spark.queries import EXTRAS

    out = {
        r["source"]: (r["n_docs"], r["n_flagged"])
        for r in EXTRAS["unigram_logprob_quality"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    assert out["srcA"] == (20, 0)
    assert out["srcB"] == (21, 1)  # exactly the alien doc


def test_source_mixture_plan_temperature_boosts_small_sources(spark, tmp_path):
    """source_mixture_plan (round 14): alpha=0.7 damps mega-sources and
    boosts small ones — temp_share > raw_share for the smallest source,
    < for the largest; quotas never exceed a source's docs; the
    md5-ordered selection is deterministic across evaluations."""
    rows = []
    did = 0
    for src, n in [("big", 60), ("mid", 20), ("tiny", 4)]:
        for _ in range(n):
            rows.append((did, src, " ".join(f"w{did}x{j}" for j in range(10))))
            did += 1
    spark.createDataFrame(rows, ["doc_id", "source", "text"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    from streampro_assignment_etl_spark.queries import EXTRAS

    run = lambda: {  # noqa: E731
        r["source"]: r.asDict()
        for r in EXTRAS["source_mixture_plan"].builder(spark, str(tmp_path)).collect()
    }
    out = run()
    assert out["tiny"]["temp_share"] > out["tiny"]["raw_share"]
    assert out["big"]["temp_share"] < out["big"]["raw_share"]
    for s in out.values():
        assert s["selected_docs"] <= s["n_docs"]
        assert s["selected_docs"] == min(s["quota_docs"], s["n_docs"])
    assert run() == out  # deterministic plan + selection
