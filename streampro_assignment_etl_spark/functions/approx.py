"""Approximate aggregates — the sketch-based 100 TB paths.

Exact medians/distincts in this repo exist as correctness anchors
(e.g. `doc_length_percentiles` computes a discrete median via
ROW_NUMBER); these wrappers are what actually runs at scale:

* ``approx_quantiles_by`` — t-digest/GK-style percentile_approx: one
  pass, bounded memory per group (`accuracy` trades memory for error;
  1/accuracy is the worst-case rank error fraction).
* ``approx_distinct_by`` — HyperLogLog++ NDV (`rsd` relative standard
  deviation, default 5%); sketch size ~ (1.04/rsd)^2 registers per
  group, mergeable map-side.

Neither is oracle-hashable (DuckDB's sketches differ), so their gates
are tolerance tests against the exact anchors (tests/test_approx.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantiles: (group_cols..., q_<pct> ...)."""
    aggs = [
        F.percentile_approx(value_col, q, accuracy).alias(f"q_{int(q * 100)}")
        for q in quantiles
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def approx_distinct_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    rsd: float = 0.05,
) -> DataFrame:
    """Per-group approximate NDV: (group_cols..., approx_distinct)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    )


def mg_candidates(terms: DataFrame, term_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries (k counters) via one
    Arrow-batched ``mapInPandas`` pass: ≤ k candidate terms per
    partition, each partition's error ≤ its row count / (k+1).

    Vectorized MG: each batch folds in through ``value_counts`` (C
    speed), then the summary trims back to k counters by subtracting
    the (k+1)-th largest count from all and dropping non-positives —
    the standard mergeable-summaries trim [Misra & Gries 1982; Agarwal
    et al. 2012], which preserves the guarantee that any term with true
    partition count > partition_rows/(k+1) survives with a positive
    counter. No per-row Python loop anywhere."""
    import pandas as pd

    def summarize(batches):
        counts = pd.Series(dtype="float64")
        for pdf in batches:
            counts = counts.add(pdf[term_col].value_counts(), fill_value=0)
            if len(counts) > k:
                counts = counts - counts.nlargest(k + 1).iloc[-1]
                counts = counts[counts > 0]
        yield pd.DataFrame({term_col: counts.index.astype(str)})

    return terms.mapInPandas(summarize, schema=f"{term_col} string")


def heavy_hitters_exact(df: DataFrame, term_col: str, k: int) -> DataFrame:
    """EXACT φ-heavy hitters (terms with count·k > N, i.e. frequency
    above N/k) in two bounded-memory passes — the sketch path that
    stays oracle-exact:

    1. ``mg_candidates`` per partition → union is ≤ k·partitions rows
       (tiny, bounded by construction — the broadcast hint is safe
       here, unlike on data-dependent sets). MG's superset guarantee:
       every true global heavy hitter survives in ≥1 partition summary.
    2. One exact count pass restricted to candidates (left-semi prune
       pushed below the scan), then the integer filter cnt·k > N.

    Because step 2 re-counts exactly and MG guarantees a candidate
    SUPERSET, the output equals the exact heavy-hitter set — no
    approximation reaches the result, only the candidate pruning.
    The exact alternative shuffles every distinct term; this shuffles
    candidates only. N is one map-side count job.

    NULL terms are excluded consistently — from the candidates (pandas
    value_counts skips NaN), from the recount, AND from N — so the
    contract is "heavy hitters among non-null terms"; a plain groupBy
    would instead keep a null group, and silently counting nulls in N
    but never in the output would be neither semantics."""
    terms = df.select(term_col).filter(F.col(term_col).isNotNull())
    cand = mg_candidates(terms, term_col, k).distinct()
    total = terms.count()
    return (
        terms.join(F.broadcast(cand), term_col, "left_semi")
        .groupBy(term_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(total))
        .orderBy(F.desc("cnt"), term_col)
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog: a deterministic, ENGINE-PORTABLE HLL whose
# register table is plain rows — unlike approx_count_distinct's opaque
# binary sketch (not oracle-hashable, see module docstring), this one
# replays bit-exactly in DuckDB SQL, so the NDV pipeline itself can sit
# behind the differential gate. Flajolet et al. 2007 geometry: p=6 →
# m=64 registers, rho over the remaining 54 hash bits, sigma ≈ 1.04/√64
# ≈ 13%.
# ---------------------------------------------------------------------------
HLL_M = 64  # registers (p = 6)
_HLL_FIELD = 54  # rho field: the 60-bit md5 hash minus 6 bucket bits
_HLL_ALPHA = 0.709  # alpha_64


def hll_register_rows(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """(group_cols..., j, r): per-group HLL registers as PLAIN ROWS —
    the persistable, MERGEABLE sketch form. r is the max first-1-bit
    rank of the 54-bit suffix of ``token_hash60(value)`` among values
    landing in register j; merging two register tables (same value
    universe or not) is ``groupBy(group, j).agg(max(r))`` — the 100 TB
    shape: per-partition/per-day sketches are m-row tables merged
    without re-scanning, and the group×64-row result is KB-sized at
    any corpus size. The max aggregate is map-side combined, so the
    shuffle carries at most m rows per group per task.

    The rank uses ``length(bin(x))`` for bit-length — identical
    minimal-width semantics in Spark and DuckDB — so an oracle replays
    registers bit-exactly (the whole point vs approx_count_distinct)."""
    from ..operators.simhash import token_hash60

    h = token_hash60(F.col(value_col))
    h2 = F.shiftright(h, 6)  # exact integer >> — never a double divide
    rho = F.when(h2 == 0, F.lit(_HLL_FIELD + 1)).otherwise(
        _HLL_FIELD + 1 - F.length(F.bin(h2))
    )
    return (
        df.select(*group_cols, (h % HLL_M).cast("int").alias("j"), rho.alias("rho"))
        .groupBy(*group_cols, "j")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols..., hll_ndv): the HLL estimate from a register table.

    All-integer until the last step: the harmonic sum is
    SUM(1 << (55 - r)) + V·(1 << 55) — exact BIGINT (max 64·2^55 =
    2^61), never a float sum whose addition ORDER could differ between
    engines — and only the final alpha·m²·2^55/isum division goes
    through doubles. Small-range correction (linear counting
    m·ln(m/V) when E ≤ 2.5m and V > 0) per the paper."""
    one = F.lit(1).cast("long")
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_present"),
        # shiftleft's amount arg must be a plan-time int in the Python
        # API; the per-row shift goes through SQL text instead
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_FIELD + 1} - r)")
        ).alias("_s"),
    )
    v = HLL_M - F.col("_present")
    isum = F.col("_s") + v.cast("long") * F.shiftleft(one, _HLL_FIELD + 1)
    e_raw = (
        F.lit(_HLL_ALPHA * HLL_M * HLL_M)
        * F.shiftleft(one, _HLL_FIELD + 1).cast("double")
        / isum.cast("double")
    )
    est = F.when(
        (e_raw <= 2.5 * HLL_M) & (v > 0), F.lit(float(HLL_M)) * F.log(HLL_M / v)
    ).otherwise(e_raw)
    return agg.select(*group_cols, est.alias("hll_ndv"))


# ---------------------------------------------------------------------------
# Portable count-min sketch: the frequency companion to the portable
# HLL above — d×w integer counters as plain rows, deterministic
# md5-seeded hashes, so the sketch replays bit-exactly in SQL. Merge is
# cell-wise SUM (vs the HLL's MAX); estimates upper-bound true counts
# by construction (Cormode & Muthukrishnan 2005).
# ---------------------------------------------------------------------------
CMS_D = 4  # hash rows
CMS_W = 256  # buckets per row; overestimate ~ 2N/w per row, min over d rows


def _cms_bucket(value: Column, i: int) -> Column:
    """Row-i bucket of a value: md5-derived 60-bit hash under the
    ':cms:' seed family, mod w — engine-portable like token_hash60."""
    from ..operators.simhash import token_hash60

    return (token_hash60(F.concat(F.lit(f"{i}:cms:"), value)) % CMS_W).cast("int")


def cms_counter_rows(
    df: DataFrame, value_col: str, group_cols: list[str] | tuple[str, ...] = ()
) -> DataFrame:
    """(group_cols..., row_i, bucket, c): the count-min counter table as
    plain rows — at most d·w rows (1024 here) per group regardless of
    input size, built by one map-side-combined aggregate over d stacked
    bucket assignments per occurrence. Persist it per source/day
    (``group_cols`` keys the partition axis) and merge by
    ``groupBy(row_i, bucket).sum(c)`` — exact associative integer
    merge, the same compose-without-rescanning contract as
    ``hll_register_rows``."""
    stacked = df.select(
        *group_cols,
        F.posexplode(
            F.array(*[_cms_bucket(F.col(value_col), i) for i in range(CMS_D)])
        ).alias("row_i", "bucket"),
    )
    return stacked.groupBy(*group_cols, "row_i", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def cms_estimate(counters: DataFrame, probes: DataFrame, value_col: str) -> DataFrame:
    """Point-frequency estimates for ``probes[value_col]``: min over the
    d counter rows each probe hashes into — never below the true count,
    above it only through hash collisions. The probe side re-derives
    its d buckets map-side and equi-joins the (≤ d·w)-row counter table
    (broadcast by AQE), so estimating costs O(probes), not O(corpus)."""
    probe_rows = probes.select(
        F.col(value_col),
        F.posexplode(
            F.array(*[_cms_bucket(F.col(value_col), i) for i in range(CMS_D)])
        ).alias("row_i", "bucket"),
    )
    return (
        probe_rows.join(counters, ["row_i", "bucket"])
        .groupBy(value_col)
        .agg(F.min("c").alias("cms_n"))
    )


# ---------------------------------------------------------------------------
# Portable bottom-k quantile sketch (hash-ordered uniform sample).
# Completes the replayable sketch trio: HLL (distinct) + CMS
# (frequency) + bottom-k (quantiles). Published technique: bottom-k /
# coordinated sampling (Cohen & Kaplan, "Summarizing data using
# bottom-k sketches", PODC 2007) — the k rows whose md5(id) hashes are
# SMALLEST form a uniform sample of the id population that is (a)
# deterministic, so DuckDB replays it bit-exactly (the property
# percentile_approx's opaque GK/t-digest state can never have), and
# (b) MERGEABLE: the bottom-k of a union is the bottom-k of the
# concatenated per-partition bottom-k tables — per-day sketches are
# k-row tables merged without re-scanning, the same 100 TB shape as
# the HLL register and CMS counter tables.
# ---------------------------------------------------------------------------
BOTTOMK_K = 256  # default sample size: rank error ~ 1/sqrt(k) ≈ 6%


def bottomk_sample_rows(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    value_col: str,
    k: int = BOTTOMK_K,
    scale_safe: bool = True,
) -> DataFrame:
    """(group_cols..., hkey, v): per-group bottom-k sample as PLAIN
    ROWS — the persistable, mergeable quantile sketch. ``hkey`` is
    md5 of the id rendered as a string (hex text compares identically
    in Spark and DuckDB); keeping it in the sketch is what makes the
    merge a pure re-truncation. ``v`` is the value cast to BIGINT —
    integer-valued metrics only (token counts, byte sizes, latencies
    in µs), keeping every downstream comparison exact cross-engine.

    ``scale_safe=True`` (default) is the two-phase bottom-k (same
    shape as ``per_source_topn``): a first window over
    ``(group, spark_partition_id())`` prunes each input partition to
    its LOCAL bottom-k — no partition of the corpus ever sorts in one
    task — then the global window ranks only the ≤ k·n_partitions
    survivors. Sound because bottom-k is itself the merge operator:
    the global bottom-k of a union is the bottom-k of the
    concatenated local bottom-k's, the exact identity ``bottomk_merge``
    is built on. ``False`` is the literal single-window form the
    oracle replays; bit-equality pinned in tests/test_approx.py."""
    from pyspark.sql.window import Window

    rows = df.select(
        *group_cols,
        F.md5(F.col(id_col).cast("string")).alias("hkey"),
        F.col(value_col).cast("long").alias("v"),
    )
    if scale_safe:
        local = Window.partitionBy(
            *group_cols, F.spark_partition_id()
        ).orderBy("hkey")
        rows = (
            rows.withColumn("_lrn", F.row_number().over(local))
            .filter(F.col("_lrn") <= k)
            .drop("_lrn")
        )
    w = Window.partitionBy(*group_cols).orderBy("hkey")
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def bottomk_merge(
    samples: DataFrame, group_cols: list[str], k: int = BOTTOMK_K
) -> DataFrame:
    """Merge sketch algebra: the bottom-k of a UNION of sample tables
    is the k hash-smallest rows of their concatenation — groupBy-free
    (one window), KB-scale inputs, bit-equal to sketching the unioned
    raw data directly (pinned). Feed it the union of per-day /
    per-partition ``bottomk_sample_rows`` outputs."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy("hkey")
    return (
        samples.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def bottomk_quantiles(
    samples: DataFrame,
    group_cols: list[str],
    bps: tuple[int, ...] = (5000, 9000, 9900),
) -> DataFrame:
    """(group_cols..., sample_n, p<bp/100>...): quantile estimates from
    a bottom-k sample table. The index rule is ALL-INTEGER — for
    basis-points q over a sorted sample of n values, the estimate is
    the value at zero-based rank (q·(n−1)) div 10000 — because 0.9 and
    0.99 have no exact binary representation and a float multiply
    could round the boundary rank differently per engine. Ties break
    by hkey, so the pick is deterministic even with duplicate values.
    Cost: the sample is ≤ k rows per group — this aggregate is
    KB-scale however big the corpus was."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*group_cols).orderBy("v", "hkey")
    wn = Window.partitionBy(*group_cols)
    t = samples.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(wn)
    )
    aggs = [
        F.max(
            F.when(
                F.col("_rn")
                == F.expr(f"CAST(({bp} * (_n - 1)) DIV 10000 AS INT) + 1"),
                F.col("v"),
            )
        ).alias(f"p{bp // 100}")
        for bp in bps
    ]
    return t.groupBy(*group_cols).agg(
        F.max("_n").cast("long").alias("sample_n"), *aggs
    )


# ---------------------------------------------------------------------------
# Portable Bloom filter: the MEMBERSHIP sketch completing the replayable
# family — HLL (distinct) + CMS (frequency) + bottom-k (quantiles) +
# Bloom (set membership). Bloom 1970 geometry: k deterministic
# md5-seeded probes over an m-bit array packed into 64-bit words as
# PLAIN ROWS (word, bits), so the sketch replays bit-exactly in SQL
# (unlike Spark's internal runtime BloomFilter, which is an opaque JVM
# object). Merge is word-wise bitwise OR (vs the HLL's MAX and the
# CMS's SUM): same-universe sketches compose without re-scanning —
# bloom(A ∪ B) == OR-merge(bloom(A), bloom(B)), bit-equal, pinned.
# No false negatives by construction; false positives at rate
# ≈ (1 - e^(-k·n/m))^k — ~0.1% at n=4k grams under the defaults here.
# ---------------------------------------------------------------------------
BLOOM_WORDS = 1024  # packed words in the bit array
BLOOM_BPW = 60  # bits per word: shifts stay <= 59, so 1::BIGINT << bit
#                 never touches the sign bit in EITHER engine (DuckDB
#                 errors on signed overflow where Spark wraps silently)
BLOOM_K = 7  # probes per key
BLOOM_BITS = BLOOM_WORDS * BLOOM_BPW


def _bloom_hash(value: Column) -> Column:
    """ONE engine-portable 60-bit hash per value under the 'bloom:'
    seed; all k probe positions derive from it arithmetically
    (Kirsch-Mitzenmacher double hashing: h1 = low 30 bits, stride
    h2 = 2*(h >> 30) + 1 forced odd, pos_i = (h1 + i*h2) mod m; max
    h1 + 6*h2 < 2^35, BIGINT-safe in both engines).

    Why one hash instead of k seeded hashes, and why the callers wrap
    it in a single-element ``transform`` lambda: Spark does NOT
    eliminate common subexpressions inside a predicate, so an
    expression that references the hash k times pays k md5+conv
    evaluations per row — measured 12 s/2M rows vs 1.4 s for the
    lambda-bound form (SCALE.md "bloom gate postmortem"). A transform
    lambda's variable is evaluated once and referenced freely — the
    only expression-level eval-once seam Spark offers."""
    from ..operators.simhash import token_hash60

    return token_hash60(F.concat(F.lit("bloom:"), value))


def _bloom_positions(h: Column, words: int) -> list[Column]:
    """The k probe bit positions from an ALREADY-EVALUATED hash column
    (a transform lambda variable — see ``_bloom_hash``). NOTE the
    geometry is part of the position domain: arrays built under
    different ``words`` are different sketches and must never be
    OR-merged (same rule as the LSH store's geometry fence)."""
    bits_m = words * BLOOM_BPW
    h1 = h % (1 << 30)
    h2 = 2 * F.shiftright(h, 30) + 1
    return [(h1 + F.lit(i).cast("long") * h2) % bits_m for i in range(BLOOM_K)]


def bloom_word_rows(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | tuple[str, ...] = (),
    words: int = BLOOM_WORDS,
) -> DataFrame:
    """(group_cols..., word, bits): the Bloom bit array as plain rows —
    at most ``words`` rows per group regardless of input size, built
    by one map-side-combined BIT_OR aggregate over k stacked probe
    positions per occurrence (duplicate inserts are free: OR is
    idempotent, so no pre-distinct shuffle is ever needed). Persist per
    source/day and merge by ``groupBy(word).agg(bit_or(bits))`` — the
    same compose-without-rescanning contract as the other three
    sketches.

    Size ``words`` to the insert count: ~10-15 bits/key for sub-1% FP
    (m = words·60 bits; FP ≈ (1 − e^(−k·n/m))^k). The default fits
    ~4-6k keys; a million-gram benchmark suite wants words ≈ 2^17
    (1 MB array — still a plan literal, still KB-per-task amortized)."""
    posarr = F.element_at(
        F.transform(
            F.array(_bloom_hash(F.col(value_col))),
            lambda h: F.array(*_bloom_positions(h, words)),
        ),
        1,
    )
    stacked = df.select(*group_cols, F.explode(posarr).alias("pos")).select(
        *group_cols,
        F.expr(f"CAST(pos DIV {BLOOM_BPW} AS INT)").alias("word"),
        # per-row shift amount -> through SQL text (the Python API's
        # shiftleft takes a plan-time int only, see hll_estimate)
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_BPW} AS INT))"
        ).alias("mask"),
    )
    return stacked.groupBy(*group_cols, "word").agg(F.bit_or("mask").alias("bits"))


def bloom_merge(*tables: DataFrame) -> DataFrame:
    """OR-merge word tables: bloom of the union of the inserted sets.
    Pure sketch algebra — KB-scale, never re-scans any corpus."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), tables)
    return u.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_array(word_rows: DataFrame, words: int = BLOOM_WORDS) -> list[int]:
    """Collect a (word, bits) table into a dense ``words``-long int
    list — the driver-side form ``bloom_member`` inlines as a plan
    literal. Bounded by contract: the table never exceeds ``words``
    rows, the same bounded-collect license as
    ``epoch_shuffle_positions``'s offset map."""
    arr = [0] * words
    for r in word_rows.select("word", "bits").collect():
        arr[int(r["word"])] = int(r["bits"])
    return arr


def _bloom_member_cond(arr_col: Column, value: Column, words: int) -> Column:
    """Membership condition given the Bloom array as a COLUMN (literal
    or broadcast-joined): one hash via the transform-lambda eval-once
    seam (see ``_bloom_hash``), k arithmetic probes, k bit tests."""
    pow2 = F.lit([1 << b for b in range(BLOOM_BPW)]).cast("array<bigint>")

    def _member(h: Column) -> Column:
        cond = None
        for pos in _bloom_positions(h, words):
            word_ix = F.floor(pos / BLOOM_BPW).cast("int") + 1  # 1-based
            mask = F.element_at(pow2, (pos % BLOOM_BPW).cast("int") + 1)
            ok = F.element_at(arr_col, word_ix).bitwiseAND(mask) != 0
            cond = ok if cond is None else (cond & ok)
        return cond

    return F.element_at(F.transform(F.array(_bloom_hash(value)), _member), 1)


# Literal arrays stop being cheap around here: element_at on a plan-
# LITERAL array measured O(size)-ish per row (65k words = 8x the 1k
# cost), while the same array as a broadcast COLUMN (UnsafeArrayData)
# is O(1) — 65k words ran FASTER than the 1k literal. SCALE.md "bloom
# gate postmortem" has the numbers.
BLOOM_LITERAL_MAX_WORDS = 4096


def bloom_member(value: Column, arr: list[int]) -> Column:
    """Boolean membership test against an INLINED Bloom array — a pure
    ZERO-SHUFFLE, ZERO-JOIN projection: one md5 probe, k array lookups,
    k bit tests, all map-side; the sketch rides the plan itself as ONE
    ``F.lit(list)`` literal. False positives possible (rate above),
    false negatives never.

    Right for arrays up to ~``BLOOM_LITERAL_MAX_WORDS`` words; beyond
    that, plan-literal element access costs O(words) per row (measured,
    SCALE.md) — use ``bloom_filter_members``, which switches to a
    broadcast-column array with O(1) access, still shuffle-free."""
    arr_lit = F.lit([int(x) for x in arr]).cast("array<bigint>")
    return _bloom_member_cond(arr_lit, value, len(arr))


def bloom_filter_members(
    df: DataFrame, value_col: str, arr: list[int], keep: bool = True
) -> DataFrame:
    """Filter ``df`` to rows whose ``value_col`` tests Bloom-member
    (``keep=True``) or non-member (``keep=False`` — the dedup/
    decontamination drop direction). Auto-selects the array transport:
    plan literal below ``BLOOM_LITERAL_MAX_WORDS`` (zero-join plan),
    broadcast one-row frame above it (one broadcast of the array,
    zero shuffle, O(1) element access) — both measured in SCALE.md."""
    if len(arr) <= BLOOM_LITERAL_MAX_WORDS:
        cond = bloom_member(F.col(value_col), arr)
        return df.filter(cond if keep else ~cond)
    side = df.sparkSession.createDataFrame(
        [([int(x) for x in arr],)], "_bloom_arr: array<bigint>"
    )
    cond = _bloom_member_cond(F.col("_bloom_arr"), F.col(value_col), len(arr))
    return (
        df.crossJoin(F.broadcast(side))
        .filter(cond if keep else ~cond)
        .drop("_bloom_arr")
    )
