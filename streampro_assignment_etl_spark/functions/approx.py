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

from pyspark.sql import DataFrame
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
