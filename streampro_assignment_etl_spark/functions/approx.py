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
