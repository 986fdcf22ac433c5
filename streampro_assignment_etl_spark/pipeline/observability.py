"""In-flight data-quality accounting via Spark ``Observation`` metrics.

The reference pipeline reports row counts by re-counting after the
write (raw_to_trusted_processor.py's ProcessingResult metadata — a
second pass over the data). Spark's observe API attaches aggregate
metrics to a plan node and collects them as a side effect of the ONE
action that already runs — at 100 TB the difference between "free
accounting" and "double-scan accounting". Metrics ride the executor →
driver heartbeat, so they cost no extra job, no extra scan, and no
shuffle.

Scope note: ``Observation`` works for batch queries; for streams the
same ``df.observe(name, *exprs)`` form surfaces per-batch metrics on
the ``StreamingQueryProgress.observedMetrics`` map instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality(
    df: DataFrame,
    null_cols: list[str] | None = None,
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics to ``df``.

    Returns ``(observed_df, observation)``: run ANY single action on
    ``observed_df`` (write, count, collect), then read
    ``observation.get`` — ``{"rows": n, "nulls_<col>": n, ...}`` —
    without a second pass. One action per Observation: Spark fixes the
    metrics at the first action's completion.
    """
    null_cols = null_cols or []
    obs = Observation(name)
    exprs = [F.count(F.lit(1)).alias("rows")] + [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}") for c in null_cols
    ]
    return df.observe(obs, *exprs), obs


def quality_gate(metrics: dict, max_null_fraction: float, cols: list[str]) -> list[str]:
    """Evaluate observed metrics against a null-fraction budget; returns
    the violations (empty = pass). Pure function of the metrics dict so
    it is trivially testable and reusable against streaming
    ``observedMetrics`` rows."""
    rows = metrics.get("rows", 0)
    problems = []
    for c in cols:
        nulls = metrics.get(f"nulls_{c}", 0)
        if rows and nulls / rows > max_null_fraction:
            problems.append(
                f"{c}: {nulls}/{rows} null rows exceeds {max_null_fraction:.1%}"
            )
    return problems
