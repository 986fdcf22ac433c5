"""As-of join (backward): each left row matched to the latest right row
with ``right.ts <= left.ts`` per key — the canonical timeseries join
Spark has no built-in for.

Implementation is the scalable union + window trick, NOT a range join:
tag both sides, union, and take ``last(value, ignorenulls=True)`` over
(key, ts, tag) with an unbounded-preceding row frame. One shuffle + one
sort, O(left + right) rows — a naive ``left.ts >= right.ts`` join would
explode to O(left × right-per-key) before aggregation, which is the
difference between linear and quadratic at 100 TB.

Tie semantics: a right row at exactly left.ts matches (inclusive, same
as DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts`` — right sorts before
left at equal ts via the tag). Callers must ensure at most one right
row per (key, ts) — equal-ts duplicates are nondeterministic in every
as-of engine; dedupe first (see the oracle query for the pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str],
    matched_ts_name: str = "matched_ts",
) -> DataFrame:
    """Left as-of-backward join: left columns + latest-at-or-before
    right values (NULL when no prior right row exists)."""
    left_payload = [c for c in left.columns if c not in (key_col, ts_col)]

    tagged_left = left.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_rts"),
    )
    tagged_right = right.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
        F.col(ts_col).alias("_rts"),
    )

    w = (
        Window.partitionBy(key_col)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_value_cols
        ],
        F.last("_rts", ignorenulls=True).over(w).alias("_m_ts"),
    )
    return carried.filter(F.col("_tag") == 1).select(
        F.col(key_col),
        F.col("_ts").alias(ts_col),
        *[F.col(c) for c in left_payload],
        *[F.col(f"_m_{c}").alias(c) for c in right_value_cols],
        F.col("_m_ts").alias(matched_ts_name),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str],
    matched_ts_name: str = "matched_ts",
) -> DataFrame:
    """Left as-of-FORWARD join: left columns + earliest-at-or-after
    right values (NULL when no later right row exists) — the "next
    event" direction (next maintenance after a failure, next quote
    after an order). Same linear union + window strategy as the
    backward form, mirrored: ``first(value, ignorenulls)`` over a
    current-row→unbounded-FOLLOWING frame, with left ordered before
    right at equal ts so an exactly-simultaneous right row matches
    (inclusive, like DuckDB's ``ASOF JOIN ... ON l.ts <= r.ts``)."""
    left_payload = [c for c in left.columns if c not in (key_col, ts_col)]

    tagged_left = left.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("_rts"),
    )
    tagged_right = right.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
        F.col(ts_col).alias("_rts"),
    )

    w = (
        Window.partitionBy(key_col)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        *[
            F.first(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in right_value_cols
        ],
        F.first("_rts", ignorenulls=True).over(w).alias("_m_ts"),
    )
    return carried.filter(F.col("_tag") == 0).select(
        F.col(key_col),
        F.col("_ts").alias(ts_col),
        *[F.col(c) for c in left_payload],
        *[F.col(f"_m_{c}").alias(c) for c in right_value_cols],
        F.col("_m_ts").alias(matched_ts_name),
    )
