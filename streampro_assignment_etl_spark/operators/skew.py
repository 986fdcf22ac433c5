"""Skew-mitigation primitives: key salting for aggregations and joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two cases still need explicit salting at 100 TB:

* a single hot KEY inside one aggregation group (AQE can split a
  skewed *partition*, not a skewed *group* — the final combine for one
  key still lands on one task);
* broadcast-unable skewed joins where one key's rows exceed an
  executor.

Salting must be DETERMINISTIC (a task retry must re-derive the same
salt or results silently change): the salt hashes stable row content,
never ``rand()`` / partition id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_expr(cols: list[str], n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts): hash of stable row columns."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    salt_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage sum/count under a salted key: stage 1 aggregates
    (keys, salt) — the hot key's combine work spreads over n_salts
    tasks — stage 2 combines the tiny partials per key. Exact for
    algebraic aggregates (sum/count/min/max)."""
    stage1 = (
        df.withColumn("_salt", salt_expr(salt_cols, n_salts))
        .groupBy(*keys, "_salt")
        .agg(
            F.sum(value_col).alias("_psum"),
            F.count(F.lit(1)).alias("_pcnt"),
        )
    )
    return stage1.groupBy(*keys).agg(
        F.sum("_psum").alias(f"sum_{value_col}"),
        F.sum("_pcnt").alias("n_rows"),
    )


def salted_join_small_right(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Equi-join a skewed big side against a small (but not
    broadcast-able) right side: big rows get a deterministic salt,
    the right side is replicated n_salts times, and the join key
    becomes (key, salt) — the hot key's matches spread across n_salts
    reducers. Row multiplicity is exactly preserved (each big row meets
    each matching small row exactly once, under its own salt)."""
    scols = salt_cols or [c for c in big.columns if c != key]
    big2 = big.withColumn("_salt", salt_expr(scols, n_salts))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    small2 = small.withColumn("_salt", salts)
    return big2.join(small2, [key, "_salt"]).drop("_salt")
