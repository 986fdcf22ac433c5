"""Cross-engine-exact numeric helpers.

The driver's correctness gate hash-compares Spark results against a DuckDB
oracle. Sums of non-integral doubles are order-dependent (Spark's partial
aggregation order varies run to run; DuckDB sums sequentially), so a naive
``SUM(double)`` can differ in the last ulp and flip the hash.

Fix: route money-style columns (fixed 2-decimal data) through DECIMAL.
Decimal aggregation is exact integer arithmetic — order-independent and
identical in both engines — and the final ``CAST(... AS DOUBLE)`` of the
same exact value is bit-identical. The DuckDB oracle SQL applies the same
``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`` shape.

Counts, min/max, and sums of integral doubles (< 2^53) are already exact
everywhere and need no special handling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, scale: int = 4, precision: int = 18) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dec_sum(col: Column | str, scale: int = 4) -> Column:
    """Order-independent SUM over fixed-decimal doubles, as DOUBLE."""
    return F.sum(dec(col, scale)).cast("double")


def dec_avg(col: Column | str, scale: int = 4) -> Column:
    """AVG as exact-decimal-sum / count — deterministic across engines.

    (Plain AVG(double) may use engine-specific accumulation.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale)).cast("double") / F.count(c)


def rnd(col: Column, digits: int) -> Column:
    """ROUND — verified identical (half-away-from-zero on doubles) in
    Spark 4.1 and DuckDB 1.0."""
    return F.round(col, digits)


def pct(num: Column, den: Column, digits: int = 1) -> Column:
    """``ROUND(100.0 * num / den, d)`` — the reference's percentage idiom
    (notebook cells 10/19/20)."""
    return F.round(F.lit(100.0) * num / den, digits)
