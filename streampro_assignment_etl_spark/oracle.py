"""Local differential harness: Spark result vs DuckDB oracle.

Mirrors the driver's t2 gate (BASELINE.json): for each declared query,
run the Spark builder and the DuckDB oracle SQL on the same parquet
tables and compare row count, column names, and values.

The comparison is strict: after sorting columns by name and rows by all
columns, every cell must match exactly (floats bit-for-bit — our queries
are engineered so identical values come out of both engines, see
functions/exact.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from .sources.testdata import TESTDATA_TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


@dataclass
class Mismatch:
    query: str
    kind: str
    detail: str

    def __str__(self) -> str:  # pragma: no cover
        return f"[{self.query}] {self.kind}: {self.detail}"


def _cell_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        return (a == b) or (math.isnan(a) and math.isnan(b))
    # int-vs-float cross-type equality is NOT accepted: the driver's value
    # hash treats 123 and 123.0 as different (see compare_frames dtype gate).
    if isinstance(a, float) != isinstance(b, float):
        return False
    return a == b


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[Mismatch]:
    problems: list[Mismatch] = []
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [Mismatch(name, "columns", f"spark={s_cols} oracle={o_cols}")]
    # Dtype-strict gate: the driver's value hash distinguishes 123 (int64)
    # from 123.0 (float64) even when == holds (round-1 lesson: DuckDB
    # SUM(BIGINT) -> HUGEINT -> float64 flipped 3 hashes while the lenient
    # local compare stayed green). Compare pandas dtype *kinds* per column
    # so local green predicts driver green. int32 vs int64 is fine (same
    # kind 'i'); int vs float / object vs numeric is a failure.
    for col in s_cols:
        sk = spark_pdf[col].dtype.kind
        ok = oracle_pdf[col].dtype.kind
        if sk != ok and not (sk in "iu" and ok in "iu"):
            problems.append(
                Mismatch(
                    name,
                    "dtype",
                    f"col={col}: spark={spark_pdf[col].dtype} oracle={oracle_pdf[col].dtype}",
                )
            )
    if problems:
        return problems
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(
            Mismatch(name, "rowcount", f"spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
        )
        return problems
    s, o = _normalize(spark_pdf), _normalize(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not _cell_equal(a, b):
                problems.append(
                    Mismatch(
                        name,
                        "value",
                        f"col={col} row={i}: spark={a!r} ({type(a).__name__}) "
                        f"oracle={b!r} ({type(b).__name__})",
                    )
                )
                if len(problems) >= 5:
                    return problems
    return problems


def run_differential(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, list[Mismatch]]:
    """Run every oracle-bearing declared query (driver-facing REGISTRY
    plus local-only EXTRAS) on both engines; return per-query mismatch
    lists (empty list = green)."""
    from .queries import EXTRAS, REGISTRY, release_persisted

    con = duckdb_connect(sf_dir)
    results: dict[str, list[Mismatch]] = {}
    for name, spec in {**REGISTRY, **EXTRAS}.items():
        release_persisted()  # free the previous query's tracked caches
        if names and name not in names:
            continue
        if spec.oracle is None:
            continue
        try:
            spark_pdf = spec.builder(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = [Mismatch(name, "spark-error", repr(e)[:500])]
            continue
        try:
            oracle_pdf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            results[name] = [Mismatch(name, "oracle-error", repr(e)[:500])]
            continue
        results[name] = compare_frames(name, spark_pdf, oracle_pdf)
    con.close()
    return results
