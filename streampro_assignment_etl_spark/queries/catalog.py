"""Declared-query registry.

Every operator from SURVEY.md §2 is declared here as a QuerySpec:
a Spark DataFrame builder plus (where SQL-expressible) an equivalent
DuckDB oracle SQL string over the same parquet tables. The driver runs
both sides at sf0.01 and hash-compares (see /root/repo/__spark_entry__.py).

Conventions that keep the hash green:
  * every computed column is aliased identically on both sides;
  * date/timestamp outputs are rendered as strings (the reference also
    models dates as strings, SURVEY §1.3);
  * money aggregations go through DECIMAL (functions/exact.py);
  * every query has a total deterministic ORDER BY (ties broken by keys).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = ()
    headline: bool = False  # included in bench.py


# Driver-facing registry: exposed through __spark_entry__.queries().
# The grading driver evaluates AT MOST 50 entries (registration order),
# so this dict is curated to one representative per operator family and
# capped — tests/test_registry.py pins the cap.
REGISTRY: dict[str, QuerySpec] = {}

# Persisted-frame bookkeeping: a few builders cache small mid-plan
# frames (e.g. sp_q2/sp_q3 user-grain folds). The builder contract
# returns a LAZY DataFrame, so the builder itself can never unpersist —
# instead every harness (driver wrapper, oracle differential, bench)
# calls release_persisted() between queries so a session that runs the
# whole registry doesn't accumulate cached frames for its lifetime.
_PERSISTED: list[DataFrame] = []


def track_persist(df: DataFrame, level) -> DataFrame:
    """persist(level) + register for release_persisted()."""
    df.persist(level)
    _PERSISTED.append(df)
    return df


def release_persisted() -> None:
    """Unpersist every tracked frame (idempotent, never raises)."""
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — session may already be gone
            pass

# Local-only registry: redundant operator representatives whose families
# already have a driver-checked row in REGISTRY (e.g. topk_orders vs
# sort_nulls_last's LIMIT). Same oracle discipline, verified by the SAME
# local differential harness (tests/test_oracle_parity.py runs
# REGISTRY | EXTRAS) — just not driver-window spend.
EXTRAS: dict[str, QuerySpec] = {}


def query(
    name: str,
    *,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    headline: bool = False,
    extra: bool = False,
) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        target = EXTRAS if extra else REGISTRY
        target[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            doc=fn.__doc__ or "",
            tags=tags,
            headline=headline,
        )
        return fn

    return deco
