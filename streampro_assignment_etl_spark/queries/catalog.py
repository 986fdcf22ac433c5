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


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    *,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    headline: bool = False,
) -> Callable:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle,
            doc=fn.__doc__ or "",
            tags=tags,
            headline=headline,
        )
        return fn

    return deco
