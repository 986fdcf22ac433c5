"""Turn Spark physical plans into assertable facts.

Parses ``explain``-style output of a DataFrame's executed plan. String
parsing is the stable public surface Spark offers for this (the plan
tree itself is JVM-private); the regexes target the formatted-explain
labels that have been stable across Spark 3.x/4.x.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, formatted: bool = True) -> str:
    """The physical plan (pre-execution; AQE nodes unresolved)."""
    qe = df._jdf.queryExecution()
    if formatted:
        jvm = df.sparkSession._jvm
        return jvm.PythonSQLUtils.explainString(qe, "formatted")
    return qe.executedPlan().toString()


def parquet_scan_count(df: DataFrame) -> int:
    """Number of distinct parquet scan nodes in the plan (counted on the
    formatted detail section — the tree section repeats each node)."""
    return len(re.findall(r"^\(\d+\) Scan parquet", plan_string(df), re.M))


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) nodes, excluding broadcasts."""
    return len(re.findall(r"^\(\d+\) Exchange\b", plan_string(df), re.M))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan_string(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (predicate pushdown proof).

    Empty list means the scan reads everything and filtering happens
    post-scan — usually a bug at 100 TB.
    """
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column sets each parquet scan actually reads (column-pruning
    proof): one list per scan node. A scan reading every table column
    for a two-column projection means pruning failed."""
    scans: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_string(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans
