"""DuckDB → Spark SQL dialect shim (SURVEY §4).

The reference's workload parses in Spark SQL verbatim except for two
constructs (SPLIT_PART, ``||``, NULLIF, SUBSTRING, ordinal GROUP BY and
NULLS LAST all work as-is):

* ``GROUP_CONCAT(expr ORDER BY key)`` (analysis.ipynb cell 8) —
  Spark has no ordered string agg; rewritten to
  ``array_join(transform(array_sort(collect_list(struct(key, expr))),
  s -> s._gc), ',')`` (sort-by-struct gives the ORDER BY, default
  separator ',' matches DuckDB).
* ``DATE_ADD(d, INTERVAL n DAY)`` (cells 14/20/21) — Spark's
  ``date_add`` takes (date, int).

Plus one type-name mapping: ``CAST(x AS VARCHAR)`` → ``AS STRING``
(Spark only accepts parameterized VARCHAR(n)).

These are expression-level *string* rewrites, not Catalyst rules —
applied before parsing, so everything downstream is stock Spark SQL.
A user of the reference can run their notebook SQL through
``run_duckdb_sql`` unmodified.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def _matching_paren(s: str, open_idx: int) -> int:
    """Index of the ')' closing the '(' at open_idx. Parens inside
    single-quoted string literals AND double-quoted identifiers are
    ignored (SQL's '' / "" doubling degrades to close-then-reopen,
    which is paren-neutral, so no escape tracking is needed)."""
    depth = 0
    quote: str | None = None
    for i in range(open_idx, len(s)):
        c = s[i]
        if quote is not None:
            if c == quote:
                quote = None
            continue
        if c in ("'", '"'):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
    raise ValueError(f"unbalanced parens after index {open_idx}")


def _in_quote(s: str, idx: int) -> bool:
    """Whether ``idx`` falls inside a single-quoted literal or
    double-quoted identifier (quote state scanned from the start; ''/""
    doubling degrades to close-then-reopen, same as _matching_paren)."""
    quote: str | None = None
    for i in range(idx):
        c = s[i]
        if quote is not None:
            if c == quote:
                quote = None
        elif c in ("'", '"'):
            quote = c
    return quote is not None


def _search_unquoted(pattern: str, s: str, pos: int = 0) -> re.Match | None:
    """First case-insensitive match at or after ``pos`` that is NOT
    inside a quoted literal/identifier. The rewrite entry points must
    use this, not bare re.search: a token like ``'DATE_ADD('`` inside a
    string literal would otherwise anchor the paren surgery mid-literal
    and derail it on valid SQL."""
    rx = re.compile(pattern, re.IGNORECASE)
    while True:
        m = rx.search(s, pos)
        if m is None or not _in_quote(s, m.start()):
            return m
        pos = m.start() + 1


def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on a (case-insensitive) separator at paren depth 0,
    skipping quoted strings/identifiers like ``_matching_paren``."""
    parts, depth, last, i = [], 0, 0, 0
    quote: str | None = None
    target = sep.upper()
    while i < len(s):
        c = s[i]
        if quote is not None:
            if c == quote:
                quote = None
            i += 1
            continue
        if c in ("'", '"'):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and s[i : i + len(target)].upper() == target:
            parts.append(s[last:i])
            last = i + len(target)
            i = last
            continue
        i += 1
    parts.append(s[last:])
    return parts


def rewrite_group_concat(sql: str) -> str:
    """``GROUP_CONCAT(expr[, sep] [ORDER BY k1[, k2...]])`` → ordered
    array_join. An explicit separator (second top-level argument before
    the ORDER BY) is honored in the array_join; the default matches
    DuckDB's ','."""
    out = sql
    while True:
        m = _search_unquoted(r"GROUP_CONCAT\s*\(", out)
        if not m:
            return out
        open_idx = m.end() - 1
        close_idx = _matching_paren(out, open_idx)
        body = out[open_idx + 1 : close_idx]
        parts = _split_top_level(body, " ORDER BY ")
        head = [a.strip() for a in _split_top_level(parts[0], ",")]
        if len(head) > 2:
            raise NotImplementedError(
                f"GROUP_CONCAT with {len(head)} arguments is not supported: {body!r}"
            )
        expr, sep = head[0], (head[1] if len(head) == 2 else "','")
        keys = [k.strip() for k in _split_top_level(parts[1], ",")] if len(parts) > 1 else []
        key_fields = ", ".join(f"{k} AS _k{i}" for i, k in enumerate(keys))
        struct_body = f"{key_fields}, {expr} AS _gc" if key_fields else f"{expr} AS _gc"
        repl = (
            f"array_join(transform(array_sort(collect_list("
            f"struct({struct_body}))), s -> s._gc), {sep})"
        )
        out = out[: m.start()] + repl + out[close_idx + 1 :]


def rewrite_date_add_interval(sql: str) -> str:
    """``DATE_ADD(x, INTERVAL n DAY[S])`` →
    ``CAST(date_add(x, n) AS TIMESTAMP)``.

    The TIMESTAMP cast is load-bearing quirk reproduction: DuckDB's
    DATE_ADD(DATE, INTERVAL) returns a TIMESTAMP, so the reference's
    ``CAST(DATE_ADD(...) AS VARCHAR)`` yields '2025-09-10 00:00:00' —
    which never string-EQUALS a bare SUBSTRING(ts,1,10) date (the
    notebook's day-1 retention comparison is silently always-false in
    DuckDB, while its ``<=`` horizon comparisons still work since
    'YYYY-MM-DD' sorts before 'YYYY-MM-DD 00:00:00'). A faithful shim
    must reproduce those strings bit-for-bit, not fix them (SURVEY
    §1.4: broken-but-load-bearing semantics stay).
    """
    out = sql
    pos = 0
    while True:
        m = _search_unquoted(r"DATE_ADD\s*\(", out, pos)
        if not m:
            return out
        open_idx = m.end() - 1
        close_idx = _matching_paren(out, open_idx)
        body = out[open_idx + 1 : close_idx]
        args = _split_top_level(body, ",")
        iv = re.fullmatch(r"\s*INTERVAL\s+(\d+)\s+DAYS?\s*", args[-1], re.IGNORECASE)
        if iv is None:
            # Already Spark-form date_add(d, n); leave untouched — but
            # advance only past the match token (not the closing paren)
            # so a nested DuckDB-form DATE_ADD inside the arguments is
            # still scanned and rewritten.
            pos = m.end()
            continue
        out = (
            out[: m.start()]
            + f"CAST(date_add({','.join(args[:-1]).strip()}, {iv.group(1)}) AS TIMESTAMP)"
            + out[close_idx + 1 :]
        )
        pos = m.start()


def rewrite_varchar_cast(sql: str) -> str:
    """``AS VARCHAR)`` → ``AS STRING)`` (bare VARCHAR casts only;
    occurrences inside string literals are left alone)."""
    out, pos = sql, 0
    while True:
        m = _search_unquoted(r"\bAS\s+VARCHAR\s*\)", out, pos)
        if not m:
            return out
        out = out[: m.start()] + "AS STRING)" + out[m.end() :]
        pos = m.start() + len("AS STRING)")


def rewrite_date_diff(sql: str) -> str:
    """``DATE_DIFF('day', a, b)`` → ``datediff(b, a)``.

    DuckDB's three-argument form counts unit boundaries from a to b;
    Spark's two-argument ``datediff(end, start)`` is day-granular with
    the argument order flipped. Only the 'day' unit maps cleanly, so any
    other unit fails loudly rather than silently changing semantics."""
    out = sql
    pos = 0
    while True:
        m = _search_unquoted(r"\bDATE_DIFF\s*\(", out, pos)
        if not m:
            return out
        open_idx = m.end() - 1
        close_idx = _matching_paren(out, open_idx)
        args = _split_top_level(out[open_idx + 1 : close_idx], ",")
        if len(args) != 3:
            # Spark-form datediff(end, start): leave untouched, scan on.
            pos = close_idx + 1
            continue
        unit = args[0].strip().strip("'\"").lower()
        if unit != "day":
            raise NotImplementedError(f"DATE_DIFF unit {unit!r} has no day-exact Spark mapping")
        a, b = args[1].strip(), args[2].strip()
        out = out[: m.start()] + f"datediff({b}, {a})" + out[close_idx + 1 :]
        pos = m.start()


def duckdb_to_spark_sql(sql: str) -> str:
    """Full shim: every rewrite the reference workload needs."""
    return rewrite_date_diff(
        rewrite_varchar_cast(rewrite_date_add_interval(rewrite_group_concat(sql)))
    )


def run_duckdb_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run reference-dialect (DuckDB) SQL on Spark, views pre-registered."""
    return spark.sql(duckdb_to_spark_sql(sql))
