"""Differential tests: every declared query must match its DuckDB oracle
exactly (this mirrors the driver's t2 gate at sf0.01)."""

from __future__ import annotations

import pytest

from streampro_assignment_etl_spark.oracle import run_differential
from streampro_assignment_etl_spark.queries import EXTRAS, REGISTRY

ALL_QUERIES = {**REGISTRY, **EXTRAS}
ORACLE_QUERIES = sorted(n for n, s in ALL_QUERIES.items() if s.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_smoke, name):
    results = run_differential(spark, sf_smoke, names=[name])
    problems = results[name]
    assert not problems, "\n".join(str(p) for p in problems)


def test_rows_only_queries_run(spark, sf_smoke):
    """Queries without an oracle must at least execute and return a
    stable schema."""
    for name, spec in REGISTRY.items():
        if spec.oracle:
            continue
        df = spec.builder(spark, sf_smoke)
        assert df.columns, name
        df.limit(5).collect()
