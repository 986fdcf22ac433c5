"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``streampro_assignment_etl_spark`` — this file
only adapts the query registry to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from streampro_assignment_etl_spark.queries import REGISTRY
from streampro_assignment_etl_spark.session import apply_runtime_confs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001.

    Flagship = the reference's Q2 (dominant-genre retention,
    /root/reference/src/notebooks/analysis.ipynb cell 15): 5-CTE chain
    with the theta horizon join and ROW_NUMBER dominant pick, folded
    into a single-pass GROUPING SETS plan. (Q3 shares the shape but its
    HAVING >= 5-users gate yields zero rows at sf0.001 fixture scale,
    so Q2 is the smoke query that always returns data.)
    """
    apply_runtime_confs(spark)
    return REGISTRY["sp_q2_dominant_genre_retention"].builder(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver-facing registry: 50 entries, one per operator family from
    SURVEY.md §2 / COVERAGE.md, every one oracle-backed — the driver's
    50-entry correctness window exactly spent (pinned in
    tests/test_registry.py; round 5's final slot went to the
    cross-batch streaming stateful dedup, and round 14 swapped three
    redundant relational reps for the flagship
    similarity_ann_ivfpq_index / scd2_apply_changes_converges /
    pagerank_event_transitions). Redundant representatives live in
    ``extras()`` below: same oracle discipline, verified by the local
    differential harness instead of driver-window spend."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            from streampro_assignment_etl_spark.queries import release_persisted

            # The driver runs the whole registry in one session; free the
            # previous query's tracked mid-plan caches before building.
            release_persisted()
            apply_runtime_confs(spark)
            return spec.builder(spark, sf_dir)

        run.__name__ = spec.name
        run.__doc__ = spec.doc
        return run

    return {name: wrap(spec) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def extras() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """NOT part of the driver contract — the locally-verified EXTRAS
    registry (redundant operator representatives; see COVERAGE.md),
    exposed for inspection with the same calling convention."""
    from streampro_assignment_etl_spark.queries import EXTRAS

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return spec.builder(spark, sf_dir)

        run.__name__ = spec.name
        return run

    return {name: wrap(spec) for name, spec in EXTRAS.items()}
