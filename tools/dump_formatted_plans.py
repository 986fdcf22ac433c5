#!/usr/bin/env python
"""Dump .explain("formatted") for queries into plans/<round>/<name>_<tag>.txt.

Optimization-round evidence artifacts (distinct from the
PLANS.md simple-mode dossier): the judge checks plan claims against
these files.

Usage: python tools/dump_formatted_plans.py <tag> [name1,name2,...] [round=r20]
       (default: all headline queries; tag is e.g. "before"/"after")
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streampro_assignment_etl_spark.queries import REGISTRY, release_persisted  # noqa: E402
from streampro_assignment_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = (
        [s for s in sys.argv[2].split(",") if s]
        if len(sys.argv) > 2
        else [n for n, s in REGISTRY.items() if s.headline]
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = sys.argv[3] if len(sys.argv) > 3 else os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r20")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = REGISTRY[name]
        df = spec.builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} ({tag})\n\n")
            f.write(plan)
        release_persisted()
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
