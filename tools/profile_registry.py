#!/usr/bin/env python
"""Per-query timing sweep over the WHOLE registry (round-19 optimization
round, guide §1: measure first).

Times every REGISTRY entry at $SPARK_GRAFT_SF_DIR (default sf0.1) with
the noop sink (guide §1.4 — computes every column of every row, no
count-pruning), median of $SPARK_GRAFT_BENCH_REPS (default 3), labeled
jobs (guide §1.5). Prints one JSON line per query plus a sorted summary
so the expensive tail is visible. This is the profiling harness, NOT
the driver bench — bench.py's methodology is unchanged.

Usage: python tools/profile_registry.py [--only name1,name2] [--skip-streaming]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streampro_assignment_etl_spark.queries import REGISTRY, release_persisted  # noqa: E402
from streampro_assignment_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    ap.add_argument("--reps", type=int, default=int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-registry")
    spark.sparkContext.setLogLevel("ERROR")

    names = list(REGISTRY)
    if args.only:
        only = {s.strip() for s in args.only.split(",") if s.strip()}
        names = [n for n in names if n in only]
    if args.skip:
        skip = {s.strip() for s in args.skip.split(",") if s.strip()}
        names = [n for n in names if n not in skip]

    # Warmup (same rationale as bench.py).
    REGISTRY["pricing_summary"].builder(spark, sf_dir).count()
    release_persisted()

    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        spec = REGISTRY[name]
        samples = []
        try:
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"profile: {name}")
                t0 = time.perf_counter()
                spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
                release_persisted()
            spark.sparkContext.setJobDescription(None)
            results[name] = round(statistics.median(samples), 3)
            print(json.dumps({"query": name, "sec": results[name], "samples": [round(s, 3) for s in samples]}), flush=True)
        except Exception as e:  # noqa: BLE001 — record and keep sweeping
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            print(json.dumps({"query": name, "err": errors[name]}), flush=True)
            release_persisted()

    print("\n=== sorted by median sec ===", flush=True)
    for n, s in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{s:8.3f}  {n}")
    print(json.dumps({"total": round(sum(results.values()), 3), "n": len(results), "errors": errors}))


if __name__ == "__main__":
    main()
