#!/usr/bin/env python
"""10× scale soak (round-7 VERDICT #4): run the bench headliners plus
the heavy extras once at an sf1-equivalent dir produced by
``tools/make_scaled_testdata.py``, and print per-query seconds plus the
ratio to a reference BENCH json (default BENCH_r07 at sf0.1) — the
scaling exponent readout. Ratio ≈ 10 means linear in rows; ratios well
above the data ratio flag a super-linear operator worth a postmortem.

Usage:
  python tools/make_scaled_testdata.py 10
  python tools/scale_soak.py [SF_DIR] [--reps N] [--only a,b,c]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streampro_assignment_etl_spark.queries import (  # noqa: E402
    EXTRAS,
    REGISTRY,
    release_persisted,
)
from streampro_assignment_etl_spark.session import get_spark  # noqa: E402

HEAVY_EXTRAS = (
    "span_dedup_reconstruct",
    "heavy_hitters_terms",
    # round-9 additions (VERDICT r8 #5): the PQ family + the new
    # serial-construct decompositions.
    "similarity_ann_pq",
    "similarity_ann_ivfpq",
    "training_shuffle_interleave",
    "per_source_cap",
)


def _bpe_merges_k8(spark, sf_dir):
    """Soak-only target (round-10 VERDICT #4): the BPE merge loop at
    k=8 — twice the registered entry's depth, exercising the per-step
    lineage checkpointing under scale."""
    from streampro_assignment_etl_spark.queries.corpus_ops import bpe_merge_table
    from streampro_assignment_etl_spark.sources.testdata import load_table

    return bpe_merge_table(load_table(spark, sf_dir, "documents"), 8)


# Name → builder(spark, sf_dir): soak targets that are parameterized
# variants of registry entries rather than registry entries themselves.
CUSTOM_TARGETS = {"bpe_merges_k8": _bpe_merges_k8}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/tmp/sf1"
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 1
    ref_path = os.environ.get("SOAK_REF_BENCH", "/root/repo/BENCH_r08.json")
    ref = {}
    try:
        doc = json.load(open(ref_path))
        ref = doc.get("queries") or doc.get("parsed", {}).get("queries", {})
    except (OSError, json.JSONDecodeError):
        pass

    spark = get_spark("streampro-scale-soak")
    spark.sparkContext.setLogLevel("ERROR")
    # Scan-layout parallelism: the scaled tables are written with ~256
    # row groups (make_scaled_testdata), but a scan only fans out when
    # maxPartitionBytes byte-ranges are smaller than the file — at the
    # default 128 MB every soak table is ONE task wide regardless of
    # row groups (the round-8 soak's first numbers measured serial
    # reads; see SCALE.md). 2 MB ranges ≈ 8-75 tasks per table here;
    # at real warehouse scale many-file layouts make this moot.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
    spark.conf.set("spark.sql.files.openCostInBytes", "65536")

    targets = {n: s for n, s in REGISTRY.items() if s.headline}
    targets.update({n: EXTRAS[n] for n in HEAVY_EXTRAS})

    class _Custom:
        def __init__(self, builder):
            self.builder = builder

    targets.update({n: _Custom(b) for n, b in CUSTOM_TARGETS.items()})

    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        unknown = only - set(targets)
        if unknown:
            raise SystemExit(f"unknown soak targets: {sorted(unknown)}")
        targets = {n: s for n, s in targets.items() if n in only}

    # Warmup on the first target (don't hardcode a name — a renamed
    # headliner must not KeyError the soak before it measures anything).
    next(iter(targets.values())).builder(spark, sf_dir).count()
    release_persisted()

    out: dict[str, dict] = {}
    for name, spec in targets.items():
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            release_persisted()
        sec = round(statistics.median(samples), 3)
        entry = {"sec": sec}
        if name in ref and ref[name]:
            entry["x_vs_sf0.1"] = round(sec / ref[name], 1)
        out[name] = entry
        print(f"{name}: {sec}s" + (f"  ({entry.get('x_vs_sf0.1', '?')}x vs sf0.1)" if name in ref else ""))

    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "queries": out}))


if __name__ == "__main__":
    main()
