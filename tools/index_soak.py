#!/usr/bin/env python
"""Persisted-index serving soak (round-10 VERDICT #1): at a given SF
dir, time the IVF-PQ query batch three ways —

  composed   similarity.ivfpq_topk (re-derives model + re-encodes the
             corpus EVERY call — the round-9 shape),
  build      build_ivfpq_index once (the amortized corpus pass),
  served     ivfpq_topk_over_index per call (model load + pruned scan
             + shared ADC/rerank — the serve-many shape),

and print per-phase seconds plus the served/composed ratio. The point
at scale: 'composed' grows with the corpus (encode pass), 'served'
grows with probed cells × cell size; the index build amortizes over
every future batch.

Round-10 additions: the incremental-ingest cycle — append a 10%
batch of fresh ids (cost should track the BATCH, not the corpus),
measure the snapshot's file fragmentation, compact, and re-serve
(compaction's payoff is scan-side: one file per cell).

Usage: python tools/index_soak.py [SF_DIR] [--reps N]
Defaults: SF_DIR=/tmp/sf1, reps=3.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streampro_assignment_etl_spark.operators import ann_index, similarity  # noqa: E402
from streampro_assignment_etl_spark.session import get_spark  # noqa: E402
from streampro_assignment_etl_spark.sources.testdata import load_table  # noqa: E402


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and not sys.argv[1].startswith("-")
        else "/tmp/sf1"
    )
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 3

    spark = get_spark("streampro-index-soak")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    def med(fn):
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        return round(statistics.median(samples), 3)

    composed = med(
        lambda: similarity.ivfpq_topk(
            emb, queries, k=5, n_centroids=16, probes=4, m=4, n_codes=16,
            shortlist=100,
        ).count()
    )

    path = tempfile.mkdtemp(prefix="ivfpq_soak_")
    t0 = time.perf_counter()
    ann_index.build_ivfpq_index(emb, path, n_centroids=16, m=4, n_codes=16)
    build = round(time.perf_counter() - t0, 3)

    served = med(
        lambda: ann_index.ivfpq_topk_over_index(
            emb, queries, path, k=5, probes=4, shortlist=100
        ).count()
    )

    # Incremental ingest: a 10% batch under FRESH ids (an append must
    # never reuse ids — contract) — cost should be ~batch-linear, i.e.
    # well under the full build.
    max_id = emb.agg(F.max("vec_id")).first()[0]
    batch = emb.filter(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(int(max_id) + 1)
    )
    t0 = time.perf_counter()
    model = ann_index.append_to_ivfpq_index(batch, path)
    append = round(time.perf_counter() - t0, 3)

    def snapshot_files(enc_dir):
        n = 0
        for _root, _dirs, files in os.walk(os.path.join(path, enc_dir)):
            n += sum(f.endswith(".parquet") for f in files)
        return n

    files_before = snapshot_files(model.encoded_dir)
    t0 = time.perf_counter()
    compacted = ann_index.compact_ivfpq_index(spark, path)
    compact = round(time.perf_counter() - t0, 3)
    files_after = snapshot_files(compacted.encoded_dir)

    served_compacted = med(
        lambda: ann_index.ivfpq_topk_over_index(
            emb, queries, path, k=5, probes=4, shortlist=100
        ).count()
    )

    out = {
        "sf_dir": sf_dir,
        "reps": reps,
        "composed_sec": composed,
        "index_build_sec": build,
        "served_sec": served,
        "served_over_composed": round(served / composed, 2),
        "append_10pct_sec": append,
        "append_over_build": round(append / build, 2),
        "files_before_compact": files_before,
        "compact_sec": compact,
        "files_after_compact": files_after,
        "served_after_compact_sec": served_compacted,
    }

    # Round-11 (VERDICT #8): filtered-search selectivity sweep — the
    # pre-ADC broadcast semi-join's cost should stay ~flat as the
    # `allowed` set shrinks (the filter is applied to candidates the
    # probe already pruned, and the smaller set only SHRINKS downstream
    # ADC work), while every query still fills k from WITHIN the
    # filter. A post-filter design would get faster too — by
    # under-filling k; results_per_query is the honesty column.
    k = 5
    for pct, pred in (
        (100, F.lit(True)),
        (10, F.col("vec_id") % 10 == 0),
        (1, F.col("vec_id") % 100 == 0),
    ):
        allowed = emb.filter(pred)
        sec = med(
            lambda a=allowed: ann_index.ivfpq_topk_over_index(
                emb, queries, path, k=k, probes=4, shortlist=100, allowed=a
            ).count()
        )
        n = ann_index.ivfpq_topk_over_index(
            emb, queries, path, k=k, probes=4, shortlist=100, allowed=allowed
        ).count()
        nq = queries.count()
        out[f"filtered_{pct}pct_sec"] = sec
        out[f"filtered_{pct}pct_results_per_query"] = round(n / nq, 2)

    # Round-11: streaming-ingest steady state. Ten 1% batches of fresh
    # ids drained one per micro-batch through the continuously-fresh-
    # index loop; per-batch cost = batch-linear encode + constant
    # commit/marker overhead, so splitting the same 10% of rows into 10
    # batches shows the per-batch constant directly against the single
    # 10% append above.
    from streampro_assignment_etl_spark.streaming import index_ingest

    stream_root = tempfile.mkdtemp(prefix="ivfpq_stream_soak_")
    landing = f"{stream_root}/landing"
    base_id = int(max_id) * 3
    for b in range(10):
        (
            emb.filter(F.col("vec_id") % 100 == b)
            .withColumn("vec_id", F.col("vec_id") + F.lit(base_id + b))
            .select("vec_id", "embedding")
            .coalesce(1)
            .write.mode("append")
            .parquet(landing)
        )
    t0 = time.perf_counter()
    index_ingest.run_index_append_stream_from_dir(
        spark, landing, path, f"{stream_root}/ckpt",
        vec_element="float", max_files_per_trigger=1,
    )
    stream_total = round(time.perf_counter() - t0, 3)
    out["stream_10x1pct_total_sec"] = stream_total
    out["stream_per_batch_sec"] = round(stream_total / 10, 3)

    # Round-11: residual (IVFADC) index — same code size, same pruned
    # scan; the serve-side delta is only the per-(query, cell) LUT
    # broadcast (P× more LUT rows). Build + served timings alongside
    # the absolute path's.
    rpath = tempfile.mkdtemp(prefix="ivfpq_soak_res_")
    t0 = time.perf_counter()
    ann_index.build_ivfpq_index(
        emb, rpath, n_centroids=16, m=4, n_codes=16, residual=True
    )
    out["residual_build_sec"] = round(time.perf_counter() - t0, 3)
    out["residual_served_sec"] = med(
        lambda: ann_index.ivfpq_topk_over_index(
            emb, queries, rpath, k=5, probes=4, shortlist=100
        ).count()
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
