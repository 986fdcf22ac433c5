#!/usr/bin/env python
"""Streaming embedding near-dup cost soak (round-10 VERDICT #5): run
``run_embedding_dedup_stream`` over an SF dir's vectors and MEASURE the
cost side of the probe-radius trade that SCALE.md so far argued from
formulas — per radius:

  state_rows        rows in the state store after the drain (statestore
                    reader — store-once says this must be layout-
                    invariant: one row per finite vector, radius plays
                    no part),
  state_dir_bytes   du of the checkpoint's state directory (includes
                    per-batch deltas — the operational footprint),
  state_payload_b   state_rows x payload width (8 B id + dim x 8 B unit
                    vector) — the resident-cohort bytes,
  ring_rows         vectors x |Hamming-<=radius ball| — the rows that
                    SHUFFLE into the stateful operator (the 7-vs-22
                    rows/vector claim, probe rows are shuffle cost not
                    state cost),
  ring_payload_b    ring_rows x in-flight row width (id + unit + bucket
                    + is_base),
  wall_sec          drain wall time,
  pairs             distinct emitted pairs.

The input is the SF dir's embeddings written as JSONL landing files
(4 splits; maxFilesPerTrigger=1 so the drain genuinely crosses
batches). Note the scaled dirs are HIGH-DUPLICATION corpora (every
sf0.1 vector has N-1 exact copies — see make_scaled_testdata), so pair
volume is the duplication worst case, like the fuzzy-dedup soak.

Usage: python tools/stream_soak.py [SF_DIR] [--radii 1,2]
Defaults: SF_DIR=/tmp/sf1, radii 1 and 2.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

from streampro_assignment_etl_spark.session import get_spark  # noqa: E402
from streampro_assignment_etl_spark.streaming.embedding_dedup import (  # noqa: E402
    probe_masks,
    run_embedding_dedup_stream,
)

DIM = 64
N_PLANES = 6
N_SPLITS = 4


def write_landing(sf_dir: str, landing: str) -> int:
    """Parquet embeddings → N_SPLITS JSONL files (mtime-ordered)."""
    table = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = table.column("vec_id").to_pylist()
    vecs = table.column("embedding").to_pylist()
    n = len(ids)
    per = -(-n // N_SPLITS)
    for s in range(N_SPLITS):
        rows = [
            json.dumps({"vec_id": int(ids[i]), "embedding": [float(x) for x in vecs[i]]})
            for i in range(s * per, min((s + 1) * per, n))
        ]
        path = os.path.join(landing, f"b{s}.jsonl")
        with open(path, "w") as f:
            f.write("\n".join(rows) + "\n")
        os.utime(path, (1_000_000_000 + s * 100,) * 2)
    return n


def main() -> None:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and not sys.argv[1].startswith("-")
        else "/tmp/sf1"
    )
    radii = (
        [int(x) for x in sys.argv[sys.argv.index("--radii") + 1].split(",")]
        if "--radii" in sys.argv
        else [1, 2]
    )

    spark = get_spark("streampro-stream-soak")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="stream_soak_")
    landing = os.path.join(base, "landing")
    os.makedirs(landing)
    n_vec = write_landing(sf_dir, landing)

    results = {}
    for radius in radii:
        out = os.path.join(base, f"out_r{radius}")
        ckpt = os.path.join(base, f"ckpt_r{radius}")
        t0 = time.perf_counter()
        run_embedding_dedup_stream(
            spark, landing, out, ckpt,
            threshold=0.9, dim=DIM, n_planes=N_PLANES, probe_radius=radius,
            max_files_per_trigger=1, timeout_s=1800,
        )
        wall = round(time.perf_counter() - t0, 1)
        state = spark.read.format("statestore").load(ckpt)
        state_rows = int(
            state.selectExpr("sum(size(value.groupState.ids))").collect()[0][0]
        )
        state_dir = os.path.join(ckpt, "state")
        du = subprocess.run(
            ["du", "-sb", state_dir], capture_output=True, text=True, check=True
        )
        state_dir_bytes = int(du.stdout.split()[0])
        pairs = (
            spark.read.parquet(out).select("vec_a", "vec_b").distinct().count()
        )
        ring = len(probe_masks(N_PLANES, radius))
        results[f"radius_{radius}"] = {
            "ring_buckets_per_vector": ring,
            "ring_rows": n_vec * ring,
            "ring_payload_b": n_vec * ring * (8 + DIM * 8 + 8 + 1),
            "state_rows": state_rows,
            "state_payload_b": state_rows * (8 + DIM * 8),
            "state_dir_bytes": state_dir_bytes,
            "wall_sec": wall,
            "pairs": pairs,
        }
        print(radius, json.dumps(results[f"radius_{radius}"]))

    print(json.dumps({"sf_dir": sf_dir, "n_vectors": n_vec, "results": results}))


if __name__ == "__main__":
    main()
