#!/usr/bin/env python
"""Produce the idle-box per-query control record the round discipline
adjudicates with (SCALE.md "Per-query idle-box control", round 15;
made mechanical in round 16: `bench_compare OLD NEW --control
BENCH_CONTROL_rN.json` clears a benign DIVERGES when the query is
flat against this record).

Usage:
    python tools/bench_control.py <round-number> [reps]

Runs bench.py at the standard sf0.1/local[$SPARK_GRAFT_CPUS] protocol
with REPS=<reps> (default 7) on a box the operator believes is idle,
records the 1-minute load average at start as the conditions line, and
writes BENCH_CONTROL_r<N>.json next to the BENCH_r*.json series.
Refuses to overwrite an existing control (a control is a measurement
record, not a rolling file). Warns — but proceeds — when load looks
non-idle; the conditions field carries the truth either way."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def main(argv: list[str]) -> int:
    if len(argv) < 2:
        print("usage: bench_control.py <round-number> [reps]", file=sys.stderr)
        return 2
    rnd = int(argv[1])
    reps = int(argv[2]) if len(argv) > 2 else 7
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(here, f"BENCH_CONTROL_r{rnd}.json")
    if os.path.exists(out_path):
        print(f"{out_path} already exists — controls are immutable records",
              file=sys.stderr)
        return 2
    load1 = os.getloadavg()[0]
    if load1 > 4.0:
        print(f"WARNING: load avg {load1:.2f} at start — this is not an "
              f"idle box; the record will say so", file=sys.stderr)
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env["SPARK_GRAFT_BENCH_REPS"] = str(reps)
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "bench.py")],
        env=env, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-2000:])
        return 1
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    parsed = json.loads(line)
    doc = {
        "kind": "idle_box_per_query_control",
        "round": rnd,
        "reps": reps,
        "conditions": (
            f"load avg {load1:.2f} at start, no concurrent tests, same "
            f"{os.path.basename(env['SPARK_GRAFT_SF_DIR'])}/"
            f"local[{env.get('SPARK_GRAFT_CPUS', '32')}] protocol as BENCH_r*"
        ),
        "parsed": parsed,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
