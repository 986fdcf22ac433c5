#!/usr/bin/env python
"""Anchor-normalized round-over-round bench comparison (VERDICT r12
Next #2: "make the comparison mechanical ... so no future verdict
hand-computes them").

Usage:
    python tools/bench_compare.py                  # newest two BENCH_r*.json
    python tools/bench_compare.py A.json B.json    # explicit old new

Prints one table row per query:

    query  prev_s  cur_s  raw_ratio  norm_ratio  verdict

where ``raw_ratio`` = cur/prev, ``norm_ratio`` divides out the host-
speed ratio measured by the data-independent ``anchor_spark_sec``
workload both files carry (bench.py): a query whose raw delta tracks
the anchor delta is host noise (norm ~1), one whose normalized ratio
stays far from 1 moved for a real reason. The verdict column applies
the same bands the round-10/12 postmortems used by hand:

    ~        norm in [0.8, 1.25]   — within host noise
    FASTER   norm < 0.8
    SLOWER   norm > 1.25           — investigate: plan/AQE/code change

Pack divergence (VERDICT r14 #2 — the one pattern the variance
addendum's two-sided rule does NOT excuse): a uniform shift of every
query together is a host artifact, but a query moving AGAINST the
pack indicts code even when its own band reads "~". Mechanically: the
pack is the median normalized ratio across all shared queries; any
query whose ratio differs from the pack median by more than the same
1.25x band is marked DIVERGES (in addition to its band verdict).

Control clearing (VERDICT r15 #3 — the one benign pattern the gate
couldn't express): a query can read DIVERGES while being FLAT, when
the PACK sheds a load artifact the query never carried (r15's
dedup_fuzzy_minhash: raw 1.03 but vs-pack 1.36 because every other
query shed r14's background-load premium). The adjudication evidence
is always the same — the idle-box control re-measurement of the same
code — so pass it mechanically:

    python tools/bench_compare.py OLD NEW --control BENCH_CONTROL_rN.json

A DIVERGES flag is CLEARED when the query's current reading is flat
against its idle-control reading (cur/control within the same
[0.8, 1.25] noise band): the divergence is then the pack's artifact,
not the query's, and the exit gate ignores it (the verdict column
shows ``DIVERGES(cleared-by-control)``). SLOWER stays a hard flag —
a genuinely slower query is slower no matter what moved the pack.

Exit code 1 when any query lands in SLOWER or uncleared DIVERGES, so
a round script can gate on it. One JSON summary line last (machine
half of the contract).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def _load(path: str) -> dict:
    """A BENCH record: either bench.py's own one-line JSON, or the
    driver's wrapper document with the bench line under "parsed"."""
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc, dict) and isinstance(doc.get("parsed"), dict):
        return doc["parsed"]
    return doc


def main(argv: list[str]) -> int:
    control_p = None
    argv = list(argv)
    if "--control" in argv:
        i = argv.index("--control")
        try:
            control_p = argv[i + 1]
        except IndexError:
            print("--control requires a path", file=sys.stderr)
            return 2
        del argv[i : i + 2]
    if len(argv) == 3:
        old_p, new_p = argv[1], argv[2]
    else:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        found = sorted(
            (int(m.group(1)), p)
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        )
        if len(found) < 2:
            print("need two BENCH_r*.json files (or pass paths)", file=sys.stderr)
            return 2
        old_p, new_p = found[-2][1], found[-1][1]

    old, new = _load(old_p), _load(new_p)
    control = _load(control_p) if control_p else None
    a_old, a_new = old.get("anchor_spark_sec"), new.get("anchor_spark_sec")
    host_ratio = (a_new / a_old) if a_old and a_new else None

    print(f"# old={os.path.basename(old_p)} new={os.path.basename(new_p)}")
    if control is not None:
        print(
            f"# control={os.path.basename(control_p)} — flat-vs-control "
            f"clears DIVERGES (not SLOWER)"
        )
    if host_ratio:
        print(
            f"# anchor_spark {a_old:.4f} -> {a_new:.4f}  "
            f"host_ratio={host_ratio:.3f} "
            f"({'slower' if host_ratio > 1 else 'faster'} host)"
        )
    else:
        print("# no anchors in one of the files: raw ratios only")
    hdr = f"{'query':<32} {'prev_s':>8} {'cur_s':>8} {'raw':>6} {'norm':>6}  verdict"
    print(hdr)

    import statistics

    shared = []
    for name, cur in sorted(new.get("queries", {}).items()):
        prev = old.get("queries", {}).get(name)
        if not prev:
            print(f"{name:<32} {'-':>8} {cur:>8.3f}    new query")
            continue
        raw = cur / prev
        norm = raw / host_ratio if host_ratio else None
        shared.append((name, prev, cur, raw, norm))
    bases = [norm if norm is not None else raw for _, _, _, raw, norm in shared]
    pack = statistics.median(bases) if bases else None

    rows = {}
    any_flag = False
    for (name, prev, cur, raw, norm), basis in zip(shared, bases):
        verdict = "~" if 0.8 <= basis <= 1.25 else ("FASTER" if basis < 0.8 else "SLOWER")
        # against-the-pack movement: the uniform-shift excuse only
        # covers queries that moved WITH everything else
        vs_pack = basis / pack if pack else None
        diverges = vs_pack is not None and not (0.8 <= vs_pack <= 1.25)
        vs_control = None
        if diverges and control is not None:
            ctl = control.get("queries", {}).get(name)
            if ctl:
                vs_control = cur / ctl
                if 0.8 <= vs_control <= 1.25:
                    # the query is FLAT against its own idle-box
                    # re-measurement: the pack moved, not the code —
                    # the one benign DIVERGES shape (VERDICT r15 #3)
                    diverges = False
                    verdict += "+DIVERGES(cleared-by-control)"
        if diverges:
            verdict += "+DIVERGES"
        any_flag |= ("SLOWER" in verdict) or diverges
        rows[name] = {
            "prev_sec": prev,
            "cur_sec": cur,
            "raw_ratio": round(raw, 3),
            "norm_ratio": round(norm, 3) if norm is not None else None,
            "vs_pack": round(vs_pack, 3) if vs_pack is not None else None,
            "vs_control": round(vs_control, 3) if vs_control is not None else None,
            "verdict": verdict,
        }
        n = f"{norm:>6.3f}" if norm is not None else "     -"
        print(f"{name:<32} {prev:>8.3f} {cur:>8.3f} {raw:>6.3f} {n}  {verdict}")
    if pack is not None:
        print(f"# pack median ratio = {pack:.3f}")

    print(
        json.dumps(
            {
                "old": os.path.basename(old_p),
                "new": os.path.basename(new_p),
                "host_ratio": round(host_ratio, 4) if host_ratio else None,
                "pack_median": round(pack, 4) if pack is not None else None,
                "queries": rows,
            }
        )
    )
    return 1 if any_flag else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
