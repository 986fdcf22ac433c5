#!/usr/bin/env python
"""Round-over-round bench comparison with raw-primary verdicts
(VERDICT r12 Next #2 made the comparison mechanical; VERDICT r16
What's-wrong #1 / Next #1 re-keyed the verdicts on RAW time after
three consecutive rounds of anchor-normalized SLOWER flags on queries
whose raw time got FASTER).

Usage:
    python tools/bench_compare.py                  # newest two BENCH_r*.json
    python tools/bench_compare.py A.json B.json    # explicit old new
    python tools/bench_compare.py A.json B.json --control BENCH_CONTROL_rN.json

Prints one table row per query:

    query  prev_s  cur_s  raw  norm  vs_ctl  verdict

Verdict bands apply to the RAW ratio cur/prev — the judge's own
adjudication method (r14/r15/r16 SCALE.md addenda + VERDICT r16):

    ~        raw in [0.8, 1.25]   — within host noise
    FASTER   raw < 0.8
    SLOWER   raw > 1.25           — investigate: plan/AQE/code change

``norm`` (raw divided by the host-speed ratio measured by the
data-independent ``anchor_spark_sec`` workload both files carry) is an
ADVISORY column only. History: the anchor over-corrects whenever the
host moved more than the workload (r16: anchor −28% vs workload ±10%
read every flat query "SLOWER 1.3–1.6×"), so normalized ratios inform
but never gate. A query with raw ≤ 1.0 can never read SLOWER.

Pack divergence (VERDICT r14 #2): a query moving AGAINST the pack
indicts code even when its own band reads "~". The pack is the median
RAW ratio across shared queries; a query whose raw ratio differs from
the pack median by more than the same 1.25x band is marked DIVERGES.

Control clearing (VERDICT r15 #3, extended to SLOWER by r16 #1): the
adjudication evidence for a benign flag is always the idle-box control
re-measurement of the same code — pass it mechanically with
``--control``. A SLOWER or DIVERGES flag is CLEARED when the query's
current reading is flat against its idle-control reading (cur/control
within [0.8, 1.25]): the movement is the host's artifact, not the
code's. Conversely a query that is flat raw but reads > 1.25 vs its
own idle control gets a non-gating ``watch(vs-control)`` advisory —
the r16 sp_q3 shape, surfaced for next round's record to confirm or
clear without failing the gate on ±20%-swing hardware.

Exit code 1 when any query lands in uncleared SLOWER or uncleared
DIVERGES. One JSON summary line last (machine half of the contract).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

BAND_LO, BAND_HI = 0.8, 1.25


def _load(path: str) -> dict:
    """A BENCH record: either bench.py's own one-line JSON, or the
    driver's wrapper document with the bench line under "parsed"."""
    with open(path) as f:
        doc = json.load(f)
    if isinstance(doc, dict) and isinstance(doc.get("parsed"), dict):
        return doc["parsed"]
    return doc


def _in_band(x: float) -> bool:
    return BAND_LO <= x <= BAND_HI


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
            f"clears SLOWER and DIVERGES; raw-flat-but-slow-vs-control "
            f"gets a non-gating watch"
        )
    if host_ratio:
        print(
            f"# anchor_spark {a_old:.4f} -> {a_new:.4f}  "
            f"host_ratio={host_ratio:.3f} "
            f"({'slower' if host_ratio > 1 else 'faster'} host) — "
            f"norm column is ADVISORY only"
        )
    else:
        print("# no anchors in one of the files: no norm column")
    hdr = (
        f"{'query':<32} {'prev_s':>8} {'cur_s':>8} {'raw':>6} {'norm':>6} "
        f"{'vs_ctl':>6}  verdict"
    )
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
    # the pack is the median RAW ratio: a uniform host shift moves the
    # pack with it, so vs_pack isolates against-the-pack movement
    # without trusting the anchor
    pack = statistics.median(r for _, _, _, r, _ in shared) if shared else None

    rows = {}
    any_flag = False
    watches = []
    for name, prev, cur, raw, norm in shared:
        verdict = "~" if _in_band(raw) else ("FASTER" if raw < BAND_LO else "SLOWER")
        ctl = control.get("queries", {}).get(name) if control is not None else None
        vs_control = (cur / ctl) if ctl else None
        flat_vs_control = vs_control is not None and _in_band(vs_control)
        if verdict == "SLOWER" and flat_vs_control:
            # the query re-measures flat on the idle box running the
            # same code: the regression is the host's, not the code's
            verdict = "SLOWER(cleared-by-control)"
        vs_pack = raw / pack if pack else None
        diverges = vs_pack is not None and not _in_band(vs_pack)
        if diverges and flat_vs_control:
            diverges = False
            verdict += "+DIVERGES(cleared-by-control)"
        elif diverges:
            verdict += "+DIVERGES"
        if (
            _in_band(raw)
            and vs_control is not None
            and vs_control > BAND_HI
            and not diverges
        ):
            # flat raw, but slow against its own idle control — the
            # one shape worth carrying to next round without gating
            verdict += "+watch(vs-control)"
            watches.append(name)
        any_flag |= verdict.startswith("SLOWER") and "cleared" not in verdict
        any_flag |= diverges
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
        c = f"{vs_control:>6.3f}" if vs_control is not None else "     -"
        print(f"{name:<32} {prev:>8.3f} {cur:>8.3f} {raw:>6.3f} {n} {c}  {verdict}")
    if pack is not None:
        print(f"# pack median raw ratio = {pack:.3f}")
    if watches:
        print(f"# watch (non-gating, confirm-or-clear next round): {watches}")

    print(
        json.dumps(
            {
                "old": os.path.basename(old_p),
                "new": os.path.basename(new_p),
                "host_ratio": round(host_ratio, 4) if host_ratio else None,
                "pack_median_raw": round(pack, 4) if pack is not None else None,
                "watch": watches,
                "queries": rows,
            }
        )
    )
    return 1 if any_flag else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
