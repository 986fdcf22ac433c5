"""Registry curation pins: the driver evaluates at most 50 queries (in
registration order), so the driver-facing REGISTRY must stay inside
that window — with a slot of headroom — and every entry must be
oracle-checkable or explicitly rows-only. EXTRAS hold redundant
operator representatives; they must never collide with driver names."""

from __future__ import annotations


import pytest
from streampro_assignment_etl_spark.queries import EXTRAS, REGISTRY

pytestmark = pytest.mark.fast  # whole module: cheap invariants, per-commit lane

DRIVER_WINDOW = 50


def test_registry_fits_driver_window():
    assert len(REGISTRY) <= DRIVER_WINDOW, sorted(REGISTRY)


def test_registry_window_exactly_spent():
    """Round 5 spent the final slot on streaming_stateful_dedup (the one
    north-star family that was pytest-only) — the window is now FULL by
    design. Landing another driver entry requires demoting a redundant
    representative to EXTRAS first; this pin makes that explicit."""
    assert len(REGISTRY) == DRIVER_WINDOW, sorted(REGISTRY)


def test_no_name_collisions():
    assert not set(REGISTRY) & set(EXTRAS)


def test_round14_flagship_promotions():
    """VERDICT r13 #3: the engine's flagship families carry driver hash
    gates — the persisted-index lifecycle, the SCD-2 convergence gate,
    and PageRank swapped in for three redundant relational
    representatives whose R-rows keep reps via sp_q1–q3 /
    shipping_priority (COVERAGE.md §2.2 updated)."""
    for n in (
        "similarity_ann_ivfpq_index",
        "scd2_apply_changes_converges",
        "pagerank_event_transitions",
    ):
        assert n in REGISTRY, n
    for n in ("left_join_null_handling", "sort_nulls_last", "conditional_case_agg"):
        assert n in EXTRAS and n not in REGISTRY, n


def test_every_registry_entry_has_oracle():
    """After round 3 every driver entry carries a DuckDB oracle — the
    hash gate covers 100% of the driver window (multimodal included)."""
    missing = [n for n, s in REGISTRY.items() if not s.oracle]
    assert not missing, missing


def test_headline_queries_stay_registered():
    """bench.py times headline entries; they must live in the driver
    registry, not EXTRAS."""
    assert [n for n, s in REGISTRY.items() if s.headline], "no headline queries"
    assert not [n for n, s in EXTRAS.items() if s.headline]


def test_bench_compare_reads_driver_wrapped_records(tmp_path):
    """tools/bench_compare.py (round-13 VERDICT #2; pack divergence
    round 15, VERDICT r14 #2): consumes both the driver's wrapper
    documents ({"parsed": {...}}) and bench.py's own one-line JSON,
    divides out the anchor host ratio, flags normalized movement
    outside the ±25% band, and marks queries moving AGAINST the pack
    median with DIVERGES — the one pattern a uniform host shift never
    excuses."""
    import json
    import subprocess
    import sys

    old = {
        "parsed": {
            "queries": {"q_same": 1.0, "q_fast": 1.0, "q_slow": 1.0},
            "anchor_spark_sec": 0.2,
        }
    }
    # host 2x slower; q_same tracks it (raw 2.0, norm 1.0), q_fast
    # truly halves, q_slow truly +50% beyond the host
    new = {
        "queries": {"q_same": 2.0, "q_fast": 1.0, "q_slow": 3.0},
        "anchor_spark_sec": 0.4,
    }
    po, pn = tmp_path / "BENCH_a.json", tmp_path / "BENCH_b.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    out = subprocess.run(
        [sys.executable, "/root/repo/tools/bench_compare.py", str(po), str(pn)],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 1  # q_slow flags SLOWER
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["host_ratio"] == 2.0
    assert summary["pack_median"] == 1.0  # q_same is the pack
    q = summary["queries"]
    assert q["q_same"]["verdict"] == "~" and q["q_same"]["norm_ratio"] == 1.0
    # the true movers also diverge from the pack median of 1.0 — both
    # facts are reported, band verdict + pack relation
    assert q["q_fast"]["verdict"] == "FASTER+DIVERGES"
    assert q["q_fast"]["norm_ratio"] == 0.5 and q["q_fast"]["vs_pack"] == 0.5
    assert q["q_slow"]["verdict"] == "SLOWER+DIVERGES"
    assert q["q_slow"]["norm_ratio"] == 1.5 and q["q_slow"]["vs_pack"] == 1.5

    # the r14 shape the flag exists for: a UNIFORM host artifact with
    # ONE query moving against the pack — the uniform movers read ~
    # against the pack (no DIVERGES), the against-pack query is marked
    # even though its band verdict alone already said SLOWER
    old2 = {
        "queries": {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0, "lone": 1.0},
        "anchor_spark_sec": 0.4,
    }
    new2 = {
        # anchor halves (host 2x faster) while every query stays flat
        # -> every norm ratio reads 2.0 (the r14 inflation artifact),
        # except `lone`, which genuinely rose +60% raw on top of it
        "queries": {"a": 1.0, "b": 1.0, "c": 1.0, "d": 1.0, "lone": 1.6},
        "anchor_spark_sec": 0.2,
    }
    po2, pn2 = tmp_path / "BENCH_c.json", tmp_path / "BENCH_d.json"
    po2.write_text(json.dumps(old2))
    pn2.write_text(json.dumps(new2))
    out2 = subprocess.run(
        [sys.executable, "/root/repo/tools/bench_compare.py", str(po2), str(pn2)],
        capture_output=True,
        text=True,
    )
    s2 = json.loads(out2.stdout.strip().splitlines()[-1])
    q2 = s2["queries"]
    assert q2["a"]["verdict"] == "SLOWER"  # inflated band, but WITH the pack
    assert "DIVERGES" not in q2["a"]["verdict"]
    assert q2["lone"]["verdict"] == "SLOWER+DIVERGES"
    assert q2["lone"]["vs_pack"] == 1.6
