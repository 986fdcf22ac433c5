"""Registry curation pins: the driver evaluates at most 50 queries (in
registration order), so the driver-facing REGISTRY must stay inside
that window — with a slot of headroom — and every entry must be
oracle-checkable or explicitly rows-only. EXTRAS hold redundant
operator representatives; they must never collide with driver names."""

from __future__ import annotations

from streampro_assignment_etl_spark.queries import EXTRAS, REGISTRY

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
    """tools/bench_compare.py (round-13 VERDICT #2): consumes both the
    driver's wrapper documents ({"parsed": {...}}) and bench.py's own
    one-line JSON, divides out the anchor host ratio, and flags only
    normalized movement outside the ±25% band."""
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
    q = summary["queries"]
    assert q["q_same"]["verdict"] == "~" and q["q_same"]["norm_ratio"] == 1.0
    assert q["q_fast"]["verdict"] == "FASTER" and q["q_fast"]["norm_ratio"] == 0.5
    assert q["q_slow"]["verdict"] == "SLOWER" and q["q_slow"]["norm_ratio"] == 1.5
