"""Weighted PageRank over an edge list — the iterative-join pattern
beyond connected components' star contraction (operators/components.py):
a fixed number of join→aggregate rounds over a (src, dst, w) frame,
lineage-truncated per round so plan depth stays constant.

Published technique (Page, Brin, Motwani, Winograd 1999) with edge
weights: r_{t+1}(v) = (1−d)/N + d·(Σ_{u→v} r_t(u)·w_uv/outw_u + D_t/N)
where D_t is the dangling mass (rank held by nodes with no out-edges),
redistributed uniformly.

Training-data relevance: domain/source ranking for crawl and curation
prioritization — the graph is usually domains with hyperlink counts;
here the test workload derives an event-type transition graph, but the
operator is size-generic: every step is a key join or aggregate over
the EDGE list, the rank frame is one row per node, and nothing ever
collects to the driver (the dangling mass is a 1-row aggregate that
rides the plan via a broadcast cross join).

Cross-engine determinism (the oracle replays iterations unrolled in
SQL): each contribution is computed as one fixed-shape DOUBLE
expression — IEEE ops are deterministic, so both engines produce the
SAME double — then ROUND(·, 9) and cast to DECIMAL(28,9) so the
per-node SUM is order-independent (the BM25 trick,
queries/extensions.py; scale 9 because at scale 18 Spark's
string-mediated double→decimal and DuckDB's binary rounding disagree
in the last digit); the rank update recombines in a fixed
parenthesization. Reference parity: the
reference has no graph surface at all (pandas + SQL clients); this
extends the repo's additive north-star inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import _truncate_lineage

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 3


def weighted_pagerank(
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    damping: float = PAGERANK_DAMPING,
    restart: DataFrame | None = None,
    tol: float | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """(node, rank) after ``iters`` rounds from a uniform start.

    ``edges``: (src, dst, w) with w > 0; multi-edges allowed (weights
    add). Ranks sum to 1 at every iteration (dangling mass is
    redistributed, test-pinned). The returned rank is the raw DOUBLE —
    bit-identical across engines because every step's arithmetic is a
    fixed-shape IEEE expression and the only order-sensitive ops (the
    per-node sums) go through exact decimals.

    ``restart``: optional (node, weight) frame of non-negative weights
    → PERSONALIZED PageRank (teleport lands on the restart
    distribution instead of uniform; weights are normalized here
    OVER THE GRAPH'S NODE SET — restart rows naming nodes absent from
    the edge list carry no teleport mass, so retained ranks still sum
    to 1, test-pinned). The curation use: seed the restart with
    trusted sources/domains and rank the graph by proximity to them
    (random walk with restarts). Nodes absent from ``restart`` get
    teleport weight 0 — they are ranked purely by inbound walks.
    Dangling mass also redistributes by the restart vector, keeping
    total mass 1 (test-pinned). The restart frame is node-sized,
    joined once per iteration on the node key like every other
    per-node frame.

    ``tol``: optional L1 convergence early-stop — after each round,
    one extra 1-row aggregate over the (already lineage-truncated)
    rank frames computes ‖r_t − r_{t−1}‖₁ and the loop breaks when it
    drops below ``tol``. ``iters`` becomes the CAP. The fixed-iters
    default stays the oracle-replayable anchor (the SQL oracle unrolls
    exactly ``PAGERANK_ITERS`` rounds); production domain-ranking runs
    set e.g. ``tol=1e-9, iters=100``. The early-stopped result is
    bit-equal to the fixed-iters result at the stopped round
    (test-pinned): stopping changes WHEN the loop exits, never what a
    round computes.

    ``stats``: optional dict the call fills with ``iters_run`` and
    ``final_delta`` (None when ``tol`` is unset) — the observability
    hook the early-stop tests pin against.

    Raises ``ValueError`` on an empty edge list (no nodes to rank) and
    on a degenerate restart vector (empty, all-zero, or naming only
    nodes outside the graph) — a silent NULL-rank result would be the
    non-ANSI-division alternative.
    """
    # Truncate the EDGE lineage once at entry: every iteration joins
    # edges, so an expensive derivation upstream (e.g. the 1M-event
    # window that builds the transition graph) would otherwise re-run
    # per round — measured 35 s → ~13 s at sf1 for 3 rounds.
    edges = _truncate_lineage(edges.select("src", "dst", "w"))
    src_nodes = edges.select(F.col("src").alias("node"))
    dst_nodes = edges.select(F.col("dst").alias("node"))
    nodes = src_nodes.unionByName(dst_nodes).distinct()
    # One count job: N is a scalar in every engine's formulation.
    n = nodes.count()
    if n == 0:
        raise ValueError(
            "weighted_pagerank: empty edge list — no nodes to rank"
        )
    outw = edges.groupBy("src").agg(
        F.sum("w").cast("double").alias("outw")
    )
    if restart is not None:
        # Normalize the teleport distribution once, over the GRAPH's
        # node set: restart rows for nodes absent from the edge list
        # must not inflate the total (retained ranks would silently
        # sum to <1). The total is a 1-row aggregate collected once at
        # build time — same cost class as nodes.count() above, never
        # inside the iteration loop.
        rst = restart.select(
            "node", F.col("weight").cast("double").alias("weight")
        )
        t_row = rst.join(nodes, "node").agg(
            F.sum("weight").alias("t")
        ).first()
        t = float(t_row["t"]) if t_row["t"] is not None else 0.0
        if t <= 0.0:
            raise ValueError(
                "weighted_pagerank: restart vector carries no teleport "
                "mass over the graph's nodes (empty frame, all-zero "
                "weights, or every restart node absent from the edge "
                "list)"
            )
        tele = nodes.join(rst, "node", "left").select(
            "node",
            (F.coalesce(F.col("weight"), F.lit(0.0)) / F.lit(t)).alias(
                "tw"
            ),
        )
        tele = _truncate_lineage(tele)
        ranks = tele.select("node", F.col("tw").alias("r"))
    else:
        tele = None
        ranks = nodes.select(
            "node", (F.lit(1.0) / F.lit(float(n))).alias("r")
        )
    iters_run, final_delta = 0, None
    for _ in range(iters):
        prev = ranks
        # dangling mass: 1-row frame, rides the plan via broadcast
        # cross join — no driver collect inside the loop
        dangling = (
            ranks.join(
                outw.withColumnRenamed("src", "node"), "node", "left_anti"
            )
            .agg(
                F.coalesce(
                    F.sum(F.round(F.col("r"), 9).cast("decimal(28,9)")),
                    F.lit(0),
                )
                .cast("double")
                .alias("dm")
            )
        )
        contrib = (
            edges.join(outw, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                "dst",
                # ROUND to scale 9 BEFORE the decimal cast: Spark's
                # double→decimal goes through Java's shortest-repr
                # string while DuckDB rounds the exact binary value —
                # at scale 18 they disagree in the last digit (ulp
                # drift compounds per iteration, observed in parity);
                # at scale 9 both engines round the same double to the
                # same decimal (the BM25 contribution trick, scale 6)
                F.round(
                    F.lit(damping)
                    * F.col("r")
                    * F.col("w").cast("double")
                    / F.col("outw"),
                    9,
                )
                .cast("decimal(28,9)")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("cs"))
        )
        joined = nodes.join(
            contrib.withColumnRenamed("dst", "node"), "node", "left"
        ).crossJoin(F.broadcast(dangling))
        if tele is not None:
            ranks = joined.join(tele, "node").select(
                "node",
                (
                    (
                        F.lit(1.0 - damping) * F.col("tw")
                        + F.coalesce(F.col("cs").cast("double"), F.lit(0.0))
                    )
                    + F.lit(damping) * F.col("dm") * F.col("tw")
                ).alias("r"),
            )
        else:
            ranks = joined.select(
                "node",
                (
                    (
                        F.lit((1.0 - damping) / float(n))
                        + F.coalesce(F.col("cs").cast("double"), F.lit(0.0))
                    )
                    + (F.lit(damping) * F.col("dm")) / F.lit(float(n))
                ).alias("r"),
            )
        ranks = _truncate_lineage(ranks)
        iters_run += 1
        if tol is not None:
            # L1 delta: one 1-row aggregate joining two checkpointed
            # node-sized frames on the key — the per-round cost the
            # early stop buys its savings with. The node set is
            # loop-invariant (every round rebuilds from `nodes`), so
            # an inner join is total.
            d_row = (
                ranks.join(
                    prev.select("node", F.col("r").alias("r_prev")),
                    "node",
                )
                .agg(F.sum(F.abs(F.col("r") - F.col("r_prev"))).alias("d"))
                .first()
            )
            final_delta = float(d_row["d"]) if d_row["d"] is not None else 0.0
            if final_delta < tol:
                break
    if stats is not None:
        stats["iters_run"] = iters_run
        stats["final_delta"] = final_delta
    return ranks.select("node", F.col("r").alias("rank"))
