"""Distributed connected components — dedup cluster resolution.

Near-duplicate detection (operators/minhash.py, simhash.py) emits
*pairs*; a curation pipeline needs *clusters*: every document mapped to
one canonical representative so the corpus can be deduplicated in one
anti-join. Pairs→clusters is transitive closure, i.e. connected
components on the near-dup graph.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the
standard shuffle-based CC algorithm that converges in O(log n) rounds
on any graph shape, unlike naive min-label propagation whose round
count is the graph diameter (a 100 TB near-dup graph can contain long
template chains). Each round is two groupBy/join passes over the edge
set — no collect to the driver, no per-node adjacency materialization
(hub nodes never pull their whole neighborhood into one task; the
min-neighbor reduction is a map-side-combined aggregate).

The reference has no counterpart (its dedup story ends at pandas
drop_duplicates); this is additive north-star surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Materialize `df` and truncate its logical plan between rounds.

    Local mode: ``localCheckpoint`` (executor-memory blocks — fast, but
    lost with an executor). On a real cluster set
    ``SPARK_CHECKPOINT_DIR`` and the same call becomes a RELIABLE
    ``checkpoint()`` to that directory (HDFS/S3): a lost executor then
    costs a re-read, not a full recompute of every prior round. The
    checkpoint dir is wired lazily so plain local runs need no setup.
    """
    ckpt_dir = os.environ.get("SPARK_CHECKPOINT_DIR")
    if ckpt_dir:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None or not str(sc.getCheckpointDir()).startswith(
            ckpt_dir
        ):
            sc.setCheckpointDir(ckpt_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def _symmetric(edges: DataFrame) -> DataFrame:
    """Both directions of each undirected edge, self-loops dropped."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .union(
            edges.filter(F.col("src") != F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star: over the UNDIRECTED neighborhood Γ(u) (edges are
    re-symmetrized here each round — the paper's neighborhoods are
    direction-free), connect every strictly-larger neighbor of u to
    m = min(Γ(u) ∪ {u}).

    One aggregate for the per-node minimum (map-side combined — hub
    nodes reduce locally before the shuffle) + one equi-join back onto
    the adjacency rows.
    """
    sym = _symmetric(edges)
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient every edge high→low, then point each node's
    smaller neighbors (and the node itself) at the minimum of that
    closed lower neighborhood."""
    le = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    mins = le.groupBy("src").agg(F.min("dst").alias("m"))
    return (
        le.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(mins.select("src", F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src_col: str,
    dst_col: str,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) labeling of the undirected graph given as an
    edge list — component = the minimum node id reachable from `node`.
    Isolated nodes (absent from `pairs`) are simply absent here; callers
    default them to themselves (see ``canonical_docs``).

    Iterates large-star/small-star until the edge set is a star forest
    — every node has exactly one outgoing edge and no edge's target
    still points elsewhere, both checked with O(|E|) aggregates (never
    a collect) — with ``max_iter`` as a safety bound; O(log n) rounds
    suffice per the algorithm's convergence proof, so 25 covers any
    realistic corpus. Each round materializes the (small) edge frontier
    via ``localCheckpoint`` — persist alone is not enough for iterative
    plans: it short-circuits *execution* but the *logical plan* still
    nests every prior round (~4× growth/round → the optimizer OOMs on
    long chains). Checkpointing truncates the lineage so round N plans
    against a flat scan of round N-1's frontier. With
    ``SPARK_CHECKPOINT_DIR`` set, ``_truncate_lineage`` upgrades to
    reliable ``checkpoint()`` automatically (survives executor loss on a
    cluster); the frontier is tiny — near-dup nodes only — either way.
    """
    # Checkpoint the INPUT too: the edge list is usually the output of
    # an expensive candidate generator (MinHash-LSH), and round 1
    # references it three times (symmetrize ×2 + min-join) — without
    # truncation that recomputes the generator per reference.
    edges = _truncate_lineage(
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    )
    for _ in range(max_iter):
        nxt = _truncate_lineage(_small_star(_large_star(edges)))
        # Star-forest test in ONE job: a node breaks the forest iff it
        # has out-degree > 1 (two labels) or appears as both source and
        # target (an unresolved chain). Degree-count union-aggregate —
        # no join, one action per round.
        degrees = (
            nxt.select(F.col("src").alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i"))
            .union(nxt.select("dst", F.lit(0), F.lit(1)))
            .groupBy("node")
            .agg(F.sum("o").alias("o"), F.sum("i").alias("i"))
        )
        broken = degrees.filter(
            (F.col("o") > 1) | ((F.col("o") > 0) & (F.col("i") > 0))
        ).count()
        edges = nxt
        if broken == 0:
            break
    # Converged star forest: every edge points node -> component min.
    # Roots carry no outgoing edge, so add their self-row to make the
    # labeling total over all nodes that appear in any pair.
    out = (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("component"))
        .union(
            edges.select(
                F.col("dst").alias("node"), F.col("dst").alias("component")
            )
        )
        .distinct()
    )
    return out


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
) -> DataFrame:
    """Every doc mapped to its cluster canonical (the min doc id of its
    near-dup component; itself when un-duplicated): (id, canonical_id,
    is_canonical). Deduplicating the corpus is then
    ``filter(is_canonical)`` — one broadcast/shuffle join, no closure
    logic downstream."""
    cc = connected_components(pairs, src_col, dst_col)
    return (
        docs.select(F.col(id_col))
        .join(cc.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("canonical_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("canonical_id"))
    )
