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


# Frontier size below which the closure finishes on the driver: 100k
# edges collect to ~2 MB — the same bounded-collect scale as any
# broadcast dim or the kmeans training sample. See connected_components.
DEFAULT_LOCAL_THRESHOLD = 100_000


def _local_components(edges: DataFrame) -> DataFrame:
    """Driver-side min-label union-find over a SMALL edge frontier —
    the finishing step once the distributed rounds (or the input
    itself) are below ``DEFAULT_LOCAL_THRESHOLD`` edges. Union always
    points the larger root at the smaller, so every set's root IS its
    minimum id and ``find`` returns exactly the component label the
    star-contraction converges to. Output schema matches the
    distributed path (node, component) with the input id type."""
    rows = edges.collect()
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        s, d = r["src"], r["dst"]
        if s not in parent:
            parent[s] = s
        if d not in parent:
            parent[d] = d
        rs, rd = find(s), find(d)
        if rs != rd:
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    out_rows = [(n, find(n)) for n in parent]
    spark = edges.sparkSession
    node_t = edges.schema["src"].dataType
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("node", node_t), T.StructField("component", node_t)]
    )
    return spark.createDataFrame(out_rows, schema)


def connected_components(
    pairs: DataFrame,
    src_col: str,
    dst_col: str,
    max_iter: int = 25,
    local_threshold: int = DEFAULT_LOCAL_THRESHOLD,
) -> DataFrame:
    """(node, component) labeling of the undirected graph given as an
    edge list — component = the minimum node id reachable from `node`.
    Isolated nodes (absent from `pairs`) are simply absent here; callers
    default them to themselves (see ``canonical_docs``).

    Iterates large-star/small-star until the edge set is a star forest
    — every node has exactly one outgoing edge and no edge's target
    still points elsewhere, both checked with O(|E|) aggregates —
    with ``max_iter`` as a safety bound; O(log n) rounds
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

    ``local_threshold`` is the hybrid cutoff: a frontier at or below it
    (checked on the input and after every round, off the same aggregate
    as the convergence test) finishes as a driver union-find instead of
    more distributed rounds — identical min-label output, collect
    bounded at ~20 B/edge. Pass 0 to force the distributed path.
    """
    # Checkpoint the INPUT too: the edge list is usually the output of
    # an expensive candidate generator (MinHash-LSH), and round 1
    # references it three times (symmetrize ×2 + min-join) — without
    # truncation that recomputes the generator per reference.
    edges = _truncate_lineage(
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    )
    # Hybrid finish (r19): once the frontier fits the driver — the
    # input often does for a deduplicated corpus, and the contraction
    # shrinks it geometrically otherwise — a local union-find replaces
    # the remaining rounds. Each distributed round on a tiny frontier
    # is ~2 s of pure shuffle/checkpoint machinery (measured at sf0.1:
    # 256 edges, one round = 2.1 s vs ~0.1 s local), and at real scale
    # the LAST O(log n) rounds are exactly this tiny-frontier regime.
    # The count is a cheap second action over the checkpointed blocks;
    # results are identical (min-label either way) — pinned by
    # test_connected_components_local_matches_distributed.
    n_edges = edges.count()
    for _ in range(max_iter):
        if n_edges <= local_threshold:
            return _local_components(edges)
        nxt = _truncate_lineage(_small_star(_large_star(edges)))
        # Star-forest test in ONE job: a node breaks the forest iff it
        # has out-degree > 1 (two labels) or appears as both source and
        # target (an unresolved chain). Degree-count union-aggregate —
        # no join, one action per round; the same aggregate also yields
        # the frontier's edge count (Σ out-degree) for the hybrid
        # cutoff, so the local-finish check costs no extra job.
        degrees = (
            nxt.select(F.col("src").alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i"))
            .union(nxt.select("dst", F.lit(0), F.lit(1)))
            .groupBy("node")
            .agg(F.sum("o").alias("o"), F.sum("i").alias("i"))
        )
        is_broken = (F.col("o") > 1) | ((F.col("o") > 0) & (F.col("i") > 0))
        stats = degrees.agg(
            F.sum(is_broken.cast("long")).alias("broken"),
            F.sum("o").alias("n_edges"),
        ).first()
        broken = stats["broken"] or 0
        n_edges = stats["n_edges"] or 0
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
