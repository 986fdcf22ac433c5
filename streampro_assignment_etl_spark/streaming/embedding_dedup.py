"""Streaming embedding near-dup detection: cross-batch cosine dedup
over SRP-LSH bucket cohorts (``applyInPandasWithState``).

The embedding counterpart of ``fuzzy_dedup`` (text MinHash cohorts):
an online pipeline asks "is this INCOMING vector a near-duplicate
(cosine ≥ τ) of anything ever seen" — across micro-batches and
restarts. State is keyed by the vector's SRP-LSH bucket (the SAME
deterministic ±1 hyperplanes as the batch ``lsh_topk`` /
``embedding_near_dup_cells`` family, ``operators/similarity.py
hyperplanes``/``srp_bucket``, so batch and stream agree on the bucket
geometry) and holds the (vec_id, unit vector) cohort that ever landed
there; an arrival is compared only against its cohort — one numpy
matrix product per bucket per batch, no Python loop over rows or
cohort members.

Multiprobe recall: each vector is STORED under its own bucket and
every 1-bit flip (n_planes+1 rows), so a pair collides iff their base
buckets are within Hamming distance 2 — the same symmetric-multiprobe
trade as the batch cell blocking (`near_dup_pairs_cells`), with
recall quantified there. A pair that collides through several shared
buckets is emitted in each; the runner's batch-local
``dropDuplicates`` makes output exactly-once (the second vector's one
arrival batch is the only batch that can emit the pair).

Scale: state per bucket = its cohort of unit vectors (near-dup
neighborhoods only — 2^n_planes-sparse buckets); the stream shuffles
n_planes+1 (bucket, id, vector) rows per vector. Cosine is computed
EXACTLY on the stored vectors (not an LSH estimate): the bucket bound
is the candidate filter, the emission predicate is exact — same
two-stage contract as every batch dedup in this repo.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from ..operators.similarity import (
    DEFAULT_PLANES,
    _as_double,
    _finite_positive,
    hyperplanes,
    norm,
    srp_bucket,
)

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("vec_a", T.LongType()),
        T.StructField("vec_b", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("vecs", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]
)


def _cohort_matcher(threshold: float):
    """Per-bucket exact-cosine matcher: cohort unit vectors as an
    ``(m, d)`` float64 matrix, each batch's ``(n, d)`` block scored
    with ONE matrix product (unit vectors ⇒ dot IS cosine). The
    stateful shape lives once in ``_cohort.make_cohort_matcher``
    (shared with the MinHash fuzzy dedup)."""
    from ._cohort import make_cohort_matcher

    return make_cohort_matcher(
        id_field="vec_id",
        payload_field="unit",
        payload_dtype=np.float64,
        score=lambda A, B: A @ B.T,
        threshold=threshold,
        out_a="vec_a",
        out_b="vec_b",
        out_score="cos_sim",
    )


def embedding_dedup_stream(
    vec_stream: DataFrame,
    threshold: float = 0.9,
    n_planes: int = DEFAULT_PLANES,
    dim: int = 64,
) -> DataFrame:
    """Streaming near-dup pair detector over embeddings:
    (vec_a, vec_b, cos_sim) whenever an incoming vector's EXACT cosine
    against any previously-seen cohort vector reaches ``threshold``.
    One stateful hop: map-side unit-normalize + SRP bucket (JVM
    expressions) → explode own bucket + 1-bit flips → per-bucket cohort
    state. Zero/NaN/inf-norm vectors are dropped map-side, like every
    batch similarity path."""
    planes = hyperplanes(dim, n_planes)
    v = _as_double("embedding")
    base = (
        vec_stream.select("vec_id", v.alias("_v"), norm(v).alias("_n"))
        .filter(_finite_positive(F.col("_n")))
        .select(
            "vec_id",
            F.transform(F.col("_v"), lambda x: x / F.col("_n")).alias("unit"),
            srp_bucket(F.col("_v"), planes).alias("_b"),
        )
    )
    flips = F.array(F.lit(0), *[F.lit(1 << j) for j in range(n_planes)])
    rows = base.select(
        "vec_id",
        "unit",
        F.explode(
            F.transform(flips, lambda f: F.col("_b").bitwiseXOR(f))
        ).alias("bucket"),
    )
    return rows.groupBy("bucket").applyInPandasWithState(
        _cohort_matcher(threshold),
        outputStructType=PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_embedding_dedup_stream(
    spark,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.9,
    n_planes: int = DEFAULT_PLANES,
    dim: int = 64,
    timeout_s: int = 300,
) -> None:
    """Drain a landing dir of vector JSONL ({vec_id, embedding:[...]})
    through the streaming embedding dedup into parquet. Multiprobe can
    surface a pair through several shared buckets, always in the ONE
    batch where its second vector arrives — batch-local dropDuplicates
    makes pair output exactly-once; the batch_id-keyed overwrite keeps
    checkpoint retries idempotent."""
    src_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    stream = spark.readStream.schema(src_schema).json(landing_dir)
    pairs = embedding_dedup_stream(
        stream, threshold=threshold, n_planes=n_planes, dim=dim
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.dropDuplicates(["vec_a", "vec_b"]).write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    q = (
        pairs.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
