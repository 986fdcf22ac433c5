"""Persisted IVF-PQ index: build once, serve many.

``similarity.ivfpq_topk`` composes the full pipeline in memory — it
re-derives centroids/codebooks and re-encodes the ENTIRE corpus on
every call. Correct, but at 10⁹ vectors the encode pass alone dominates
any query batch; the serving shape every production ANN system uses is
a persisted index:

* ``build_ivfpq_index`` runs the expensive corpus pass ONCE — cell
  assignment + PQ encoding as the same fused zero-shuffle projection as
  the composed path — and writes:
  - ``<path>/encoded-<token>``: (neighbor_id, _code0.._code{m-1})
    parquet, **partitioned by cell**, so a query batch's scan prunes to
    its probed cells at the file listing (the pruning-to-scan pattern
    of `pipeline/catalog_ops` external tables); a fresh dir per build,
  - ``<path>/model``: the centroid list + per-subspace codebooks as one
    JSON document (Python ``json`` round-trips finite doubles
    bit-exactly — shortest-repr emit, exact parse — so a reloaded model
    probes/encodes on the IDENTICAL floats the build used), plus the
    NAME of the encoded dir holding this model's codes — the manifest
    write is the rebuild's atomic commit point (pointer swap, see
    ``build_ivfpq_index``).
* ``append_to_ivfpq_index`` is the incremental-ingest half: a new
  batch is encoded under the RESIDENT model (batch-linear, corpus
  untouched) and appended into the manifest's snapshot — bit-equal to
  a full rebuild over the union under the same model.
* ``ivfpq_topk_over_index`` answers a query batch by loading the model
  (small by contract: C centroids + m·n_codes codewords), scanning ONLY
  the probed-cell partitions of the encoded corpus, and running the
  SAME relational ADC shortlist + exact re-rank code the composed path
  uses (``similarity._adc_shortlist`` / ``similarity._exact_rerank``)
  — results are bit-equal to ``ivfpq_topk`` by construction (pinned in
  tests/test_operators.py, and the driver-shape oracle re-passes over
  the index in queries/dedup_ann.similarity_ann_ivfpq_index).

Scale notes: the index holds m bytes of codes per vector (plus the id)
— ~12 B/row at m=4 vs ~520 B for the raw float64 vector, so a 10⁹-row
index is ~12 GB of parquet across C partitions, and a P-of-C probe
batch reads ~P/C of that. The exact re-rank fetches raw vectors for
only the ``shortlist`` survivors via an id-equi-join against the
corpus table — the point-lookup pattern (at warehouse scale, back that
table by a bucketed-by-id layout so the fetch is also pruned). Writing
one partition dir per cell is the right layout while C ≤ O(10³); for
C beyond the file-listing sweet spot, bucket by cell instead.

≙ reference: none (north-star extension; the reference has no vector
surface). Composition/citations: similarity.py's IVF/PQ operators.
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    CentroidList,
    PQCodebooks,
    _adc_shortlist,
    _exact_rerank,
    assign_cells,
    collect_centroids,
    pq_codebooks,
    pq_encode,
    probe_cells,
    seed_centroids,
)

ENCODED_DIR = "encoded"  # legacy fixed layout; new builds use encoded-<token>
MODEL_DIR = "model"
_MODEL_VERSION = 1


@dataclass(frozen=True)
class IvfPqModel:
    """The driver-resident half of a persisted index: everything needed
    to probe cells and build ADC LUTs without touching the corpus.
    ``encoded_dir`` is the manifest pointer — the model names WHICH
    encoded snapshot its codes live in (see ``build_ivfpq_index``)."""

    centroids: CentroidList
    codebooks: PQCodebooks
    n_centroids: int
    m: int
    n_codes: int
    dim: int
    encoded_dir: str = ENCODED_DIR


def build_ivfpq_index(
    emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 4,
    n_codes: int = 16,
    centroids: CentroidList | None = None,
    codebooks: PQCodebooks | None = None,
) -> IvfPqModel:
    """One corpus pass → persisted index at ``path``.

    Centroids/codebooks default to the deterministic id-seeded model
    (oracle-replayable); pass ``kmeans_centroids`` /
    ``pq_codebooks_kmeans`` output for trained indexes — the layout and
    query path are identical (``m``/``n_codes`` are derived from a
    caller-supplied ``codebooks``, so a geometry mismatch between the
    two is impossible by construction). The encoded corpus write is the
    fused assign+encode projection (zero shuffles before the
    partitioned write's own exchange).

    Rebuild atomicity (snapshot-pointer pattern): each build writes its
    codes to a FRESH ``encoded-<token>`` dir, then commits by
    overwriting the one-row model manifest that names that dir. A crash
    between the two writes leaves the OLD manifest pointing at the OLD
    (intact) snapshot — readers never see new codes under old
    centroids, the failure mode a fixed in-place ``encoded/`` overwrite
    cannot avoid. Superseded snapshot dirs are garbage, not hazard;
    ``expire_ivfpq_snapshots`` sweeps them by retention (any dir the
    current manifest doesn't name), same as table-format snapshot
    expiry."""
    cents = centroids or collect_centroids(
        seed_centroids(emb, id_col, vec_col, n_centroids)
    )
    cbs = codebooks or pq_codebooks(emb, id_col, vec_col, m, n_codes)
    # The codebooks ARE the geometry: a trained book with m=8 passed
    # alongside the default m=4 must not silently persist half the
    # subspaces (and n_centroids only seeds the default centroid draw).
    m = len(cbs)
    n_codes = len(cbs[0])
    dim = len(cents[0][1])
    encoded_dir = f"{ENCODED_DIR}-{uuid.uuid4().hex[:12]}"

    cells = assign_cells(emb, cents, id_col, vec_col)
    enc = pq_encode(cells, cbs, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "cell", *[f"_code{j}" for j in range(m)]
    )
    enc.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/{encoded_dir}")

    _commit_manifest(emb.sparkSession, path, cents, cbs, dim, encoded_dir)
    return IvfPqModel(
        centroids=cents,
        codebooks=cbs,
        n_centroids=len(cents),
        m=m,
        n_codes=n_codes,
        dim=dim,
        encoded_dir=encoded_dir,
    )


def _commit_manifest(
    spark: SparkSession,
    path: str,
    cents: CentroidList,
    cbs: PQCodebooks,
    dim: int,
    encoded_dir: str,
) -> None:
    """Overwrite the one-row model manifest — the atomic commit point
    for builds AND compactions. One-row text write through Spark, not
    ``open()``: the index path may be any Hadoop-compatible FS
    (s3a://...), same contract as the parquet half."""
    doc = {
        "version": _MODEL_VERSION,
        "n_centroids": len(cents),
        "m": len(cbs),
        "n_codes": len(cbs[0]),
        "dim": dim,
        "encoded_dir": encoded_dir,
        "centroids": [[int(cid), list(map(float, v))] for cid, v in cents],
        "codebooks": [
            [[int(code), list(map(float, w))] for code, w in book] for book in cbs
        ],
    }
    spark.createDataFrame([(json.dumps(doc),)], "value string").coalesce(
        1
    ).write.mode("overwrite").text(f"{path}/{MODEL_DIR}")


def compact_ivfpq_index(spark: SparkSession, path: str) -> IvfPqModel:
    """Rewrite the index's snapshot with one file per cell partition and
    pointer-swap the manifest — the OPTIMIZE step an append-heavy index
    needs. Every ``append_to_ivfpq_index`` lands one file per (append,
    cell); after a year of daily ingest a probed cell's scan opens ~365
    files whose per-file overhead (open + footer + tiny row groups)
    dwarfs the code bytes. Compaction is pure IO — read the current
    snapshot, ``repartition("cell")`` so each cell's rows land in one
    task → ONE file per cell dir, write a fresh snapshot, commit the
    manifest (same model, new dir). No re-encode, no result change
    (bit-equal pinned in tests); the swap is atomic under the same
    snapshot-pointer rule as rebuilds, so live readers finish on the
    old snapshot. Single-writer contract: don't run concurrent
    appends/compactions against one index path — last manifest wins."""
    model = load_ivfpq_model(spark, path)
    enc = spark.read.parquet(f"{path}/{model.encoded_dir}")
    new_dir = f"{ENCODED_DIR}-{uuid.uuid4().hex[:12]}"
    enc.repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/{new_dir}"
    )
    _commit_manifest(spark, path, model.centroids, model.codebooks, model.dim, new_dir)
    return IvfPqModel(
        centroids=model.centroids,
        codebooks=model.codebooks,
        n_centroids=model.n_centroids,
        m=model.m,
        n_codes=model.n_codes,
        dim=model.dim,
        encoded_dir=new_dir,
    )


def expire_ivfpq_snapshots(spark: SparkSession, path: str) -> list[str]:
    """Retention sweep: delete every encoded snapshot dir the CURRENT
    manifest does not name — the garbage rebuilds and compactions leave
    behind by design (their write order makes the swap atomic; see
    ``build_ivfpq_index``). Returns the deleted dir names, sorted.

    Same grace-period discipline as table-format snapshot expiry: a
    reader that loaded the manifest BEFORE the latest swap may still be
    scanning a superseded dir, so at scale this runs on a schedule with
    a horizon comfortably above the longest query job (e.g. daily,
    deleting snapshots superseded for >24 h), not inline after every
    rebuild. Filesystem access goes through ``pyarrow.fs`` — the same
    local/S3/HDFS seam as ``pipeline/lake.py``."""
    import pyarrow.fs as pafs

    model = load_ivfpq_model(spark, path)
    if "://" in path:
        fs, base = pafs.FileSystem.from_uri(path)
    else:
        fs, base = pafs.LocalFileSystem(), path
    infos = fs.get_file_info(pafs.FileSelector(base, recursive=False))
    doomed = sorted(
        i.base_name
        for i in infos
        if i.type == pafs.FileType.Directory
        and (
            i.base_name.startswith(f"{ENCODED_DIR}-")
            or i.base_name == ENCODED_DIR  # legacy fixed layout
        )
        and i.base_name != model.encoded_dir
    )
    for d in doomed:
        fs.delete_dir(f"{base}/{d}")
    return doomed


def append_to_ivfpq_index(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfPqModel:
    """Incremental ingest: encode ONLY the new batch under the index's
    EXISTING model and append its (neighbor_id, cell, codes) rows into
    the manifest's current snapshot — the daily-ingest shape. Cost is
    one map-side assign+encode projection over the BATCH; the resident
    corpus is never touched, which is the whole point at 10⁹ vectors
    (a 10⁶-row day lands in seconds regardless of corpus size).

    Consistency: the model is unchanged, so appended codes are mutually
    consistent with resident ones by construction — serving after an
    append is bit-equal to a full rebuild over the union under the same
    model (pinned in tests). The append commits through the job-level
    output committer: a failed append leaves staging debris, never
    half-visible codes, and the manifest needs no rewrite (it names the
    dir, and the dir's contents grew under the same model). Caller
    contract: batch ids are NEW ids — the index stores rows, not keys;
    run the incremental-dedup ops upstream. When drift accumulates
    (appended mass pulling cell occupancy away from the trained
    centroids' balance), retrain via ``build_ivfpq_index`` — the
    snapshot-pointer rebuild swaps atomically under live readers."""
    spark = new_emb.sparkSession
    model = load_ivfpq_model(spark, path)
    cells = assign_cells(new_emb, model.centroids, id_col, vec_col)
    enc = pq_encode(cells, model.codebooks, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        "cell",
        *[f"_code{j}" for j in range(model.m)],
    )
    enc.write.mode("append").partitionBy("cell").parquet(
        f"{path}/{model.encoded_dir}"
    )
    return model


def load_ivfpq_model(spark: SparkSession, path: str) -> IvfPqModel:
    """Read back the model artifact. Loud on version mismatch — codes
    written under one model are meaningless probed under another (same
    failure mode as the bloom slot-version guard)."""
    rows = spark.read.text(f"{path}/{MODEL_DIR}").collect()
    if len(rows) != 1:
        raise ValueError(
            f"index model at {path}/{MODEL_DIR} has {len(rows)} rows, expected 1"
        )
    doc = json.loads(rows[0]["value"])
    if doc.get("version") != _MODEL_VERSION:
        raise ValueError(
            f"index model version {doc.get('version')} != code version "
            f"{_MODEL_VERSION}: rebuild the index"
        )
    return IvfPqModel(
        centroids=[(int(cid), [float(x) for x in v]) for cid, v in doc["centroids"]],
        codebooks=[
            [(int(code), [float(x) for x in w]) for code, w in book]
            for book in doc["codebooks"]
        ],
        n_centroids=int(doc["n_centroids"]),
        m=int(doc["m"]),
        n_codes=int(doc["n_codes"]),
        dim=int(doc["dim"]),
        # Pre-snapshot manifests (no key) point at the legacy fixed dir.
        encoded_dir=str(doc.get("encoded_dir", ENCODED_DIR)),
    )


def ivfpq_topk_over_index(
    emb: DataFrame,
    queries: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    probes: int = 4,
    shortlist: int = 100,
    allowed: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ top-k served from a persisted index: probe cells from the
    loaded model, scan ONLY those cell partitions of the encoded
    corpus (a literal IN filter on the partition column — static
    pruning at the file listing, pinned in tests/test_plans.py), ADC
    shortlist, exact re-rank against ``emb`` (the raw-vector store; an
    id-equi-join point lookup over ``shortlist`` ids per query).
    Bit-equal to ``similarity.ivfpq_topk`` with the same model — both
    paths share ``_adc_shortlist``/``_exact_rerank``.

    ``allowed`` is FILTERED search — the metadata-filter feature every
    production vector store ships (tenant / label / freshness
    predicates): a frame whose ``id_col`` lists the eligible neighbor
    ids; candidates are restricted by a semi-join BEFORE ADC scoring,
    so the shortlist is spent entirely on eligible vectors (top-k
    *among the filtered set*, not a post-filter of the unfiltered
    top-k, which under-fills k whenever the filter is selective).
    Scale note: a semi-join is the right shape while the filter is a
    query-time set; a filter used on EVERY query (e.g. tenant id)
    belongs in the index rows themselves — add it as a column next to
    the codes and it pushes into the pruned scan for free."""
    spark = emb.sparkSession
    model = load_ivfpq_model(spark, path)
    # The manifest names the snapshot its codes live in — reading the
    # dir it points at (not a fixed path) is what makes a half-finished
    # rebuild invisible to queries.
    enc = spark.read.parquet(f"{path}/{model.encoded_dir}")

    probed = probe_cells(queries, model.centroids, id_col, vec_col, probes)
    # The probed cell set is Q×P ints, bounded by contract (queries are
    # a batch, not a stream) — collect it so the scan filter is LITERAL
    # and prunes partitions statically, not via a runtime DPP subquery.
    cell_rows = probed.select("cell").distinct().collect()
    cell_ids = sorted(r["cell"] for r in cell_rows)
    if not cell_ids:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, l2sq_micro long"
        )
    pruned = enc.filter(F.col("cell").isin(cell_ids))
    cand = (
        probed.select("query_id", "cell")
        .join(pruned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    if allowed is not None:
        cand = cand.join(
            allowed.select(F.col(id_col).alias("neighbor_id")).distinct(),
            "neighbor_id",
            "left_semi",
        )
    short = _adc_shortlist(cand, queries, model.codebooks, id_col, vec_col, shortlist)
    if short is None:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, rank int, l2sq_micro long"
        )
    return _exact_rerank(short, queries, emb, id_col, vec_col, k)
