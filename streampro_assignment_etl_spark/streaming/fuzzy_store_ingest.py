"""Streaming document ingest through the persisted LSH signature store
(``operators/minhash.signature_store`` / ``incremental_fuzzy_matches``).

The batch half gives arrival-batch fuzzy dedup against an already-signed
corpus; real pipelines ingest documents as a STREAM. This module closes
that loop the way ``index_ingest`` closes the ANN one: ``foreachBatch``
over the doc stream, each micro-batch probed against the store, accepted
docs landing in BOTH halves of the store's layout —

* ``store/ingest=<id>/``  — the batch's (doc_id, band_id, band_hash)
  band rows (what future batches probe against);
* ``docs/ingest=<id>/``   — the batch's accepted (doc_id, text) rows
  (what verification point-looks-up);
* ``decisions/ingest=<id>/`` — the dropped docs' (doc_id, dup_of,
  jaccard) audit log;
* ``applied/<stream>/b<id>`` — the replay marker.

Exactly-once under foreachBatch's at-least-once replay, by construction:

* every write is an OVERWRITE of the batch's own ``ingest=`` subtree —
  a retried batch re-lands its own rows in place, never duplicates;
* the probe EXCLUDES the batch's own subtree (partition filter on the
  ``ingest`` column), so a replayed batch can never match ITSELF in the
  store and silently drop its own docs — the one replay shape the
  overwrite alone cannot make idempotent;
* the ``applied`` marker short-circuits fully-committed batches.

Semantics per batch: exact within-batch collapse first (lowest doc_id
per identical text — a micro-batch that contains the same doc twice
lands it once), then fuzzy match vs the store with the batch operator's
best-match selection. NEAR-dup pairs arriving inside one micro-batch
both land (next batches will match the survivor); cross-batch fuzzy
dups are the store's job, within-stream fuzzy cohorts are
``fuzzy_dedup.py``'s — compose them upstream if both are needed.

Scale shape: each batch costs the batch's shingle+sign pass, one
equi-join against the store's band rows, and a candidate point-lookup
into the accepted-docs table — never a corpus re-sign (the measured
argument is SCALE.md "Incremental fuzzy dedup vs the signature store").

≙ reference: none (north-star extension). Composition: minhash.py +
the subtree-overwrite + marker discipline of index_ingest.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators import minhash
from .index_ingest import _marker_exists, _write_marker

STORE_DIR = "store"
DOCS_DIR = "docs"
DECISIONS_DIR = "decisions"


def _read_subtrees(
    spark: SparkSession, base: str, schema: T.StructType
) -> DataFrame:
    """All committed ``ingest=`` subtrees under ``base`` with the
    ``ingest`` partition column attached; empty frame (with schema)
    when nothing has landed yet."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.option("basePath", base).parquet(base)
    except AnalysisException:
        return spark.createDataFrame(
            [], T.StructType(schema.fields + [T.StructField("ingest", T.StringType())])
        )


def read_store_bands(spark: SparkSession, store_path: str) -> DataFrame:
    return _read_subtrees(
        spark,
        f"{store_path}/{STORE_DIR}",
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("band_id", T.IntegerType()),
                T.StructField("band_hash", T.LongType()),
            ]
        ),
    )


def read_store_docs(spark: SparkSession, store_path: str) -> DataFrame:
    return _read_subtrees(
        spark,
        f"{store_path}/{DOCS_DIR}",
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )


def read_decisions(spark: SparkSession, store_path: str) -> DataFrame:
    return _read_subtrees(
        spark,
        f"{store_path}/{DECISIONS_DIR}",
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("dup_of", T.LongType()),
                T.StructField("jaccard", T.DoubleType()),
            ]
        ),
    )


def make_fuzzy_ingest_writer(
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    stream_name: str = "ingest",
):
    """The ``foreachBatch`` body, exposed so tests can drive the replay
    contract directly. The store's LSH geometry is fixed at writer
    construction and must match every prior writer of this store
    (band hashes are seed-dependent — a mismatch silently yields zero
    candidates; see ``incremental_fuzzy_matches``)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if _marker_exists(store_path, stream_name, batch_id):
            return
        spark = batch_df.sparkSession
        cur = f"{stream_name}-b{batch_id:012d}"
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                _write_marker(store_path, stream_name, batch_id)
                return
            # exact within-batch collapse: lowest id per identical text
            batch = (
                batch_df.select(id_col, text_col)
                .withColumn("_fp", F.md5(F.col(text_col)))
                .groupBy("_fp")
                .agg(F.min(F.struct(id_col, text_col)).alias("_s"))
                .select("_s.*")
            )
            # probe against every subtree EXCEPT our own (replay guard)
            store = read_store_bands(spark, store_path).filter(
                F.col("ingest") != cur
            )
            corpus = read_store_docs(spark, store_path).filter(
                F.col("ingest") != cur
            )
            matches = minhash.incremental_fuzzy_matches(
                batch,
                corpus,
                store.select(id_col, "band_id", "band_hash"),
                id_col,
                text_col,
                threshold=threshold,
                num_hashes=num_hashes,
                bands=bands,
                shingle_n=shingle_n,
            ).persist()
            survivors = batch.join(matches, id_col, "left_anti").persist()
            if not matches.isEmpty():
                matches.write.mode("overwrite").parquet(
                    f"{store_path}/{DECISIONS_DIR}/ingest={cur}"
                )
            if not survivors.isEmpty():
                survivors.select(id_col, text_col).write.mode("overwrite").parquet(
                    f"{store_path}/{DOCS_DIR}/ingest={cur}"
                )
                minhash.signature_store(
                    survivors,
                    id_col,
                    text_col,
                    num_hashes=num_hashes,
                    bands=bands,
                    shingle_n=shingle_n,
                ).write.mode("overwrite").parquet(
                    f"{store_path}/{STORE_DIR}/ingest={cur}"
                )
            matches.unpersist()
            survivors.unpersist()
            _write_marker(store_path, stream_name, batch_id)
        finally:
            batch_df.unpersist()
            from ..queries.catalog import release_persisted

            release_persisted()  # incremental_fuzzy_matches track-persists

    return apply_batch


def run_fuzzy_store_ingest_stream(
    doc_stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    timeout_s: int = 300,
    **writer_kwargs,
) -> None:
    """Drain a document stream into the store at ``store_path``
    (availableNow; re-runs resume from the checkpoint). The store may
    start empty — the first batch seeds it."""
    q = (
        doc_stream.writeStream.outputMode("append")
        .foreachBatch(make_fuzzy_ingest_writer(store_path, **writer_kwargs))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)


def run_fuzzy_store_ingest_from_dir(
    spark: SparkSession,
    landing_dir: str,
    store_path: str,
    checkpoint_dir: str,
    timeout_s: int = 300,
    max_files_per_trigger: int | None = None,
    **writer_kwargs,
) -> None:
    """Convenience runner: parquet landing dir → store. Each dropped
    file is a micro-batch when ``max_files_per_trigger=1``."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    run_fuzzy_store_ingest_stream(
        reader.parquet(landing_dir),
        store_path,
        checkpoint_dir,
        timeout_s=timeout_s,
        **writer_kwargs,
    )
