"""Custom stateful streaming operator: cross-batch exact dedup
(``applyInPandasWithState``).

The batch dedup operators (queries/extensions.py, operators/minhash.py)
answer "what is duplicated in this corpus"; a streaming training-data
pipeline needs the online form — "have I EVER seen this document
before" — across micro-batches and restarts. Spark has no built-in for
that (``dropDuplicates`` on a stream needs watermark-bounded state and
forgets), so this is the applyInPandasWithState case: state is keyed
by content fingerprint, lives in the state store, and survives
checkpoint restarts.

Scale properties: state per DISTINCT fingerprint is one int; the
stream shuffles by fingerprint (same key-width argument as batch
fingerprint dedup); keys never expire (NoTimeout) because "seen
before" has no horizon — at 100 TB you would shard the state store or
swap in a bloom-filter state per key-range, which changes only the
state schema, not the operator shape.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("fingerprint", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.IntegerType())])


def fingerprinted(docs: DataFrame) -> DataFrame:
    """Attach the normalized-content md5 (same normalization as the
    batch `dedup_fingerprint` query, so batch and stream agree on what
    a duplicate is)."""
    fp = F.md5(F.lower(F.regexp_replace("text", r"[ \t\n\r\f\x0B]+", " ")))
    return docs.select("doc_id", "text", fp.alias("fingerprint"))


def _emit_first_unseen(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per fingerprint: emit the lowest-doc_id row the FIRST time the
    fingerprint is ever seen; afterwards (same batch or any later one)
    emit nothing. State = a single 'seen' flag."""
    if state.exists:
        return
    best: pd.DataFrame | None = None
    for pdf in pdfs:
        cand = pdf.nsmallest(1, "doc_id")
        if best is None or cand["doc_id"].iloc[0] < best["doc_id"].iloc[0]:
            best = cand
    if best is not None:
        state.update((1,))
        yield best[["doc_id", "text", "fingerprint"]]


def dedup_stream(doc_stream: DataFrame) -> DataFrame:
    """Streaming exact-dedup: one output row per never-before-seen
    fingerprint, state persisted across micro-batches via the
    checkpointed state store."""
    return (
        fingerprinted(doc_stream)
        .groupBy("fingerprint")
        .applyInPandasWithState(
            _emit_first_unseen,
            outputStructType=DOC_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_dedup_stream(
    spark: Any, landing_dir: str, out_dir: str, checkpoint_dir: str, timeout_s: int = 300
) -> None:
    """Drain a landing dir of docs JSONL through the stateful dedup into
    parquet (availableNow; re-runs resume the fingerprint state). Each
    micro-batch overwrites its own ``batch_id=N`` subtree so checkpoint
    retries are idempotent (exactly-once, matching the state-store
    semantics; a bare append would double-emit on retry)."""
    src_schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spark.readStream.schema(src_schema).json(landing_dir)
    deduped = dedup_stream(stream)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    q = (
        deduped.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
