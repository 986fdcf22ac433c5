"""Shared availableNow drain for stateful streams.

Plain ``Trigger.AvailableNow`` queries terminate on their own once the
source drains — ``awaitTermination`` is enough. A query holding
``ProcessingTimeTimeout`` state does NOT: after the data drains it
loops "No new data but cleaning up state" batches forever, standing by
to service future timeouts. For those, drain-until-idle: once a
zero-input batch has run with no data available, the real data (and
every ALREADY-EXPIRED timeout — the engine services expired keys in
each batch, including the data batches) has been processed; stop the
query. Not-yet-expired timeouts are serviced by the next drain's
batches. The idle heuristic is deliberately conservative: under load
the engine can emit a zero-row batch BEFORE source listing finds new
files, so an idle report is only trusted after a data batch has run
(or a grace period passed).
"""

from __future__ import annotations

import time


def make_pair_sink_writer(
    out_dir: str, keys: list[str] | None = None, *, skip_empty: bool
):
    """foreachBatch writer shared by the stateful-dedup sinks:
    batch-local dropDuplicates on ``keys`` when given (a near-dup pair
    can surface through several shared buckets, always in its second
    item's ONE arrival batch, so this makes pair output exactly-once;
    the exact-dedup streams emit unique rows already and pass None) +
    batch_id-keyed overwrite (idempotent under checkpoint retry).
    ``skip_empty`` is the TTL-mode policy — zero-row state-cleanup
    batches must not litter the sink; the frame is persisted around the
    two actions (emptiness probe + write) because a foreachBatch plan
    re-executes per action and the probe must not run the stateful
    operator twice."""

    def write_batch(batch_df, batch_id: int) -> None:
        out = batch_df.dropDuplicates(keys) if keys else batch_df
        if not skip_empty:
            out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
            return
        out.persist()
        try:
            if not out.isEmpty():
                out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        finally:
            out.unpersist()

    return write_batch


def drain_available_now(q, timeout_s: int, *, ttl: bool) -> None:
    """Block until the availableNow query ``q`` finishes its drain.
    ``ttl=False`` → plain awaitTermination; ``ttl=True`` → the
    drain-until-idle loop above, then stop."""
    if not ttl:
        if not q.awaitTermination(timeout_s):
            # Timed out: stop the query before the caller's finally
            # restores session confs (shuffle_partitions / checkpoint
            # checksum dials), so a still-running drain never sees
            # them flip back mid-flight.
            q.stop()
            q.awaitTermination(timeout_s)
        return
    start = time.time()
    deadline = start + timeout_s
    seen_data = False
    while time.time() < deadline:
        if not q.isActive:
            break  # query died — surface its exception NOW, not at deadline
        lp = q.lastProgress
        if lp is not None and lp["numInputRows"] > 0:
            seen_data = True
        idle = (
            lp is not None
            and lp["numInputRows"] == 0
            and not q.status["isDataAvailable"]
        )
        if idle and (seen_data or time.time() - start > 10):
            break
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(timeout_s)
