"""Shared per-bucket cohort state machine for the streaming near-dup
detectors (``fuzzy_dedup`` MinHash signatures, ``embedding_dedup`` unit
vectors).

Both operators are the SAME stateful shape — restore the bucket's
(ids, payload-matrix) cohort, score each arriving batch block against
the cohort and against its own earlier rows (strict lower triangle),
emit threshold hits, append, persist — and that shape carries the
subtle parts: the None-vs-empty restore edge (a persisted EMPTY cohort
must restore payloads as ``None``, not a (0,)-shaped array that breaks
the later vstack; found by a hypothesis property in round 7), the
builtin-types-only ``state.update`` discipline (numpy scalars poison
the state pickle), and the arrival-order pair rule. One factory keeps
those fixed once; the operators differ only in payload dtype and the
vectorized score function.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql.streaming.state import GroupState


def make_cohort_matcher(
    *,
    id_field: str,
    payload_field: str,
    payload_dtype: type,
    score: Callable[[np.ndarray, np.ndarray], np.ndarray],
    threshold: float,
    out_a: str,
    out_b: str,
    out_score: str,
):
    """Build an ``applyInPandasWithState`` function: row i pairs with
    every cohort member plus every EARLIER row of the same batch whose
    ``score`` (an (n, m) matrix from two payload blocks) reaches
    ``threshold``, skipping id-equal rows."""

    def match_bucket(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists and len(state.get[0]):
            ids = np.asarray(state.get[0], dtype=np.int64)
            payload = np.asarray([list(v) for v in state.get[1]], dtype=payload_dtype)
        else:
            ids = np.empty(0, dtype=np.int64)
            payload = None  # (0, k) with k unknown until the first rows land
        parts: list[pd.DataFrame] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            b_ids = pdf[id_field].to_numpy(dtype=np.int64)
            b_pay = np.asarray([list(v) for v in pdf[payload_field]], dtype=payload_dtype)
            n = len(b_ids)
            if payload is not None and len(ids):
                sc = score(b_pay, payload)  # (n, m)
                hit = (sc >= threshold) & (b_ids[:, None] != ids[None, :])
                bi, ci = np.nonzero(hit)
                if len(bi):
                    parts.append(
                        pd.DataFrame(
                            {
                                out_a: np.minimum(b_ids[bi], ids[ci]),
                                out_b: np.maximum(b_ids[bi], ids[ci]),
                                out_score: sc[bi, ci],
                            }
                        )
                    )
            if n > 1:
                sc_b = score(b_pay, b_pay)
                hit_b = (
                    (sc_b >= threshold)
                    & (b_ids[:, None] != b_ids[None, :])
                    & np.tri(n, k=-1, dtype=bool)
                )
                bi, ji = np.nonzero(hit_b)
                if len(bi):
                    parts.append(
                        pd.DataFrame(
                            {
                                out_a: np.minimum(b_ids[bi], b_ids[ji]),
                                out_b: np.maximum(b_ids[bi], b_ids[ji]),
                                out_score: sc_b[bi, ji],
                            }
                        )
                    )
            ids = np.concatenate([ids, b_ids])
            payload = b_pay if payload is None else np.vstack([payload, b_pay])
        # builtin types only: numpy scalars poison the state pickle.
        state.update((ids.tolist(), payload.tolist() if payload is not None else []))
        if parts:
            out = pd.concat(parts, ignore_index=True)
            out[out_a] = out[out_a].astype("int64")
            out[out_b] = out[out_b].astype("int64")
            yield out

    return match_bucket
