"""Scale-path operators for the LLM-training-data pipeline (north star).

Algorithms Spark lacks as built-ins, composed from DataFrame primitives
so they stay JVM-side and shuffle-bounded:

* ``minhash`` — MinHash-LSH banded candidate generation + exact n-gram
  Jaccard verification (fuzzy dedup, O(n·bands), never all-pairs).
* ``simhash`` — 60-bit SimHash + pigeonhole banding for Hamming-ball
  candidate generation (near-dup at fixed bit distance).
* ``similarity`` — IVF-Flat approximate nearest neighbors (centroid
  partitioning + multiprobe), validated against brute-force cosine.
* ``ann_index`` — the persisted IVF-PQ index (build once / serve many):
  encoded corpus partitioned by cell + JSON model artifact, queried via
  partition-pruned scans; bit-equal to the composed in-memory path.
* ``multimodal`` — binary media columns + typed metadata with
  Arrow-batched mapInPandas featurize/resize/frame-sample operators
  (codec step stubbed; plumbing real).
"""

from . import ann_index, minhash, multimodal, simhash, similarity  # noqa: F401
