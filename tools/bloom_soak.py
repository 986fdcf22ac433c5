"""Bloom-gate soak: the decontamination gate vs the exact broadcast join.

Usage: ``python tools/bloom_soak.py [sf_dir]`` (default /tmp/sf1 — the
copy-scaled corpus ``tools/make_scaled_testdata.py`` builds). Prints one
JSON line: exact-join wall, per-geometry bloom build/probe walls,
flagged-doc parity (exact ⊆ bloom must hold — false negatives are
impossible by construction) and the FP overflag count. The numbers
behind SCALE.md's "bloom gate postmortem"."""
import json, sys, time
sys.path.insert(0, "/root/repo")
from streampro_assignment_etl_spark.session import get_spark
from streampro_assignment_etl_spark.sources.testdata import load_table
from streampro_assignment_etl_spark.functions.approx import (
    bloom_array, bloom_filter_members, bloom_word_rows,
)
from streampro_assignment_etl_spark.operators.minhash import shingles_from_words
from pyspark.sql import functions as F

spark = get_spark("soak-bloom")
spark.sparkContext.setLogLevel("ERROR")
docs = load_table(spark, (sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"), "documents")
grams = docs.select("doc_id", F.split("text", " ").alias("_w")).select(
    "doc_id", F.explode(F.array_distinct(shingles_from_words(F.col("_w"), 5))).alias("gram")
)
ev = grams.filter(F.col("doc_id") % 7 == 0)
tr = grams.filter(F.col("doc_id") % 7 != 0)

n_ev = ev.select("gram").distinct().count()

# exact: broadcast join, >=1 shared gram (same pruning-free comparison)
t0 = time.perf_counter()
exact_docs = set(
    r.doc_id for r in tr.join(
        F.broadcast(ev.select("gram").distinct()), "gram"
    ).select("doc_id").distinct().collect()
)
t_exact = time.perf_counter() - t0

results = {"n_eval_grams": n_ev, "exact_sec": round(t_exact, 2),
           "exact_docs": len(exact_docs), "bloom": []}
for words in (1024, 65536):
    t0 = time.perf_counter()
    arr = bloom_array(bloom_word_rows(ev, "gram", words=words), words=words)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    bloom_docs = set(
        r.doc_id for r in bloom_filter_members(tr, "gram", arr)
        .select("doc_id").distinct().collect()
    )
    t_probe = time.perf_counter() - t0
    results["bloom"].append({
        "words": words, "bits": words * 60,
        "build_sec": round(t_build, 2), "probe_sec": round(t_probe, 2),
        "flagged_docs": len(bloom_docs),
        "no_false_negatives": exact_docs <= bloom_docs,
        "overflag_docs": len(bloom_docs - exact_docs),
    })
print(json.dumps(results))
