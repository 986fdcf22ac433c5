"""SimHash near-duplicate detection (north-star operator).

60-bit SimHash over whitespace tokens: each token hashes to a 60-bit
integer (md5 prefix, engine-portable — see below); bit k of the
signature is the majority vote of bit k across the document's tokens.
Near-duplicates are pairs within a small Hamming distance.

Candidate generation uses the pigeonhole principle: split the 60 bits
into ``chunks`` equal slices — any pair with Hamming distance
< chunks must agree exactly on at least one slice, so grouping on
(slice_id, slice_value) finds all such pairs with one shuffle,
never an all-pairs join. Verification computes the exact Hamming
distance via bit_count(xor).

Portability note: the token hash is the first 15 hex chars of md5
(60 bits, always positive in a signed 64-bit int) rather than
xxhash64, because md5 is the one hash with identical output in both
Spark and DuckDB — keeping the whole operator oracle-checkable.

Hot-path layout (like minhash.minhash_signatures): tokens explode to
rows, per-bit counts are plain ``SUM((h >> k) & 1)`` aggregates —
codegen'd and map-side combined — rather than interpreted
higher-order array folds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 60
DEFAULT_CHUNKS = 4  # detects Hamming distance <= 3 exactly


def token_hash60(token: Column) -> Column:
    """60-bit integer hash of a token: conv(md5[:15], 16, 10)."""
    return F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("long")


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sig) 60-bit SimHash signatures.

    Majority vote per bit: bit k of sig is set iff >= half the doc's
    tokens have bit k set (duplicated tokens vote repeatedly, matching
    the SQL ``unnest`` oracle).
    """
    # Small-file guard (see minhash.fuzzy_dup_pairs): spread the
    # tokenize+hash map side across the cluster when the corpus arrives
    # in few input splits; gated on the actual partition count so a
    # many-split corpus skips the shuffle (guide §2.4).
    from ._spread import spread_small_input

    tok = (
        spread_small_input(df)
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_w"))
        .select(id_col, token_hash60(F.col("_w")).alias("_h"))
    )
    counts = tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.shiftright(F.col("_h"), k).bitwiseAND(F.lit(1))).alias(f"_b{k}")
            for k in range(BITS)
        ],
    )
    sig = F.lit(0).cast("long")
    for k in range(BITS):
        sig = sig + F.when(
            F.col(f"_b{k}") * 2 >= F.col("_n"), F.lit(2**k).cast("long")
        ).otherwise(F.lit(0))
    return counts.select(F.col(id_col), sig.alias("sig"))


def simhash_slices(sig: Column, chunks: int = DEFAULT_CHUNKS) -> Column:
    """Array of ``chunks`` equal bit-slices of a signature."""
    width = BITS // chunks
    mask = (1 << width) - 1
    return F.array(
        *[
            F.shiftright(sig, j * width).bitwiseAND(F.lit(mask))
            for j in range(chunks)
        ]
    )


def near_dup_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 3,
    chunks: int = DEFAULT_CHUNKS,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming distance <= max_distance.

    Exact for max_distance < chunks (pigeonhole guarantee); candidate
    generation is one shuffle on (slice_id, slice_value).
    """
    if max_distance >= chunks:
        raise ValueError("pigeonhole exactness needs max_distance < chunks")
    sigs = docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    sigs = simhash_signatures(sigs, "_id", "_t")
    exploded = sigs.select(
        "_id",
        "sig",
        F.posexplode(simhash_slices(F.col("sig"), chunks)).alias(
            "slice_id", "slice_val"
        ),
    )
    buckets = (
        exploded.groupBy("slice_id", "slice_val")
        .agg(F.array_sort(F.collect_list(F.struct("_id", "sig"))).alias("members"))
        .filter(F.size("members") > 1)
    )
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("members"),
                        lambda x, i: F.transform(
                            F.slice(
                                F.col("members"),
                                i + F.lit(2),
                                F.size(F.col("members")) - i - 1,
                            ),
                            lambda y: F.struct(
                                x["_id"].alias("doc_a"),
                                y["_id"].alias("doc_b"),
                                F.bit_count(x["sig"].bitwiseXOR(y["sig"])).alias(
                                    "hamming"
                                ),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b", "p.hamming")
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_distance)
