"""SimHash fingerprints + near-duplicate pairs by Hamming distance.

32-bit SimHash over token hashes: bit b of the fingerprint is set iff
``sum over tokens of (2 * bit_b(hash(token)) - 1) >= 0``. Tokens carry
multiplicity (classic term-frequency weighting). The bit-count
aggregation is 32 conditional sums in one groupBy — single shuffle, no
explode over bits, fully codegen'd.

Near-dup pairs: block on the 4 bytes of the fingerprint (a Hamming-
distance-<=3-in-any-byte relaxation would use all one-byte-off keys; we
use exact byte blocks — pairs must agree on at least one byte, which is
guaranteed for hamming distance <= 3 by pigeonhole over 4 blocks), then
verify the true Hamming distance with JVM ``bit_count(a ^ b)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import TOKEN_RE

BITS = 32


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash) — 32-bit fingerprint as a long."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("tok"),
    ).select(
        id_col,
        F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{b}")
        for b in range(BITS)
    ]
    agg = toks.groupBy(id_col).agg(*bit_sums)
    fingerprint = None
    for b in range(BITS):
        term = F.when(F.col(f"b{b}") >= 0, F.lit(2**b)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return agg.select(id_col, fingerprint.cast("long").alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming distance <= max_hamming."""
    fp = simhash_fingerprints(docs, text_col, id_col).persist()
    blocks = fp.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright(F.col("simhash"), 8 * i)
                        .bitwiseAND(F.lit(255))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", F.col("bk.blk").alias("blk"), F.col("bk.key").alias("key"))
    a = blocks.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("ha"), "blk", "key"
    )
    b = blocks.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("hb"), "blk", "key"
    )
    cand = (
        a.join(b, ["blk", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
