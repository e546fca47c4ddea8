"""MinHash + LSH near-duplicate candidate generation.

Pipeline: shingle -> k salted minhashes -> band buckets -> bucket
self-join. The i-th hash family member is ``H(shingle || '#' || i)``
with the portable 60-bit md5 hash, so signatures are deterministic and
reproducible in plain SQL. Banding: ``num_bands`` bands of
``k / num_bands`` rows; the band key is the md5 of the joined signature
slice. Docs sharing any band bucket become candidates — the classic
S-curve trade-off — after which callers verify with true Jaccard
(``ngram_jaccard_pairs``) if exactness is needed.

Scale notes: signatures are one explode + groupBy(doc, i).min — shuffle
volume is k rows per doc, not per shingle (partial agg folds map-side);
bucket join fan-out is bounded by dropping buckets above
``max_bucket_size`` (hub buckets = boilerplate shingle sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import spread, word_ngrams


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 16,
) -> DataFrame:
    """(doc_id, i, minhash) — k min-hash values per doc."""
    grams = spread(docs).select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
    )
    salted = grams.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        F.col("gram"),
    ).select(
        id_col,
        "i",
        F.conv(
            F.substring(F.md5(F.concat_ws("#", F.col("gram"), F.col("i"))), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    return salted.groupBy(id_col, "i").agg(F.min("h").alias("minhash"))


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 16,
    num_bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs from shared LSH buckets."""
    sig = minhash_signatures(docs, text_col, id_col, n, k)
    rows_per_band = k // num_bands
    banded = sig.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
    buckets = (
        banded.groupBy(id_col, "band")
        .agg(F.sort_array(F.collect_list(F.struct("i", "minhash"))).alias("sig"))
        .select(
            id_col,
            "band",
            F.md5(
                F.concat_ws(",", F.transform("sig", lambda s: s["minhash"]))
            ).alias("bucket"),
        )
    )
    if max_bucket_size is not None:
        ok = (
            buckets.groupBy("band", "bucket")
            .agg(F.count("*").alias("sz"))
            .filter(F.col("sz") <= max_bucket_size)
            .select("band", "bucket")
        )
        buckets = buckets.join(ok, ["band", "bucket"], "left_semi")
    a = buckets.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    b = buckets.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
