"""Exact deduplication by content hash (hash-groupBy).

One shuffle on the 60-bit content hash; the canonical row per duplicate
group is the minimum doc id (deterministic). At 100 TB this is the
standard first pass: the hash groupBy partial-aggregates map-side, so
only (hash, id) pairs shuffle — never document bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import portable_hash


def exact_duplicate_groups(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(text_hash, n_dups, keep_id) for every group with > 1 copy."""
    hashed = docs.select(
        F.col(id_col), portable_hash(F.col(text_col)).alias("text_hash")
    )
    return (
        hashed.groupBy("text_hash")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_dups") > 1)
    )


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Documents with exactly one (min-id) representative per distinct text."""
    hashed = docs.withColumn("_h", portable_hash(F.col(text_col)))
    keep = hashed.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return docs.join(keep, id_col, "left_semi")


def soft_dedup_weights(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, group_size, weight) — SoftDeDup-style per-document
    training weights: every document keeps its row, but its sampling
    weight is 1/n where n is the size of its exact-duplicate group, so
    each distinct content contributes total mass 1 to the training mix
    regardless of how many times it was crawled.

    The soft alternative to ``exact_dedup``'s hard drop (downweighting
    duplicated data instead of deleting it preserves rare in-duplicate
    variation signals and keeps the pipeline reversible). Same scale
    shape as the hard path: one map-side-combinable groupBy on the
    60-bit content hash — only (hash, count) pairs shuffle — then one
    hash-keyed join back; never a window over document bodies.

    ``weight`` is round(1/n, 9), a fixed double expression over the
    exact integer count, so results are bit-identical across partition
    layouts and to the SQL oracle.
    """
    hashed = docs.select(
        F.col(id_col), portable_hash(F.col(text_col)).alias("_h")
    )
    sizes = hashed.groupBy("_h").agg(F.count("*").alias("group_size"))
    return (
        hashed.join(sizes, "_h")
        .select(
            id_col,
            "group_size",
            F.round(F.lit(1.0) / F.col("group_size"), 9).alias("weight"),
        )
    )
