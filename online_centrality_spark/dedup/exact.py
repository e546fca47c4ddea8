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
