"""Embedding-cosine near-duplicate detection.

Cosine similarity as a JVM higher-order-function expression
(``zip_with`` dot product + ``aggregate`` norms — no Python). The
all-pairs form is the exactness baseline; at scale, candidate pairs come
from the LSH bucketing in ``similarity.ann`` and only candidates pay the
full dot product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cosine_expr(a: str, b: str) -> Column:
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + v * v))"
    nb = f"sqrt(aggregate({b}, 0.0D, (acc, v) -> acc + v * v))"
    return F.expr(f"({dot}) / (({na}) * ({nb}))")


def embedding_near_dups(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """(doc_a, doc_b, cosine) pairs with cosine >= threshold, a < b."""
    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    a = vecs.select(F.col(id_col).alias("doc_a"), F.col("v").alias("va"))
    b = vecs.select(F.col(id_col).alias("doc_b"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
    return pairs.select(
        "doc_a", "doc_b", cosine_expr("va", "vb").alias("cosine")
    ).filter(F.col("cosine") >= threshold)
