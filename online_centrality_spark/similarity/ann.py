"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k per query — cross join +
  zip_with/aggregate dot product (JVM-side) + ranked window. The O(n*m)
  baseline every ANN variant is validated against.

- ``lsh_topk``: random-hyperplane LSH buckets as the scale path. The
  hyperplanes are *deterministic* pseudo-random: component (p, d) is
  derived from the portable md5 hash of "p:d", mapped to [-1, 1], so
  runs are reproducible with no RNG state to ship. Queries only score
  candidates sharing a bucket in at least one table; recall is tuned by
  ``num_tables`` x ``num_planes``. Misses (queries with fewer than k
  candidates) simply return fewer rows — callers needing exactness fall
  back to brute force for those ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.embedding import cosine_expr


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def brute_force_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, item_id, cosine, rank) — exact cosine top-k, self-match excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    it = items.select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).cast("array<double>").alias("iv"),
    )
    scored = (
        q.crossJoin(it)
        .filter(F.col("query_id") != F.col("item_id"))
        .select("query_id", "item_id", cosine_expr("qv", "iv").alias("cosine"))
    )
    return _ranked_topk(scored, k)


def _hyperplane_sign(vec_col: str, plane: int, dim: int) -> F.Column:
    """Sign of <v, h_plane> with deterministic pseudo-random hyperplane."""
    comps = []
    for d in range(dim):
        h = F.conv(F.substring(F.md5(F.lit(f"{plane}:{d}")), 1, 15), 16, 10).cast(
            "double"
        )
        coef = h / F.lit(float(2**60)) * 2.0 - 1.0  # [-1, 1]
        comps.append(coef * F.element_at(F.col(vec_col), d + 1))
    dot = comps[0]
    for c in comps[1:]:
        dot = dot + c
    return (dot >= 0).cast("int")


def lsh_buckets(
    vecs: DataFrame,
    id_col: str,
    vec_col: str,
    num_tables: int,
    num_planes: int,
    dim: int,
) -> DataFrame:
    """(id, table, bucket) — sign-pattern bucket per hash table."""
    out = []
    for t in range(num_tables):
        key = None
        for p in range(num_planes):
            bit = _hyperplane_sign(vec_col, t * num_planes + p, dim)
            key = bit if key is None else key * 2 + bit
        out.append(
            vecs.select(
                F.col(id_col),
                F.lit(t).alias("table"),
                key.alias("bucket"),
            )
        )
    result = out[0]
    for df in out[1:]:
        result = result.unionByName(df)
    return result


def lsh_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 8,
    num_planes: int = 8,
) -> DataFrame:
    """(query_id, item_id, cosine, rank) — LSH-bucketed approximate top-k."""
    dim = len(items.select(vec_col).first()[0])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).persist()
    it = items.select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).cast("array<double>").alias("iv"),
    ).persist()
    qb = lsh_buckets(q, "query_id", "qv", num_tables, num_planes, dim)
    ib = lsh_buckets(it, "item_id", "iv", num_tables, num_planes, dim)
    cand = (
        qb.join(ib, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("item_id"))
        .select("query_id", "item_id")
        .distinct()
    )
    scored = (
        cand.join(q, "query_id")
        .join(it, "item_id")
        .select("query_id", "item_id", cosine_expr("qv", "iv").alias("cosine"))
    )
    return _ranked_topk(scored, k)
