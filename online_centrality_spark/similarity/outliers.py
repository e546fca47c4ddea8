"""Per-cluster embedding outliers (mislabel / anomaly candidates).

A standard training-data curation pass: for every labeled cluster of
embeddings, compute the cluster centroid and rank members by squared
L2 distance to it — the far tail is where mislabeled, corrupted, or
out-of-distribution examples concentrate.

Scale shape: the centroid is a (label, dim) two-stage hash aggregation
over the posexploded matrix (map-side partials collapse each task's
rows to one partial centroid per label before the shuffle — the same
shape as the engine's other algebraic aggs); distances reuse the
exploded frame with one more groupBy. The final per-label top-k is a
window over label partitions — label count is the cluster count
(bounded, like ``topk_per_language``'s strata), never a global sort.
Explode factor is the embedding dim (constant), not data-dependent.

No counterpart in the reference; extends the §2.8 training-data
pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def embedding_outliers(
    emb: DataFrame,
    top_k: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``top_k`` members farthest from their label's centroid.

    Returns ``(label, vec_id, d2, rk)`` with ``d2`` the squared L2
    distance to the label centroid rounded to 6 (the rank's sort key,
    so the top-k boundary decision is identical across engines) and
    ``rk`` in 1..top_k, ties broken by id.
    """
    dims = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "val"),
    )
    cent = dims.groupBy("label", "dim").agg(F.avg("val").alias("c"))
    d2 = (
        dims.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.round(F.sum(F.pow(F.col("val") - F.col("c"), 2)), 6).alias("d2"))
    )
    w = Window.partitionBy("label").orderBy(F.desc("d2"), F.col("vec_id"))
    return (
        d2.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("label", "vec_id", "d2", "rk")
    )
