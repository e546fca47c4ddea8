"""Distributed embedding covariance — the exact Gram/covariance matrix
of an ``array<float>`` column, computed as scaled-int64 sums so the
answer is bit-identical under any partition layout.

No reference counterpart (``/root/reference/python`` has no embedding
analytics); this is the screening pass run before PCA/whitening on a
training-embedding corpus: which dimensions carry variance, which pairs
are redundant.

Scale design: the element frame is one ``posexplode`` (d rows per
vector, JVM-side); the pair products come from a self-join ON THE
VECTOR KEY (co-partitioned, no fan-out beyond the d(d+1)/2 cells each
vector contributes map-side) and reduce into d(d+1)/2 accumulator
cells — output cardinality is dim-squared, independent of corpus size.
Every sum is an INT64 of per-row ``round(x_i * x_j * 1e12)`` products
(both engines round the identical double product), so the shuffle
carries exact integers and the gate hash is noise-free; only the final
covariance normalization floats, rounded to 6. At very wide dims the
same cells are better fed by a per-partition Arrow Gram
(``mapInPandas`` partial matmul) — the cell schema here is already the
mergeable form that path would emit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROD_SCALE = 1_000_000_000_000  # 1e12: x_i * x_j product scale
MEAN_SCALE = 1_000_000  # 1e6: element scale for the mean sums


def embedding_covariance(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(i, j, cov)`` for every dimension pair ``i <= j`` (0-based):
    ``cov_ij = E[x_i x_j] - E[x_i] E[x_j]`` over all vectors, rounded
    to 6. Deterministic under any layout (integer-sum reduction)."""
    long_ = (
        emb.select(
            F.col(id_col).alias("vid"),
            F.posexplode(F.col(vec_col)).alias("i", "x"),
        )
        # float32 storage -> double BEFORE any product, so both engines
        # round the identical double
        .select("vid", "i", F.col("x").cast("double").alias("x"))
        .persist()
    )
    n = long_.select("vid").distinct().count()
    if n == 0:
        raise ValueError("embedding_covariance: empty input")
    means = long_.groupBy("i").agg(
        F.sum(F.round(F.col("x") * MEAN_SCALE).cast("long")).alias("ms")
    )
    pairs = (
        long_.select("vid", "i", "x")
        .join(
            long_.select(
                "vid", F.col("i").alias("j"), F.col("x").alias("y")
            ),
            "vid",
        )
        .filter(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.round(F.col("x") * F.col("y") * PROD_SCALE).cast("long")
            ).alias("ps")
        )
    )
    return (
        pairs.join(means.select(F.col("i"), F.col("ms").alias("mi")), "i")
        .join(means.select(F.col("i").alias("j"), F.col("ms").alias("mj")), "j")
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.round(
                (F.col("ps") / PROD_SCALE) / n
                - (F.col("mi") / MEAN_SCALE / n)
                * (F.col("mj") / MEAN_SCALE / n),
                6,
            ).alias("cov"),
        )
    )


def label_centroid_distances(
    emb: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """``(label_a, label_b, dist)`` for every unordered label pair —
    the Euclidean distance between per-label centroids: the class
    confusion/separability screen run before training a classifier on
    the embedding corpus (two labels whose centroids nearly coincide
    will not separate). Complements ``embedding_outliers`` (within-
    label spread) with the between-label geometry. No reference
    counterpart.

    Scale design: the centroid stage is one posexplode + one
    map-side-combinable (label, dim) groupBy whose output is
    |labels|·d cells — bounded by schema, not corpus; the sums are
    scaled int64 (round(x*1e6) per element), so centroids are exact
    integer ratios and layout-proof. The pairwise stage is a self-join
    of that bounded frame on the dimension key (|labels|²·d rows, still
    schema-bounded). Only the final distance floats, rounded to 6
    (cross-engine double noise on a d-term sum is ~1e-14).
    """
    cent = (
        emb.select(
            F.col(label_col).alias("lbl"),
            F.posexplode(F.col(vec_col)).alias("i", "x"),
        )
        .select("lbl", "i", F.col("x").cast("double").alias("x"))
        .groupBy("lbl", "i")
        .agg(
            F.sum(F.round(F.col("x") * 1e6).cast("long")).alias("ms"),
            F.count("*").alias("cnt"),
        )
        .select(
            "lbl", "i", (F.col("ms") / 1e6 / F.col("cnt")).alias("c")
        )
    )
    a, b = cent.alias("a"), cent.alias("b")
    return (
        a.join(b, (F.col("a.i") == F.col("b.i")) & (F.col("a.lbl") < F.col("b.lbl")))
        .groupBy(
            F.col("a.lbl").alias("label_a"), F.col("b.lbl").alias("label_b")
        )
        .agg(
            F.round(
                F.sqrt(F.sum(F.pow(F.col("a.c") - F.col("b.c"), 2))), 6
            ).alias("dist")
        )
    )
