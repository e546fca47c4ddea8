"""Score-list alignment + correlations as DataFrame operators (V2-V7).

For big per-snapshot node sets, Pearson and Spearman run entirely
JVM-side: alignment is a full-outer join with coalesce(0.0)
(``proc_corr``, correlation_computer.py:63-75), Spearman's average-tie
ranks come from two window functions, and the correlation itself is the
built-in ``corr`` aggregate. Kendall / weighted Kendall (pair statistics
over tie-corrected ranks) run in the vectorized numpy kernel via one
Arrow task — per-snapshot cardinalities are small relative to the edge
stream, which is exactly the reference's regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import kernels


def top_k(scores: DataFrame, k: int) -> DataFrame:
    """Top-k rows by score, deterministic node-id tiebreak (V1).

    ``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject: every
    partition keeps a local k-heap and only k rows per partition reach
    the driver-side merge — no single-partition global sort (the
    unpartitioned-window formulation would funnel the whole score table
    through one task).
    """
    return scores.orderBy(F.col("score").desc(), F.col("node_id").asc()).limit(k)


def top_k_per_group(
    scores: DataFrame, k: int, by: list[str], id_col: str = "node_id"
) -> DataFrame:
    """Top-k rows by score within each group (grouped V1): one
    window-ranked pass, deterministic id tiebreak — the per-stratum
    reporting shape (top docs per language, top actors per snapshot)."""
    w = Window.partitionBy(*by).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scores.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .withColumnRenamed("_rn", "rank")
    )


def align_scores(list_1: DataFrame, list_2: DataFrame) -> DataFrame:
    """Full-outer align on node_id with 0.0 fill (V2): (node_id, a, b)."""
    a = list_1.select("node_id", F.col("score").alias("a"))
    b = list_2.select("node_id", F.col("score").alias("b"))
    return a.join(b, "node_id", "full_outer").select(
        "node_id",
        F.coalesce(F.col("a"), F.lit(0.0)).alias("a"),
        F.coalesce(F.col("b"), F.lit(0.0)).alias("b"),
    )


def _maybe_topk(df: DataFrame, k: int | None) -> DataFrame:
    return top_k(df, k) if k is not None else df


def _safe_corr(df: DataFrame, c1: str, c2: str) -> float | None:
    """Pearson as covar/(sd*sd) with try_divide: NULL (None) for constant
    input, matching scipy's NaN instead of ANSI-mode division-by-zero."""
    row = df.agg(
        F.try_divide(
            F.covar_samp(c1, c2), F.stddev_samp(c1) * F.stddev_samp(c2)
        ).alias("r")
    ).collect()[0]
    return row["r"]


def corr_pearson(list_1: DataFrame, list_2: DataFrame, k: int | None = None) -> float:
    aligned = align_scores(_maybe_topk(list_1, k), _maybe_topk(list_2, k))
    return _safe_corr(aligned, "a", "b")


def _avg_tie_rank(col: str) -> F.Column:
    """Average-tie rank on decreasing order: min_rank + (ties - 1) / 2."""
    w = Window.orderBy(F.col(col).desc())
    ties = Window.partitionBy(col)
    return F.rank().over(w) + (F.count("*").over(ties) - 1) / 2.0


def corr_spearman(list_1: DataFrame, list_2: DataFrame, k: int | None = None) -> float:
    aligned = align_scores(_maybe_topk(list_1, k), _maybe_topk(list_2, k))
    ranked = aligned.select(
        _avg_tie_rank("a").alias("ra"), _avg_tie_rank("b").alias("rb")
    )
    return _safe_corr(ranked, "ra", "rb")


def _collect_aligned(list_1: DataFrame, list_2: DataFrame, k: int | None):
    pdf = align_scores(_maybe_topk(list_1, k), _maybe_topk(list_2, k)).toPandas()
    return pdf["a"].to_numpy(float), pdf["b"].to_numpy(float)


def corr_kendall(list_1: DataFrame, list_2: DataFrame, k: int | None = None) -> float:
    a, b = _collect_aligned(list_1, list_2, k)
    return kernels.kendall(a, b)


def corr_weighted_kendall(list_1: DataFrame, list_2: DataFrame) -> float:
    a, b = _collect_aligned(list_1, list_2, None)
    return kernels.weighted_kendall(a, b)
