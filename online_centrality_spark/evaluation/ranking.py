"""Ranking metrics as DataFrame operators (V1, V8, V9, V12, V13)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .correlation import top_k  # noqa: F401  (re-exported; V1)


def ndcg(
    relevance: DataFrame,
    prediction: DataFrame,
    k: int | None = None,
    log_decay: bool = True,
) -> float:
    """NDCG@k with deterministic node-id tiebreak (V8, ndcg_computer.py:16-28).

    Window-function formulation: position by (score desc, node_id asc),
    gain = rel / ln(pos+1) (log decay) or rel * (k-pos+1)/k (linear).

    Scalar helper (a handful of driver actions per call) — for many
    (snapshot, param) groups use the single grouped-aggregation batch
    path in ``labeling.labels.prediction_metrics`` instead.  The two
    inputs are persisted for the call's duration so the four actions
    don't re-execute their (possibly expensive) upstream pipelines.
    """
    relevance = relevance.persist()
    prediction = prediction.persist()
    try:
        return _ndcg_cached(relevance, prediction, k, log_decay)
    finally:
        prediction.unpersist()
        relevance.unpersist()


def _ndcg_cached(
    relevance: DataFrame,
    prediction: DataFrame,
    k: int | None,
    log_decay: bool,
) -> float:
    n_pred = prediction.count()
    n_rel = relevance.count()
    if k is None or k > n_pred or k > n_rel:
        k = min(n_pred, n_rel)
    if k == 0:
        return 0.0
    rel = relevance.select("node_id", F.col("score").alias("rel"))

    def dcg_of(order_df: DataFrame) -> float:
        w = Window.orderBy(F.col("score").desc(), F.col("node_id").asc())
        pos = F.row_number().over(w)
        ranked = order_df.withColumn("pos", pos).filter(F.col("pos") <= k)
        gained = ranked.join(rel, "node_id", "left").withColumn(
            "rel", F.coalesce(F.col("rel"), F.lit(0.0))
        )
        if log_decay:
            gain = F.col("rel") / F.log(F.col("pos") + 1)
        else:
            gain = F.col("rel") * (F.lit(k) - F.col("pos") + 1) / F.lit(k)
        return gained.agg(F.sum(gain)).collect()[0][0] or 0.0

    dcg_val = dcg_of(prediction)
    idcg_val = dcg_of(relevance)
    return 0.0 if idcg_val == 0.0 else float(dcg_val) / float(idcg_val)


def _relevant(labels: DataFrame) -> DataFrame:
    """Relevance threshold > 0.999 (binary_eval_computer.py:12,27)."""
    return labels.filter(F.col("score") > 0.999).select("node_id")


def precision_at_k(labels: DataFrame, prediction: DataFrame, k: int) -> float:
    relevant = _relevant(labels)
    n_rel = relevant.count()
    if n_rel == 0:
        return 0.0
    hit = top_k(prediction, k).join(relevant, "node_id", "left_semi").count()
    return hit / k


def recall_at_k(labels: DataFrame, prediction: DataFrame, k: int) -> float:
    relevant = _relevant(labels)
    n_rel = relevant.count()
    if n_rel == 0:
        return 0.0
    hit = top_k(prediction, k).join(relevant, "node_id", "left_semi").count()
    return hit / n_rel


def active_ratio(scores: DataFrame, const: float, by: list[str] | None = None) -> DataFrame:
    """Fraction of scores > const, per group (V12, eval_utils.py:42-56)."""
    agg = F.avg((F.col("score") > F.lit(const)).cast("double")).alias("active_ratio")
    if by:
        return scores.groupBy(*by).agg(agg)
    return scores.agg(agg)


def normalize_scores(scores: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Scores normalized by their (per-group) sum (V13, experiment_utils.py:112-118)."""
    w = Window.partitionBy(*by) if by else Window.partitionBy()
    return scores.withColumn("score", F.col("score") / F.sum("score").over(w))
