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


def rbo(
    a: DataFrame,
    b: DataFrame,
    depth: int = 50,
    p: float = 0.9,
    id_col: str = "node_id",
    score_col: str = "score",
) -> DataFrame:
    """One row ``(depth, p, overlap_at_depth, rbo)`` — truncated
    Rank-Biased Overlap (Webber, Moffat & Zobel 2010) between two score
    rankings: RBO@D = sum_{d=1..D} (1-p) p^(d-1) |A_d ∩ B_d| / d, the
    top-weighted list-agreement metric that (unlike Kendall/Spearman)
    handles non-conjoint lists and discounts tail disagreement
    geometrically.

    Determinism and scale:
    - ranks = score DESC, id ASC via TakeOrderedAndProject (top-``depth``
      per side — no global sort task); the row_number runs on the
      depth-bounded frame only ("bounded by depth, not data").
    - an item in both prefixes enters the intersection at
      d = max(rank_a, rank_b), so every |A_d ∩ B_d| falls out of ONE
      inner join + a cumulative window over the depth-sized frame.
    - the geometric weights (1-p) p^(d-1) / d are PRECOMPUTED python
      doubles attached as literals (no cross-engine pow()), each term
      is scaled to int64 before the final sum (layout-proof total,
      the scaled-int64 rule used across the repo).
    """
    if depth <= 0:
        raise ValueError(f"depth must be positive, got {depth}")
    if not (0.0 < p < 1.0):
        raise ValueError(f"p must be in (0, 1), got {p}")
    spark = a.sparkSession

    def prefix(df, rank_name):
        top = df.select(
            F.col(id_col).alias("id"), F.col(score_col).alias("s")
        ).orderBy(F.col("s").desc(), F.col("id").asc()).limit(depth)
        w = Window.orderBy(F.col("s").desc(), F.col("id").asc())
        return top.select(
            "id", F.row_number().over(w).alias(rank_name)
        )
    ra = prefix(a, "ra")
    rb = prefix(b, "rb")
    entry_depth = ra.join(rb, "id").select(
        F.greatest("ra", "rb").alias("d")
    )
    per_depth = entry_depth.groupBy("d").agg(F.count("*").alias("n"))
    weights = spark.createDataFrame(
        [(d, (1.0 - p) * (p ** (d - 1)) / d) for d in range(1, depth + 1)],
        "d long, w double",
    )
    wd = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    terms = (
        weights.join(per_depth, "d", "left")
        .select(
            "d",
            "w",
            F.sum(F.coalesce(F.col("n"), F.lit(0))).over(wd).alias("ov"),
        )
        .select(
            "d",
            "ov",
            F.round(F.col("ov") * F.col("w") * 1e15)
            .cast("long")
            .alias("t"),
        )
    )
    return (
        terms.agg(
            F.max(F.when(F.col("d") == depth, F.col("ov"))).alias(
                "overlap_at_depth"
            ),
            F.round(F.sum("t") / 1e15, 9).alias("rbo"),
        )
        .select(
            F.lit(depth).cast("long").alias("depth"),
            F.lit(float(p)).alias("p"),
            "overlap_at_depth",
            "rbo",
        )
    )
