from .correlation import (
    align_scores,
    corr_kendall,
    corr_pearson,
    corr_spearman,
    corr_weighted_kendall,
)
from .metrics import evaluate_pairwise, evaluate_sequential
from .ranking import active_ratio, ndcg, normalize_scores, precision_at_k, rbo, recall_at_k, top_k

__all__ = [
    "align_scores",
    "corr_pearson",
    "corr_spearman",
    "corr_kendall",
    "corr_weighted_kendall",
    "top_k",
    "ndcg",
    "rbo",
    "precision_at_k",
    "recall_at_k",
    "active_ratio",
    "normalize_scores",
    "evaluate_pairwise",
    "evaluate_sequential",
]
