"""Numpy metric kernels shared by the DataFrame ops and the grouped
per-snapshot evaluation job.

Semantics follow the reference's evaluation layer with one documented
deviation: the reference random-shuffles tied prediction scores
(``ndcg_computer.py:20``, ``binary_eval_computer.py:8``); we break ties
deterministically by node id so results are reproducible (SURVEY §5.4).

- alignment: full outer on node id, missing scores -> 0.0, ordered by the
  second list's order then leftover ids ascending
  (``correlation_computer.py:63-75``)
- tiedrank: decreasing-score average-tie ranks (``correlation_computer.py:78-80``)
- weighted Kendall: the reference's pair weight 1/rankY[i] + 1/rankY[j]
  over all aligned positions (``correlation_computer.py:93-120``; the
  O(n log n) variant ``:225-254`` computes the same statistic — we keep
  the vectorized O(n^2) formulation, exact and fast to ~10^4 nodes per
  snapshot, which matches per-snapshot cardinalities)
- NDCG / precision / recall: ``ndcg_computer.py:4-28``,
  ``binary_eval_computer.py:4-32`` (relevance threshold > 0.999)
"""

from __future__ import annotations

import numpy as np


def align(
    ids1: np.ndarray, s1: np.ndarray, ids2: np.ndarray, s2: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Align two (id, score) lists: order = list-2 ids (in their given
    order) then list-1-only ids sorted ascending; missing scores 0.0.
    Returns (ids, a, b) where a = list-1 scores, b = list-2 scores."""
    m1 = dict(zip(ids1.tolist(), s1.tolist()))
    m2 = dict(zip(ids2.tolist(), s2.tolist()))
    extra = sorted(set(m1) - set(m2))
    order = list(ids2.tolist()) + extra
    a = np.array([m1.get(i, 0.0) for i in order])
    b = np.array([m2.get(i, 0.0) for i in order])
    return np.array(order), a, b


def tiedrank(v: np.ndarray) -> np.ndarray:
    """Average-tie ranks on decreasing score order (rank 1 = largest)."""
    v = np.asarray(v, dtype=np.float64)
    order = np.argsort(-v, kind="mergesort")
    ranks = np.empty(len(v), dtype=np.float64)
    sorted_v = v[order]
    i = 0
    while i < len(v):
        j = i
        while j + 1 < len(v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        avg = (i + j) / 2.0 + 1.0
        ranks[order[i : j + 1]] = avg
        i = j + 1
    return ranks


def pearson(a: np.ndarray, b: np.ndarray) -> float:
    a = a - a.mean()
    b = b - b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum())
    return float((a * b).sum() / denom) if denom > 0 else float("nan")


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    return pearson(tiedrank(a), tiedrank(b))


def kendall(a: np.ndarray, b: np.ndarray) -> float:
    """Kendall tau-b with tie correction (scipy.stats.kendalltau parity)."""
    n = len(a)
    if n < 2:
        return float("nan")
    sx = np.sign(a[:, None] - a[None, :])
    sy = np.sign(b[:, None] - b[None, :])
    iu = np.triu_indices(n, k=1)
    tx, ty = sx[iu], sy[iu]
    num = float((tx * ty).sum())
    denom = np.sqrt(float((tx * tx).sum()) * float((ty * ty).sum()))
    return num / denom if denom > 0 else float("nan")


def weighted_kendall(a: np.ndarray, b: np.ndarray) -> float:
    """Reference WKendall: pair weight 1/rankY[i] + 1/rankY[j] with Y = b's
    average-tie ranks; numerator sign-product, denominators weighted
    non-tie counts (``computeWKendall``)."""
    rx, ry = tiedrank(a), tiedrank(b)
    n = len(rx)
    if n < 2:
        return float("nan")
    wy = 1.0 / ry
    weight = wy[:, None] + wy[None, :]
    sx = np.sign(rx[:, None] - rx[None, :])
    sy = np.sign(ry[:, None] - ry[None, :])
    iu = np.triu_indices(n, k=1)
    w, tx, ty = weight[iu], sx[iu], sy[iu]
    num_w = float((tx * ty * w).sum())
    denom_xw = float((tx * tx * w).sum())
    denom_yw = float((ty * ty * w).sum())
    denom = np.sqrt(denom_xw * denom_yw)
    return num_w / denom if denom > 0 else float("nan")


def _top_order(ids: np.ndarray, scores: np.ndarray, k: int) -> np.ndarray:
    """Top-k ids by decreasing score, deterministic node-id tiebreak."""
    order = np.lexsort((ids, -scores))
    return ids[order[:k]]


def dcg_at(rel_map: dict, pred_order: np.ndarray, k: int, log_decay: bool) -> float:
    val = 0.0
    for i in range(min(k, len(pred_order))):
        rel = float(rel_map.get(int(pred_order[i]), 0.0))
        if log_decay:
            val += rel / np.log(i + 2)
        else:
            val += rel * float(k - i) / k
    return val


def ndcg(
    rel_ids: np.ndarray,
    rel_scores: np.ndarray,
    pred_ids: np.ndarray,
    pred_scores: np.ndarray,
    k: int | None = None,
    log_decay: bool = True,
) -> float:
    if k is None or k > len(pred_ids) or k > len(rel_ids):
        k = min(len(pred_ids), len(rel_ids))
    pred_order = _top_order(pred_ids, pred_scores, k)
    ideal_order = _top_order(rel_ids, rel_scores, k)
    rel_map = dict(zip(rel_ids.tolist(), rel_scores.tolist()))
    dcg_val = dcg_at(rel_map, pred_order, k, log_decay)
    idcg_val = dcg_at(rel_map, ideal_order, k, log_decay)
    return 0.0 if idcg_val == 0.0 else dcg_val / idcg_val


def precision_recall(
    rel_ids: np.ndarray,
    rel_scores: np.ndarray,
    pred_ids: np.ndarray,
    pred_scores: np.ndarray,
    k: int,
) -> tuple[float, float]:
    predicted = set(_top_order(pred_ids, pred_scores, k).tolist())
    relevant = set(rel_ids[rel_scores > 0.999].tolist())
    if not relevant:
        return 0.0, 0.0
    hit = len(predicted & relevant)
    return hit / k, hit / len(relevant)
