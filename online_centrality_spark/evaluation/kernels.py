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
  over all aligned positions (``correlation_computer.py:93-120``).
  :func:`weighted_kendall` computes the statistic in O(n log n) via a
  tie-mass decomposition + merge-sort weighted inversion count (same
  asymptotics as the reference's FastWKendall ``:225-254``, independent
  derivation); the literal O(n^2) formulation survives as
  :func:`weighted_kendall_quadratic`, the test cross-check
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


def weighted_kendall_quadratic(a: np.ndarray, b: np.ndarray) -> float:
    """Reference WKendall, literal O(n^2) formulation: pair weight
    1/rankY[i] + 1/rankY[j] with Y = b's average-tie ranks; numerator
    sign-product, denominators weighted non-tie counts
    (``computeWKendall``, correlation_computer.py:93-120).  Kept as the
    cross-check for :func:`weighted_kendall` — it materializes three
    n x n matrices, so it is test-scale only."""
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


def _weighted_inversions(
    y: np.ndarray, w: np.ndarray
) -> tuple[float, np.ndarray, np.ndarray]:
    """Sum of (w_i + w_j) over pairs i < j (by position) with y_i > y_j
    strictly — a merge-sort inversion count where every level's cross
    count is one vectorized ``searchsorted`` + suffix-sum gather (C
    speed; O(n log^2 n) total because merges use a stable argsort).
    Returns (total, y sorted ascending, w in that order)."""
    n = len(y)
    if n < 2:
        return 0.0, y, w
    mid = n // 2
    d1, y1, w1 = _weighted_inversions(y[:mid], w[:mid])
    d2, y2, w2 = _weighted_inversions(y[mid:], w[mid:])
    # cross pairs: i in left half, j in right half, y_i > y_j
    pos = np.searchsorted(y1, y2, side="right")  # per j: #left <= y_j
    cnt_gt = len(y1) - pos
    suf = np.concatenate([np.cumsum(w1[::-1])[::-1], [0.0]])
    d = d1 + d2 + float((cnt_gt * w2).sum()) + float(suf[pos].sum())
    ym = np.concatenate([y1, y2])
    wm = np.concatenate([w1, w2])
    o = np.argsort(ym, kind="mergesort")
    return d, ym[o], wm[o]


def _tie_group_weight(key: np.ndarray, w: np.ndarray) -> float:
    """Sum of (w_i + w_j) over pairs tied on ``key``: per tie group G,
    Sum_{i<j in G} (w_i + w_j) = (|G| - 1) * Sum_{i in G} w_i."""
    _, inv = np.unique(key, return_inverse=True)
    cnt = np.bincount(inv)
    sw = np.bincount(inv, weights=w)
    return float(((cnt - 1) * sw).sum())


def weighted_kendall(a: np.ndarray, b: np.ndarray) -> float:
    """Reference WKendall statistic in O(n log n): identical to
    :func:`weighted_kendall_quadratic` (cross-checked to 1e-12) without
    the n x n matrices.

    Decomposition over the pair weight w_ij = 1/rankY[i] + 1/rankY[j]:
    with T = Sum over ALL pairs of w_ij = (n-1) * Sum w, and TX / TY / TB
    the weighted masses of pairs tied in X / in Y / in both,

        denomXW = T - TX,  denomYW = T - TY,
        numW    = (T - TX - TY + TB) - 2 * D

    where D is the weighted mass of strictly discordant pairs, counted
    by a merge-sort inversion pass over Y in (X asc, Y asc) order (X-tie
    and Y-tie pairs produce no strict inversion in that order).
    """
    rx, ry = tiedrank(a), tiedrank(b)
    n = len(rx)
    if n < 2:
        return float("nan")
    w = 1.0 / ry
    t_w = (n - 1) * float(w.sum())
    tx_w = _tie_group_weight(rx, w)
    ty_w = _tie_group_weight(ry, w)
    # both-tied groups: rank pairs as one combined key — ranks live in
    # [1, n] on an exact 0.5 grid, so distinct rx differ by >= 0.5 and
    # rx * (2n + 1) + ry separates all (rx, ry) pairs in exact float64
    tb_w = _tie_group_weight(rx * (2 * n + 1.0) + ry, w)
    order = np.lexsort((ry, rx))
    d_w, _, _ = _weighted_inversions(ry[order], w[order])
    num_w = (t_w - tx_w - ty_w + tb_w) - 2.0 * d_w
    denom = np.sqrt((t_w - tx_w) * (t_w - ty_w))
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
