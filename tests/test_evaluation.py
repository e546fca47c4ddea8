"""Evaluation layer vs independent reference-formula oracles."""

import math

import numpy as np
import pandas as pd
import pytest

from online_centrality_spark.evaluation import (
    active_ratio,
    align_scores,
    corr_kendall,
    corr_pearson,
    corr_spearman,
    corr_weighted_kendall,
    evaluate_pairwise,
    evaluate_sequential,
    ndcg,
    normalize_scores,
    precision_at_k,
    recall_at_k,
    top_k,
)
from online_centrality_spark.evaluation import kernels


# --- independent oracle formulas (explicit loops, reference semantics) ---

def o_rank_desc_avg(v):
    n = len(v)
    ranks = [0.0] * n
    for i in range(n):
        less = sum(1 for x in v if x > v[i])
        ties = sum(1 for x in v if x == v[i])
        ranks[i] = less + (ties + 1) / 2.0
    return ranks


def o_pearson(a, b):
    n = len(a)
    ma, mb = sum(a) / n, sum(b) / n
    num = sum((x - ma) * (y - mb) for x, y in zip(a, b))
    den = math.sqrt(
        sum((x - ma) ** 2 for x in a) * sum((y - mb) ** 2 for y in b)
    )
    return num / den


def o_kendall(a, b):
    n = len(a)
    num = dx = dy = 0
    for i in range(n):
        for j in range(i + 1, n):
            tx = np.sign(a[i] - a[j])
            ty = np.sign(b[i] - b[j])
            num += tx * ty
            dx += tx * tx
            dy += ty * ty
    return num / math.sqrt(dx * dy)


def o_wkendall(a, b):
    # computeWKendall (correlation_computer.py:93-120) on tiedranks
    rx, ry = o_rank_desc_avg(a), o_rank_desc_avg(b)
    n = len(rx)
    num_w = dxw = dyw = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            wy = 1.0 / ry[i] + 1.0 / ry[j]
            tx = np.sign(rx[i] - rx[j])
            ty = np.sign(ry[i] - ry[j])
            num_w += tx * ty * wy
            dxw += tx * tx * wy
            dyw += ty * ty * wy
    return num_w / math.sqrt(dxw * dyw)


def rand_lists(seed, n=40, ties=True):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 12 if ties else 10**9, n).astype(float)
    b = (a + rng.normal(0, 3, n)).round(0 if ties else 6)
    return a, b


@pytest.mark.parametrize("seed", range(5))
def test_kernel_correlations_vs_oracle(seed):
    a, b = rand_lists(seed)
    assert kernels.pearson(a, b) == pytest.approx(o_pearson(a, b), abs=1e-12)
    assert kernels.kendall(a, b) == pytest.approx(o_kendall(a, b), abs=1e-12)
    assert kernels.spearman(a, b) == pytest.approx(
        o_pearson(o_rank_desc_avg(a), o_rank_desc_avg(b)), abs=1e-12
    )
    assert kernels.weighted_kendall(a, b) == pytest.approx(
        o_wkendall(a, b), abs=1e-12
    )


def o_ndcg(rel, pred, k, log_decay=True):
    # ndcg_computer.py:4-28 with deterministic node-id tiebreak
    if k is None or k > len(pred) or k > len(rel):
        k = min(len(pred), len(rel))
    pred_order = [i for i, _ in sorted(pred.items(), key=lambda kv: (-kv[1], kv[0]))][:k]
    ideal_order = [i for i, _ in sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))][:k]

    def dcg(order):
        s = 0.0
        for pos, nid in enumerate(order):
            r = rel.get(nid, 0.0)
            s += r / math.log(pos + 2) if log_decay else r * (k - pos) / k
        return s

    ideal = dcg(ideal_order)
    return 0.0 if ideal == 0.0 else dcg(pred_order) / ideal


def score_df(spark, d):
    return spark.createDataFrame(
        pd.DataFrame({"node_id": list(d.keys()), "score": list(d.values())})
    )


@pytest.fixture(scope="module")
def eval_maps():
    rng = np.random.default_rng(5)
    pred = {int(i): float(s) for i, s in enumerate(rng.integers(0, 50, 60))}
    rel = {int(i): 1.0 for i in rng.choice(60, 12, replace=False)}
    rel.update({int(i) + 100: 1.0 for i in range(3)})  # relevant-but-unpredicted
    return rel, pred


def test_dataframe_ndcg_matches_kernel_and_oracle(spark, eval_maps):
    rel, pred = eval_maps
    rel_df, pred_df = score_df(spark, rel), score_df(spark, pred)
    for k in (10, None):
        for log_decay in (True, False):
            want = o_ndcg(rel, pred, k, log_decay)
            got_df = ndcg(rel_df, pred_df, k=k, log_decay=log_decay)
            got_kernel = kernels.ndcg(
                np.array(list(rel.keys())),
                np.array(list(rel.values())),
                np.array(list(pred.keys())),
                np.array(list(pred.values())),
                k=k,
                log_decay=log_decay,
            )
            assert got_df == pytest.approx(want, abs=1e-12)
            assert got_kernel == pytest.approx(want, abs=1e-12)


def test_precision_recall(spark, eval_maps):
    rel, pred = eval_maps
    rel_df, pred_df = score_df(spark, rel), score_df(spark, pred)
    k = 10
    topk = sorted(pred.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    hit = len({i for i, _ in topk} & set(rel))
    assert precision_at_k(rel_df, pred_df, k) == pytest.approx(hit / k)
    assert recall_at_k(rel_df, pred_df, k) == pytest.approx(hit / len(rel))


def test_dataframe_correlations_match_kernels(spark):
    a, b = rand_lists(7, n=50)
    la = {i: float(v) for i, v in enumerate(a)}
    lb = {i + 10: float(v) for i, v in enumerate(b)}  # partial overlap
    df_a, df_b = score_df(spark, la), score_df(spark, lb)
    ids_a = np.array(list(la.keys()))
    sa = np.array(list(la.values()))
    ids_b = np.array(list(lb.keys()))
    sb = np.array(list(lb.values()))
    _, ka, kb = kernels.align(ids_a, sa, ids_b, sb)
    assert corr_pearson(df_a, df_b) == pytest.approx(kernels.pearson(ka, kb), abs=1e-12)
    assert corr_spearman(df_a, df_b) == pytest.approx(kernels.spearman(ka, kb), abs=1e-12)
    assert corr_kendall(df_a, df_b) == pytest.approx(kernels.kendall(ka, kb), abs=1e-12)
    assert corr_weighted_kendall(df_a, df_b) == pytest.approx(
        kernels.weighted_kendall(ka, kb), abs=1e-12
    )


def test_top_k_and_utils(spark):
    d = {1: 5.0, 2: 5.0, 3: 7.0, 4: 1.0}
    got = top_k(score_df(spark, d), 2).toPandas().sort_values("node_id")
    assert got["node_id"].tolist() == [1, 3]  # deterministic tiebreak
    ar = active_ratio(score_df(spark, d), 4.0).collect()[0][0]
    assert ar == pytest.approx(0.75)
    norm = normalize_scores(score_df(spark, d)).toPandas()
    assert norm["score"].sum() == pytest.approx(1.0)
    aligned = align_scores(score_df(spark, {1: 2.0}), score_df(spark, {2: 3.0}))
    rows = {r["node_id"]: (r["a"], r["b"]) for r in aligned.collect()}
    assert rows == {1: (2.0, 0.0), 2: (0.0, 3.0)}


def test_evaluate_pairwise_and_sequential(spark, eval_maps):
    rel, pred = eval_maps
    scores = pd.DataFrame(
        {
            "measure": "tk",
            "param_id": "p0",
            "snapshot_id": 1,
            "node_id": list(pred.keys()),
            "score": list(pred.values()),
        }
    )
    # snapshot 0 = slightly perturbed copy for sequential mode
    prev = scores.copy()
    prev["snapshot_id"] = 0
    prev["score"] = prev["score"] * 1.1
    scores_df = spark.createDataFrame(pd.concat([prev, scores]))
    labels = spark.createDataFrame(
        pd.DataFrame(
            {"snapshot_id": 1, "node_id": list(rel.keys()), "score": list(rel.values())}
        )
    )
    metric_ids = ["ndcg@10", "recall@10", "precision@10", "pearson", "w_kendall_fast"]
    got = {
        r["metric"]: r["value"]
        for r in evaluate_pairwise(scores_df, labels, metric_ids)
        .filter("snapshot_id = 1")
        .collect()
    }
    eps = 1e-9
    rel_e = {k: v + eps for k, v in rel.items()}
    pred_e = {k: v + eps for k, v in pred.items()}
    assert got["ndcg@10"] == pytest.approx(o_ndcg(rel_e, pred_e, 10), abs=1e-12)
    topk = sorted(pred_e.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    hit = len({i for i, _ in topk} & {k for k, v in rel_e.items() if v > 0.999})
    assert got["recall@10"] == pytest.approx(hit / len(rel))
    assert got["precision@10"] == pytest.approx(hit / 10)
    # sequential: prev vs cur of the same series
    seq = {
        r["metric"]: r["value"]
        for r in evaluate_sequential(scores_df, ["spearman", "kendall"])
        .filter("snapshot_id = 1")
        .collect()
    }
    # identical ranking up to scaling -> rank correlations == 1
    assert seq["spearman"] == pytest.approx(1.0, abs=1e-12)
    assert seq["kendall"] == pytest.approx(1.0, abs=1e-12)


def test_weighted_kendall_fast_matches_quadratic():
    """O(n log n) decomposition == literal O(n^2) reference formulation
    to 1e-12 on random fixtures incl. heavy ties, zeros, and both
    orientations."""
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(2, 200))
        if trial % 3 == 0:
            a = rng.integers(0, 5, n).astype(float)  # heavy ties
            b = rng.integers(0, 4, n).astype(float)
        else:
            a = rng.normal(size=n)
            b = 0.5 * a + rng.normal(size=n) * (trial % 5)
        want = kernels.weighted_kendall_quadratic(a, b)
        got = kernels.weighted_kendall(a, b)
        if np.isnan(want):
            assert np.isnan(got)
        else:
            assert got == pytest.approx(want, abs=1e-12), (trial, n)
    # perfect agreement / reversal sanity
    a = np.arange(1, 50, dtype=float)
    assert kernels.weighted_kendall(a, a) == pytest.approx(1.0, abs=1e-12)
    assert kernels.weighted_kendall(a, -a) == pytest.approx(-1.0, abs=1e-12)


def test_weighted_kendall_fast_scales():
    """1e5 elements complete in seconds without n^2 memory (the
    quadratic kernel would need three ~80 GB matrices here)."""
    import time

    rng = np.random.default_rng(11)
    n = 100_000
    a = rng.normal(size=n)
    b = 0.7 * a + rng.normal(size=n)
    t0 = time.time()
    v = kernels.weighted_kendall(a, b)
    elapsed = time.time() - t0
    assert -1.0 <= v <= 1.0 and not np.isnan(v)
    assert elapsed < 30.0, elapsed
