"""Concept-drift reproduction (SURVEY §3.3, ConceptDrift.ipynb pattern).

Two stream segments with reshuffled hub weights (the reference samples
edge streams from a weighted graph and reshuffles weights between
segments, ``experiment_utils.py:52-87`` + ``change_weights``,
``graph_generator.py:126-134``).  Temporal-Katz scores with a fast-decay
weighter must track the ACTIVE segment's ground truth: rank correlation
against segment-B hubs must overtake segment-A's after the drift point,
while a no-decay baseline (long memory) lags.  Uses the walk path +
per-snapshot Spearman from the evaluation layer.
"""

import numpy as np

from online_centrality_spark.evaluation.kernels import spearman
from online_centrality_spark.functions.weights import ExponentialWeighter
from online_centrality_spark.operators.temporal_katz import TemporalKatz


def _segment(rng, n, E, hubs, t0, span):
    """Edges preferentially targeting ``hubs`` (weighted sampling)."""
    w = np.ones(n)
    w[hubs] = 12.0
    p = w / w.sum()
    dst = rng.choice(n, E, p=p)
    src = rng.integers(0, n, E)
    t = np.sort(rng.uniform(t0, t0 + span, E)).astype(np.int64)
    return t, src, dst


def test_temporal_katz_tracks_drift(spark):
    rng = np.random.default_rng(42)
    n, E, span = 30, 1500, 3000.0
    hubs_a = np.arange(0, 6)
    hubs_b = np.arange(20, 26)
    ta, sa, da = _segment(rng, n, E, hubs_a, 0.0, span)
    tb, sb, db = _segment(rng, n, E, hubs_b, span, span)
    t = np.concatenate([ta, tb])
    src = np.concatenate([sa, sb])
    dst = np.concatenate([da, db])
    rows = [
        (float(tt), int(s), int(d), i + 1)
        for i, (tt, s, d) in enumerate(zip(t, src, dst))
    ]
    df = spark.createDataFrame(rows, "key double, src long, dst long, seq long")

    # ground truths: per-segment expected in-degree share
    gt_a = np.ones(n)
    gt_a[hubs_a] = 12.0
    gt_b = np.ones(n)
    gt_b[hubs_b] = 12.0

    # fast decay (memory ~ segment / 10) vs slow decay (memory >> stream)
    fast = ExponentialWeighter(norm=span / 10.0, base=0.5)
    slow = ExponentialWeighter(norm=span * 50.0, base=0.5)
    tk = TemporalKatz([(0.1, fast), (0.1, slow)], n, path="walk")
    boundaries = [span * (i + 1) / 4.0 for i in range(8)]  # 4 per segment
    outs = tk.run_batch(df, [(i, b, b) for i, b in enumerate(boundaries)])

    def corr(iid, pid_idx, gt):
        pdf = outs[iid]
        pid = tk.param_ids[pid_idx]
        sub = pdf[pdf["param_id"] == pid]
        scores = np.zeros(n)
        scores[sub["node_id"].to_numpy()] = sub["score"].to_numpy()
        return spearman(scores, gt)

    # end of segment A: both params aligned with A's ground truth
    assert corr(3, 0, gt_a) > corr(3, 0, gt_b)
    # end of segment B: the fast-decay param has switched allegiance...
    assert corr(7, 0, gt_b) > corr(7, 0, gt_a)
    # ...decisively
    assert corr(7, 0, gt_b) > 0.5
    # while the slow-decay param still remembers segment A comparatively
    assert corr(7, 0, gt_b) - corr(7, 0, gt_a) > corr(7, 1, gt_b) - corr(
        7, 1, gt_a
    )
