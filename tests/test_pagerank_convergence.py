"""Per-iteration PageRank convergence profile vs a numpy rebuild."""

import numpy as np
import pytest

from online_centrality_spark.operators import pagerank_convergence


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _numpy_profile(pairs, alpha=0.85, iters=10):
    """Dense-numpy replica of the distributed loop (uniform start,
    out-degree push, dangling mass uniform) emitting (l1, max)."""
    nodes = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    dedup = sorted({(idx[a], idx[b]) for a, b in pairs})
    outdeg = np.zeros(n)
    for a, _ in dedup:
        outdeg[a] += 1
    r = np.full(n, 1.0 / n)
    out = []
    for _ in range(iters):
        push = np.zeros(n)
        for a, b in dedup:
            push[b] += r[a] / outdeg[a]
        dangle = r[outdeg == 0].sum()
        new = alpha * push + (alpha * dangle + 1 - alpha) / n
        out.append((np.abs(new - r).sum(), np.abs(new - r).max()))
        r = new
    return out


FIXTURE = [
    (1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (1, 4), (5, 1),
    (6, 1), (7, 3), (8, 9),  # 9 is dangling
]


def test_profile_matches_numpy(spark):
    got = (
        pagerank_convergence(_edges(spark, FIXTURE), iters=10)
        .orderBy("iter")
        .collect()
    )
    want = _numpy_profile(FIXTURE, iters=10)
    assert [r["iter"] for r in got] == list(range(1, 11))
    for row, (l1, mx) in zip(got, want):
        assert row["l1_delta"] == pytest.approx(l1, abs=1e-12)
        assert row["max_delta"] == pytest.approx(mx, abs=1e-12)


def test_profile_contracts_geometrically(spark):
    """The delta curve must decay ~alpha per iteration once mixing —
    the property an operator actually reads off this telemetry."""
    got = (
        pagerank_convergence(_edges(spark, FIXTURE), iters=12)
        .orderBy("iter")
        .collect()
    )
    l1 = [r["l1_delta"] for r in got]
    assert l1[-1] < l1[2] * 0.2
    assert all(b <= a * 0.9 + 1e-15 for a, b in zip(l1[4:], l1[5:]))


def test_profile_empty_edges(spark):
    out = pagerank_convergence(_edges(spark, []), iters=5)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["iter", "l1_delta", "max_delta"]
