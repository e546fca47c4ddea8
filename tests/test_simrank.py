"""SimRank vs a dense-matrix truncated-iteration replay."""

import random

import numpy as np
import pytest

from online_centrality_spark.operators.simrank import simrank


def _simrank_brute(pairs, c=0.8, k=3):
    eset = {(s, d) for s, d in pairs if s != d}
    nodes = sorted({n for p in eset for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    inn = [[] for _ in range(n)]
    for s, d in eset:
        inn[idx[d]].append(idx[s])
    s_mat = np.eye(n)
    for _ in range(k):
        nxt = np.eye(n)
        for a in range(n):
            for b in range(n):
                if a == b or not inn[a] or not inn[b]:
                    continue
                tot = sum(s_mat[u, v] for u in inn[a] for v in inn[b])
                nxt[a, b] = c * tot / (len(inn[a]) * len(inn[b]))
        s_mat = nxt
    return {
        (nodes[a], nodes[b]): s_mat[a, b]
        for a in range(n)
        for b in range(n)
        if nodes[a] < nodes[b] and s_mat[a, b] > 0
    }


def test_simrank_matches_dense(spark):
    rng = random.Random(41)
    pairs = list({(rng.randrange(12), rng.randrange(12)) for _ in range(40)})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {(r["a"], r["b"]): r["s"] for r in simrank(edges, 0.8, 3).collect()}
    exp = _simrank_brute(pairs, 0.8, 3)
    assert got.keys() == exp.keys()
    for p in exp:
        assert got[p] == pytest.approx(exp[p], abs=1e-12)


def test_simrank_shared_predecessor(spark):
    # 1 -> 2, 1 -> 3: s(2,3) = C after one round and stays (only
    # in-neighbor pair is (1,1) with s=1)
    edges = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    got = {(r["a"], r["b"]): r["s"] for r in simrank(edges, 0.8, 3).collect()}
    assert got == {(2, 3): pytest.approx(0.8)}


def test_simrank_min_score_prunes(spark):
    rng = random.Random(43)
    pairs = list({(rng.randrange(15), rng.randrange(15)) for _ in range(60)})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    full = {(r["a"], r["b"]): r["s"] for r in simrank(edges, 0.8, 3).collect()}
    pruned = {
        (r["a"], r["b"]): r["s"]
        for r in simrank(edges, 0.8, 3, min_score=0.2).collect()
    }
    assert set(pruned) <= set(full)
    assert all(v >= 0.2 for v in pruned.values())
    # every surviving score is a LOWER bound on its unpruned value
    for p, v in pruned.items():
        assert v <= full[p] + 1e-12


# -------------------------------------------------------------------- salsa


def _salsa_brute(pairs, k):
    import numpy as np

    eset = sorted({(s, d) for s, d in pairs if s != d})
    nodes = sorted({n for p in eset for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    outd = {}
    ind = {}
    for s, d in eset:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    h = {n: 1.0 for n in nodes}
    a = {}
    for _ in range(k):
        a = {}
        for s, d in eset:
            a[d] = a.get(d, 0.0) + h.get(s, 0.0) / outd[s]
        h = {}
        for s, d in eset:
            h[s] = h.get(s, 0.0) + a.get(d, 0.0) / ind[d]
    hs = sum(h.values())
    asum = sum(a.values())
    return (
        {n: h.get(n, 0.0) / hs for n in nodes},
        {n: a.get(n, 0.0) / asum for n in nodes},
    )


def test_salsa_matches_brute(spark):
    from online_centrality_spark.operators.salsa import salsa

    rng = random.Random(47)
    pairs = list({(rng.randrange(18), rng.randrange(18)) for _ in range(70)})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["node_id"]: (r["hub"], r["authority"])
        for r in salsa(edges, max_iter=7).collect()
    }
    eh, ea = _salsa_brute(pairs, 7)
    assert got.keys() == eh.keys()
    for n in eh:
        assert got[n][0] == pytest.approx(eh[n], abs=1e-12)
        assert got[n][1] == pytest.approx(ea[n], abs=1e-12)


def test_salsa_mass_splits_across_outlinks(spark):
    from online_centrality_spark.operators.salsa import salsa

    # star 1 -> {2,3,4}: after round 1 each leaf authority = 1/3 of
    # node 1's mass; hub mass returns fully to node 1
    edges = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "src long, dst long")
    got = {
        r["node_id"]: (r["hub"], r["authority"])
        for r in salsa(edges, max_iter=5).collect()
    }
    assert got[1][0] == pytest.approx(1.0)
    for leaf in (2, 3, 4):
        assert got[leaf][1] == pytest.approx(1.0 / 3.0)
        assert got[leaf][0] == pytest.approx(0.0)
