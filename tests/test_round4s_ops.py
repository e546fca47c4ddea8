"""Round-4 additions, batch s: edge neighborhood overlap (tie
strength / local bridges) and per-community conductance — each against
an independent in-Python oracle."""

import random

from online_centrality_spark.operators.community import community_conductance
from online_centrality_spark.operators.triangles import edge_overlap


def test_edge_overlap_matches_brute(spark):
    rng = random.Random(109)
    edges = [(rng.randint(0, 14), rng.randint(0, 14)) for _ in range(55)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["a"], r["b"]): (r["cn"], r["overlap"], r["is_local_bridge"])
        for r in edge_overlap(df).collect()
    }
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    adj = {}
    for h, l in es:
        adj.setdefault(h, set()).add(l)
        adj.setdefault(l, set()).add(h)
    want = {}
    for h, l in es:
        a, b = l, h
        cn = len(adj[a] & adj[b])
        denom = len(adj[a]) + len(adj[b]) - cn - 2
        ov = None if denom <= 0 else round(cn / denom, 6)
        want[(a, b)] = (cn, ov, 1 if cn == 0 else 0)
    assert got == want


def test_edge_overlap_triangle_and_bridge(spark):
    # triangle 0-1-2 plus a pendant bridge 2-9
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 9)], "src long, dst long"
    )
    got = {(r["a"], r["b"]): r for r in edge_overlap(df).collect()}
    assert got[(0, 1)]["overlap"] == 1.0  # only common neighbor is the union
    assert got[(2, 9)]["is_local_bridge"] == 1
    assert got[(2, 9)]["overlap"] == 0.0


def test_community_conductance_matches_brute(spark):
    rng = random.Random(113)
    edges = [(rng.randint(0, 11), rng.randint(0, 11)) for _ in range(40)]
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    nodes = {n for e in es for n in e}
    lab = {n: n % 3 for n in nodes}
    df = spark.createDataFrame(list(es), "src long, dst long")
    ldf = spark.createDataFrame(list(lab.items()), "node_id long, label long")
    got = {
        r["label"]: (r["n_nodes"], r["vol"], r["cut"], r["conductance"])
        for r in community_conductance(df, ldf).collect()
    }
    deg = {}
    for h, l in es:
        deg[h] = deg.get(h, 0) + 1
        deg[l] = deg.get(l, 0) + 1
    m2 = 2 * len(es)
    want = {}
    for c in set(lab.values()):
        members = [n for n in nodes if lab[n] == c]
        vol = sum(deg[n] for n in members)
        cut = sum(1 for h, l in es if (lab[h] == c) != (lab[l] == c))
        den = min(vol, m2 - vol)
        want[c] = (len(members), vol, cut, None if den <= 0 else round(cut / den, 6))
    assert got == want


def test_community_conductance_perfect_split(spark):
    # two disjoint triangles labeled by component: zero cut everywhere
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    labels = [(n, 0) for n in (0, 1, 2)] + [(n, 1) for n in (10, 11, 12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    ldf = spark.createDataFrame(labels, "node_id long, label long")
    for r in community_conductance(df, ldf).collect():
        assert r["cut"] == 0 and r["conductance"] == 0.0
