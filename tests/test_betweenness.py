"""Pivot-based Brandes betweenness vs a pure-python reference."""

import random
from collections import defaultdict, deque

import pytest

from online_centrality_spark.operators import betweenness_from_pivots


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _py_brandes(pairs, pivots, directed=False):
    adj = defaultdict(set)
    nodes = set()
    for a, b in pairs:
        if a == b:
            continue
        nodes.update((a, b))
        adj[a].add(b)
        if not directed:
            adj[b].add(a)
    bc = defaultdict(float)
    for s in pivots:
        # BFS with path counts
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        preds = defaultdict(list)
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    if not directed:
        for v in bc:
            bc[v] /= 2.0
    return {v: bc.get(v, 0.0) for v in nodes}


def _check(spark, pairs, pivots, directed=False):
    got = {
        r["node_id"]: r["bc"]
        for r in betweenness_from_pivots(
            _edges(spark, pairs),
            pivots=spark.createDataFrame([(p,) for p in pivots], "node_id long"),
            directed=directed,
        ).collect()
    }
    want = _py_brandes(pairs, pivots, directed)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_betweenness_path_all_pivots(spark):
    # path 0-1-2-3: bc(1)=bc(2)=2, endpoints 0 (all-pairs undirected)
    pairs = [(0, 1), (1, 2), (2, 3)]
    _check(spark, pairs, [0, 1, 2, 3])


def test_betweenness_star_center(spark):
    pairs = [(0, 1), (0, 2), (0, 3), (0, 4)]
    _check(spark, pairs, [1, 2, 3, 4])


def test_betweenness_pivot_subset(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
    _check(spark, pairs, [0, 2])


def test_betweenness_directed(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 1)]
    _check(spark, pairs, [0, 1], directed=True)


def test_betweenness_random_matches_reference(spark):
    rng = random.Random(17)
    pairs = list({(rng.randrange(25), rng.randrange(25)) for _ in range(60)})
    pairs = [(a, b) for a, b in pairs if a != b]
    nodes = sorted({a for a, b in pairs} | {b for a, b in pairs})
    _check(spark, pairs, nodes[:6])


def test_betweenness_default_pivots_smallest_ids(spark):
    pairs = [(5, 6), (6, 7), (7, 8), (8, 9), (9, 5)]
    out = {
        r["node_id"]: r["bc"]
        for r in betweenness_from_pivots(_edges(spark, pairs), k=2).collect()
    }
    want = _py_brandes(pairs, [5, 6])
    for v in want:
        assert out[v] == pytest.approx(want[v], abs=1e-9)
