"""Minimum spanning forest (Boruvka) against a python Kruskal oracle
with the identical (w, a, b) tie-break, plus structural invariants."""

import random

from online_centrality_spark.operators import minimum_spanning_forest


def _kruskal(edges):
    """Unique MSF under the (w, a, b) total order on canonical edges."""
    canon = {}
    for a, b, w in edges:
        if a != b:
            key = (max(a, b), min(a, b))
            canon[key] = min(canon.get(key, float("inf")), w)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (h, l), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0][1], kv[0][0])):
        a, b = l, h
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            forest.add((a, b, w))
    return forest


def test_msf_matches_kruskal_with_ties(spark):
    rng = random.Random(61)
    # heavy ties: weights drawn from 4 values only
    edges = [
        (rng.randint(0, 19), rng.randint(0, 19), rng.choice([0.5, 0.6, 0.7, 0.8]))
        for _ in range(80)
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {(r["a"], r["b"], r["w"]) for r in minimum_spanning_forest(df).collect()}
    assert got == _kruskal(edges)


def test_msf_forest_structure(spark):
    rng = random.Random(67)
    edges = [
        (rng.randint(0, 29), rng.randint(0, 29), round(rng.random(), 3))
        for _ in range(120)
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    rows = minimum_spanning_forest(df).collect()
    want = _kruskal(edges)
    assert {(r["a"], r["b"], r["w"]) for r in rows} == want
    # |F| = n - C over the simple graph
    nodes = {n for a, b, _ in edges if a != b for n in (a, b)}
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
    n_comp = len({find(n) for n in nodes})
    assert len(rows) == len(nodes) - n_comp


def test_msf_disconnected_and_empty(spark):
    df = spark.createDataFrame(
        [(1, 2, 0.3), (3, 4, 0.2), (1, 2, 0.1)], "src long, dst long, w double"
    )
    got = {(r["a"], r["b"], r["w"]) for r in minimum_spanning_forest(df).collect()}
    # parallel edge keeps min weight; two separate trees
    assert got == {(1, 2, 0.1), (3, 4, 0.2)}
    empty = spark.createDataFrame([], "src long, dst long, w double")
    assert minimum_spanning_forest(empty).count() == 0
