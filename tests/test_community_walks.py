"""Modularity metric + deterministic random-walk corpus."""

import hashlib
import random

import pytest

from online_centrality_spark.operators import modularity, random_walks

nx = pytest.importorskip("networkx")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _labels(spark, mapping):
    return spark.createDataFrame(
        [(k, v) for k, v in mapping.items()], "node_id long, label long"
    )


def test_modularity_two_triangles(spark):
    # two triangles bridged by one edge; partition = the two triangles
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    part = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    row = modularity(_edges(spark, pairs), _labels(spark, part)).collect()[0]
    G = nx.Graph(pairs)
    want = nx.algorithms.community.modularity(G, [{0, 1, 2}, {3, 4, 5}])
    assert row["n_communities"] == 2
    assert row["modularity"] == pytest.approx(want, abs=1e-6)


def test_modularity_random_matches_networkx(spark):
    rng = random.Random(13)
    pairs = list({(rng.randrange(20), rng.randrange(20)) for _ in range(50)})
    pairs = [(a, b) for a, b in pairs if a != b]
    G = nx.Graph(pairs)
    part = {v: v % 3 for v in G.nodes}
    comms = [
        {v for v in G.nodes if part[v] == c}
        for c in range(3)
        if any(part[v] == c for v in G.nodes)
    ]
    row = modularity(_edges(spark, pairs), _labels(spark, part)).collect()[0]
    want = nx.algorithms.community.modularity(G, comms)
    assert row["modularity"] == pytest.approx(want, abs=1e-6)


def _md5_pick(walk_id, step, seed, outdeg):
    h = hashlib.md5(f"{walk_id}:{step}:{seed}".encode()).hexdigest()
    return int(h[:15], 16) % outdeg


def _py_walks(pairs, walk_length, seed):
    adj = {}
    for a, b in sorted(set(pairs)):
        if a != b:
            adj.setdefault(a, []).append(b)
    for k in adj:
        adj[k] = sorted(set(adj[k]))
    nodes = {a for a, b in pairs} | {b for a, b in pairs}
    rows = set()
    for start in nodes:
        v = start
        rows.add((start, 0, start))
        for s in range(1, walk_length + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break
            v = nbrs[_md5_pick(start, s, 0, len(nbrs))]
            rows.add((start, s, v))
    return rows


def test_random_walks_match_python_replay(spark):
    rng = random.Random(23)
    pairs = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = {
        (r["walk_id"], r["step"], r["node_id"])
        for r in random_walks(_edges(spark, pairs), walk_length=6, seed=0).collect()
    }
    assert got == _py_walks(pairs, 6, 0)


def test_random_walks_deterministic_and_dead_ends(spark):
    pairs = [(0, 1), (1, 2)]  # 2 is a dead end
    out1 = sorted(
        map(tuple, random_walks(_edges(spark, pairs), walk_length=5).collect())
    )
    out2 = sorted(
        map(tuple, random_walks(_edges(spark, pairs), walk_length=5).collect())
    )
    assert out1 == out2
    # walk from 0: 0 -> 1 -> 2, stops; walk from 1: 1 -> 2, stops; walk
    # from 2: stays at step 0
    assert out1 == [
        (0, 0, 0), (0, 1, 1), (0, 2, 2),
        (1, 0, 1), (1, 1, 2),
        (2, 0, 2),
    ]


def test_random_walks_undirected_never_stops_early(spark):
    pairs = [(0, 1)]
    out = random_walks(_edges(spark, pairs), walk_length=4, directed=False)
    per_walk = {}
    for r in out.collect():
        per_walk.setdefault(r["walk_id"], []).append(r["step"])
    assert all(sorted(v) == [0, 1, 2, 3, 4] for v in per_walk.values())
