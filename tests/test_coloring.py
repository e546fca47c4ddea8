"""Fixture tests for Jones–Plassmann greedy coloring (round-5 batch 6)."""

import hashlib

from pyspark.sql import functions as F

from online_centrality_spark.operators import greedy_coloring


def _ph(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _greedy_reference(pairs):
    """Sequential greedy coloring in decreasing (hash, id) order."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    order = sorted(adj, key=lambda n: (_ph(f"jp:{n}"), n), reverse=True)
    col: dict[int, int] = {}
    for u in order:
        used = {col[v] for v in adj[u] if v in col}
        k = 0
        while k in used:
            k += 1
        col[u] = k
    return col


FIX = [
    (1, 2), (2, 3), (3, 1),          # triangle -> needs 3 colors
    (3, 4), (4, 5), (5, 6), (6, 4),  # tail into a second triangle
    (7, 8),                          # separate edge
    (9, 9),                          # self-loop (dropped)
    (2, 1),                          # reverse duplicate (dedup)
]


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return {r["node_id"]: r["color"] for r in greedy_coloring(df).collect()}


def test_matches_sequential_greedy(spark):
    assert _run(spark, FIX) == _greedy_reference(FIX)


def test_coloring_is_proper_and_bounded(spark):
    got = _run(spark, FIX)
    adj = [(a, b) for a, b in FIX if a != b]
    for a, b in adj:
        assert got[a] != got[b]
    deg: dict[int, set[int]] = {}
    for a, b in adj:
        deg.setdefault(a, set()).add(b)
        deg.setdefault(b, set()).add(a)
    max_deg = max(len(v) for v in deg.values())
    assert max(got.values()) <= max_deg  # <= Δ+1 colors, 0-based


def test_self_loop_only_node_is_excluded(spark):
    got = _run(spark, FIX)
    assert 9 not in got
    assert set(got) == {1, 2, 3, 4, 5, 6, 7, 8}


def test_isolated_edge_gets_two_colors(spark):
    got = _run(spark, [(10, 11)])
    assert sorted(got.values()) == [0, 1]


def test_path_rerun_is_deterministic(spark):
    pairs = [(i, i + 1) for i in range(12)]
    assert _run(spark, pairs) == _run(spark, pairs)
