"""Bridge-detection fixtures: hand graphs with known cut edges, the
networkx cross-check (the same oracle style as static PageRank), and
input-normalization rules."""

import pytest

from online_centrality_spark.operators import bridges


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return {(r["a"], r["b"]) for r in bridges(df).collect()}


def test_path_graph_every_edge_is_a_bridge(spark):
    assert _run(spark, [(1, 2), (2, 3), (3, 4)]) == {(1, 2), (2, 3), (3, 4)}


def test_cycle_has_no_bridges(spark):
    assert _run(spark, [(1, 2), (2, 3), (3, 1)]) == set()


def test_cycle_with_pendant_chain(spark):
    """Only the chain edges hanging off the cycle are bridges."""
    got = _run(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)])
    assert got == {(3, 4), (4, 5)}


def test_two_cycles_joined_by_one_edge(spark):
    """The classic barbell: the connector is the unique bridge."""
    got = _run(
        spark,
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)],
    )
    assert got == {(3, 4)}


def test_disconnected_components(spark):
    """Bridges are found per component."""
    got = _run(spark, [(1, 2), (10, 11), (11, 12), (12, 10)])
    assert got == {(1, 2)}


def test_duplicates_orientation_and_self_loops_collapse(spark):
    """(a,b) and (b,a) are ONE undirected edge (still a bridge — not a
    2-cycle); self-loops vanish."""
    got = _run(spark, [(1, 2), (2, 1), (1, 2), (1, 1)])
    assert got == {(1, 2)}


def test_empty_graph(spark):
    assert _run(spark, [(1, 1)]) == set()


def test_networkx_parity_random_graphs(spark):
    nx = pytest.importorskip("networkx")
    for seed, (n, p) in enumerate([(20, 0.1), (35, 0.07), (25, 0.2)]):
        g = nx.gnp_random_graph(n, p, seed=seed * 17 + 5)
        g.add_edge(0, n + 1)
        g.add_edge(n + 1, n + 2)
        exp = {tuple(sorted(e)) for e in nx.bridges(g)}
        got = _run(spark, [(a, b) for a, b in g.edges()])
        assert got == exp, f"seed {seed}"


def test_max_rounds_raises_loudly(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not saturate"):
        bridges(df, max_rounds=1)


def _run_ap(spark, pairs):
    from online_centrality_spark.operators import articulation_points

    df = spark.createDataFrame(pairs, "src long, dst long")
    return {r["node_id"] for r in articulation_points(df).collect()}


def test_articulation_bowtie_shared_vertex(spark):
    """Two triangles sharing vertex 3: the share point is the unique
    cut vertex (and there are no bridges — the vertex/edge rules are
    genuinely different)."""
    el = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)]
    assert _run_ap(spark, el) == {3}
    assert _run(spark, el) == set()


def test_articulation_path_internal_vertices(spark):
    assert _run_ap(spark, [(1, 2), (2, 3), (3, 4)]) == {2, 3}


def test_articulation_star_center(spark):
    assert _run_ap(spark, [(0, 1), (0, 2), (0, 3)]) == {0}


def test_articulation_cycle_has_none(spark):
    assert _run_ap(spark, [(1, 2), (2, 3), (3, 1)]) == set()


def test_articulation_networkx_parity(spark):
    nx = pytest.importorskip("networkx")
    for seed, (n, p) in enumerate([(18, 0.12), (28, 0.09)]):
        g = nx.gnp_random_graph(n, p, seed=seed * 11 + 3)
        g.add_edge(0, n + 1)
        g.add_edge(n + 1, n + 2)
        exp = set(nx.articulation_points(g))
        got = _run_ap(spark, [(a, b) for a, b in g.edges()])
        assert got == exp, f"seed {seed}"


def test_two_edge_components_barbell_and_networkx(spark):
    from online_centrality_spark.operators import two_edge_components

    nx = pytest.importorskip("networkx")
    # barbell: two triangles joined by a bridge -> two 2ecc's
    el = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
    df = spark.createDataFrame(el, "src long, dst long")
    got = {
        r["node_id"]: r["component"]
        for r in two_edge_components(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}
    # random-graph parity with networkx k_edge_components(k=2)
    from networkx.algorithms.connectivity import k_edge_components

    g = nx.gnp_random_graph(22, 0.11, seed=41)
    g.add_edge(0, 23)
    g.add_edge(23, 24)
    df = spark.createDataFrame(
        [(a, b) for a, b in g.edges()], "src long, dst long"
    )
    got = {}
    for r in two_edge_components(df).collect():
        got.setdefault(r["component"], set()).add(r["node_id"])
    engine_nodes = set().union(*got.values())
    # networkx also reports nodes with no edges; the engine's universe
    # is the edge list
    exp = {
        frozenset(s)
        for s in k_edge_components(g, k=2)
        if s & engine_nodes
    }
    assert {frozenset(v) for v in got.values()} == exp
