"""Onion decomposition (`operators/kcore.py: onion_decomposition`) —
networkx parity on random graphs plus hand-built structure fixtures."""

import networkx as nx
import pytest

from online_centrality_spark.operators import onion_decomposition


def _run(spark, edges):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node_id"]: (r["core"], r["layer"])
        for r in onion_decomposition(e).collect()
    }


@pytest.mark.parametrize("seed", [1, 2, 7])
def test_onion_matches_networkx(spark, seed):
    """Exact (core, layer) parity with networkx onion_layers +
    core_number on G(n,m) random graphs."""
    G = nx.gnm_random_graph(40, 90, seed=seed)
    G.remove_nodes_from(list(nx.isolates(G)))
    got = _run(spark, list(G.edges()))
    core, layer = nx.core_number(G), nx.onion_layers(G)
    assert got == {n: (core[n], layer[n]) for n in G.nodes()}


def test_onion_path_peels_inward(spark):
    """Path 0-1-2-3-4: ends peel first (layer 1), then the next pair
    (layer 2), then the center (layer 3); every core is 1."""
    got = _run(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    assert got == {
        0: (1, 1),
        4: (1, 1),
        1: (1, 2),
        3: (1, 2),
        2: (1, 3),
    }


def test_onion_triangle_with_tail(spark):
    """Triangle 1-2-3 with a tail 3-4: the tail node is stage-1
    layer 1; the triangle survives to stage 2 as one batch (layer 2,
    core 2) — layers separate tree-like from loopy regions."""
    got = _run(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    assert got == {
        4: (1, 1),
        1: (2, 2),
        2: (2, 2),
        3: (2, 2),
    }


def test_onion_core_column_matches_core_number(spark):
    """The core column IS the degeneracy core number (stage index of
    removal), cross-checked against the engine's own core_number."""
    from online_centrality_spark.operators import core_number

    G = nx.gnm_random_graph(30, 70, seed=11)
    G.remove_nodes_from(list(nx.isolates(G)))
    e = spark.createDataFrame(list(G.edges()), "src long, dst long")
    onion = {r["node_id"]: r["core"] for r in onion_decomposition(e).collect()}
    cores = {r["node_id"]: r["core"] for r in core_number(e).collect()}
    assert onion == cores
