"""Bow-tie decomposition (Broder macro-structure) on handmade fixtures."""

import random

import pytest

from online_centrality_spark.operators import bowtie_decomposition

nx = pytest.importorskip("networkx")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _classes(spark, pairs):
    return {
        r["node_id"]: r["bowtie_class"]
        for r in bowtie_decomposition(_edges(spark, pairs)).collect()
    }


# the canonical bow-tie fixture: core cycle 1-2-3, IN feeder 0,
# OUT sink 4, a tendril off IN (5), a tendril into OUT (6), a
# core-bypassing tube (7), a node attached only to a tendril (8),
# and a disconnected 2-cycle (10, 11)
BOWTIE = [
    (1, 2), (2, 3), (3, 1),      # CORE
    (0, 1),                      # IN
    (3, 4),                      # OUT
    (0, 5),                      # TENDRIL_IN
    (6, 4),                      # TENDRIL_OUT
    (0, 7), (7, 4),              # TUBE
    (8, 5),                      # OTHER (weakly attached via a tendril)
    (10, 11), (11, 10),          # DISCONNECTED 2-cycle
]

EXPECTED = {
    0: "IN",
    1: "CORE", 2: "CORE", 3: "CORE",
    4: "OUT",
    5: "TENDRIL_IN",
    6: "TENDRIL_OUT",
    7: "TUBE",
    8: "OTHER",
    10: "DISCONNECTED", 11: "DISCONNECTED",
}


def test_bowtie_canonical_fixture(spark):
    assert _classes(spark, BOWTIE) == EXPECTED


def test_bowtie_empty_edges(spark):
    out = bowtie_decomposition(_edges(spark, []))
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["node_id", "bowtie_class"]


def test_bowtie_all_singleton_sccs_is_deterministic(spark):
    """A pure DAG has only size-1 SCCs; the giant pick falls back to
    the smallest node id, and everything downstream of it is OUT."""
    got = _classes(spark, [(1, 2), (2, 3)])
    assert got == {1: "CORE", 2: "OUT", 3: "OUT"}


def test_bowtie_partition_is_exhaustive_and_exclusive(spark):
    """Random digraph: every endpoint gets exactly one class, CORE is
    the largest SCC of the graph (networkx cross-check), and the
    IN/OUT sets match networkx ancestor/descendant reachability."""
    rng = random.Random(7)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _classes(spark, pairs)
    G = nx.DiGraph(pairs)
    assert set(got) == set(G.nodes)
    sccs = sorted(nx.strongly_connected_components(G),
                  key=lambda c: (-len(c), min(c)))
    core = sccs[0]
    assert {v for v, c in got.items() if c == "CORE"} == core
    r = min(core)
    anc = nx.ancestors(G, r) - core
    dec = nx.descendants(G, r) - core
    assert {v for v, c in got.items() if c == "IN"} == anc
    assert {v for v, c in got.items() if c == "OUT"} == dec
