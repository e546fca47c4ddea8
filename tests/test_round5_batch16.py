"""Hand-computed fixtures for the round-5 batch-16 operators:
Brandes edge betweenness (pivot-exact) and source vocabulary overlap."""

from online_centrality_spark.operators.betweenness import (
    edge_betweenness_from_pivots,
)
from online_centrality_spark.text.analysis import source_vocab_overlap


def test_edge_betweenness_path_graph(spark):
    """Path 1-2-3-4 with every node a pivot: the middle edge carries
    the 2x2 crossing pairs (4.0), the end edges 3.0 each."""
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {
        (r["src"], r["dst"]): round(r["ebc"], 6)
        for r in edge_betweenness_from_pivots(df, k=8).collect()
    }
    assert got == {(1, 2): 3.0, (2, 3): 4.0, (3, 4): 3.0}


def test_edge_betweenness_star_graph(spark):
    """Star centered at 1: every spoke carries its leaf's 3 ordered
    paths (to the center and both other leaves) -> 3.0 each."""
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "src long, dst long"
    )
    got = {
        (r["src"], r["dst"]): round(r["ebc"], 6)
        for r in edge_betweenness_from_pivots(df, k=8).collect()
    }
    assert got == {(1, 2): 3.0, (1, 3): 3.0, (1, 4): 3.0}


def test_edge_betweenness_consistent_with_node_variant(spark):
    """On any graph, summing edge betweenness over edges equals the sum
    of node betweenness plus the (ordered-pair-count / 2) boundary term
    — checked here via the simpler identity: for each node v, node
    bc(v) <= sum of ebc over v's incident edges (paths through v use
    two incident edges; paths ending at v use one)."""
    from online_centrality_spark.operators.betweenness import (
        betweenness_from_pivots,
    )

    edges = [(1, 2), (2, 3), (3, 4), (2, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    eb = {
        (r["src"], r["dst"]): r["ebc"]
        for r in edge_betweenness_from_pivots(df, k=8).collect()
    }
    nb = {
        r["node_id"]: r["bc"]
        for r in betweenness_from_pivots(df, k=8).collect()
    }
    for v, bc in nb.items():
        incident = sum(w for (a, b), w in eb.items() if v in (a, b))
        assert bc <= incident + 1e-9


def test_source_vocab_overlap_by_hand(spark):
    """Vocab s1 = {a,b,c}, s2 = {b,c,d} -> intersection 2, union 4."""
    docs = spark.createDataFrame(
        [(1, "a b c a", "s1"), (2, "b c d", "s2"), (3, "b", "s2")],
        "doc_id long, text string, source string",
    )
    got = source_vocab_overlap(docs).collect()
    assert len(got) == 1
    r = got[0]
    assert (
        r["source_a"], r["source_b"], r["n_a"], r["n_b"], r["n_common"],
        r["jaccard"],
    ) == ("s1", "s2", 3, 3, 2, 0.5)


def test_edge_betweenness_directed_keeps_direction(spark):
    """Directed chain 1->2->3: paths (1,2),(1,3),(2,3). Edge (1,2)
    carries 2 (no halving), (2,3) carries 2; the reverse keys never
    appear."""
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {
        (r["src"], r["dst"]): round(r["ebc"], 6)
        for r in edge_betweenness_from_pivots(df, k=8, directed=True).collect()
    }
    assert got == {(1, 2): 2.0, (2, 3): 2.0}
