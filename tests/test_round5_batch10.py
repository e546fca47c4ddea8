"""Hand-computed fixtures for the round-5 batch-10 operators:
Morone-Makse collective influence (l=1) and Onnela neighborhood
overlap / local-bridge detection."""

from online_centrality_spark.operators import (
    collective_influence,
    neighborhood_overlap,
)


def test_collective_influence_path_plus_spur(spark):
    """Path 1-2-3-4 with spur 2-5: ci = (k_i-1) * sum_j (k_j-1) by
    hand. Node 2 (hub, k=3) and node 3 (k=2 next to the hub) tie at 2;
    every leaf scores 0 regardless of its neighbor's degree."""
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5)], "src long, dst long"
    )
    got = {
        r["node_id"]: (r["degree"], r["ci"])
        for r in collective_influence(df).collect()
    }
    assert got == {
        1: (1, 0),
        2: (3, 2),  # (3-1) * ((k1-1)+(k3-1)+(k5-1)) = 2 * 1
        3: (2, 2),  # (2-1) * ((k2-1)+(k4-1)) = 1 * 2
        4: (1, 0),
        5: (1, 0),
    }


def test_collective_influence_normalizes_multi_edges(spark):
    """Reversed duplicates and self-loops fold away before degrees are
    counted — same answer as the simple graph."""
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 3), (3, 4), (2, 5), (5, 2)],
        "src long, dst long",
    )
    got = {r["node_id"]: r["ci"] for r in collective_influence(df).collect()}
    assert got == {1: 0, 2: 2, 3: 2, 4: 0, 5: 0}


def test_neighborhood_overlap_triangle_and_bridge(spark):
    """Triangle 1-2-3 with pendant 3-4: the in-triangle edges carry
    positive overlap, the pendant edge is a LOCAL BRIDGE (cn=0 with a
    positive denominator -> overlap exactly 0)."""
    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {
        (r["src"], r["dst"]): (
            r["cn"],
            r["deg_src"],
            r["deg_dst"],
            r["overlap"],
        )
        for r in neighborhood_overlap(df).collect()
    }
    assert got == {
        (1, 2): (1, 2, 2, 1.0),  # denom = 2+2-2-1 = 1
        (1, 3): (1, 2, 3, 0.5),  # denom = 2+3-2-1 = 2
        (2, 3): (1, 2, 3, 0.5),
        (3, 4): (0, 3, 1, 0.0),  # local bridge: denom = 2, cn = 0
    }


def test_neighborhood_overlap_isolated_pair_denominator_zero(spark):
    """A disconnected 2-clique has denominator 0 (k_u = k_v = 1); the
    coefficient is defined as 0.0 rather than NaN."""
    df = spark.createDataFrame(
        [(7, 8), (8, 7), (1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    got = {
        (r["src"], r["dst"]): r["overlap"]
        for r in neighborhood_overlap(df).collect()
    }
    assert got[(7, 8)] == 0.0
    assert got[(1, 2)] == 1.0
