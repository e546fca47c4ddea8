"""Hand-computed fixtures for the round-5 batch-6d operators:
configuration-model clustering stats and the truncated Katz
link-prediction index (`operators/nullmodel.py`)."""

import pytest

from online_centrality_spark.operators import config_model_stats, katz_index


def test_config_model_triangle(spark):
    """K3: every degree is 2 → n=3, S1=6, S2=12, wedges=3, triangles=1,
    gcc=1.0, expected_gcc=36/216, ratio=6.0 — all closed-form."""
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    row = config_model_stats(e).collect()[0]
    assert row["n_nodes"] == 3
    assert row["n_edges"] == 3
    assert row["wedges"] == 3
    assert row["triangles"] == 1
    assert row["gcc"] == pytest.approx(1.0)
    assert row["expected_gcc"] == pytest.approx(36 / 216, abs=1e-9)
    assert row["clustering_ratio"] == pytest.approx(6.0, abs=1e-6)


def test_config_model_ignores_direction_multiplicity_loops(spark):
    """Duplicate edges, both orientations, and self-loops must collapse
    to the same simple graph as the clean K3."""
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (3, 1), (2, 2)],
        "src long, dst long",
    )
    clean = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    assert (
        config_model_stats(e).collect() == config_model_stats(clean).collect()
    )


def test_config_model_star_has_zero_gcc(spark):
    """Star S3 (hub 0, leaves 1..3): degrees (3,1,1,1) → S1=6, S2=12,
    3 wedges, 0 triangles → gcc 0; expected_gcc = 36/216."""
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    row = config_model_stats(e).collect()[0]
    assert row["wedges"] == 3
    assert row["triangles"] == 0
    assert row["gcc"] == 0.0
    assert row["expected_gcc"] == pytest.approx(36 / 216, abs=1e-9)
    assert row["clustering_ratio"] == 0.0


def test_katz_index_path_graph(spark):
    """Path 0-1-2-3 is bipartite, so same-parity pairs see only even
    walks: (0,2) and (1,3) get walks2=1 / walks3=0 → β²; the end pair
    (0,3) gets walks2=0 / walks3=1 → β³. Adjacent pairs are excluded
    even though they have length-3 walks."""
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    rows = katz_index(e, beta=0.1, top_k=10).collect()
    got = {(r["a"], r["b"]): r for r in rows}
    assert set(got) == {(0, 2), (1, 3), (0, 3)}
    assert got[(0, 2)]["paths2"] == 1 and got[(0, 2)]["paths3"] == 0
    assert got[(1, 3)]["paths2"] == 1 and got[(1, 3)]["paths3"] == 0
    assert got[(0, 3)]["paths2"] == 0 and got[(0, 3)]["paths3"] == 1
    assert got[(0, 2)]["katz"] == pytest.approx(0.01)
    assert got[(0, 3)]["katz"] == pytest.approx(0.001)
    # deterministic ordering: score desc, then (a, b)
    assert [(r["a"], r["b"]) for r in rows] == [(0, 2), (1, 3), (0, 3)]


def test_katz_index_counts_backtracking_walks(spark):
    """Square 0-1-2-3-0 plus chord 0-2: pair (1,3) is non-adjacent with
    walks2(1,3)=2 (via 0 and via 2) and walks3 counting every length-3
    walk including backtracking ones — cross-checked with numpy A³."""
    import numpy as np

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    A = np.zeros((4, 4), dtype=np.int64)
    for a, b in edges:
        A[a, b] = A[b, a] = 1
    A2, A3 = A @ A, A @ A @ A
    e = spark.createDataFrame(edges, "src long, dst long")
    rows = katz_index(e, beta=0.05, top_k=10).collect()
    got = {(r["a"], r["b"]): r for r in rows}
    assert set(got) == {(1, 3)}
    assert got[(1, 3)]["paths2"] == A2[1, 3] == 2
    assert got[(1, 3)]["paths3"] == A3[1, 3]


def test_katz_index_mid_degree_cap_is_lower_bound(spark):
    """Capping the wedge midpoint degree only removes walk mass routed
    through hubs: capped paths2 <= exact, and with a cap above the max
    degree the result is identical to exact."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (0, 4), (4, 5)]
    e = spark.createDataFrame(edges, "src long, dst long")
    exact = {
        (r["a"], r["b"]): (r["paths2"], r["paths3"])
        for r in katz_index(e, top_k=100).collect()
    }
    loose = {
        (r["a"], r["b"]): (r["paths2"], r["paths3"])
        for r in katz_index(e, top_k=100, max_mid_degree=10).collect()
    }
    assert loose == exact
    capped = {
        (r["a"], r["b"]): (r["paths2"], r["paths3"])
        for r in katz_index(e, top_k=100, max_mid_degree=2).collect()
    }
    for pair, (p2, _p3) in capped.items():
        assert p2 <= exact[pair][0]
