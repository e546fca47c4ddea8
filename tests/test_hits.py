import random

import pytest

from online_centrality_spark.operators import hits


def _scores(df):
    return {
        r["node_id"]: (r["hub"], r["authority"]) for r in df.collect()
    }


def test_hits_star(spark):
    # three hubs all pointing at one authority: the fixpoint is exact
    edges = spark.createDataFrame(
        [(0, 1), (2, 1), (3, 1)], "src long, dst long"
    )
    out = _scores(hits(edges, max_iter=5, tol=0.0))
    assert out[1][1] == pytest.approx(1.0)  # sole authority
    for n in (0, 2, 3):
        assert out[n][0] == pytest.approx(1 / 3)  # equal hubs
        assert out[n][1] == pytest.approx(0.0)
    assert out[1][0] == pytest.approx(0.0)  # authority has no out-edges


def test_hits_multi_edge_dedup(spark):
    # duplicate (src, dst) pairs must not double-count
    edges = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 1), (2, 1)], "src long, dst long"
    )
    out = _scores(hits(edges, max_iter=5, tol=0.0))
    assert out[0][0] == pytest.approx(out[2][0])


def test_hits_distributed_matches_compact(spark):
    rng = random.Random(7)
    rows = list(
        {(rng.randrange(30), rng.randrange(30)) for _ in range(150)}
    )
    rows = [(s, d) for s, d in rows if s != d]
    edges = spark.createDataFrame(rows, "src long, dst long")
    compact = _scores(hits(edges, max_iter=15, tol=0.0))
    dist = _scores(
        hits(edges, max_iter=15, tol=0.0, collect_threshold=0)
    )
    salted = _scores(
        hits(edges, max_iter=15, tol=0.0, collect_threshold=0, salt=3)
    )
    assert compact.keys() == dist.keys() == salted.keys()
    for n in compact:
        assert dist[n][0] == pytest.approx(compact[n][0], abs=1e-9)
        assert dist[n][1] == pytest.approx(compact[n][1], abs=1e-9)
        assert salted[n][0] == pytest.approx(compact[n][0], abs=1e-9)


def test_hits_convergence_early_stop(spark):
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    # symmetric 2-cycle converges immediately; tol>0 must stop early
    out = _scores(hits(edges, max_iter=50, tol=1e-12))
    assert out[0] == (pytest.approx(0.5), pytest.approx(0.5))


def test_hits_empty(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert hits(edges).count() == 0
