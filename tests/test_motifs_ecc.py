"""Eccentricity (all-sources BFS) + δ-temporal motif counts."""

import random

import pytest

from online_centrality_spark.operators import eccentricity, temporal_motifs

nx = pytest.importorskip("networkx")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_eccentricity_path(spark):
    out = {
        r["node_id"]: r["ecc"]
        for r in eccentricity(_edges(spark, [(0, 1), (1, 2), (2, 3)])).collect()
    }
    assert out == {0: 3, 1: 2, 2: 2, 3: 3}


def test_eccentricity_two_components(spark):
    # triangle (ecc 1 each) + disjoint path of 2 (ecc 1 each)
    out = {
        r["node_id"]: r["ecc"]
        for r in eccentricity(
            _edges(spark, [(0, 1), (1, 2), (0, 2), (5, 6)])
        ).collect()
    }
    assert out == {0: 1, 1: 1, 2: 1, 5: 1, 6: 1}


def test_eccentricity_random_matches_networkx(spark):
    rng = random.Random(11)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(45)})
    pairs = [(a, b) for a, b in pairs if a != b]
    got = {
        r["node_id"]: r["ecc"]
        for r in eccentricity(_edges(spark, pairs)).collect()
    }
    G = nx.Graph(pairs)
    want = {}
    for comp in nx.connected_components(G):
        sub = G.subgraph(comp)
        want.update(nx.eccentricity(sub))
    assert got == want


def _tedges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, t long")


def _brute_motifs(rows, delta):
    from collections import defaultdict

    wedges, tris = defaultdict(int), defaultdict(int)
    for (u, v, t1) in rows:
        for (v2, w, t2) in rows:
            if v2 != v or not (t1 < t2 <= t1 + delta) or w == u:
                continue
            wedges[u] += 1
            for (w3, u3, t3) in rows:
                if w3 == w and u3 == u and t2 < t3 <= t1 + delta:
                    tris[u] += 1
    return dict(wedges), dict(tris)


def test_motifs_hand_built(spark):
    delta = 100
    rows = [
        (0, 1, 10),   # u->v
        (1, 2, 50),   # v->w (wedge 0->1->2)
        (2, 0, 90),   # w->u closes the triangle within delta
        (1, 2, 200),  # too late for edge at t=10
        (3, 4, 10),
        (4, 3, 20),   # w == u -> not a wedge
    ]
    out = {
        r["node_id"]: (r["n_wedges"], r["n_triangles"])
        for r in temporal_motifs(_tedges(spark, rows), delta).collect()
    }
    # u=0: wedge 0->1->2 closed by 2->0@90; u=1: wedge 1->2->0 (open)
    assert out == {0: (1, 1), 1: (1, 0)}


def test_motifs_boundary_inclusive_exclusive(spark):
    delta = 100
    # t2 == t1 + delta is IN; t2 == t1 is OUT (strictly increasing);
    # both straddle δ-bucket boundaries on purpose
    rows = [(0, 1, 99), (1, 2, 199), (1, 3, 99)]
    out = {
        r["node_id"]: r["n_wedges"]
        for r in temporal_motifs(_tedges(spark, rows), delta).collect()
    }
    assert out == {0: 1}


def test_motifs_random_matches_bruteforce(spark):
    rng = random.Random(5)
    rows = [
        (rng.randrange(8), rng.randrange(8), rng.randrange(1000))
        for _ in range(120)
    ]
    rows = [(a, b, t) for a, b, t in rows if a != b]
    delta = 150
    got = {
        r["node_id"]: (r["n_wedges"], r["n_triangles"])
        for r in temporal_motifs(_tedges(spark, rows), delta).collect()
    }
    wedges, tris = _brute_motifs(rows, delta)
    want = {u: (wedges[u], tris.get(u, 0)) for u in wedges}
    assert got == want


def test_response_latency_hand_built(spark):
    from pyspark.sql import functions as F

    from online_centrality_spark.streaming import response_latency

    rows = [
        # user 1: gaps 10us then 30us; user 2: gap 100us
        (1, 1_000_000, 1, "a"),
        (2, 1_000_010, 1, "b"),
        (3, 1_000_040, 1, "b"),
        (4, 2_000_000, 2, "b"),
        (5, 2_000_100, 2, "a"),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, t_us long, user_id long, event_type string"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("t_us")).alias("ts"),
        "user_id",
        "event_type",
    )
    out = {r["event_type"]: r for r in response_latency(events).collect()}
    assert out["b"]["n_gaps"] == 2 and out["b"]["p50_gap_secs"] == pytest.approx(20e-6)
    assert out["a"]["n_gaps"] == 1 and out["a"]["mean_gap_secs"] == pytest.approx(100e-6)
    # p90 of [10, 30] us by linear interpolation = 10 + 0.9 * 20 = 28 us
    assert out["b"]["p90_gap_secs"] == pytest.approx(28e-6)
