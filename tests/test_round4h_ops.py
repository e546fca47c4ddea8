"""Round-4 additions, batch h: rich-club coefficient, per-user
burstiness, per-day component evolution — each against an independent
in-Python brute-force oracle."""

import math
import random

from online_centrality_spark.operators import component_evolution, rich_club
from online_centrality_spark.streaming.sessions import user_burstiness


# ------------------------------------------------------------- rich club


def _rich_club_brute(edges):
    es = set()
    for a, b in edges:
        if a != b:
            es.add((max(a, b), min(a, b)))
    deg = {}
    for h, l in es:
        deg[h] = deg.get(h, 0) + 1
        deg[l] = deg.get(l, 0) + 1
    out = {}
    for k in range(1, max(deg.values(), default=1)):
        rich = {n for n, d in deg.items() if d > k}
        if len(rich) < 2:
            continue
        ek = sum(1 for h, l in es if h in rich and l in rich)
        phi = round(2.0 * ek / (len(rich) * (len(rich) - 1)), 6)
        out[k] = (len(rich), ek, phi)
    return out


def test_rich_club_matches_brute(spark):
    rng = random.Random(11)
    edges = [(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["k"]: (r["n_rich_nodes"], r["n_rich_edges"], r["phi"])
        for r in rich_club(df).collect()
    }
    want = _rich_club_brute(edges)
    assert got == want


def test_rich_club_star_graph(spark):
    # star: hub 0 with 5 leaves — at k=1 only the hub survives alone,
    # so no row qualifies (n_rich_nodes < 2 everywhere)
    df = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    assert rich_club(df).count() == 0


def test_rich_club_clique_is_one(spark):
    # K5: every degree is 4; at k in 1..3 all 5 nodes and all 10 edges
    # survive, phi = 1.0
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = {r["k"]: r["phi"] for r in rich_club(df).collect()}
    assert rows == {1: 1.0, 2: 1.0, 3: 1.0}


# ------------------------------------------------------------ burstiness


def test_burstiness_matches_brute(spark):
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = []
    eid = 0
    for u in range(4):
        t = 1_000_000_000
        for _ in range(rng.randint(3, 30)):
            t += rng.randint(0, 10_000_000) * 1_000  # 0..10000s in ms steps
            rows.append((u, t, eid))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, t_us long, event_id long").select(
        "user_id", F.timestamp_micros("t_us").alias("ts"), "event_id"
    )
    got = {
        r["user_id"]: (r["n_gaps"], r["mean_gap_secs"], r["burstiness"])
        for r in user_burstiness(df, min_gaps=5).collect()
    }
    by_user = {}
    for u, t, _ in rows:
        by_user.setdefault(u, []).append(t)
    want = {}
    for u, ts in by_user.items():
        gaps = [(b - a) // 1_000_000 for a, b in zip(sorted(ts), sorted(ts)[1:])]
        if len(gaps) < 5:
            continue
        n = len(gaps)
        mu = sum(gaps) / n
        var = sum(g * g for g in gaps) / n - mu * mu
        sigma = math.sqrt(max(var, 0.0))
        b = None if sigma + mu == 0 else round((sigma - mu) / (sigma + mu), 6)
        want[u] = (n, round(mu, 6), b)
    assert got == want


def test_burstiness_periodic_is_minus_one_and_zero_gaps_null(spark):
    from pyspark.sql import functions as F

    rows = [(1, 1_000_000_000 + i * 5_000_000, i) for i in range(8)]
    rows += [(2, 2_000_000_000, 100 + i) for i in range(8)]  # all same ts
    df = spark.createDataFrame(
        rows, "user_id long, t_us long, event_id long"
    ).select("user_id", F.timestamp_micros("t_us").alias("ts"), "event_id")
    got = {r["user_id"]: r for r in user_burstiness(df, min_gaps=5).collect()}
    assert got[1]["burstiness"] == -1.0  # perfectly periodic
    assert got[2]["burstiness"] is None  # sigma + mu == 0
    assert got[2]["mean_gap_secs"] == 0.0


# ------------------------------------------------- component evolution


def _cc_sizes_brute(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes = {}
    for n in list(parent):
        sizes[find(n)] = sizes.get(find(n), 0) + 1
    return sizes


def test_component_evolution_matches_brute(spark):
    rng = random.Random(3)
    day_us = 86_400_000_000
    rows = []
    for day in range(4):
        for _ in range(40):
            a, b = rng.randint(0, 24), rng.randint(0, 24)
            if a != b:
                rows.append((a, b, day * day_us + rng.randint(0, day_us - 1)))
    df = spark.createDataFrame(rows, "src long, dst long, t long")
    got = {
        r["day"]: (r["n_components"], r["n_nodes"], r["largest"])
        for r in component_evolution(df).collect()
    }
    want = {}
    for day in range(4):
        es = [(a, b) for a, b, t in rows if t // day_us == day]
        if not es:
            continue
        sizes = _cc_sizes_brute(es)
        want[day] = (len(sizes), sum(sizes.values()), max(sizes.values()))
    assert got == want


def test_component_evolution_empty_and_overflow_guard(spark):
    import pytest as _pytest

    empty = spark.createDataFrame([], "src long, dst long, t long")
    assert component_evolution(empty).count() == 0
    huge = spark.createDataFrame(
        [(2**61, 1, 86_400_000_000 * 5)], "src long, dst long, t long"
    )
    with _pytest.raises(ValueError, match="overflow"):
        component_evolution(huge)


def test_rich_club_matching_graph_is_empty(spark):
    # max degree 1 (perfect matching): the k-series 1..max_deg-1 is
    # empty — the descending-sequence hazard regression
    df = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    assert rich_club(df).count() == 0


def test_burstiness_custom_user_col(spark):
    from pyspark.sql import functions as F

    rows = [("c1", 1_000_000_000 + i * 5_000_000, i) for i in range(8)]
    df = spark.createDataFrame(
        rows, "conv_id string, t_us long, event_id long"
    ).select("conv_id", F.timestamp_micros("t_us").alias("ts"), "event_id")
    got = user_burstiness(df, user_col="conv_id", min_gaps=5).collect()
    assert len(got) == 1 and got[0]["burstiness"] == -1.0
