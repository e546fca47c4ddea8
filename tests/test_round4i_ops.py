"""Round-4 additions, batch i: densest subgraph (batch greedy peel),
disparity-filter backbone, day-over-day edge persistence — each against
an independent in-Python oracle."""

import math
import random

from online_centrality_spark.operators import (
    densest_subgraph,
    disparity_backbone,
    disparity_scores,
    edge_persistence,
)


# ------------------------------------------------------ densest subgraph


def _peel_brute(edges):
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    best = (-1.0, set())
    while es:
        deg = {}
        for h, l in es:
            deg[h] = deg.get(h, 0) + 1
            deg[l] = deg.get(l, 0) + 1
        density = len(es) / len(deg)
        if density > best[0]:
            best = (density, set(deg))
        keep = {n for n, d in deg.items() if d * len(deg) > 3 * len(es)}
        es = {(h, l) for h, l in es if h in keep and l in keep}
    return best


def test_densest_matches_peel_brute(spark):
    rng = random.Random(13)
    edges = [(rng.randint(0, 29), rng.randint(0, 29)) for _ in range(90)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = densest_subgraph(df).collect()
    density, nodes = _peel_brute(edges)
    assert {r["node_id"] for r in rows} == nodes
    assert all(r["density"] == round(density, 6) for r in rows)


def test_densest_finds_planted_clique(spark):
    # K6 (density 15/6 = 2.5) with a long path tail hanging off node 0:
    # the peel must shed the tail and return exactly the clique
    edges = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    edges += [(100 + i, 100 + i + 1) for i in range(20)] + [(0, 100)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = densest_subgraph(df).collect()
    assert {r["node_id"] for r in rows} == set(range(6))
    assert rows[0]["density"] == 2.5


def test_densest_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert densest_subgraph(df).count() == 0


# ------------------------------------------------------ disparity filter


def _disparity_brute(pair_rows):
    w = {}
    for s, d in pair_rows:
        if s != d:
            key = (max(s, d), min(s, d))
            w[key] = w.get(key, 0) + 1
    strength, degree = {}, {}
    for (a, b), wt in w.items():
        for n in (a, b):
            strength[n] = strength.get(n, 0) + wt
            degree[n] = degree.get(n, 0) + 1
    out = {}
    for (a, b), wt in w.items():
        aa = math.pow((strength[a] - wt) / strength[a], degree[a] - 1)
        ab = math.pow((strength[b] - wt) / strength[b], degree[b] - 1)
        out[(a, b)] = (wt, round(min(aa, ab), 6))
    return out


def test_disparity_scores_match_brute(spark):
    rng = random.Random(17)
    pair_rows = [(rng.randint(0, 11), rng.randint(0, 11)) for _ in range(200)]
    df = spark.createDataFrame(pair_rows, "src long, dst long")
    got = {
        (r["a"], r["b"]): (r["weight"], r["alpha_min"])
        for r in disparity_scores(df).collect()
    }
    # operator canonicalizes a = least, b = greatest
    want = {
        (min(a, b), max(a, b)): v for (a, b), v in _disparity_brute(pair_rows).items()
    }
    assert got == want


def test_disparity_backbone_hub_with_one_dominant_edge(spark):
    # hub 0 with 11 spokes: ten weight-1 edges and one weight-50 edge —
    # only the dominant edge is significant from the hub's perspective
    rows = [(0, i) for i in range(1, 11)] + [(0, 99)] * 50
    df = spark.createDataFrame(rows, "src long, dst long")
    kept = disparity_backbone(df, alpha=0.05).collect()
    assert [(r["a"], r["b"]) for r in kept] == [(0, 99)]
    # spokes are degree-1 (alpha = 1 from their side) and insignificant
    # from the hub's side: (1 - 1/60)^10 ~ 0.845
    scores = {(r["a"], r["b"]): r["alpha_min"] for r in disparity_scores(df).collect()}
    assert scores[(0, 1)] == round((1 - 1 / 60) ** 10, 6)


# ------------------------------------------------------ edge persistence


def test_edge_persistence_matches_brute(spark):
    rng = random.Random(23)
    day_us = 86_400_000_000
    rows = []
    for day in range(5):
        for _ in range(30):
            a, b = rng.randint(0, 9), rng.randint(0, 9)
            if a != b:
                rows.append((a, b, day * day_us + rng.randint(0, day_us - 1)))
    df = spark.createDataFrame(rows, "src long, dst long, t long")
    got = {
        r["day"]: (r["n_edges"], r["n_next"], r["n_common"], r["jaccard"])
        for r in edge_persistence(df).collect()
    }
    by_day = {}
    for a, b, t in rows:
        by_day.setdefault(t // day_us, set()).add((min(a, b), max(a, b)))
    want = {}
    for day in sorted(by_day):
        if day + 1 not in by_day:
            continue
        cur, nxt = by_day[day], by_day[day + 1]
        inter = len(cur & nxt)
        want[day] = (
            len(cur),
            len(nxt),
            inter,
            round(inter / (len(cur) + len(nxt) - inter), 6),
        )
    assert got == want


def test_edge_persistence_identical_days_is_one(spark):
    day_us = 86_400_000_000
    rows = [(1, 2, 10), (2, 3, 20), (1, 2, day_us + 5), (2, 3, day_us + 6)]
    df = spark.createDataFrame(rows, "src long, dst long, t long")
    out = edge_persistence(df).collect()
    assert len(out) == 1 and out[0]["jaccard"] == 1.0 and out[0]["n_common"] == 2
