"""Round-4 additions, batch c: two-hop reach, deterministic negative
edge sampling, Zipf corpus profile — each checked against an
independent in-Python oracle (dict BFS / brute-force hash replay /
numpy least squares), not the DuckDB twin."""

import hashlib
import random

import numpy as np
import pytest

from online_centrality_spark.operators.link_prediction import (
    negative_edge_samples,
)
from online_centrality_spark.operators.neighborhood import two_hop_reach
from online_centrality_spark.text.analysis import zipf_profile


# --------------------------------------------------------------- 2-hop reach


def _reach_brute(pairs):
    out_adj = {}
    nodes = set()
    for s, d in pairs:
        if s == d:
            continue
        out_adj.setdefault(s, set()).add(d)
        nodes.update((s, d))
    exp = {}
    for v in nodes:
        one = out_adj.get(v, set())
        two = {
            c
            for b in one
            for c in out_adj.get(b, set())
            if c != v
        }
        exp[v] = (len(one), len(two))
    return exp


def test_two_hop_reach_matches_brute(spark):
    rng = random.Random(7)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["node_id"]: (r["reach1"], r["reach2"])
        for r in two_hop_reach(edges).collect()
    }
    assert got == _reach_brute(pairs)


def test_two_hop_reach_multiplicity_ignored(spark):
    # duplicate edges must not inflate either count
    pairs = [(1, 2), (1, 2), (2, 3), (2, 3), (3, 1)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r["node_id"]: (r["reach1"], r["reach2"])
        for r in two_hop_reach(edges).collect()
    }
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 1)}


def test_two_hop_reach_hub_cap_is_lower_bound(spark):
    rng = random.Random(3)
    pairs = list({(rng.randrange(15), rng.randrange(15)) for _ in range(90)})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    exact = {
        r["node_id"]: r["reach2"] for r in two_hop_reach(edges).collect()
    }
    capped = {
        r["node_id"]: r["reach2"]
        for r in two_hop_reach(edges, max_mid_degree=4).collect()
    }
    assert capped.keys() == exact.keys()
    assert all(capped[n] <= exact[n] for n in exact)


# --------------------------------------------------------- negative sampling


def _portable_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _neg_brute(pairs, k):
    eset = {(s, d) for s, d in pairs if s != d}
    nodes = sorted({n for p in eset for n in p})
    idx = {i + 1: n for i, n in enumerate(nodes)}
    out = set()
    for v in nodes:
        for i in range(k):
            cand = idx[_portable_hash(f"{v}#neg#{i}") % len(nodes) + 1]
            if cand != v and (v, cand) not in eset:
                out.add((v, cand))
    return out


def test_negative_samples_match_hash_replay(spark):
    rng = random.Random(13)
    pairs = list({(rng.randrange(40), rng.randrange(40)) for _ in range(150)})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        (r["src"], r["dst"])
        for r in negative_edge_samples(edges, k=6).collect()
    }
    assert got == _neg_brute(pairs, 6)


def test_negative_samples_are_non_edges(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (1, 3)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = negative_edge_samples(edges, k=16).collect()
    eset = set(pairs)
    for r in got:
        assert r["src"] != r["dst"]
        assert (r["src"], r["dst"]) not in eset


def test_negative_samples_deterministic(spark):
    pairs = [(i, (i * 3 + 1) % 11) for i in range(11)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    a = sorted(
        (r["src"], r["dst"]) for r in negative_edge_samples(edges, k=4).collect()
    )
    b = sorted(
        (r["src"], r["dst"]) for r in negative_edge_samples(edges, k=4).collect()
    )
    assert a == b and a


# --------------------------------------------------------------- zipf profile


def test_zipf_profile_matches_numpy(spark):
    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(40)]
    # zipf-ish draws: token i with weight 1/(i+1)
    weights = np.array([1.0 / (i + 1) for i in range(40)])
    weights /= weights.sum()
    docs = []
    for d in range(30):
        n = rng.randrange(20, 60)
        toks = np.random.default_rng(d).choice(vocab, size=n, p=weights)
        docs.append((d, " ".join(toks)))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    out = zipf_profile(sdf, top_n=10).toPandas()
    assert len(out) == 10
    # independent frequency table + rank + least-squares slope
    from collections import Counter

    counts = Counter()
    for _, text in docs:
        counts.update(text.split())
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ranks = np.arange(1, len(ordered) + 1, dtype=float)
    freqs = np.array([c for _, c in ordered], dtype=float)
    slope = np.polyfit(np.log(ranks), np.log(freqs), 1)[0]
    got = out.sort_values("rank").reset_index(drop=True)
    for i in range(10):
        assert got["token"][i] == ordered[i][0]
        assert got["freq"][i] == ordered[i][1]
        assert got["rank"][i] == i + 1
    assert got["zipf_slope"][0] == pytest.approx(round(slope, 6), abs=1e-5)


def test_zipf_slope_near_minus_one_for_zipf_corpus(spark):
    # a corpus drawn from a true 1/rank law must fit close to slope -1
    vocab = [f"tok{i:03d}" for i in range(200)]
    weights = np.array([1.0 / (i + 1) for i in range(200)])
    weights /= weights.sum()
    gen = np.random.default_rng(99)
    docs = [
        (d, " ".join(gen.choice(vocab, size=400, p=weights)))
        for d in range(40)
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    out = zipf_profile(sdf, top_n=5).toPandas()
    slope = out["zipf_slope"][0]
    assert -1.35 < slope < -0.65


# ------------------------------------------------------------- weighted sssp


def test_weighted_sssp_matches_dijkstra(spark):
    import heapq

    from online_centrality_spark.operators.sssp import weighted_sssp

    rng = random.Random(53)
    pairs = list({(rng.randrange(20), rng.randrange(20)) for _ in range(70)})
    pairs = [(s, d) for s, d in pairs if s != d]
    wedges = [(s, d, round(0.1 + rng.random(), 6)) for s, d in pairs]
    df = spark.createDataFrame(wedges, "src long, dst long, w double")
    source = min(min(s, d) for s, d, _ in wedges)
    got = {
        r["node_id"]: r["dist"]
        for r in weighted_sssp(df, source).collect()
    }
    # independent Dijkstra
    adj = {}
    for s, d, w in wedges:
        adj.setdefault(s, []).append((d, w))
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, ()):
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    assert got.keys() == dist.keys()
    for n in dist:
        assert got[n] == pytest.approx(dist[n], abs=1e-9)


def test_weighted_sssp_unreachable_omitted(spark):
    from online_centrality_spark.operators.sssp import weighted_sssp

    df = spark.createDataFrame(
        [(1, 2, 1.0), (3, 4, 1.0)], "src long, dst long, w double"
    )
    got = {r["node_id"]: r["dist"] for r in weighted_sssp(df, 1).collect()}
    assert got == {1: 0.0, 2: 1.0}
