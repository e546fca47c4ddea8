"""Static measures + graph algorithms vs pure-python oracles."""

import numpy as np
import pandas as pd
import pytest

from online_centrality_spark.operators.components import (
    connected_components,
    label_propagation,
)
from online_centrality_spark.operators.harmonic import harmonic_centrality
from online_centrality_spark.operators.static_degree import (
    static_indegree,
    static_negative_beta,
)
from online_centrality_spark.operators.static_pagerank import static_pagerank
from online_centrality_spark.operators.triangles import (
    triangle_count,
    triangle_count_per_vertex,
)
from tests.oracle.reference_oracle import (
    oracle_harmonic,
    oracle_indegree,
    oracle_negative_beta,
    oracle_pagerank,
)


def random_edge_set(seed, n_nodes=30, n_edges=120):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    return {(int(s), int(d)) for s, d in zip(src, dst)}


def to_df(spark, edge_set):
    pdf = pd.DataFrame(sorted(edge_set), columns=["src", "dst"])
    return spark.createDataFrame(pdf)


def as_map(df):
    return {r["node_id"]: r["score"] for r in df.collect()}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_static_indegree(spark, seed):
    es = random_edge_set(seed)
    got = as_map(static_indegree(to_df(spark, es)))
    want = oracle_indegree(es)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_static_negative_beta(spark, seed):
    es = random_edge_set(seed)
    got = as_map(static_negative_beta(to_df(spark, es)))
    want = oracle_negative_beta(es)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("threshold", [0, 100_000])  # distributed vs compact
def test_static_pagerank(spark, seed, threshold):
    es = random_edge_set(seed, n_nodes=25, n_edges=80)
    got = as_map(static_pagerank(to_df(spark, es), collect_threshold=threshold))
    want = oracle_pagerank(es)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("threshold", [0, 100_000])
def test_harmonic(spark, seed, threshold):
    es = random_edge_set(seed, n_nodes=20, n_edges=60)
    got = as_map(harmonic_centrality(to_df(spark, es), collect_threshold=threshold))
    want = oracle_harmonic(es, epsilon=0.0)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9)


def oracle_wcc(edge_set):
    nodes = set()
    for s, d in edge_set:
        nodes.update((s, d))
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edge_set:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # component id = min node id in component
    comp = {}
    for n in nodes:
        comp[n] = find(n)
    # path-compress fully
    changed = True
    while changed:
        changed = False
        for n in nodes:
            if comp[n] != comp[comp[n]]:
                comp[n] = comp[comp[n]]
                changed = True
    return comp


def oracle_lpa(edge_set, max_iter=10):
    nodes = sorted({n for e in edge_set for n in e})
    nbrs = {n: set() for n in nodes}
    for s, d in edge_set:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    labels = {n: n for n in nodes}
    for _ in range(max_iter):
        new = {}
        changed = 0
        for n in nodes:
            if not nbrs[n]:
                new[n] = labels[n]
                continue
            counts = {}
            for m in nbrs[n]:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            best = min(sorted(counts), key=lambda l: (-counts[l], l))
            new[n] = best
            if best != labels[n]:
                changed += 1
        labels = new
        if changed == 0:
            break
    return labels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components(spark, seed):
    # sparse graph so multiple components exist
    es = random_edge_set(seed, n_nodes=60, n_edges=45)
    got = {r["node_id"]: r["component"] for r in connected_components(to_df(spark, es)).collect()}
    want = oracle_wcc(es)
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_label_propagation(spark, seed):
    es = random_edge_set(seed, n_nodes=25, n_edges=50)
    got = {r["node_id"]: r["label"] for r in label_propagation(to_df(spark, es), max_iter=5).collect()}
    want = oracle_lpa(es, max_iter=5)
    assert got == want


def oracle_triangles(edge_set):
    nbrs = {}
    for s, d in edge_set:
        if s == d:
            continue
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    count = 0
    per_node = {n: 0 for n in nbrs}
    for a in nbrs:
        for b in nbrs[a]:
            if b <= a:
                continue
            common = nbrs[a] & nbrs[b]
            for c in common:
                if c > b:
                    count += 1
                    per_node[a] += 1
                    per_node[b] += 1
                    per_node[c] += 1
    return count, per_node


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_triangle_count(spark, seed):
    es = random_edge_set(seed, n_nodes=15, n_edges=70)
    df = to_df(spark, es)
    want_total, want_per = oracle_triangles(es)
    assert triangle_count(df) == want_total
    got_per = {
        r["node_id"]: r["triangles"]
        for r in triangle_count_per_vertex(df).collect()
    }
    for n, c in want_per.items():
        assert got_per[n] == c


def test_salted_pagerank_matches_unsalted(spark):
    """Explicit hub salting (functions/skew.py) leaves scores unchanged
    on a hub-skewed star + chain graph."""
    import numpy as np

    from online_centrality_spark.operators.static_pagerank import static_pagerank

    rng = np.random.default_rng(11)
    hub_edges = [(int(s), 0) for s in rng.integers(1, 40, 300)]
    chain = [(i, i + 1) for i in range(1, 39)]
    rows = [(s, d) for s, d in hub_edges + chain]
    edges = spark.createDataFrame(rows, "src long, dst long")
    plain = (
        static_pagerank(edges, max_iter=40, strict=False, collect_threshold=0)
        .toPandas()
        .set_index("node_id")["score"]
    )
    salted = (
        static_pagerank(
            edges, max_iter=40, strict=False, collect_threshold=0, salt=4
        )
        .toPandas()
        .set_index("node_id")["score"]
    )
    assert set(plain.index) == set(salted.index)
    for n in plain.index:
        assert abs(plain[n] - salted[n]) < 1e-12


def test_static_katz_matches_dense_series(spark):
    """Engine Katz (compact + distributed) vs a dense matrix-power oracle
    (reference semantics: column sums of sum_i (alpha A)^i, binarized —
    concept_drift/experiment_utils.py:21-43)."""
    import numpy as np

    from online_centrality_spark.operators.static_katz import static_katz

    rng = np.random.default_rng(5)
    n, E = 25, 160
    src = rng.integers(0, n, E)
    dst = rng.integers(0, n, E)
    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in zip(src, dst)], "src long, dst long"
    )
    A = np.zeros((n, n))
    A[src, dst] = 1.0  # binarized
    alpha = 0.05
    total = np.zeros(n)
    term = np.ones(n)
    M = alpha * A
    P = M.copy()
    for _ in range(200):
        contrib = P.sum(axis=0)
        total += contrib
        if np.abs(contrib).mean() < 1e-12:
            break
        P = P @ M
    present = sorted(set(src.tolist()) | set(dst.tolist()))
    for threshold in (100_000, 0):  # compact, then distributed
        got = (
            static_katz(edges, alpha=alpha, collect_threshold=threshold)
            .toPandas()
            .set_index("node_id")["score"]
        )
        assert sorted(got.index) == present
        for node in present:
            assert got[node] == pytest.approx(total[node], abs=1e-9), (
                threshold,
                node,
            )


def test_cc_star_vs_hashmin_and_round_count(spark):
    """Both algorithms agree with the oracle; the star variant converges
    in O(log n) rounds on a long path where hash-min needs O(diameter)."""
    from online_centrality_spark.operators.components import (
        connected_components_detail,
    )

    # long path (diameter 119) + a separate clique + isolated-ish pair
    path = [(i, i + 1) for i in range(120)]
    clique = [(200 + a, 200 + b) for a in range(6) for b in range(a + 1, 6)]
    es = path + clique + [(300, 301)]
    df = to_df(spark, es)
    # collect_threshold=0 pins the DISTRIBUTED star algorithm
    star, r_star = connected_components_detail(
        df, algorithm="star", collect_threshold=0
    )
    hm, r_hm = connected_components_detail(df, algorithm="hashmin")
    want = oracle_wcc(es)
    got_star = {r["node_id"]: r["component"] for r in star.collect()}
    got_hm = {r["node_id"]: r["component"] for r in hm.collect()}
    assert got_star == want
    assert got_hm == want
    # hash-min propagates one hop per round (O(diameter)); star doubles
    assert r_hm >= 60
    assert 0 < r_star <= 12, (r_star, r_hm)
    # the single-task union-find fast path (default threshold) agrees
    fast, r_fast = connected_components_detail(df, algorithm="star")
    assert r_fast == 0  # fast path taken
    assert {r["node_id"]: r["component"] for r in fast.collect()} == want


def test_weighted_harmonic_matches_dijkstra_oracle(spark):
    """C8 weighted variant (nx distance= parity): compact Dijkstra kernel
    and distributed min-plus supersteps both match a dense Dijkstra
    oracle, incl. parallel-edge min-weight dedup."""
    import heapq

    from online_centrality_spark.operators.harmonic import harmonic_centrality

    rng = np.random.default_rng(5)
    n, E = 24, 90
    src = rng.integers(0, n, E)
    dst = rng.integers(0, n, E)
    w = np.round(rng.uniform(0.5, 4.0, E), 3)
    rows = [
        (int(s), int(d), float(ww)) for s, d, ww in zip(src, dst, w) if s != d
    ]
    rows += [(rows[0][0], rows[0][1], rows[0][2] + 1.0)]  # parallel edge, heavier
    df = spark.createDataFrame(rows, "src long, dst long, distance double")

    # dense oracle: per-target Dijkstra over incoming min-weight edges
    adj: dict = {}
    for s, d, ww in rows:
        adj[(s, d)] = min(adj.get((s, d), float("inf")), ww)
    pred: dict = {}
    for (s, d), ww in adj.items():
        pred.setdefault(d, []).append((s, ww))
    nodes = sorted({x for s, d, _ in rows for x in (s, d)})
    want = {}
    for v in nodes:
        dist = {v: 0.0}
        heap = [(0.0, v)]
        while heap:
            du, u = heapq.heappop(heap)
            if du > dist.get(u, float("inf")):
                continue
            for p, ww in pred.get(u, []):
                nd = du + ww
                if nd < dist.get(p, float("inf")):
                    dist[p] = nd
                    heapq.heappush(heap, (nd, p))
        want[v] = sum(1.0 / d for u, d in dist.items() if u != v)

    for thresh in (20_000, 0):  # compact kernel, then distributed path
        got = {
            r["node_id"]: r["score"]
            for r in harmonic_centrality(
                df, collect_threshold=thresh, weight_col="distance"
            ).collect()
        }
        assert set(got) == set(want), thresh
        for v in nodes:
            assert got[v] == pytest.approx(want[v], abs=1e-9), (thresh, v)
