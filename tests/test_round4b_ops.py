"""Round-4 additions: eigenvector, closeness, as-of join, weighted
PageRank, edge-stream growth."""

import random

import numpy as np
import pandas as pd
import pytest

from online_centrality_spark.operators.asof import asof_join
from online_centrality_spark.operators.bfs import closeness_centrality
from online_centrality_spark.operators.eigenvector import eigenvector_centrality
from online_centrality_spark.operators.static_pagerank import (
    static_pagerank,
    weighted_pagerank,
)
from online_centrality_spark.sources.edges import edge_stream_growth


# ---------------------------------------------------------------- eigenvector


def _ev_brute(pairs, k):
    """Dense matrix-power replica: symmetrize, v = A^k 1, L1 norm."""
    nodes = sorted({n for p in pairs for n in p})
    idx = {n: i for i, n in enumerate(nodes)}
    a = np.zeros((len(nodes), len(nodes)))
    for s, d in pairs:
        a[idx[s], idx[d]] = 1.0
        a[idx[d], idx[s]] = 1.0
    v = np.ones(len(nodes))
    for _ in range(k):
        v = a @ v
    return {n: v[idx[n]] / v.sum() for n in nodes}


def test_eigenvector_matches_dense_power(spark):
    rng = random.Random(11)
    pairs = list({(rng.randrange(20), rng.randrange(20)) for _ in range(60)})
    pairs = [(s, d) for s, d in pairs if s != d]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out = {
        r["node_id"]: r["score"]
        for r in eigenvector_centrality(edges, max_iter=9).collect()
    }
    exp = _ev_brute(pairs, 9)
    assert out.keys() == exp.keys()
    for n in exp:
        assert out[n] == pytest.approx(exp[n], abs=1e-12)


def test_eigenvector_distributed_matches_compact(spark):
    rng = random.Random(5)
    pairs = list({(rng.randrange(25), rng.randrange(25)) for _ in range(80)})
    pairs = [(s, d) for s, d in pairs if s != d]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    compact = {
        r["node_id"]: r["score"]
        for r in eigenvector_centrality(edges, max_iter=8).collect()
    }
    dist = {
        r["node_id"]: r["score"]
        for r in eigenvector_centrality(
            edges, max_iter=8, collect_threshold=0
        ).collect()
    }
    salted = {
        r["node_id"]: r["score"]
        for r in eigenvector_centrality(
            edges, max_iter=8, collect_threshold=0, salt=3
        ).collect()
    }
    assert compact.keys() == dist.keys() == salted.keys()
    for n in compact:
        assert dist[n] == pytest.approx(compact[n], abs=1e-9)
        assert salted[n] == pytest.approx(compact[n], abs=1e-9)


def test_eigenvector_empty(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert eigenvector_centrality(edges, max_iter=3).count() == 0


# ----------------------------------------------------------------- closeness


def test_closeness_path_graph(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = {
        r["node_id"]: (r["reach"], r["total_dist"], r["closeness"])
        for r in closeness_centrality(edges).collect()
    }
    assert out[0] == (2, 3, pytest.approx(2 / 3))
    assert out[1] == (2, 2, pytest.approx(1.0))
    assert out[2] == (2, 3, pytest.approx(2 / 3))


def test_closeness_two_components(spark):
    edges = spark.createDataFrame(
        [(0, 1), (2, 3), (3, 4)], "src long, dst long"
    )
    out = {
        r["node_id"]: (r["reach"], r["total_dist"])
        for r in closeness_centrality(edges).collect()
    }
    assert out[0] == (1, 1) and out[1] == (1, 1)
    assert out[3] == (2, 2)
    assert out[2] == (2, 3) and out[4] == (2, 3)


def test_closeness_matches_bfs_brute(spark):
    rng = random.Random(3)
    pairs = list({(rng.randrange(15), rng.randrange(15)) for _ in range(30)})
    pairs = [(s, d) for s, d in pairs if s != d]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    out = {
        r["node_id"]: (r["reach"], r["total_dist"])
        for r in closeness_centrality(edges).collect()
    }
    # brute-force BFS replica
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    for v in adj:
        dist = {v: 0}
        frontier = [v]
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        nxt.append(w)
            frontier = nxt
        reach = len(dist) - 1
        total = sum(dist.values())
        assert out[v] == (reach, total), v


# ----------------------------------------------------------------- as-of join


def _asof_frames(spark, n_left=120, n_right=40, n_keys=6, seed=13):
    rng = random.Random(seed)
    left = pd.DataFrame(
        {
            "k": [rng.randrange(n_keys) for _ in range(n_left)],
            "t": [rng.randrange(0, 1000) for _ in range(n_left)],
            "lid": list(range(n_left)),
        }
    )
    right = pd.DataFrame(
        {
            "k": [rng.randrange(n_keys) for _ in range(n_right)],
            "t": [rng.randrange(0, 1000) for _ in range(n_right)],
            "v": [float(i) for i in range(n_right)],
        }
    ).drop_duplicates(["k", "t"])
    return left, right


@pytest.mark.parametrize("bucket_us", [50, 173, 10_000])
def test_asof_matches_pandas_merge_asof(spark, bucket_us):
    left, right = _asof_frames(spark)
    lf = spark.createDataFrame(left.astype({"k": "int64", "t": "int64"}))
    rf = spark.createDataFrame(right.astype({"k": "int64", "t": "int64"}))
    out = asof_join(
        lf, rf, key="k", left_ts="t", right_ts="t", value_col="v",
        out_col="val", bucket_us=bucket_us,
    ).toPandas()
    exp = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("t", kind="stable"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    got = dict(zip(out["lid"], out["val"]))
    want = dict(zip(exp["lid"], exp["v"]))
    assert got.keys() == want.keys()
    for lid in want:
        if pd.isna(want[lid]):
            assert got[lid] is None or pd.isna(got[lid]), lid
        else:
            assert got[lid] == want[lid], lid


def test_asof_equal_ts_is_inclusive(spark):
    lf = spark.createDataFrame([(1, 100, 0)], "k long, t long, lid long")
    rf = spark.createDataFrame([(1, 100, 7.0)], "k long, t long, v double")
    out = asof_join(
        lf, rf, key="k", left_ts="t", right_ts="t", value_col="v",
        out_col="val", bucket_us=50,
    ).collect()
    assert out[0]["val"] == 7.0


def test_asof_carry_across_empty_buckets(spark):
    # right value in bucket 0, left rows in buckets 5 and 9 (no right
    # rows anywhere near) must still see the carry
    lf = spark.createDataFrame(
        [(1, 550, 0), (1, 990, 1)], "k long, t long, lid long"
    )
    rf = spark.createDataFrame([(1, 10, 3.0)], "k long, t long, v double")
    out = {
        r["lid"]: r["val"]
        for r in asof_join(
            lf, rf, key="k", left_ts="t", right_ts="t", value_col="v",
            out_col="val", bucket_us=100,
        ).collect()
    }
    assert out == {0: 3.0, 1: 3.0}


# --------------------------------------------------------- weighted pagerank


def test_weighted_pagerank_uniform_weights_match_static(spark):
    rng = random.Random(23)
    pairs = list({(rng.randrange(20), rng.randrange(20)) for _ in range(70)})
    pairs = [(s, d) for s, d in pairs if s != d]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    wedges = spark.createDataFrame(
        [(s, d, 2.5) for s, d in pairs], "src long, dst long, w double"
    )
    plain = {
        r["node_id"]: r["score"]
        for r in static_pagerank(edges, max_iter=60, tol=1e-12).collect()
    }
    weighted = {
        r["node_id"]: r["score"]
        for r in weighted_pagerank(wedges, max_iter=60, tol=1e-12).collect()
    }
    assert plain.keys() == weighted.keys()
    for n in plain:
        assert weighted[n] == pytest.approx(plain[n], abs=1e-9)


def test_weighted_pagerank_distributed_matches_compact(spark):
    rng = random.Random(29)
    rows = list(
        {
            (rng.randrange(15), rng.randrange(15), float(rng.randrange(1, 9)))
            for _ in range(50)
        }
    )
    rows = [(s, d, w) for s, d, w in rows if s != d]
    wedges = spark.createDataFrame(rows, "src long, dst long, w double")
    compact = {
        r["node_id"]: r["score"]
        for r in weighted_pagerank(wedges, max_iter=80, tol=1e-12).collect()
    }
    dist = {
        r["node_id"]: r["score"]
        for r in weighted_pagerank(
            wedges, max_iter=80, tol=1e-12, collect_threshold=0
        ).collect()
    }
    assert compact.keys() == dist.keys()
    for n in compact:
        assert dist[n] == pytest.approx(compact[n], abs=1e-8)
    assert sum(compact.values()) == pytest.approx(1.0, abs=1e-9)


def test_weighted_pagerank_weight_pull(spark):
    # 0 -> 1 (w 9), 0 -> 2 (w 1): node 1 must outrank node 2
    wedges = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 1.0)], "src long, dst long, w double"
    )
    out = {
        r["node_id"]: r["score"]
        for r in weighted_pagerank(wedges, max_iter=100, tol=1e-10).collect()
    }
    assert out[1] > out[2] > 0.0


# -------------------------------------------------------------- graph growth


def test_edge_stream_growth_counts(spark):
    day = 86_400_000_000
    rows = [
        (0, 1, 0 * day + 5),        # day 0: nodes 0,1 new; edge (0,1) new
        (1, 0, 0 * day + 10),       # day 0: edge (1,0) new, no new node
        (0, 1, 2 * day + 1),        # day 2: nothing new
        (2, 0, 2 * day + 2),        # day 2: node 2 new, edge (2,0) new
    ]
    edges = spark.createDataFrame(rows, "src long, dst long, t long")
    out = {r["day"].isoformat(): r for r in edge_stream_growth(edges).collect()}
    assert len(out) == 2
    d0, d2 = sorted(out)
    assert (out[d0]["new_nodes"], out[d0]["new_edges"]) == (2, 2)
    assert (out[d2]["new_nodes"], out[d2]["new_edges"]) == (1, 1)
    assert (out[d2]["cum_nodes"], out[d2]["cum_edges"]) == (3, 3)


def test_asof_null_value_attaches_not_bleeds(spark):
    # the most recent right row has v = NULL: it must attach NULL, not
    # let the older non-null value bleed through (DuckDB ASOF/merge_asof
    # semantics) — in-bucket case and cross-bucket carry case
    left = spark.createDataFrame(
        [(1, 10), (1, 90_000_000_000)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 1, 5.0), (1, 2, None), (1, 86_400_000_001, None)],
        "k long, t long, v double",
    )
    out = {
        r["t"]: r["v"]
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="t", value_col="v"
        ).collect()
    }
    assert out[10] is None  # latest in-bucket right row (t=2) is NULL
    assert out[90_000_000_000] is None  # carry from bucket-1's last row
