"""Round-4 additions, batch g: k-hop feature propagation, per-label
embedding outliers, leakage-safe grouped split — each against an
independent in-Python oracle, plus the structural invariants the
operators exist to guarantee."""

import random

import pytest

from online_centrality_spark.operators.feature_prop import khop_feature_propagation
from online_centrality_spark.similarity.outliers import embedding_outliers
from online_centrality_spark.text.packing import grouped_split


# ------------------------------------------------- k-hop feature propagation


def _khop_brute(pairs, feats, hops):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    layers = [dict(feats)]
    for _ in range(hops):
        prev, nxt = layers[-1], {}
        for v, ns in adj.items():
            vals = [prev[u] for u in ns if prev.get(u) is not None]
            if vals:
                nxt[v] = sum(vals) / len(vals)
        layers.append(nxt)
    return layers


def test_khop_matches_brute(spark):
    rng = random.Random(7)
    pairs = sorted({tuple(sorted(rng.sample(range(30), 2))) for _ in range(60)})
    feats = [(v, float(rng.randint(0, 9))) for v in range(30)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    fdf = spark.createDataFrame(feats, "node_id long, f double")
    got = {
        r["node_id"]: (r["f0"], r["f1"], r["f2"])
        for r in khop_feature_propagation(edges, fdf, hops=2).collect()
    }
    layers = _khop_brute(pairs, feats, 2)
    assert set(got) == set(range(30))
    for v in range(30):
        f0, f1, f2 = got[v]
        assert f0 == layers[0][v]
        for have, want in ((f1, layers[1].get(v)), (f2, layers[2].get(v))):
            if want is None:
                assert have is None
            else:
                assert have == pytest.approx(want, abs=1e-9)


def test_khop_isolated_node_null_layers(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    fdf = spark.createDataFrame(
        [(1, 4.0), (2, 8.0), (3, 5.0)], "node_id long, f double"
    )
    rows = {r["node_id"]: r for r in khop_feature_propagation(edges, fdf).collect()}
    assert rows[3]["f1"] is None and rows[3]["f2"] is None
    assert rows[1]["f1"] == 8.0 and rows[1]["f2"] == 4.0


# ------------------------------------------------------- embedding outliers


def test_outliers_match_brute(spark):
    rng = random.Random(11)
    rows = [
        (i, i % 3, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    got = embedding_outliers(emb, top_k=3).collect()
    # brute: per-label centroid, rounded d2, sort by (-d2, vec_id)
    by_label = {}
    for i, lab, vec in rows:
        by_label.setdefault(lab, []).append((i, vec))
    want = {}
    for lab, members in by_label.items():
        dim = len(members[0][1])
        cent = [
            sum(v[d] for _, v in members) / len(members) for d in range(dim)
        ]
        scored = sorted(
            (
                (round(sum((v[d] - cent[d]) ** 2 for d in range(dim)), 6), i)
                for i, v in members
            ),
            key=lambda t: (-t[0], t[1]),
        )
        for rk, (d2, i) in enumerate(scored[:3], 1):
            want[(lab, i)] = (d2, rk)
    assert len(got) == len(want)
    for r in got:
        d2, rk = want[(r["label"], r["vec_id"])]
        assert r["rk"] == rk
        assert r["d2"] == pytest.approx(d2, abs=1e-9)


def test_outliers_rank_bounded_and_sorted(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = embedding_outliers(emb, top_k=4).collect()
    per = {}
    for r in out:
        per.setdefault(r["label"], []).append((r["rk"], r["d2"]))
    for lab, rows in per.items():
        rows.sort()
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1))
        d2s = [d for _, d in rows]
        assert d2s == sorted(d2s, reverse=True)


# ------------------------------------------------------- leakage-safe split


def test_grouped_split_no_group_straddles(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tagged = grouped_split(docs, group_col="source", test_fraction=0.3)
    straddle = (
        tagged.groupBy("source")
        .agg({"split": "approx_count_distinct"})
        .filter("`approx_count_distinct(split)` > 1")
        .count()
    )
    assert straddle == 0
    splits = {r["split"] for r in tagged.select("split").distinct().collect()}
    assert splits <= {"train", "test"}


def test_grouped_split_deterministic_and_scan_only(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = grouped_split(docs, test_fraction=0.3)
    b = grouped_split(docs, test_fraction=0.3)
    assert (
        a.groupBy("split").count().orderBy("split").collect()
        == b.groupBy("split").count().orderBy("split").collect()
    )
    # the tagging itself is a projection: no Exchange before the scan's
    # project (splitting a 100 TB corpus must not shuffle)
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --------------------------------------------------------- WL refinement


def _h60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _wl_brute(pairs, rounds, mod=1_000_000_000):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    color = {v: len(ns) for v, ns in adj.items()}
    for _ in range(rounds):
        digest = {
            v: sum(_h60(str(color[u])) % mod for u in ns)
            for v, ns in adj.items()
        }
        color = {v: _h60(f"{color[v]}:{digest[v]}") % mod for v in adj}
    return color


def test_wl_matches_brute(spark):
    from online_centrality_spark.operators.wl import wl_refinement

    rng = random.Random(3)
    pairs = sorted({tuple(sorted(rng.sample(range(25), 2))) for _ in range(50)})
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["node_id"]: r["wl_color"] for r in wl_refinement(edges, 2).collect()}
    assert got == _wl_brute(pairs, 2)


def test_wl_vertex_transitive_graph_is_monochrome(spark):
    # a cycle is vertex-transitive: WL can never distinguish its nodes
    from online_centrality_spark.operators.wl import wl_histogram, wl_refinement

    n = 12
    cyc = [(i, (i + 1) % n) for i in range(n)]
    edges = spark.createDataFrame(cyc, "src long, dst long")
    hist = wl_histogram(wl_refinement(edges, rounds=3)).collect()
    assert len(hist) == 1 and hist[0]["n"] == n


def test_wl_separates_structural_roles(spark):
    # star + triangle: center, leaves, and triangle nodes are three
    # distinct structural roles; round-2 WL must separate all three
    from online_centrality_spark.operators.wl import wl_refinement

    pairs = [(0, i) for i in range(1, 5)] + [(10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["node_id"]: r["wl_color"] for r in wl_refinement(edges, 2).collect()}
    leaves = {got[i] for i in range(1, 5)}
    tri = {got[i] for i in (10, 11, 12)}
    assert len(leaves) == 1 and len(tri) == 1
    assert len({got[0], leaves.pop(), tri.pop()}) == 3


# ------------------------------------------------------ temporal edge split


def test_temporal_split_matches_brute(spark):
    from online_centrality_spark.operators.splits import temporal_edge_split

    rng = random.Random(5)
    rows = [
        (rng.randint(0, 9), rng.randint(0, 9), rng.randint(1000, 2000))
        for _ in range(80)
    ]
    pairs = spark.createDataFrame(rows, "src long, dst long, t long")
    got = {r["split"]: r for r in temporal_edge_split(pairs, num=4, den=5).collect()}
    lo = min(t for _, _, t in rows)
    hi = max(t for _, _, t in rows)
    cut = lo + ((hi - lo) * 4) // 5
    train = [(s, d) for s, d, t in rows if t <= cut]
    test = [(s, d) for s, d, t in rows if t > cut]
    tn = {n for e in train for n in e}
    sn = {n for e in test for n in e}
    assert got["train"]["n_edges"] == len(train)
    assert got["test"]["n_edges"] == len(test)
    assert got["train"]["n_nodes"] == len(tn)
    assert got["test"]["n_nodes"] == len(sn)
    assert got["train"]["n_new_nodes"] == 0
    assert got["test"]["n_new_nodes"] == len(sn - tn)


def test_temporal_split_all_train_when_one_timestamp(spark):
    from online_centrality_spark.operators.splits import temporal_edge_split

    pairs = spark.createDataFrame(
        [(1, 2, 100), (2, 3, 100)], "src long, dst long, t long"
    )
    rows = temporal_edge_split(pairs).collect()
    assert len(rows) == 1 and rows[0]["split"] == "train"
    assert rows[0]["n_edges"] == 2 and rows[0]["n_new_nodes"] == 0
