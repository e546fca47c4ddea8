"""Round-4 additions, batch r: mutual-kNN graph and Cramér's V — each
against an independent in-Python oracle."""

import math
import random

from online_centrality_spark.similarity.ann import mutual_knn_graph
from online_centrality_spark.text.analysis import cramers_v


def _round_half_up(x):
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


# ------------------------------------------------------------ mutual kNN


def test_mutual_knn_matches_brute(spark):
    rng = random.Random(103)
    vecs = {i: [rng.gauss(0, 1) for _ in range(8)] for i in range(25)}
    rows = [(i, v) for i, v in vecs.items()]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["a"], r["b"]) for r in mutual_knn_graph(df, k=3).collect()}

    def cos(x, y):
        num = sum(a * b for a, b in zip(x, y))
        return round(
            num
            / (math.sqrt(sum(a * a for a in x)) * math.sqrt(sum(b * b for b in y))),
            6,
        )

    knn = {}
    for u in vecs:
        cand = sorted(
            ((cos(vecs[u], vecs[v]), v) for v in vecs if v != u),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        knn[u] = {v for _, v in cand}
    want = {
        (min(u, v), max(u, v))
        for u in vecs
        for v in knn[u]
        if u in knn[v] and u < v
    }
    assert got == want
    # mutuality: every edge endpoint pair is in each other's kNN
    for a, b in got:
        assert b in knn[a] and a in knn[b]


def test_mutual_knn_two_clusters(spark):
    # two tight clusters: mutual edges never cross clusters with k
    # smaller than the cluster size
    rows = [(i, [1.0 + 0.01 * i, 0.0]) for i in range(4)]
    rows += [(10 + i, [0.0, 1.0 + 0.01 * i]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["a"], r["b"]) for r in mutual_knn_graph(df, k=2).collect()}
    for a, b in got:
        assert (a < 10) == (b < 10)


# ------------------------------------------------------------- Cramér's V


def test_cramers_v_matches_brute(spark):
    rng = random.Random(107)
    rows = [
        (i, "t", ["en", "fr", "de"][rng.randint(0, 2)], ["w", "x", "y", "z"][rng.randint(0, 3)])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = cramers_v(df).collect()[0]
    ct = {}
    for _, _, a, b in rows:
        ct[(a, b)] = ct.get((a, b), 0) + 1
    ra, cb = {}, {}
    for (a, b), c in ct.items():
        ra[a] = ra.get(a, 0) + c
        cb[b] = cb.get(b, 0) + c
    n = len(rows)
    ts = 0
    for a in ra:
        for b in cb:
            e = float(ra[a]) * cb[b] / n
            nij = ct.get((a, b), 0)
            ts += _round_half_up((nij - e) * (nij - e) / e * 1e12)
    want = round(math.sqrt((ts / 1e12) / (float(n) * (min(len(ra), len(cb)) - 1))), 6)
    assert (got["n_docs"], got["n_a"], got["n_b"]) == (n, 3, 4)
    assert got["v"] == want


def test_cramers_v_perfect_and_single(spark):
    rows = [(i, "t", "en", "web") for i in range(10)]
    rows += [(100 + i, "t", "fr", "chat") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    assert cramers_v(df).collect()[0]["v"] == 1.0  # lang determines source
    single = spark.createDataFrame(
        [(1, "t", "en", "web"), (2, "t", "en", "chat")],
        "doc_id long, text string, lang string, source string",
    )
    assert cramers_v(single).collect()[0]["v"] is None  # min(R,C) = 1


def test_mutual_knn_drops_zero_norm_vectors(spark):
    # a zero embedding has NaN cosine to everyone: it must simply be
    # absent from the graph (engine masks NaN sims; oracle mirrors)
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.8, 0.2]), (9, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["a"], r["b"]) for r in mutual_knn_graph(df, k=2).collect()}
    assert all(9 not in e for e in got)
    assert got  # the well-formed vectors still form edges
