"""Round-4 additions, batch p: strength disparity Y2, OOV rate,
percolation threshold profile — each against an independent in-Python
oracle."""

import random

from online_centrality_spark.operators import strength_disparity, threshold_profile
from online_centrality_spark.text.analysis import oov_rate


# ---------------------------------------------------- strength disparity


def test_strength_disparity_matches_brute(spark):
    rng = random.Random(83)
    rows = [(rng.randint(0, 7), rng.randint(0, 7)) for _ in range(120)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["node_id"]: (r["k"], r["s"], r["y2"])
        for r in strength_disparity(df).collect()
    }
    w = {}
    for a, b in rows:
        if a != b:
            key = (max(a, b), min(a, b))
            w[key] = w.get(key, 0) + 1
    per = {}
    for (a, b), wt in w.items():
        for n in (a, b):
            k, s, sq = per.get(n, (0, 0, 0))
            per[n] = (k + 1, s + wt, sq + wt * wt)
    want = {n: (k, s, round(sq / (float(s) * float(s)), 6)) for n, (k, s, sq) in per.items()}
    assert got == want


def test_strength_disparity_bounds(spark):
    # dominant single edge: y2 -> 1; even spread over k edges: y2 = 1/k
    rows = [(0, 1)] * 50 + [(0, 2), (0, 3)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {r["node_id"]: r for r in strength_disparity(df).collect()}
    assert got[0]["y2"] > 0.9
    even = spark.createDataFrame([(9, 10), (9, 11), (9, 12), (9, 13)], "src long, dst long")
    g2 = {r["node_id"]: r for r in strength_disparity(even).collect()}
    assert g2[9]["y2"] == 0.25


# ----------------------------------------------------------- oov rate


def test_oov_rate_matches_brute(spark):
    docs = [
        (1, "common common words here"),
        (2, "common words and a zyzzyva qwertyuiop"),
        (3, "entirely xylotomous vocabulary"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov"])
        for r in oov_rate(df, vocab_k=4).collect()
    }
    cw = {}
    for _, text in docs:
        for w in text.lower().split():
            cw[w] = cw.get(w, 0) + 1
    vocab = {w for w, _ in sorted(cw.items(), key=lambda kv: (-kv[1], kv[0]))[:4]}
    want = {}
    for d, text in docs:
        toks = text.lower().split()
        oov = sum(1 for w in toks if w not in vocab)
        want[d] = (len(toks), oov, round(oov / len(toks), 6))
    assert got == want


# -------------------------------------------------- threshold profile


def _cc_sizes(es):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in es:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    sizes = {}
    for n in list(parent):
        sizes[find(n)] = sizes.get(find(n), 0) + 1
    return sizes


def test_threshold_profile_matches_brute(spark):
    rng = random.Random(89)
    edges = [
        (rng.randint(0, 19), rng.randint(0, 19), round(rng.random(), 2))
        for _ in range(80)
    ]
    ladder = [0.2, 0.5, 0.8]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r["threshold"]: (r["n_edges"], r["n_nodes"], r["n_components"], r["largest"])
        for r in threshold_profile(df, ladder).collect()
    }
    want = {}
    for th in ladder:
        alive = {
            (max(a, b), min(a, b))
            for a, b, w in edges
            if a != b and w >= th
        }
        if not alive:
            continue
        sizes = _cc_sizes(alive)
        want[th] = (len(alive), sum(sizes.values()), len(sizes), max(sizes.values()))
    assert got == want
    # monotone: higher threshold never has more edges
    ths = sorted(got)
    for a, b in zip(ths, ths[1:]):
        assert got[b][0] <= got[a][0]
