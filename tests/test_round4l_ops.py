"""Round-4 additions, batch l: document n-gram novelty and cohort
retention — each against an independent in-Python oracle."""

import random
import re

from online_centrality_spark.dedup.ngram import doc_novelty
from online_centrality_spark.streaming.sessions import cohort_retention

TOKEN_RE = re.compile(r"[a-z0-9]+|[^a-z0-9\s]+")


def _grams(text, n=3):
    toks = TOKEN_RE.findall(text.lower())
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


# ------------------------------------------------------------ doc novelty


def test_doc_novelty_matches_brute(spark):
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox sleeps all day long"),
        (3, "completely different content with unique trigrams here"),
        (4, "the quick brown fox jumps over the lazy dog"),  # dup of 1
        (5, "hi"),  # too short for trigrams -> not emitted
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_unique"], r["novelty"])
        for r in doc_novelty(df).collect()
    }
    all_grams = {d: _grams(t) for d, t in docs}
    want = {}
    for d, gs in all_grams.items():
        if not gs:
            continue
        uniq = sum(
            1
            for g in gs
            if all(g not in all_grams[o] for o in all_grams if o != d)
        )
        want[d] = (len(gs), uniq, round(uniq / len(gs), 6))
    assert got == want
    # exact duplicates share every trigram -> zero novelty both sides
    assert got[1][2] == 0.0 and got[4][2] == 0.0
    # fully unique doc -> novelty 1.0
    assert got[3][2] == 1.0


# ------------------------------------------------------- cohort retention


def test_cohort_retention_matches_brute(spark):
    from pyspark.sql import functions as F

    rng = random.Random(53)
    day_us = 86_400_000_000
    rows = []
    for u in range(20):
        start = rng.randint(0, 4)
        for d in range(start, 10):
            if d == start or rng.random() < 0.4:
                rows.append((u, start * 0 + d * day_us + rng.randint(0, day_us - 1)))
    df = spark.createDataFrame(rows, "user_id long, t_us long").select(
        "user_id", F.timestamp_micros("t_us").alias("ts")
    )
    got = {
        (r["cohort_day"], r["day_offset"]): (r["n_active"], r["retention"])
        for r in cohort_retention(df).collect()
    }
    active = {}
    for u, t in rows:
        active.setdefault(u, set()).add(t // day_us)
    first = {u: min(ds) for u, ds in active.items()}
    sizes = {}
    for u, f in first.items():
        sizes[f] = sizes.get(f, 0) + 1
    want = {}
    for u, ds in active.items():
        for d in ds:
            key = (first[u], d - first[u])
            want[key] = want.get(key, 0) + 1
    want = {k: (v, round(v / sizes[k[0]], 6)) for k, v in want.items()}
    assert got == want
    # offset-0 retention is 1.0 for every cohort
    for (c, off), (_, r) in got.items():
        if off == 0:
            assert r == 1.0


# ------------------------------------------------------------- spam mass


def test_spam_mass_trust_concentrates_at_seeds(spark):
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod

    rows = entry_mod.q_spam_mass(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # trust is a probability mass: 0 <= trust, pagerank > 0,
        # spam_mass = 1 - trust/pr <= 1
        assert r["pagerank"] > 0 and r["trust"] >= 0
        assert r["spam_mass"] <= 1.0
    # seed suppliers (suppkey % 7 == 0, ids < 100000) must carry MORE
    # trust relative to rank than the average non-seed node
    seeds = [r for r in rows if r["node_id"] < 100000 and r["node_id"] % 7 == 0]
    others = [r for r in rows if not (r["node_id"] < 100000 and r["node_id"] % 7 == 0)]
    assert seeds and others
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
    assert mean([r["spam_mass"] for r in seeds]) < mean(
        [r["spam_mass"] for r in others]
    )


# ----------------------------------------------- avg neighbor degree


def test_avg_neighbor_degree_matches_brute(spark):
    import math
    import random

    from online_centrality_spark.operators.summary import avg_neighbor_degree

    def _round_half_up(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    rng = random.Random(71)
    edges = [(rng.randint(0, 14), rng.randint(0, 14)) for _ in range(50)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["k"]: (r["n_nodes"], r["knn"])
        for r in avg_neighbor_degree(df).collect()
    }
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    adj = {}
    for h, l in es:
        adj.setdefault(h, set()).add(l)
        adj.setdefault(l, set()).add(h)
    by_k = {}
    for v, ns in adj.items():
        t = _round_half_up(sum(len(adj[u]) for u in ns) / len(ns) * 1e6)
        by_k.setdefault(len(ns), []).append(t)
    want = {
        k: (len(ts), round(sum(ts) / 1e6 / len(ts), 6)) for k, ts in by_k.items()
    }
    assert got == want


def test_avg_neighbor_degree_star(spark):
    from online_centrality_spark.operators.summary import avg_neighbor_degree

    # star with 5 leaves: hub (k=5) sees knn=1; leaves (k=1) see knn=5
    df = spark.createDataFrame([(0, i) for i in range(1, 6)], "src long, dst long")
    got = {r["k"]: (r["n_nodes"], r["knn"]) for r in avg_neighbor_degree(df).collect()}
    assert got == {5: (1, 1.0), 1: (5, 5.0)}


# ----------------------------------------------------- doc surprisal


def test_doc_surprisal_matches_brute(spark):
    import math

    from online_centrality_spark.text.analysis import doc_surprisal

    def _round_half_up(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    docs = [
        (1, "the the the common words"),
        (2, "zeta xylophone quixotic rare rare"),
        (3, "the common zeta mix"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["cross_entropy"])
        for r in doc_surprisal(df).collect()
    }
    cdw, cw = {}, {}
    for d, text in docs:
        for w in text.split():
            cdw[(d, w)] = cdw.get((d, w), 0) + 1
            cw[w] = cw.get(w, 0) + 1
    n = sum(cw.values())
    want = {}
    for d, _ in docs:
        ld = sum(c for (dd, _), c in cdw.items() if dd == d)
        ts = [
            _round_half_up((c / ld) * math.log(cw[w] / n) * 1e12)
            for (dd, w), c in cdw.items()
            if dd == d
        ]
        want[d] = (ld, round(-sum(ts) / 1e12, 6))
    assert got == want
    # the rare-token doc must be more surprising than the common one
    assert got[2][1] > got[1][1]
