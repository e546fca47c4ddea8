"""Round-4 additions, batch o: C(k) clustering curve, activity heatmap,
Heaps'-law vocabulary growth — each against an independent in-Python
oracle."""

import math
import random

from online_centrality_spark.operators.summary import clustering_by_degree
from online_centrality_spark.streaming.sessions import activity_heatmap
from online_centrality_spark.text.analysis import vocab_growth


def _round_half_up(x):
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


# ------------------------------------------------- clustering by degree


def test_clustering_by_degree_matches_brute(spark):
    rng = random.Random(73)
    edges = [(rng.randint(0, 14), rng.randint(0, 14)) for _ in range(45)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["k"]: (r["n_nodes"], r["ck"]) for r in clustering_by_degree(df).collect()
    }
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    adj = {}
    for h, l in es:
        adj.setdefault(h, set()).add(l)
        adj.setdefault(l, set()).add(h)
    by_k = {}
    for v, ns in adj.items():
        tri = sum(1 for u in ns for w in ns if u < w and w in adj[u])
        d = len(ns)
        lcc = 2.0 * tri / (d * (d - 1)) if d >= 2 else 0.0
        by_k.setdefault(d, []).append(_round_half_up(lcc * 1e12))
    want = {
        k: (len(ts), round(sum(ts) / 1e12 / len(ts), 6)) for k, ts in by_k.items()
    }
    assert got == want


def test_clustering_by_degree_clique(spark):
    # K4: every node degree 3, lcc 1.0
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = clustering_by_degree(df).collect()
    assert len(rows) == 1 and rows[0]["k"] == 3 and rows[0]["ck"] == 1.0


# ------------------------------------------------------ activity heatmap


def test_activity_heatmap_matches_brute(spark):
    from pyspark.sql import functions as F

    rng = random.Random(79)
    rows = [
        (rng.randint(0, 9), rng.randint(0, 40) * 86_400_000_000 + rng.randint(0, 86_399) * 1_000_000)
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "user_id long, t_us long").select(
        "user_id", F.timestamp_micros("t_us").alias("ts")
    )
    got = {
        (r["dow"], r["hour"]): (r["n_events"], r["n_users"])
        for r in activity_heatmap(df).collect()
    }
    cells = {}
    for u, t in rows:
        key = ((t // 86_400_000_000 + 3) % 7, (t // 3_600_000_000) % 24)
        ev, us = cells.get(key, (0, set()))
        us = us | {u}
        cells[key] = (ev + 1, us)
    want = {k: (ev, len(us)) for k, (ev, us) in cells.items()}
    assert got == want
    # epoch day 0 is a Thursday: dow 3 under the Monday=0 convention
    thu = spark.createDataFrame([(1, 3_600_000_000)], "user_id long, t_us long").select(
        "user_id", F.timestamp_micros("t_us").alias("ts")
    )
    r = activity_heatmap(thu).collect()[0]
    assert (r["dow"], r["hour"]) == (3, 1)


# --------------------------------------------------------- vocab growth


def test_vocab_growth_matches_brute(spark):
    docs = [
        (0, "alpha beta"),
        (3, "alpha gamma"),
        (7, "delta"),
        (12, "beta epsilon zeta"),
        (19, "alpha eta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["bucket"]: (r["n_docs_cum"], r["vocab_cum"])
        for r in vocab_growth(df, buckets=4).collect()
    }
    width = 19 // 4 + 1  # = 5
    first_b, docs_b = {}, {}
    for d, text in docs:
        b = d // width
        docs_b[b] = docs_b.get(b, 0) + 1
        for w in text.split():
            first_b[w] = min(first_b.get(w, b), b)
    want = {}
    for b in docs_b:
        want[b] = (
            sum(n for bb, n in docs_b.items() if bb <= b),
            sum(1 for fb in first_b.values() if fb <= b),
        )
    assert got == want
    # cumulative curves are non-decreasing
    ks = sorted(got)
    for a, b in zip(ks, ks[1:]):
        assert got[b][0] >= got[a][0] and got[b][1] >= got[a][1]


def test_vocab_growth_empty(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert vocab_growth(df).count() == 0
