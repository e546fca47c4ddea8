"""Round-4 additions, batch q: degree/weight Gini inequality profile
and per-user Simpson diversity — each against an independent in-Python
oracle."""

import random

from online_centrality_spark.operators.summary import inequality_profile
from online_centrality_spark.streaming.sessions import user_diversity


def _gini(values):
    vs = sorted(values)
    n = len(vs)
    total = sum(vs)
    return round(
        sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(vs)) / (n * total), 6
    )


def test_inequality_profile_matches_brute(spark):
    rng = random.Random(97)
    rows = [(rng.randint(0, 11), rng.randint(0, 11)) for _ in range(150)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = {r["kind"]: (r["n"], r["gini"]) for r in inequality_profile(df).collect()}
    w = {}
    for a, b in rows:
        if a != b:
            key = (max(a, b), min(a, b))
            w[key] = w.get(key, 0) + 1
    deg = {}
    for h, l in w:
        deg[h] = deg.get(h, 0) + 1
        deg[l] = deg.get(l, 0) + 1
    want = {
        "degree": (len(deg), _gini(deg.values())),
        "weight": (len(w), _gini(w.values())),
    }
    assert got == want


def test_inequality_profile_uniform_is_zero(spark):
    # 4-cycle: every degree 2, every weight 1 -> both Ginis exactly 0
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    got = {r["kind"]: r["gini"] for r in inequality_profile(df).collect()}
    assert got == {"degree": 0.0, "weight": 0.0}


def test_user_diversity_matches_brute(spark):
    rng = random.Random(101)
    rows = [
        (rng.randint(0, 5), "abcd"[rng.randint(0, 3)]) for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        r["user_id"]: (r["n_events"], r["n_types"], r["simpson"])
        for r in user_diversity(df).collect()
    }
    cnt = {}
    for u, t in rows:
        cnt.setdefault(u, {}).setdefault(t, 0)
        cnt[u][t] += 1
    want = {}
    for u, cs in cnt.items():
        n = sum(cs.values())
        want[u] = (n, len(cs), round(1.0 - sum(c * c for c in cs.values()) / (float(n) * n), 6))
    assert got == want


def test_user_diversity_extremes(spark):
    rows = [(1, "a")] * 10 + [(2, t) for t in "abcd" * 3]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {r["user_id"]: r for r in user_diversity(df).collect()}
    assert got[1]["simpson"] == 0.0  # monomaniac
    assert got[2]["simpson"] == 0.75  # uniform over 4 types: 1 - 4/16
