"""Round-4 additions, batch j: attack-robustness curve, butterfly
counting, categorical attribute assortativity — each against an
independent in-Python oracle."""

import random

from online_centrality_spark.operators import (
    attack_robustness,
    attribute_assortativity,
    butterfly_count,
)


# --------------------------------------------------- attack robustness


def _cc_stats(es):
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


def _robustness_brute(edges, max_remove):
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    deg = {}
    for h, l in es:
        deg[h] = deg.get(h, 0) + 1
        deg[l] = deg.get(l, 0) + 1
    ranked = sorted(deg, key=lambda n: (-deg[n], n))[:max_remove]
    out = {}
    for level in range(max_remove + 1):
        removed = set(ranked[:level])
        alive = {(h, l) for h, l in es if h not in removed and l not in removed}
        if not alive:
            continue
        sizes = _cc_stats(alive)
        out[level] = (
            len(alive),
            sum(sizes.values()),
            len(sizes),
            max(sizes.values()),
        )
    return out


def test_attack_robustness_matches_brute(spark):
    rng = random.Random(31)
    edges = [(rng.randint(0, 24), rng.randint(0, 24)) for _ in range(70)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["level"]: (r["n_edges"], r["n_nodes"], r["n_components"], r["largest"])
        for r in attack_robustness(df, max_remove=6).collect()
    }
    assert got == _robustness_brute(edges, 6)


def test_attack_robustness_star_collapses_at_level_one(spark):
    # star: removing the single hub (level 1) leaves no edges at all —
    # only the level-0 row exists
    df = spark.createDataFrame([(0, i) for i in range(1, 8)], "src long, dst long")
    rows = attack_robustness(df, max_remove=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["level"], r["n_edges"], r["n_components"], r["largest"]) == (0, 7, 1, 8)


# ----------------------------------------------------------- butterflies


def test_butterfly_matches_brute(spark):
    rng = random.Random(37)
    rows = [(rng.randint(0, 9), rng.randint(100, 109)) for _ in range(60)]
    df = spark.createDataFrame(rows, "src long, dst long")
    got = butterfly_count(df).collect()[0]
    es = set(rows)
    from itertools import combinations

    by_r = {}
    for u, r in es:
        by_r.setdefault(r, set()).add(u)
    wedges = sum(len(us) * (len(us) - 1) // 2 for us in by_r.values())
    c = {}
    for us in by_r.values():
        for u1, u2 in combinations(sorted(us), 2):
            c[(u1, u2)] = c.get((u1, u2), 0) + 1
    bf = sum(v * (v - 1) // 2 for v in c.values())
    assert (got["n_edges"], got["n_wedges"], got["n_butterflies"]) == (
        len(es),
        wedges,
        bf,
    )


def test_butterfly_single_biclique(spark):
    # K_{2,2} is exactly one butterfly, two wedges
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11)], "src long, dst long"
    )
    r = butterfly_count(df).collect()[0]
    assert (r["n_edges"], r["n_wedges"], r["n_butterflies"]) == (4, 2, 1)


# ----------------------------------------- categorical assortativity


def test_attribute_assortativity_two_cliques_is_one(spark):
    # two attribute-pure cliques joined by nothing: r = 1
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges += [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    df = spark.createDataFrame(edges, "src long, dst long")
    attrs = spark.createDataFrame(
        [(n, "x") for n in range(4)] + [(n, "y") for n in range(10, 14)],
        "node_id long, attr string",
    )
    r = attribute_assortativity(df, attrs).collect()[0]
    assert r["assortativity"] == 1.0


def test_attribute_assortativity_single_attr_is_null(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    attrs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x")], "node_id long, attr string"
    )
    r = attribute_assortativity(df, attrs).collect()[0]
    assert r["assortativity"] is None and r["n_edges"] == 2


def test_attribute_assortativity_matches_brute(spark):
    rng = random.Random(41)
    edges = [(rng.randint(0, 14), rng.randint(0, 14)) for _ in range(50)]
    attr_of = {n: ["x", "y", "z"][n % 3] for n in range(15)}
    df = spark.createDataFrame(edges, "src long, dst long")
    attrs = spark.createDataFrame(
        list(attr_of.items()), "node_id long, attr string"
    )
    got = attribute_assortativity(df, attrs).collect()[0]
    und = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    half = [(attr_of[a], attr_of[b]) for a, b in und] + [
        (attr_of[b], attr_of[a]) for a, b in und
    ]
    m = len(half)
    same = sum(1 for ta, tb in half if ta == tb)
    cnt = {}
    for ta, _ in half:
        cnt[ta] = cnt.get(ta, 0) + 1
    sq = sum(v * v for v in cnt.values()) / (m * m)
    want = round((same / m - sq) / (1 - sq), 6)
    assert got["assortativity"] == want and got["n_edges"] == len(und)


def test_attack_robustness_rejects_negative_node_ids(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(-5, 3), (3, 4)], "src long, dst long")
    with _pytest.raises(ValueError, match="non-negative"):
        attack_robustness(df, max_remove=2).collect()


def test_butterfly_empty_input_all_zero(spark):
    df = spark.createDataFrame([], "src long, dst long")
    r = butterfly_count(df).collect()[0]
    assert (r["n_edges"], r["n_wedges"], r["n_butterflies"]) == (0, 0, 0)


def test_random_failure_matches_brute(spark):
    import hashlib

    from online_centrality_spark.operators import random_failure

    def h(n):
        return int(hashlib.md5(str(n).encode()).hexdigest()[:15], 16) % 100

    import random as _random

    rng = _random.Random(137)
    edges = [(rng.randint(0, 29), rng.randint(0, 29)) for _ in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["pct"]: (r["n_edges"], r["n_nodes"], r["n_components"], r["largest"])
        for r in random_failure(df, percents=[0, 25, 50]).collect()
    }
    es = {(max(a, b), min(a, b)) for a, b in edges if a != b}
    want = {}
    for pct in (0, 25, 50):
        alive = {(x, y) for x, y in es if h(x) >= pct and h(y) >= pct}
        if not alive:
            continue
        sizes = _cc_stats(alive)
        want[pct] = (
            len(alive),
            sum(sizes.values()),
            len(sizes),
            max(sizes.values()),
        )
    assert got == want


def test_random_failure_level_zero_is_whole_graph(spark):
    from online_centrality_spark.operators import random_failure

    df = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "src long, dst long")
    rows = {r["pct"]: r for r in random_failure(df, percents=[0]).collect()}
    assert rows[0]["n_edges"] == 3 and rows[0]["n_components"] == 2
