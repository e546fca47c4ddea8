"""Round-5 extras: bipartite projection + log-bucket quantile sketch."""

from itertools import combinations

from pyspark.sql import functions as F

from online_centrality_spark.operators import bipartite_projection
from online_centrality_spark.text.analysis import token_quantile_sketch


def _bip(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _brute(pairs, min_shared=1, cap=None):
    right = {}
    for u, r in set(pairs):
        right.setdefault(r, set()).add(u)
    if cap is not None:
        right = {r: us for r, us in right.items() if len(us) <= cap}
    out = {}
    for us in right.values():
        for a, b in combinations(sorted(us), 2):
            out[(a, b)] = out.get((a, b), 0) + 1
    return {k: v for k, v in out.items() if v >= min_shared}


FIX = [
    (1, 10), (2, 10), (3, 10),          # 10 shared by 1,2,3
    (1, 11), (2, 11),                   # 11 shared by 1,2
    (1, 12), (3, 12),                   # 12 shared by 1,3
    (4, 13),                            # 4 isolated on the left
    (1, 10),                            # duplicate edge (must dedup)
]


def _got(spark, **kw):
    return {
        (r["a"], r["b"]): r["shared"]
        for r in bipartite_projection(_bip(spark, FIX), **kw).collect()
    }


def test_projection_matches_bruteforce(spark):
    assert _got(spark) == _brute(FIX)


def test_projection_min_shared_filters(spark):
    assert _got(spark, min_shared=2) == _brute(FIX, min_shared=2)
    assert _got(spark, min_shared=2) == {(1, 2): 2, (1, 3): 2}


def test_projection_right_degree_cap_is_exact_lower_bound(spark):
    """Capping right hubs drops hub-mediated pairs: with cap=2 the
    3-degree customer 10 vanishes and every weight is the brute-force
    count on the capped graph (never larger than uncapped)."""
    capped = _got(spark, max_right_degree=2)
    assert capped == _brute(FIX, cap=2)
    full = _got(spark)
    assert all(capped[k] <= full[k] for k in capped)


def test_token_sketch_selects_correct_buckets(spark):
    """Token counts 1,2,3,7,100 ('en'): buckets [1,2],[1,2],[3..6],
    [7..14],[63..126] -> b=1,1,2,3,6. Median (rank ceil(0.5*5)=3) lands
    in bucket 2 (est 3); q=0.9 -> rank 5 -> bucket 6 (est 63)."""
    docs = spark.createDataFrame(
        [
            ("d1", "en", "a"),
            ("d2", "en", "a b"),
            ("d3", "en", "a b c"),
            ("d4", "en", "a b c d e f g"),
            ("d5", "en", " ".join(f"w{i}" for i in range(100))),
        ],
        "doc_id string, lang string, text string",
    )
    out = {
        (r["lang"], r["q"]): (r["bucket"], r["est_tokens"], r["n_docs"])
        for r in token_quantile_sketch(docs, quantiles=(0.5, 0.9)).collect()
    }
    assert out[("en", 0.5)] == (2, 3, 5)
    assert out[("en", 0.9)] == (6, 63, 5)
    assert out[("all", 0.5)] == (2, 3, 5)


def test_token_sketch_two_x_error_bound(spark):
    """The bucket lower edge underestimates the true quantile by at
    most 2x + 1 (bucket width) — the bound callers size context
    windows with."""
    import random

    rng = random.Random(3)
    rows = [
        (f"d{i}", "en", " ".join("w" for _ in range(rng.randrange(1, 500))))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    counts = sorted(len(t.split()) for _, _, t in rows)
    for r in token_quantile_sketch(docs, quantiles=(0.5, 0.9)).collect():
        if r["lang"] != "en":
            continue
        import math

        exact = counts[math.ceil(r["q"] * len(counts)) - 1]
        assert r["est_tokens"] <= exact <= 2 * (r["est_tokens"] + 1)


def test_triangle_estimate_accuracy_and_determinism(spark):
    """On a dense-ish random graph the wedge-sampling estimate lands
    within ~3 standard errors of the exact count, and the
    hash-deterministic sample makes reruns bit-identical."""
    import random

    from online_centrality_spark.operators.triangles import (
        triangle_count,
        triangle_estimate,
    )

    rng = random.Random(11)
    pairs = list({(rng.randrange(40), rng.randrange(40)) for _ in range(260)})
    pairs = [(a, b) for a, b in pairs if a != b]
    e = spark.createDataFrame(pairs, "src long, dst long")
    exact = triangle_count(e)
    row = triangle_estimate(e, num_samples=20_000).collect()[0]
    assert row["n_sampled"] > 15_000
    # gcc_est = 3T/W exactly when sampling is exhaustive-in-expectation;
    # 3-sigma band of the binomial estimator
    import math

    p = 3.0 * exact / row["n_wedges"]
    sigma = math.sqrt(p * (1 - p) / row["n_sampled"]) * row["n_wedges"] / 3.0
    assert abs(row["est_triangles"] - exact) <= 3 * sigma + 1
    again = triangle_estimate(e, num_samples=20_000).collect()[0]
    assert row == again


def test_triangle_estimate_empty_graph(spark):
    from online_centrality_spark.operators.triangles import triangle_estimate

    e = spark.createDataFrame([], "src long, dst long")
    row = triangle_estimate(e).collect()[0]
    assert (row["n_wedges"], row["n_sampled"], row["n_closed"]) == (0, 0, 0)


def test_label_spreading_clamps_seeds_and_spreads(spark):
    """Two seed islands on a path graph: labels flood outward round by
    round, seeds never change, ties break to the smaller label, and
    nodes out of reach within max_iter stay unlabeled."""
    from online_centrality_spark.operators import seeded_label_spreading

    # path 0-1-2-3-4-5-6, seeds at 0 ('a') and 6 ('b');
    # isolated pair 10-11 (no seed -> never labeled)
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame(
        [(0, "a"), (6, "b")], "node_id long, label string"
    )
    got = {
        r["node_id"]: r["label"]
        for r in seeded_label_spreading(e, seeds, max_iter=2).collect()
    }
    # after 2 rounds the flood reaches distance 2; node 3 gets BOTH
    # 'a' (via 2) and 'b' (via 4) in round... not yet: round 1 labels
    # 1 and 5; round 2 labels 2 and 4 — 3 and the island stay out
    assert got == {0: "a", 1: "a", 2: "a", 6: "b", 5: "b", 4: "b"}
    full = {
        r["node_id"]: r["label"]
        for r in seeded_label_spreading(e, seeds, max_iter=6).collect()
    }
    # node 3 sees one 'a' (node 2) and one 'b' (node 4): tie -> 'a'
    assert full[3] == "a"
    assert full[0] == "a" and full[6] == "b"  # clamped
    assert 10 not in full and 11 not in full


def test_label_spreading_seed_majority_overrides_distance(spark):
    """A node adjacent to two 'b' seeds and one 'a' seed takes 'b' —
    majority, not proximity order."""
    from online_centrality_spark.operators import seeded_label_spreading

    e = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "src long, dst long"
    )
    seeds = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "b")], "node_id long, label string"
    )
    got = {
        r["node_id"]: r["label"]
        for r in seeded_label_spreading(e, seeds, max_iter=1).collect()
    }
    assert got[0] == "b"


def test_weighted_walks_bias_and_validity(spark):
    """200 walkers each choose between a w=9 and a w=1 out-edge: ~90%
    must take the heavy edge (A-ES one-winner correctness), every step
    must follow an actual edge, and reruns are bit-identical."""
    from online_centrality_spark.operators.walk_corpus import (
        weighted_random_walks,
    )

    rows = [(i, 1000, 9.0) for i in range(200)] + [
        (i, 1001, 1.0) for i in range(200)
    ]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    out = weighted_random_walks(e, walk_length=1).collect()
    step1 = {r["walk_id"]: r["node_id"] for r in out if r["step"] == 1}
    picks = [v for k, v in step1.items() if k < 1000]
    heavy = sum(1 for v in picks if v == 1000)
    assert len(picks) == 200
    assert 0.80 <= heavy / 200 <= 0.97, heavy
    again = weighted_random_walks(e, walk_length=1).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_weighted_walks_follow_edges_and_fold_multiedges(spark):
    """Multi-edges fold into the weight by summation; every emitted
    step follows an existing edge; dead ends stop the walk."""
    from online_centrality_spark.operators.walk_corpus import (
        weighted_random_walks,
    )

    rows = [(0, 1, 1.0), (0, 1, 1.0), (1, 2, 3.0), (5, 6, 1.0)]
    e = spark.createDataFrame(rows, "src long, dst long, w double")
    out = weighted_random_walks(e, walk_length=4).collect()
    adj = {(0, 1), (1, 2), (5, 6)}
    by_walk = {}
    for r in sorted(out, key=lambda r: (r["walk_id"], r["step"])):
        by_walk.setdefault(r["walk_id"], []).append(r["node_id"])
    for path in by_walk.values():
        for a, b in zip(path, path[1:]):
            assert (a, b) in adj
    # node 0 has exactly one distinct out-neighbor -> must reach 2
    assert by_walk[0][:3] == [0, 1, 2]
    # 2 and 6 are dead ends: their walks stop at step 0
    assert by_walk[2] == [2] and by_walk[6] == [6]
