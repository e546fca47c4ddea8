"""Hand-computed fixtures for the round-5 batch-15 operators:
Onnela weighted clustering and the dedup threshold-survival profile."""

from online_centrality_spark.dedup.ngram import dedup_threshold_profile
from online_centrality_spark.operators.triangles import weighted_clustering


def test_weighted_clustering_by_hand(spark):
    """Triangle 1-2-3 (w = .8/.8/.2, max .8 -> normalized 1/1/.25,
    cbrt = .25^(1/3)) + pendant 3-4: nodes 1,2 get the full term,
    node 3 a third of it, the pendant leaf 0."""
    df = spark.createDataFrame(
        [(1, 2, 0.8), (1, 3, 0.8), (2, 3, 0.2), (3, 4, 0.4)],
        "src long, dst long, w double",
    )
    got = {
        r["node_id"]: (r["degree"], r["wcc"])
        for r in weighted_clustering(df).collect()
    }
    t = 0.25 ** (1 / 3)  # 0.6299605249
    assert got == {
        1: (2, round(t, 6)),
        2: (2, round(t, 6)),
        3: (3, round(t / 3, 6)),
        4: (1, 0.0),
    }


def test_weighted_clustering_parallel_edges_take_max(spark):
    """A duplicate (reversed) edge with a lower weight collapses to the
    max before any triangle math."""
    df = spark.createDataFrame(
        [(1, 2, 0.8), (2, 1, 0.1), (1, 3, 0.8), (2, 3, 0.2)],
        "src long, dst long, w double",
    )
    got = {r["node_id"]: r["wcc"] for r in weighted_clustering(df).collect()}
    t = 0.25 ** (1 / 3)
    assert got[1] == round(t, 6)


def test_dedup_threshold_profile_by_hand(spark):
    """Bigram sets: d1 = d2 = {ab, bc} (j=1.0 -> bucket 10); d3 shares
    one of two bigrams with each (j=1/3 -> bucket 3). All nine rungs
    emitted: t<=0.3 sees 3 pairs / 3 docs, t>=0.4 the identical pair
    only."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b x")],
        "doc_id long, text string",
    )
    got = {
        r["threshold"]: (r["n_pairs"], r["n_docs"])
        for r in dedup_threshold_profile(docs, n=2).collect()
    }
    assert len(got) == 9
    for t in (0.1, 0.2, 0.3):
        assert got[t] == (3, 3)
    for t in (0.4, 0.5, 0.6, 0.7, 0.8, 0.9):
        assert got[t] == (1, 2)
