"""Hand-computed fixtures for the round-5 batch-14 operators:
event-type Markov stationary distribution and pairwise label-centroid
distances."""

import pytest

from online_centrality_spark.operators.markov import markov_stationary
from online_centrality_spark.similarity.covariance import (
    label_centroid_distances,
)


def test_markov_stationary_two_cycle(spark):
    """A <-> B deterministic 2-cycle: the uniform start is already
    stationary -> exactly (0.5, 0.5)."""
    events = spark.createDataFrame(
        [(1, 1, "A"), (1, 2, "B"), (1, 3, "A"), (1, 4, "B")],
        "user_id long, event_id long, event_type string",
    )
    got = {r["event_type"]: r["prob"] for r in markov_stationary(events).collect()}
    assert got == {"A": 0.5, "B": 0.5}


def test_markov_stationary_dangling_redistributes(spark):
    """A -> B with B dangling: fixpoint is A = 1/3, B = 2/3 (B's mass
    re-seeds both states uniformly each step); 25 oscillating steps
    land within ~2^-25."""
    events = spark.createDataFrame(
        [(1, 1, "A"), (1, 2, "B")],
        "user_id long, event_id long, event_type string",
    )
    got = {r["event_type"]: r["prob"] for r in markov_stationary(events).collect()}
    assert abs(got["A"] - 1 / 3) < 1e-6 and abs(got["B"] - 2 / 3) < 1e-6
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_markov_stationary_empty_raises(spark):
    events = spark.createDataFrame(
        [], "user_id long, event_id long, event_type string"
    )
    with pytest.raises(ValueError):
        markov_stationary(events)


def test_label_centroid_distances_by_hand(spark):
    """Centroids (1,0) and (4,4) -> distance 5."""
    emb = spark.createDataFrame(
        [(1, [0.0, 0.0], "a"), (2, [2.0, 0.0], "a"), (3, [4.0, 4.0], "b")],
        "vec_id long, embedding array<float>, label string",
    )
    got = label_centroid_distances(emb).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["label_a"], r["label_b"], r["dist"]) == ("a", "b", 5.0)
