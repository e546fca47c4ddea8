"""Hand-computed fixtures for truncated Rank-Biased Overlap."""

import pytest

from online_centrality_spark.evaluation import rbo


def _scores(spark, items):
    """items: list of (id, score)."""
    return spark.createDataFrame(items, "node_id long, score double")


def test_rbo_identical_lists(spark):
    """Identical 3-item rankings at depth 3, p=0.5:
    sum_{d=1..3} 0.5 * 0.5^(d-1) * d/d = 0.875."""
    a = _scores(spark, [(1, 3.0), (2, 2.0), (3, 1.0)])
    r = rbo(a, a, depth=3, p=0.5).collect()[0]
    assert (r["depth"], r["p"], r["overlap_at_depth"]) == (3, 0.5, 3)
    assert r["rbo"] == 0.875


def test_rbo_disjoint_lists(spark):
    a = _scores(spark, [(1, 2.0), (2, 1.0)])
    b = _scores(spark, [(10, 2.0), (20, 1.0)])
    r = rbo(a, b, depth=2, p=0.5).collect()[0]
    assert r["rbo"] == 0.0 and r["overlap_at_depth"] == 0


def test_rbo_swapped_pair(spark):
    """A=[1,2], B=[2,1], depth 2, p=0.5: d=1 overlap 0, d=2 overlap 2
    -> 0.5*0.5*2/2 = 0.25."""
    a = _scores(spark, [(1, 2.0), (2, 1.0)])
    b = _scores(spark, [(1, 1.0), (2, 2.0)])
    r = rbo(a, b, depth=2, p=0.5).collect()[0]
    assert r["rbo"] == 0.25 and r["overlap_at_depth"] == 2


def test_rbo_top_weighting(spark):
    """Agreement at the top is worth more than at the tail: swapping
    ranks 1-2 hurts more than swapping ranks 2-3."""
    base = [(1, 3.0), (2, 2.0), (3, 1.0)]
    swap_top = [(1, 2.0), (2, 3.0), (3, 1.0)]
    swap_tail = [(1, 3.0), (2, 1.0), (3, 2.0)]
    a = _scores(spark, base)
    r_top = rbo(a, _scores(spark, swap_top), depth=3, p=0.5).collect()[0]
    r_tail = rbo(a, _scores(spark, swap_tail), depth=3, p=0.5).collect()[0]
    assert r_top["rbo"] < r_tail["rbo"] < 0.875


def test_rbo_validates_args(spark):
    a = _scores(spark, [(1, 1.0)])
    with pytest.raises(ValueError, match="depth"):
        rbo(a, a, depth=0)
    with pytest.raises(ValueError, match="p must"):
        rbo(a, a, p=1.0)
