"""Hand-computed fixtures for the round-5 batch-12 operators:
per-source lexical-saturation Pearson and the exact scaled-int64
embedding covariance matrix."""

import pytest

from online_centrality_spark.similarity.covariance import embedding_covariance
from online_centrality_spark.text.analysis import lexical_saturation


def test_lexical_saturation_by_hand(spark):
    """Source s1: docs (3,2) (4,4) (2,1) -> n=3, Sx=9 Sy=7 Sxx=29
    Syy=21 Sxy=24 -> corr = 9 / sqrt(6*14) = 0.981981. Source s2 has
    zero variance in both features -> corr 0.0 by convention."""
    docs = spark.createDataFrame(
        [
            (1, "a b a", "s1"),
            (2, "a b c d", "s1"),
            (3, "a a", "s1"),
            (4, "x y", "s2"),
            (5, "y z", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: (
            r["n_docs"],
            r["mean_tokens"],
            r["mean_distinct"],
            r["corr"],
        )
        for r in lexical_saturation(docs).collect()
    }
    assert got == {
        "s1": (3, 3.0, 2.333333, 0.981981),
        "s2": (2, 2.0, 2.0, 0.0),
    }


def test_embedding_covariance_by_hand(spark):
    """Vectors (1,0) (0,1) (1,1): cov00 = cov11 = 2/3 - 4/9 = 2/9,
    cov01 = 1/3 - 4/9 = -1/9."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(emb).collect()
    }
    assert got == {
        (0, 0): 0.222222,
        (0, 1): -0.111111,
        (1, 1): 0.222222,
    }


def test_embedding_covariance_empty_raises(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        embedding_covariance(emb)
