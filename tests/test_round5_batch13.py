"""Hand-computed fixtures for the round-5 batch-13 operators:
session return-time histogram and per-source character entropy."""

import math

from online_centrality_spark.streaming.sessions import session_return_hist
from online_centrality_spark.text.analysis import char_entropy


def test_session_return_hist_by_hand(spark):
    """User 1: gaps of ~1.03h and ~2.8h -> buckets 1 and 2; user 2 has
    a single session -> contributes nothing."""
    h = 3_600_000_000
    sessions = spark.createDataFrame(
        [
            (1, 0, 1_000),
            (1, 1_000 + h + 100_000_000, 2 * h),          # gap ~1.03h -> 1
            (1, 2 * h + 10_000_000_000, 6 * h),           # gap ~2.8h  -> 2
            (2, 0, 500),
        ],
        "user_id long, session_start_us long, session_end_us long",
    )
    got = {
        r["hours"]: r["n_returns"]
        for r in session_return_hist(sessions).collect()
    }
    assert got == {1: 1, 2: 1}


def test_char_entropy_by_hand(spark):
    """'aab' -> H = -(2/3)ln(2/3) - (1/3)ln(1/3); 'aa' -> 0; the
    source mean averages the two. A doc with no [a-z0-9] chars is
    skipped entirely."""
    docs = spark.createDataFrame(
        [
            (1, "aab", "s1"),
            (2, "a a", "s1"),  # whitespace ignored -> single char class
            (3, "???", "s1"),  # no alphanumerics: skipped
            (4, "abcd", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        r["source"]: (r["n_docs"], r["mean_char_entropy"])
        for r in char_entropy(docs).collect()
    }
    h_aab = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert got["s1"][0] == 2
    assert abs(got["s1"][1] - round(h_aab / 2, 6)) < 2e-6
    assert got["s2"] == (1, round(math.log(4), 6))
