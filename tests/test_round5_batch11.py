"""Hand-computed fixtures for the round-5 batch-11 operators:
exact 4-cycle census, day-over-day active-user churn, and the
per-tie distinct-day persistence histogram."""

import datetime

from online_centrality_spark.operators import square_census
from online_centrality_spark.sources.edges import tie_persistence
from online_centrality_spark.sources.transcripts import user_churn


def test_square_census_plain_c4(spark):
    """A single 4-cycle: both diagonal pairs carry 2 common neighbors,
    sum w(w-1) = 4 -> exactly one square."""
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "src long, dst long"
    )
    row = square_census(df).collect()[0]
    assert (
        row["n_wedge_pairs"],
        row["n_diag_pairs"],
        row["n_wedges"],
        row["n_squares"],
    ) == (2, 2, 4, 1)


def test_square_census_k4_has_three_squares(spark):
    """K4: every one of the 6 node pairs has exactly 2 common
    neighbors -> sum w(w-1) = 12 -> 3 squares (the 3 distinct 4-cycles
    of K4)."""
    nodes = [1, 2, 3, 4]
    df = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a < b], "src long, dst long"
    )
    row = square_census(df).collect()[0]
    assert (
        row["n_wedge_pairs"],
        row["n_diag_pairs"],
        row["n_wedges"],
        row["n_squares"],
    ) == (6, 6, 12, 3)


def test_square_census_triangle_has_none(spark):
    """A triangle has 3 wedge pairs of multiplicity 1 and zero
    squares."""
    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src long, dst long")
    row = square_census(df).collect()[0]
    assert (row["n_wedge_pairs"], row["n_diag_pairs"], row["n_squares"]) == (
        3,
        0,
        0,
    )


def test_user_churn_consecutive_days_only(spark):
    """Days d1 {a,b} -> d2 {b,c}: one churn row (jaccard 1/3); d4 {c}
    has no active previous day and is omitted, as is the first day."""
    d = datetime.datetime
    rows = [
        (d(2024, 1, 1, 10), 1),
        (d(2024, 1, 1, 11), 1),  # duplicate (day, user) collapses
        (d(2024, 1, 1, 12), 2),
        (d(2024, 1, 2, 9), 2),
        (d(2024, 1, 2, 10), 3),
        (d(2024, 1, 4, 8), 3),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    got = [
        (str(r["day"]), r["prev_users"], r["curr_users"], r["common"], r["jaccard"])
        for r in user_churn(df).collect()
    ]
    assert got == [("2024-01-02", 2, 2, 1, 0.333333)]


def test_user_churn_disjoint_sets_zero_jaccard(spark):
    d = datetime.datetime
    df = spark.createDataFrame(
        [(d(2024, 1, 1), 1), (d(2024, 1, 2), 2)], "ts timestamp, user_id long"
    )
    got = user_churn(df).collect()
    assert len(got) == 1 and got[0]["common"] == 0 and got[0]["jaccard"] == 0.0


def test_tie_persistence_histogram(spark):
    """Pair {1,2} active on two distinct days (direction and intra-day
    multiplicity fold away), pair {2,3} on one; self-loops dropped."""
    day = 86400000000
    df = spark.createDataFrame(
        [
            (1, 2, 0),
            (2, 1, 100),  # same undirected pair, same day
            (1, 2, day + 5),  # second day
            (2, 3, 7),
            (4, 4, 0),  # self-loop: dropped
        ],
        "src long, dst long, t long",
    )
    got = {r["n_days"]: r["n_edges"] for r in tie_persistence(df).collect()}
    assert got == {1: 1, 2: 1}
