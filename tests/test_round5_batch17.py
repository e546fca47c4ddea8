"""Hand-computed fixtures for the round-5 batch-17 operators:
corpus word-bigram conditional entropy and customer reorder-gap
histogram (the latter is inline in __spark_entry__, exercised here
through the contract callable)."""

import datetime
import math

from online_centrality_spark.text.analysis import word_bigram_entropy


def test_bigram_entropy_deterministic_chain_is_zero(spark):
    """'a b a b': every current word has exactly one successor ->
    H(next | cur) = 0."""
    docs = spark.createDataFrame(
        [(1, "a b a b")], "doc_id long, text string"
    )
    r = word_bigram_entropy(docs).collect()[0]
    assert (r["n_bigrams"], r["n_states"], r["entropy_rate"]) == (3, 2, 0.0)


def test_bigram_entropy_fair_split(spark):
    """'a a b': from 'a' the successor is a fair coin -> H = ln 2."""
    docs = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    r = word_bigram_entropy(docs).collect()[0]
    assert (r["n_bigrams"], r["n_states"]) == (2, 1)
    assert abs(r["entropy_rate"] - round(math.log(2), 6)) < 2e-6


def test_bigram_entropy_skips_short_docs(spark):
    """Single-word and empty docs contribute no bigrams; transitions
    never cross document boundaries."""
    docs = spark.createDataFrame(
        [(1, "a"), (2, ""), (3, "b c")], "doc_id long, text string"
    )
    r = word_bigram_entropy(docs).collect()[0]
    assert (r["n_bigrams"], r["n_states"], r["entropy_rate"]) == (1, 1, 0.0)


def test_reorder_gaps_by_hand(spark, tmp_path):
    """c1 orders on days 1,1,5 -> gaps {0, 4}; the single-order
    customer contributes nothing. Exercised through the contract
    callable on a parquet fixture dir."""
    import __spark_entry__ as entry

    d = datetime.date
    orders = spark.createDataFrame(
        [
            (10, 1, "x", 1.0, d(2024, 1, 1), "p"),
            (11, 1, "x", 1.0, d(2024, 1, 1), "p"),
            (12, 1, "x", 1.0, d(2024, 1, 5), "p"),
            (13, 2, "x", 1.0, d(2024, 1, 9), "p"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["gap_days"]: r["n_pairs"]
        for r in entry.q_reorder_gaps(spark, str(tmp_path)).collect()
    }
    assert got == {0: 1, 4: 1}


def test_directed_assortativity_by_hand(spark):
    """Chain 1->2->3 plus 1->3: degrees out(1)=2,in(1)=0; out(2)=1,
    in(2)=1; out(3)=0,in(3)=2. Hand Pearson per mode over the 3 edges
    (computed with numpy in the comment):
      out-in pairs  (2,1),(2,2),(1,2) -> corr = -0.5
      out-out pairs (2,1),(2,0),(1,0) -> corr = +0.5
      in-in pairs   (0,1),(0,2),(1,2) -> corr = +0.5
      in-out pairs  (0,1),(0,0),(1,0) -> corr = -0.5"""
    from online_centrality_spark.operators.triangles import (
        directed_assortativity,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    got = {
        r["mode"]: (r["n_edges"], r["corr"])
        for r in directed_assortativity(df).collect()
    }
    assert got == {
        "out-in": (3, -0.5),
        "out-out": (3, 0.5),
        "in-in": (3, 0.5),
        "in-out": (3, -0.5),
    }


def test_directed_assortativity_zero_variance(spark):
    """A perfect 3-cycle: every degree is 1 in both directions -> all
    four modes are zero-variance -> corr 0.0 by convention."""
    from online_centrality_spark.operators.triangles import (
        directed_assortativity,
    )

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    got = {r["mode"]: r["corr"] for r in directed_assortativity(df).collect()}
    assert got == {
        "out-in": 0.0, "out-out": 0.0, "in-in": 0.0, "in-out": 0.0,
    }


def test_activation_latency_by_hand(spark):
    """u1: first event at t=0, first purchase 90 min later -> bucket 1;
    u2 purchases immediately -> bucket 0; u3 never purchases ->
    absent."""
    import datetime as dt

    d = dt.datetime
    from online_centrality_spark.sources.transcripts import (
        activation_latency,
    )

    events = spark.createDataFrame(
        [
            (d(2024, 1, 1, 0, 0), 1, "view"),
            (d(2024, 1, 1, 1, 30), 1, "purchase"),
            (d(2024, 1, 1, 5, 0), 1, "purchase"),  # later ones ignored
            (d(2024, 1, 2), 2, "purchase"),
            (d(2024, 1, 3), 3, "view"),
        ],
        "ts timestamp, user_id long, event_type string",
    )
    got = {
        r["hours"]: r["n_users"] for r in activation_latency(events).collect()
    }
    assert got == {1: 1, 0: 1}
