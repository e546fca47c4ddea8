"""Hand-computed fixtures for the round-5 batch-7 operators: walk
co-occurrence pairs, SoftDeDup weights, SFT dialogue-pair mining, and
boilerplate n-gram extraction."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from online_centrality_spark.dedup import soft_dedup_weights
from online_centrality_spark.operators import walk_cooccurrence
from online_centrality_spark.sources import dialogue_pairs
from online_centrality_spark.text import boilerplate_ngrams


def test_walk_cooccurrence_window_counts(spark):
    """One walk 1-2-3-4 with window=2: pairs at distance 1 and 2 only;
    a second walk revisiting (2,3) doubles that pair's count."""
    rows = [(0, s, n) for s, n in enumerate([1, 2, 3, 4])] + [
        (7, 0, 2),
        (7, 1, 3),
    ]
    walks = spark.createDataFrame(
        rows, "walk_id long, step long, node_id long"
    )
    got = {
        (r["a"], r["b"]): r["n_cooc"]
        for r in walk_cooccurrence(walks, window=2).collect()
    }
    assert got == {
        (1, 2): 1,
        (1, 3): 1,  # distance 2, inside the window
        (2, 3): 2,  # once on walk 0, once on walk 7
        (2, 4): 1,
        (3, 4): 1,
        # (1, 4) is distance 3 — outside window=2
    }


def test_walk_cooccurrence_unordered_and_self_pairs(spark):
    """A walk that returns to its start (1-2-1) folds both directions
    into one unordered key and keeps the positional self-pair (1,1)."""
    rows = [(0, 0, 1), (0, 1, 2), (0, 2, 1)]
    walks = spark.createDataFrame(
        rows, "walk_id long, step long, node_id long"
    )
    got = {
        (r["a"], r["b"]): r["n_cooc"]
        for r in walk_cooccurrence(walks, window=2).collect()
    }
    assert got == {(1, 2): 2, (1, 1): 1}


def test_soft_dedup_weights_mass_conservation(spark):
    """Three copies of one text and one unique text: weights 1/3 and 1,
    and total weight equals the number of distinct contents."""
    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "aaa"), (4, "bbb")],
        "doc_id long, text string",
    )
    out = soft_dedup_weights(docs)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 4  # every document keeps its row
    for d in (1, 2, 3):
        assert rows[d]["group_size"] == 3
        assert rows[d]["weight"] == pytest.approx(1 / 3, abs=1e-9)
    assert rows[4]["group_size"] == 1 and rows[4]["weight"] == 1.0
    total = out.agg(F.sum("weight")).collect()[0][0]
    assert total == pytest.approx(2.0, abs=1e-6)


def test_dialogue_pairs_adjacency_rule(spark):
    """Only IMMEDIATELY adjacent user→assistant pairs under turn order
    qualify: a tool turn between them breaks the pair; latency is the
    exact microsecond gap."""
    rows = [
        ("c1", 0, "user", "hi", None, datetime(2024, 1, 1, 0, 0, 0)),
        ("c1", 1, "assistant", "hello!", None, datetime(2024, 1, 1, 0, 0, 5)),
        ("c1", 2, "user", "run it", None, datetime(2024, 1, 1, 0, 0, 10)),
        ("c1", 3, "tool", "out", "bash", datetime(2024, 1, 1, 0, 0, 11)),
        ("c1", 4, "assistant", "done", None, datetime(2024, 1, 1, 0, 0, 20)),
        ("c2", 0, "user", "q", None, datetime(2024, 1, 1, 1, 0, 0)),
        ("c2", 1, "assistant", "a", None, datetime(2024, 1, 1, 1, 0, 2)),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = dialogue_pairs(t, "user", "assistant").collect()
    got = {(r["conv_id"], r["prompt_pos"]): r for r in out}
    # c1 turn 2 (user) is followed by a tool turn -> NOT a pair
    assert set(got) == {("c1", 0), ("c2", 0)}
    r = got[("c1", 0)]
    assert r["response_pos"] == 1
    assert r["latency_us"] == 5_000_000
    assert r["prompt_chars"] == 2 and r["response_chars"] == 6
    assert got[("c2", 0)]["latency_us"] == 2_000_000


def test_dialogue_pairs_no_cross_conversation_pairs(spark):
    """The lead window is partitioned by conversation: a user turn at
    the end of one conv never pairs with the next conv's assistant."""
    rows = [
        ("c1", 0, "user", "hi", None, datetime(2024, 1, 1)),
        ("c2", 0, "assistant", "a", None, datetime(2024, 1, 2)),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    assert dialogue_pairs(t, "user", "assistant").count() == 0


def test_boilerplate_ngrams_df_threshold_and_order(spark):
    """A cookie-banner trigram present in 3 docs crosses min_df=3; a
    phrase in only 2 docs does not; per-doc repetition does not inflate
    df (grams are per-doc distinct); order is (df desc, gram asc)."""
    docs = spark.createDataFrame(
        [
            (1, "accept all cookies please accept all cookies"),
            (2, "accept all cookies now"),
            (3, "we accept all cookies"),
            (4, "rare phrase here"),
            (5, "rare phrase here"),
        ],
        "doc_id long, text string",
    )
    out = boilerplate_ngrams(docs, n=3, min_df=3, top_k=10).collect()
    got = {r["gram"]: r["df"] for r in out}
    assert got["accept all cookies"] == 3
    assert "rare phrase here" not in got  # df=2 < min_df
    dfs = [r["df"] for r in out]
    assert dfs == sorted(dfs, reverse=True)


def test_duplication_flow_rollup(spark):
    """Pairs roll up to unordered source cells; max_score is the exact
    max, and direction of the (a, b) pair never matters."""
    from online_centrality_spark.dedup import duplication_flow

    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.4), (5, 6, 0.6)],
        "doc_a long, doc_b long, jaccard double",
    )
    docs = spark.createDataFrame(
        [(1, "web"), (2, "books"), (3, "books"), (4, "web"),
         (5, "web"), (6, "web")],
        "doc_id long, source string",
    )
    out = duplication_flow(pairs, docs, score_col="jaccard").collect()
    got = {(r["group_a"], r["group_b"]): (r["n_pairs"], r["max_score"])
           for r in out}
    # (1:web,2:books) and (3:books,4:web) land in the SAME unordered cell
    assert got == {("books", "web"): (2, 0.9), ("web", "web"): (1, 0.6)}


def test_reciprocity_latency_direction_and_value(spark):
    """First 1->2 at t=100, first 2->1 at t=250 (multiplicity collapses
    to the min): one row, initiator 1, latency 150. An unreciprocated
    edge emits nothing; an exact tie attributes to the smaller id."""
    from online_centrality_spark.operators import reciprocity_latency

    pairs = spark.createDataFrame(
        [
            (1, 2, 100), (1, 2, 400),   # repeated forward interactions
            (2, 1, 250), (2, 1, 300),
            (3, 4, 50),                 # never reciprocated
            (5, 6, 70), (6, 5, 70),     # exact tie
        ],
        "src long, dst long, t long",
    )
    out = {r["initiator"]: r for r in reciprocity_latency(pairs).collect()}
    assert set(out) == {1, 5}
    assert out[1]["responder"] == 2
    assert out[1]["t_initiate_us"] == 100
    assert out[1]["latency_us"] == 150
    assert out[5]["responder"] == 6 and out[5]["latency_us"] == 0


def test_pipeline_funnel_stage_losses(spark):
    """4 raw docs -> 3 after exact dedup (one exact pair) -> 1 after
    the quality floor (only the long English doc passes n_words >= 10);
    token totals are exact per stage."""
    from online_centrality_spark.text import pipeline_funnel

    good = ("the cat and the dog walked to the market in the morning "
            "and then the cat slept")
    docs = spark.createDataFrame(
        [(1, good), (2, "zz xx"), (3, "zz xx"), (4, "@@@@")],
        "doc_id long, text string",
    )
    rows = {r["stage"]: r for r in pipeline_funnel(docs).collect()}
    assert [rows[s]["stage_idx"] for s in ("raw", "dedup", "quality")] == [1, 2, 3]
    assert rows["raw"]["n_docs"] == 4
    assert rows["dedup"]["n_docs"] == 3      # doc 3 is an exact dup of 2
    assert rows["quality"]["n_docs"] == 1    # only doc 1 survives
    assert rows["raw"]["total_tokens"] > rows["dedup"]["total_tokens"]
    assert rows["quality"]["total_tokens"] == 17  # the good doc's tokens


def test_age_degree_profile_cohorts(spark):
    """Node 1 appears day 0 and accumulates 3 distinct neighbors
    (multi-interactions fold); nodes 2/3 first appear day 0 and day 1
    respectively — cohort totals are exact."""
    from online_centrality_spark.sources.edges import age_degree_profile

    D = 86_400_000_000
    pairs = spark.createDataFrame(
        [
            (1, 2, 0), (1, 2, 5),          # day 0: 1 and 2 appear
            (1, 3, D + 1), (3, 1, D + 2),  # day 1: 3 appears; 1-3 both ways
            (1, 4, 2 * D), (4, 4, 2 * D),  # day 2: 4 appears; self-loop dropped
        ],
        "src long, dst long, t long",
    )
    got = {r["first_day"]: (r["n_nodes"], r["total_degree"])
           for r in age_degree_profile(pairs).collect()}
    # day 0 cohort: node 1 (deg 3: nbrs 2,3,4) + node 2 (deg 1) = (2, 4)
    # day 1 cohort: node 3 (deg 1); day 2 cohort: node 4 (deg 1)
    assert got == {0: (2, 4), 1: (1, 1), 2: (1, 1)}
