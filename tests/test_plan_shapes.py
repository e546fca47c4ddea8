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
