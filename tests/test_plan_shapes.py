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
