"""End-to-end graph-report job over the smallest test scale."""


def test_graph_report_all_stages(spark, tmp_path):
    from jobs.graph_report import run_report

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "report")
    metrics = run_report(spark, events, out, gap_seconds=60.0, walk_length=4)
    assert set(metrics) == {
        "scc", "reciprocity", "temporal_motifs", "random_walks",
        "two_hop_reach", "negative_samples", "hits", "response_latency",
        "component_evolution", "edge_persistence", "disparity_backbone",
        "graph_summary", "bowtie", "transition_entropy", "cohort_retention",
    }
    # edge_persistence is legitimately empty when no two consecutive
    # days both have edges (the sf0.001 case)
    assert all(
        m["rows"] >= 1 for n, m in metrics.items() if n != "edge_persistence"
    ), metrics
    # the sinks must be re-readable and carry the expected schemas
    scc = spark.read.parquet(f"{out}/metric=scc")
    assert set(scc.columns) == {"node_id", "component"}
    reach = spark.read.parquet(f"{out}/metric=two_hop_reach")
    assert set(reach.columns) == {"node_id", "reach1", "reach2"}
    negs = spark.read.parquet(f"{out}/metric=negative_samples")
    assert set(negs.columns) == {"src", "dst"}
    walks = spark.read.parquet(f"{out}/metric=random_walks")
    assert set(walks.columns) == {"walk_id", "step", "node_id"}
    # walks start at step 0 for every walk id
    starts = walks.filter("step = 0").count()
    assert starts == walks.select("walk_id").distinct().count()


def test_graph_report_resume_skips_committed(spark, tmp_path):
    import shutil

    from jobs.graph_report import run_report

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "report2")
    first = run_report(spark, events, out, walk_length=3)
    # simulate a crash after some families: wipe two sinks
    shutil.rmtree(f"{out}/metric=hits")
    shutil.rmtree(f"{out}/metric=response_latency")
    second = run_report(spark, events, out, walk_length=3, resume=True)
    for name, m in second.items():
        assert m["rows"] == first[name]["rows"], name
    resumed = {n for n, m in second.items() if m.get("resumed")}
    assert resumed == {
        "scc", "reciprocity", "temporal_motifs", "random_walks",
        "two_hop_reach", "negative_samples",
        "component_evolution", "edge_persistence", "disparity_backbone",
        "graph_summary", "bowtie", "transition_entropy", "cohort_retention",
    }


def test_graph_report_resume_recomputes_on_param_change(spark, tmp_path):
    """--resume with DIFFERENT parameters must not serve stale families:
    the per-family params manifest gates the skip (ADVICE r03)."""
    from jobs.graph_report import run_report

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "report3")
    run_report(spark, events, out, walk_length=3)
    second = run_report(spark, events, out, walk_length=4, resume=True)
    # walk_length changed -> nothing may resume (one shared manifest)
    assert not any(m.get("resumed") for m in second.values()), second
    # the recomputed sink's manifest records the NEW invocation params
    # (the sf0.001 digraph is a single dead-end edge, so walk depth
    # itself cannot witness the recompute)
    import json

    mani = json.load(open(f"{out}/metric=random_walks/_params.json"))
    assert mani["walk_length"] == 4
    # and a third run with the same params resumes everything
    third = run_report(spark, events, out, walk_length=4, resume=True)
    assert all(m.get("resumed") for m in third.values()), third


def test_graph_report_reciprocity_schema_matches_driver_query(spark, tmp_path):
    """Both surfaces emit the shared (n_edges, n_mutual, reciprocity)
    select — schema drift between the job and q_reciprocity was an
    ADVICE r03 finding."""
    import sys

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from jobs.graph_report import run_report

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "report4")
    run_report(spark, events, out, walk_length=2)
    job_row = spark.read.parquet(f"{out}/metric=reciprocity")
    q_row = entry_mod.q_reciprocity(spark, "/root/testdata/sf0.001")
    assert job_row.columns == q_row.columns
    assert job_row.collect() == q_row.collect()


def test_corpus_profile_all_stages(spark, tmp_path):
    from jobs.corpus_profile import run_profile

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "profile")
    metrics = run_profile(spark, docs, events, out)
    assert set(metrics) == {
        "token_percentiles", "tfidf_top_terms", "term_cooccurrence",
        "heavy_hitters", "daily_activity",
        "domain_divergence", "doc_surprisal", "doc_novelty",
    }
    assert all(m["rows"] >= 1 for m in metrics.values()), metrics
    hh = spark.read.parquet(f"{out}/metric=heavy_hitters")
    assert set(hh.columns) == {"token", "n_true", "n_est"}
    assert hh.filter("n_est < n_true").count() == 0  # CMS never undershoots
    # resume skips everything when params are unchanged
    again = run_profile(spark, docs, events, out, resume=True)
    assert all(m.get("resumed") for m in again.values()), again
