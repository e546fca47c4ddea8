"""End-to-end graph-report job over the smallest test scale."""


def test_graph_report_all_stages(spark, tmp_path):
    from jobs.graph_report import run_report

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "report")
    metrics = run_report(spark, events, out, gap_seconds=60.0, walk_length=4)
    assert set(metrics) == {
        "scc", "reciprocity", "temporal_motifs", "random_walks",
        "hits", "response_latency",
    }
    assert all(m["rows"] >= 1 for m in metrics.values()), metrics
    # the sinks must be re-readable and carry the expected schemas
    scc = spark.read.parquet(f"{out}/metric=scc")
    assert set(scc.columns) == {"node_id", "component"}
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
    assert resumed == {"scc", "reciprocity", "temporal_motifs", "random_walks"}
