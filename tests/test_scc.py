"""SCC (FW-BW coloring) + user-interaction digraph induction."""

import random

import pytest

from online_centrality_spark.operators import strongly_connected_components
from online_centrality_spark.sources.edges import user_interaction_digraph

nx = pytest.importorskip("networkx")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _nx_scc(pairs):
    G = nx.DiGraph(pairs)
    want = {}
    for comp in nx.strongly_connected_components(G):
        m = min(comp)
        for v in comp:
            want[v] = m
    return want


def _check(spark, pairs):
    got = {
        r["node_id"]: r["component"]
        for r in strongly_connected_components(_edges(spark, pairs)).collect()
    }
    assert got == _nx_scc(pairs)


def test_scc_empty_edge_list_returns_empty_frame(spark):
    """A quiet events slice induces no digraph: SCC must return an empty
    typed frame, not crash on finished[0] (ADVICE r03)."""
    out = strongly_connected_components(_edges(spark, []))
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["node_id", "component"]
    assert [f.dataType.simpleString() for f in out.schema] == ["bigint", "bigint"]


def test_scc_finishing_exactly_on_max_iter_does_not_raise(spark):
    """One SCC retiring exactly on the last allowed outer round must
    succeed — the old for/else guard raised despite finished work
    (ADVICE r03)."""
    pairs = [(0, 1), (1, 2), (2, 0)]  # single SCC -> exactly 1 outer round
    got = {
        r["node_id"]: r["component"]
        for r in strongly_connected_components(
            _edges(spark, pairs), max_iter=1
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0}


def test_scc_two_cycles_bridge(spark):
    # cycle {0,1,2} -> bridge -> cycle {3,4}
    _check(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3)])


def test_scc_dag_all_singletons(spark):
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = {
        r["node_id"]: r["component"]
        for r in strongly_connected_components(_edges(spark, pairs)).collect()
    }
    assert got == {v: v for v in range(5)}


def test_scc_self_loops_and_multiedges_ignored(spark):
    _check(spark, [(0, 0), (0, 1), (0, 1), (1, 0), (1, 2)])


def test_scc_nested_condensation_chain(spark):
    # SCC A={0,1} -> SCC B={2,3} -> SCC C={4,5}: exercises multiple
    # outer retire rounds (colors of B/C shadowed by A's root first)
    _check(
        spark,
        [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (4, 5), (5, 4)],
    )


def test_scc_random_digraph_matches_networkx(spark):
    rng = random.Random(7)
    n = 60
    pairs = list(
        {(rng.randrange(n), rng.randrange(n)) for _ in range(220)}
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    _check(spark, pairs)


def test_digraph_bucket_stitch_matches_plain_window(spark):
    """The bucket-stitched induction must equal the naive single-window
    plan for any bucket count (the boundary rows are the regression)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(3)
    rows = []
    t0 = 1_500_000_000_000_000
    for i in range(400):
        rows.append(
            (
                i,
                t0 + rng.randrange(0, 3_000_000_000),
                rng.randrange(25),
                f"type{rng.randrange(3)}",
            )
        )
    events = spark.createDataFrame(
        rows, "event_id long, t_us long, user_id long, event_type string"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("t_us")).alias("ts"),
        "user_id",
        "event_type",
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    ref = (
        events.withColumn("pu", F.lag("user_id").over(w))
        .withColumn("pt", F.lag(t).over(w))
        .withColumn("t", t)
        .filter(
            F.col("pu").isNotNull()
            & (F.col("t") - F.col("pt") <= 60_000_000)
            & (F.col("pu") != F.col("user_id"))
        )
        .select(F.col("pu").alias("src"), F.col("user_id").alias("dst"))
        .distinct()
    )
    want = {(r["src"], r["dst"]) for r in ref.collect()}
    for buckets in (1, 7, 64):
        got = {
            (r["src"], r["dst"])
            for r in user_interaction_digraph(
                events, gap_seconds=60.0, time_buckets=buckets
            ).collect()
        }
        assert got == want, f"buckets={buckets}"


def test_digraph_empty_events(spark):
    from pyspark.sql import functions as F

    events = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string"
    )
    assert user_interaction_digraph(events).count() == 0


def test_scc_condensation_matches_networkx(spark):
    from pyspark.sql import functions as F

    from online_centrality_spark.operators import strongly_connected_components

    rng = random.Random(31)
    pairs = list({(rng.randrange(30), rng.randrange(30)) for _ in range(80)})
    pairs = [(a, b) for a, b in pairs if a != b]
    dg = _edges(spark, pairs).persist()
    labels = strongly_connected_components(dg)
    ls = labels.select(F.col("node_id").alias("src"), F.col("component").alias("sc"))
    ld = labels.select(F.col("node_id").alias("dst"), F.col("component").alias("dc"))
    got = {
        (r["sc"], r["dc"])
        for r in dg.join(ls, "src").join(ld, "dst")
        .filter(F.col("sc") != F.col("dc")).select("sc", "dc").distinct().collect()
    }
    comp = _nx_scc(pairs)
    want = {
        (comp[a], comp[b]) for a, b in pairs if comp[a] != comp[b]
    }
    assert got == want
    # the condensation must be a DAG
    C = nx.DiGraph(got)
    assert nx.is_directed_acyclic_graph(C)
