"""Structured Streaming front-end: stateful edge induction parity with
the batch rule, watermarked windowed metrics vs batch equivalents."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from online_centrality_spark.sources.transcripts import generate_transcripts
from online_centrality_spark.streaming import (
    stream_edge_induction,
    windowed_decayed_indegree,
    windowed_edge_counts,
)

TSCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def _expected_edges(pdf):
    """Pandas oracle for the §1.5 induction rule (per-turn lag)."""
    out = []
    for conv, sub in pdf.groupby("conv_id"):
        sub = sub.sort_values("turn_idx")
        actors = [
            f"tool:{t}" if r == "tool" else r
            for r, t in zip(sub["role"], sub["tool"])
        ]
        ts = (sub["ts"].astype("int64") // 1000).tolist()  # ns -> us
        turns = sub["turn_idx"].tolist()
        for i in range(1, len(actors)):
            out.append((conv, ts[i], actors[i - 1], actors[i], turns[i]))
    return sorted(out)


def _run_stream(spark, src_dir, build, mode="append", name="sink_t"):
    # append mode only emits windows the watermark has passed — the
    # trailing windows of a finite fixture never close, so aggregate
    # parity tests read the full state via complete mode instead
    stream_in = spark.readStream.schema(TSCHEMA).parquet(str(src_dir))
    q = (
        build(stream_in)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


@pytest.fixture()
def transcript_files(spark, tmp_path):
    pdf = generate_transcripts(n_convs=25, max_turns=10, seed=3)
    src = tmp_path / "in"
    src.mkdir()
    # two files; second contains a conv's EARLIER turns (out-of-order
    # arrival across micro-batches exercises the state buffer)
    mid = pdf.sort_values(["conv_id", "turn_idx"], ascending=[True, False])
    a = mid.iloc[: len(mid) // 2]
    b = mid.iloc[len(mid) // 2 :]
    # parts land directly in the watched dir (the file-stream source
    # does not recurse into subdirectories)
    spark.createDataFrame(a, TSCHEMA).write.mode("append").parquet(str(src))
    spark.createDataFrame(b, TSCHEMA).write.mode("append").parquet(str(src))
    return src, pdf


def test_stream_edge_induction_matches_batch(spark, transcript_files):
    src, pdf = transcript_files
    got = _run_stream(spark, src, stream_edge_induction).toPandas()
    got_t = sorted(
        zip(got["conv_id"], got["t"], got["src_actor"], got["dst_actor"], got["turn_idx"])
    )
    assert got_t == _expected_edges(pdf)


def test_windowed_metrics_match_batch(spark, transcript_files):
    src, pdf = transcript_files
    delta = 3600

    def build(stream_in):
        return windowed_edge_counts(stream_edge_induction(stream_in), delta)

    got = _run_stream(spark, src, build, mode="complete", name="s_cnt").toPandas()
    exp_edges = _expected_edges(pdf)
    starts = (
        pd.Series([t for _, t, _, _, _ in exp_edges]) // (delta * 1_000_000)
    ) * delta
    want = starts.value_counts().to_dict()
    got_map = {
        int(r["snapshot"]["start"].timestamp()): int(r["edges"])
        for _, r in got.iterrows()
    }
    assert got_map == {int(k): v for k, v in want.items()}


def test_windowed_decayed_indegree_matches_closed_form(spark, transcript_files):
    src, pdf = transcript_files
    delta, norm = 3600, 1800.0

    def build(stream_in):
        return windowed_decayed_indegree(
            stream_edge_induction(stream_in), delta, norm
        )

    got = _run_stream(spark, src, build, mode="complete", name="s_did").toPandas()
    exp_edges = _expected_edges(pdf)
    want: dict = {}
    for _, t, _s, d, _ in exp_edges:
        w_start = (t // (delta * 1_000_000)) * delta
        w_end = (w_start + delta) * 1_000_000
        want[(w_start, d)] = want.get((w_start, d), 0.0) + 0.5 ** (
            (w_end - t) / (norm * 1e6)
        )
    got_map = {
        (int(r["snapshot"]["start"].timestamp()), r["dst_actor"]): r[
            "decayed_indegree"
        ]
        for _, r in got.iterrows()
    }
    assert set(got_map) == set(want)
    for k, v in want.items():
        assert got_map[k] == pytest.approx(v, rel=1e-9)


def test_induce_gap_skip_bounded_buffer():
    # a permanent turn_idx gap (dropped turn / 1-based source) must not
    # stall the conversation forever: once the out-of-order buffer
    # exceeds max_buffer, replay skips the gap and resumes (ADVICE r01)
    from online_centrality_spark.streaming.stream import _induce

    st = (None, None, [], [], [])
    # turn 0 never arrives; turns 1..8 do
    st, edges = _induce(st, list(range(1, 9)), [f"a{i}" for i in range(1, 9)],
                        list(range(1, 9)), max_buffer=4)
    # buffer exceeded 4 -> gap skipped at turn 1, chain emitted from there
    assert st[0] == 8  # last_turn advanced
    assert [e[3] for e in edges] == list(range(2, 9))
    # after the flush, in-order turns keep flowing normally
    st, edges = _induce(st, [9], ["a9"], [9], max_buffer=4)
    assert edges == [(9, "a8", "a9", 9)]


def test_streaming_distributed_replay_matches_batch(spark, tmp_path):
    """Structured Streaming driving the distributed-state engine via
    foreachBatch: N time-ordered micro-batches produce exactly the same
    read-outs as ONE batch replay over the union with the same
    boundaries (state carried as a cogrouped DataFrame throughout)."""
    from online_centrality_spark.functions.weights import ExponentialWeighter
    from online_centrality_spark.operators import (
        DistributedTemporalKatz,
        attach_closure_components,
    )
    from online_centrality_spark.sources.edges import edges_from_transcripts
    from online_centrality_spark.sources.transcripts import transcripts_spark
    from online_centrality_spark.streaming import StreamingDistributedReplay

    params = [(1.0, ExponentialWeighter(norm=3600.0, base=0.5))]
    tr = transcripts_spark(spark, n_convs=25, max_turns=10, seed=9)
    edges, _ = edges_from_transcripts(tr)
    epdf = (
        attach_closure_components(edges)
        .selectExpr("CAST(t AS DOUBLE) AS key", "src", "dst", "seq", "closure")
        .toPandas()
        .sort_values(["key", "seq"])
        .reset_index(drop=True)
    )
    # split into 3 time-ordered files, cuts only where key strictly
    # increases (the ordering contract: no key tie across micro-batches)
    n = len(epdf)
    cuts = []
    for want in (n // 3, 2 * n // 3):
        c = want
        while c < n and epdf["key"][c] == epdf["key"][c - 1]:
            c += 1
        cuts.append(c)
    parts = [epdf.iloc[: cuts[0]], epdf.iloc[cuts[0] : cuts[1]], epdf.iloc[cuts[1] :]]
    src_dir = tmp_path / "stream_in"
    src_dir.mkdir()
    import time as _time

    schema = "key double, src long, dst long, seq long, closure long"
    for i, part in enumerate(parts):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src_dir))
        _time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    sink = StreamingDistributedReplay(
        DistributedTemporalKatz(params), str(tmp_path / "stream_out")
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(sink.batches) == 3
    got_pdf = sink.scores(spark).toPandas()
    got = {
        (r.interval_id, r.param_id, r.node_id): r.score
        for r in got_pdf.itertuples()
    }

    # batch reference: ONE replay with the same three boundaries
    ref = DistributedTemporalKatz(params)
    all_edges = spark.createDataFrame(epdf, schema)
    intervals = [(bid, hi, hi) for bid, hi in sink.batches]
    want_pdf = ref.run_batch(all_edges, intervals).toPandas()
    want = {
        (r.interval_id, r.param_id, r.node_id): r.score
        for r in want_pdf.itertuples()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9, abs=1e-12), k


def test_streaming_exact_dedup_first_seen(spark, tmp_path):
    from online_centrality_spark.streaming import streaming_exact_dedup

    src = tmp_path / "docs_src"
    src.mkdir()
    schema = "doc_id long, text string, ts timestamp"
    base = pd.Timestamp("2024-01-01")
    mk = lambda i, t, s: (i, t, base + pd.Timedelta(seconds=s))
    # batch 1: two distinct texts + an in-batch duplicate
    b1 = pd.DataFrame(
        [mk(0, "alpha beta gamma", 0), mk(1, "delta epsilon", 10),
         mk(2, "Alpha  beta gamma!", 20)],  # normalizes equal to doc 0
        columns=["doc_id", "text", "ts"],
    )
    # batch 2 (later file): cross-batch duplicate + a new text
    b2 = pd.DataFrame(
        [mk(3, "delta epsilon", 30), mk(4, "zeta eta", 40)],
        columns=["doc_id", "text", "ts"],
    )
    spark.createDataFrame(b1, schema).write.mode("append").parquet(str(src))
    spark.createDataFrame(b2, schema).write.mode("append").parquet(str(src))

    stream_in = spark.readStream.schema(schema).parquet(str(src))
    q = (
        streaming_exact_dedup(stream_in, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_sink").toPandas()
    # one row per fingerprint; 2 and 3 are dups (in-batch and cross-batch)
    assert sorted(got["doc_id"]) in ([0, 1, 4], [1, 2, 4], [0, 3, 4], [2, 3, 4])
    assert got["fingerprint"].nunique() == 3


def test_streaming_sessionize_append_matches_batch_closed_sessions(
    spark, transcript_files
):
    """`sessionize` promises the identical call works under Structured
    Streaming with a watermark: in append mode only sessions the
    watermark has CLOSED emit, and every emitted row must equal its
    batch twin exactly (same start/end/count)."""
    from online_centrality_spark.streaming.sessions import sessionize

    src, _ = transcript_files

    def build(stream_in):
        return sessionize(
            stream_in.withWatermark("ts", "1 minute"),
            user_col="conv_id",
            gap_minutes=0.5,
            value_col=None,
        )

    got = _run_stream(spark, src, build, mode="append", name="sess_t").collect()
    batch = sessionize(
        spark.read.schema(TSCHEMA).parquet(str(src)),
        user_col="conv_id",
        gap_minutes=0.5,
        value_col=None,
    ).collect()
    bmap = {(r["conv_id"], r["session_start_us"]): r for r in batch}
    assert got, "no session closed under the watermark — fixture too short"
    assert len(got) < len(batch), "trailing sessions must stay open"
    for r in got:
        b = bmap[(r["conv_id"], r["session_start_us"])]
        assert (r["n_events"], r["session_end_us"]) == (
            b["n_events"],
            b["session_end_us"],
        )


def test_streaming_session_stats_folds_over_closed_sessions(
    spark, transcript_files
):
    """SURVEY §2.8's claim for `sessionize (+ session_stats)`: the same
    calls stream with a watermark. In append mode every CLOSED session
    is emitted exactly once, so `session_stats` applied unchanged to
    the accumulated closed-session relation (a foreachBatch sink)
    equals the batch stats over the same session set."""
    from online_centrality_spark.streaming.sessions import (
        session_stats,
        sessionize,
    )

    src, _ = transcript_files
    batches = []

    def sink(bdf, _bid):
        batches.append(bdf.toPandas())

    stream_in = spark.readStream.schema(TSCHEMA).parquet(str(src))
    q = (
        sessionize(
            stream_in.withWatermark("ts", "1 minute"),
            user_col="conv_id",
            gap_minutes=0.5,
            value_col=None,
        )
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    closed = pd.concat([b for b in batches if len(b)], ignore_index=True)
    assert len(closed), "no session closed under the watermark"
    # exactly-once emission is what makes the downstream fold mergeable
    assert not closed.duplicated(["conv_id", "session_start_us"]).any()

    got = (
        session_stats(spark.createDataFrame(closed), user_col="conv_id")
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    bs = sessionize(
        spark.read.schema(TSCHEMA).parquet(str(src)),
        user_col="conv_id",
        gap_minutes=0.5,
        value_col=None,
    ).toPandas()
    keys = set(
        map(tuple, closed[["conv_id", "session_start_us"]].values.tolist())
    )
    bs = bs[
        [
            (c, s) in keys
            for c, s in zip(bs["conv_id"], bs["session_start_us"])
        ]
    ]
    assert len(bs) == len(closed)  # closed sessions ARE batch sessions
    want = (
        session_stats(spark.createDataFrame(bs), user_col="conv_id")
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )


def test_streaming_session_flow_matrix_folds_over_closed_sessions(
    spark, transcript_files
):
    """The flow matrix streams through `sessionize(type_col=...)`: the
    entry/exit extraction is an aggregate INSIDE the session_window
    groupBy (so it watermarks like the rest of the call), and the
    (entry, exit) count fold over closed sessions is a mergeable sum
    across micro-batches. Cross-checked against the batch
    `session_flows` operator on the same events."""
    from online_centrality_spark.streaming.sessions import (
        session_flows,
        sessionize,
    )

    src, _ = transcript_files
    batches = []

    def sink(bdf, _bid):
        batches.append(bdf.toPandas())

    stream_in = spark.readStream.schema(TSCHEMA).parquet(str(src))
    q = (
        sessionize(
            stream_in.withWatermark("ts", "1 minute"),
            user_col="conv_id",
            gap_minutes=0.5,
            value_col=None,
            type_col="role",
            order_col="turn_idx",
        )
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    closed = pd.concat([b for b in batches if len(b)], ignore_index=True)
    assert len(closed)
    assert not closed.duplicated(["conv_id", "session_start_us"]).any()

    # batch twin: sessionize-with-types over all events equals the
    # session_flows operator's matrix (semantic parity of the two
    # entry/exit extractions: same struct total order, same inclusive
    # gap boundary)
    full = sessionize(
        spark.read.schema(TSCHEMA).parquet(str(src)),
        user_col="conv_id",
        gap_minutes=0.5,
        value_col=None,
        type_col="role",
        order_col="turn_idx",
    ).toPandas()
    flows_op = {
        (r["entry_type"], r["exit_type"]): r["n_sessions"]
        for r in session_flows(
            spark.read.schema(TSCHEMA).parquet(str(src)),
            user_col="conv_id",
            ts_col="ts",
            order_col="turn_idx",
            type_col="role",
            gap_minutes=0.5,
        ).collect()
    }
    from collections import Counter

    flows_full = Counter(zip(full["entry_type"], full["exit_type"]))
    assert dict(flows_full) == flows_op

    # streamed closed sessions fold to the batch matrix restricted to
    # the same session set
    keys = set(
        map(tuple, closed[["conv_id", "session_start_us"]].values.tolist())
    )
    fsub = full[
        [
            (c, s) in keys
            for c, s in zip(full["conv_id"], full["session_start_us"])
        ]
    ]
    want = Counter(zip(fsub["entry_type"], fsub["exit_type"]))
    got = Counter(zip(closed["entry_type"], closed["exit_type"]))
    assert got == want


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """The HLL register table is a plain max-agg, so the SAME call
    streams in complete mode: after both micro-batches the streamed
    sketch (and hence any estimate derived from it) equals the batch
    sketch over the union — the mergeable-sketch property, live."""
    from online_centrality_spark.text.sketches import hll_registers

    src = tmp_path / "ev_src"
    src.mkdir()
    schema = "event_type string, user_id long"
    b1 = pd.DataFrame(
        [("click", i) for i in range(300)], columns=["event_type", "user_id"]
    )
    b2 = pd.DataFrame(
        [("click", i) for i in range(200, 500)],
        columns=["event_type", "user_id"],
    )
    spark.createDataFrame(b1, schema).write.mode("append").parquet(str(src))
    spark.createDataFrame(b2, schema).write.mode("append").parquet(str(src))

    stream_in = spark.readStream.schema(schema).parquet(str(src))
    q = (
        hll_registers(stream_in, ["event_type"], "user_id")
        .writeStream.format("memory")
        .queryName("hll_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("hll_sink").toPandas()
    batch = hll_registers(
        spark.read.parquet(str(src)), ["event_type"], "user_id"
    ).toPandas()
    key = ["event_type", "reg"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert got[key + ["r"]].equals(batch[key + ["r"]])


def test_streaming_token_histogram_matches_batch(spark, tmp_path):
    """The token-sketch histogram cells are additive counts, so the
    SAME call streams in complete mode: after two micro-batches the
    streamed (lang, bucket) histogram equals the batch histogram over
    the union — the mergeability the 100 TB sketch path relies on."""
    from online_centrality_spark.text.analysis import token_bucket_histogram

    src = tmp_path / "doc_src"
    src.mkdir()
    schema = "doc_id string, lang string, text string"
    b1 = pd.DataFrame(
        [(f"a{i}", "en", "w " * (i % 37 + 1)) for i in range(150)],
        columns=["doc_id", "lang", "text"],
    )
    b2 = pd.DataFrame(
        [(f"b{i}", "de", "w " * (i % 211 + 1)) for i in range(150)],
        columns=["doc_id", "lang", "text"],
    )
    spark.createDataFrame(b1, schema).write.mode("append").parquet(str(src))
    spark.createDataFrame(b2, schema).write.mode("append").parquet(str(src))

    stream_in = spark.readStream.schema(schema).parquet(str(src))
    q = (
        token_bucket_histogram(stream_in)
        .writeStream.format("memory")
        .queryName("tok_hist_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("tok_hist_sink").toPandas()
    batch = token_bucket_histogram(spark.read.parquet(str(src))).toPandas()
    key = ["lang", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert got[key + ["c"]].equals(batch[key + ["c"]])
