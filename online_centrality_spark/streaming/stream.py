"""Structured Streaming front-end for the replay engine.

The reference is an offline replay of an ordered stream (SURVEY §2.7):
no watermarks or late data exist there because every epoch is indexed
before replay begins (``graph_simulator.py:10,15``).  These operators
carry the same semantics onto a live `readStream` source:

- :func:`stream_edge_induction` — the §1.5 interaction-adjacency rule as
  a custom stateful operator (``applyInPandasWithState``): per
  ``conv_id`` the state holds the last emitted actor/turn plus a small
  buffer of out-of-order turns, so edges are emitted exactly in stable
  turn order as turns arrive.
- :func:`windowed_edge_counts` — the per-snapshot node/edge metrics
  (E4 ``take_snapshot`` parity) as a watermarked tumbling-window agg.
- :func:`windowed_decayed_indegree` — streaming C9-lite: with the Exp
  weighter the decayed weight factorizes
  (``w(b - t) = base^(b/norm) * base^(-t/norm)``), so per-window decayed
  indegree is an ALGEBRAIC aggregation of ``base^((b - t)/norm)`` —
  plain built-in `sum`, map-side partials, no state operator needed.

Batch supersteps remain the centrality engine (the windowed semantics
are identical); these operators make the ingest/metrics path streamable.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

_EDGE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("t", T.LongType(), False),
        T.StructField("src_actor", T.StringType(), False),
        T.StructField("dst_actor", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_turn", T.IntegerType(), True),
        T.StructField("last_actor", T.StringType(), True),
        T.StructField("buf_turns", T.ArrayType(T.IntegerType()), True),
        T.StructField("buf_actors", T.ArrayType(T.StringType()), True),
        T.StructField("buf_ts", T.ArrayType(T.LongType()), True),
    ]
)


def _induce(state_tuple, turns, actors, ts, max_buffer=1024):
    """Emit edges for in-order turns; buffer out-of-order arrivals.

    The dense-0-based ``turn_idx`` contract is enforced with a bounded
    buffer: a permanent gap (a dropped/filtered turn, or a source whose
    turns start at 1) would otherwise stall the conversation forever
    under ``GroupStateTimeout.NoTimeout``.  When more than ``max_buffer``
    turns are pending, the gap is skipped — replay resumes at the
    smallest buffered turn, chaining from the last emitted actor — so a
    contract violation degrades to a bounded reorder window instead of
    silently withholding all subsequent edges.
    """
    last_turn, last_actor, bt, ba, bts = state_tuple
    pend = dict(zip(bt or [], zip(ba or [], bts or [])))
    for turn, actor, t in zip(turns, actors, ts):
        pend[int(turn)] = (actor, int(t))
    edges = []
    nxt = 0 if last_turn is None else last_turn + 1
    while True:
        while nxt in pend:
            actor, t = pend.pop(nxt)
            if last_actor is not None:
                edges.append((t, last_actor, actor, nxt))
            last_actor = actor
            last_turn = nxt
            nxt += 1
        if len(pend) <= max_buffer:
            break
        nxt = min(pend)  # gap-skip flush (contract violation)
    bt = sorted(pend)
    return (
        (last_turn, last_actor, bt, [pend[k][0] for k in bt], [pend[k][1] for k in bt]),
        edges,
    )


def stream_edge_induction(
    transcripts: DataFrame, max_buffer: int = 1024
) -> DataFrame:
    """Streaming §1.5 edge induction, keyed by ``conv_id``.

    Input: streaming ``(conv_id, turn_idx, role, tool, ts)``; output:
    streaming ``(conv_id, t, src_actor, dst_actor, turn_idx)`` in stable
    turn order per conversation (actor ids still string-form here — the
    dictionary encode is a batch-side join against the node table).
    ``max_buffer`` bounds the per-conversation out-of-order buffer; a
    turn_idx gap larger than it is skipped rather than stalling the
    conversation forever (see :func:`_induce`).
    """
    from ..sources.edges import actor_expr

    prepped = transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        actor_expr().alias("actor"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = tuple(state.get)
        else:
            st = (None, None, [], [], [])
        all_edges = []
        for pdf in pdfs:
            st, edges = _induce(
                st,
                pdf["turn_idx"].tolist(),
                pdf["actor"].tolist(),
                pdf["t"].tolist(),
                max_buffer=max_buffer,
            )
            all_edges.extend(edges)
        state.update(st)
        if all_edges:
            yield pd.DataFrame(
                {
                    "conv_id": key[0],
                    "t": [e[0] for e in all_edges],
                    "src_actor": [e[1] for e in all_edges],
                    "dst_actor": [e[2] for e in all_edges],
                    "turn_idx": [e[3] for e in all_edges],
                }
            )

    return prepped.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=_EDGE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_edge_counts(
    edges: DataFrame,
    delta_seconds: int,
    watermark: str = "1 hour",
    ts_col: str = "t",
) -> DataFrame:
    """Per-snapshot-window edge/actor counts (E4 metrics) with event-time
    tumbling windows + watermark for late data."""
    with_ts = edges.withColumn(
        "_ts", F.timestamp_micros(F.col(ts_col).cast("long"))
    ).withWatermark("_ts", watermark)
    return with_ts.groupBy(
        F.window("_ts", f"{delta_seconds} seconds").alias("snapshot")
    ).agg(
        F.count("*").alias("edges"),
        F.approx_count_distinct("dst_actor").alias("active_targets"),
    )


def windowed_decayed_indegree(
    edges: DataFrame,
    delta_seconds: int,
    norm_seconds: float,
    base: float = 0.5,
    watermark: str = "1 hour",
    ts_col: str = "t",
) -> DataFrame:
    """Streaming decayed indegree per window: for each (window, dst),
    ``sum(base^((window_end - t) / norm))`` — algebraic thanks to Exp
    factorization, so it runs as a plain watermarked windowed sum."""
    d_us = int(delta_seconds) * 1_000_000
    with_ts = (
        edges.withColumn(
            "_ts", F.timestamp_micros(F.col(ts_col).cast("long"))
        )
        .withColumn(
            # tumbling-window end for this edge, derivable per row (the
            # grouping alias is not referenceable inside the aggregate)
            "_w_end",
            (F.floor(F.col(ts_col).cast("long") / d_us) + 1) * d_us,
        )
        .withColumn(
            "_decayed",
            F.pow(
                F.lit(base),
                (F.col("_w_end") - F.col(ts_col).cast("long"))
                / F.lit(norm_seconds * 1e6),
            ),
        )
        .withWatermark("_ts", watermark)
    )
    win = F.window("_ts", f"{delta_seconds} seconds")
    return with_ts.groupBy(win.alias("snapshot"), F.col("dst_actor")).agg(
        F.sum("_decayed").alias("decayed_indegree")
    )


def streaming_exact_dedup(
    docs: DataFrame,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup: first-seen doc per content fingerprint.

    ``dropDuplicatesWithinWatermark`` keeps one row per normalized-text
    fingerprint while the watermark bounds the dedup state — the
    streaming half of the batch exact-dedup stage.  State for a
    fingerprint is purged once its event time falls behind the
    watermark horizon, so a duplicate arriving later than ``watermark``
    can re-emit: the standard bounded-state/at-least-once trade for
    dedup over an unbounded stream (the batch ``dedup_exact`` pass
    downstream stays exact).
    """
    from ..text.analysis import document_fingerprint

    return (
        document_fingerprint(docs, text_col=text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
