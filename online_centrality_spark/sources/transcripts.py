"""Deterministic synthetic transcript generator (fixtures + bench input).

Schema per FIXTURES.md §1 — the authoritative engine input shape from
BASELINE.json ``input_hint``::

    transcripts(conv_id: string, turn_idx: int32, role: string,
                text: string, tool: string, ts: timestamp)

Everything is seeded numpy; the same pandas frame feeds both the Spark
engine and the test oracle, so the per-turn text-equality invariant is
checkable row by row. No external data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "bash", "browser", "edit", "read"]
#: zipf-ish weights — ``search`` is the dominant hub actor (FIXTURES.md §1)
TOOL_WEIGHTS = np.array([0.55, 0.20, 0.12, 0.08, 0.05])

T0 = 1_500_000_000  # fixed epoch origin (2017-07-14), whole seconds


def generate_transcripts(
    n_convs: int = 50,
    max_turns: int = 20,
    seed: int = 42,
    span_seconds: int = 6 * 3600,
    zipf_lengths: bool = False,
) -> pd.DataFrame:
    """Generate a deterministic multi-turn transcript table.

    Conversations start at a seeded offset in ``[0, span_seconds)`` and
    advance with small integer-second gaps, so timestamps are strictly
    non-decreasing within a conv while cross-conv ties are common
    (same-second bursts) — exercising the reference's within-epoch
    file-order semantics (``graph_simulator.py:34-39``).
    """
    rng = np.random.default_rng(seed)
    rows: list[tuple] = []
    for i in range(n_convs):
        conv_id = f"conv_{i:06d}"
        if zipf_lengths:
            n_turns = int(min(2 + rng.zipf(1.6), 10 * max_turns))
        else:
            n_turns = int(rng.integers(2, max_turns + 1))
        start = T0 + int(rng.integers(0, span_seconds))
        ts = start
        prev_role = None
        for k in range(n_turns):
            if k == 0:
                role = "system" if rng.random() < 0.3 else "user"
            elif prev_role in ("user", "system"):
                role = "assistant"
            elif prev_role == "assistant":
                role = "tool" if rng.random() < 0.45 else "user"
            else:  # after tool: assistant continues or chains another tool
                role = "tool" if rng.random() < 0.25 else "assistant"
            tool = None
            if role == "tool":
                tool = TOOLS[int(rng.choice(len(TOOLS), p=TOOL_WEIGHTS))]
            # deterministic filler text (per-turn text-equality invariant)
            text = f"{conv_id}:{k}:{role}:{int(rng.integers(0, 1_000_000))}"
            rows.append((conv_id, np.int32(k), role, text, tool, ts))
            # integer-second gaps; 0-gap allowed within conv (non-decreasing)
            ts += int(rng.integers(0, 120))
            prev_role = role
    df = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    return df


def transcripts_spark(spark, **kwargs):
    """The generated fixture as a Spark DataFrame with the explicit schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    return spark.createDataFrame(generate_transcripts(**kwargs), schema=schema)


def read_transcripts(spark, source: str, fmt: str | None = None):
    """Load the transcript table from a catalog table or a path.

    The north-star input is an Iceberg table of transcripts; this
    sandbox has no Iceberg runtime, so the engine treats the storage
    backend as configuration, not code:

    - ``source`` containing no ``/`` is read as a catalog table
      (``spark.read.table`` — Iceberg/Hive/Unity resolve through the
      session catalog, so an Iceberg deployment is purely a
      ``spark.sql.catalog.*`` config change),
    - otherwise as a path with ``fmt`` (default parquet; pass
      ``fmt="iceberg"`` for Iceberg path-based reads on a cluster with
      the runtime jar).

    Returns the DataFrame in the FIXTURES.md §1 schema; column presence
    is validated so misconfigured sources fail loudly at the boundary.
    """
    if "/" not in source and fmt is None:
        df = spark.read.table(source)
    else:
        df = spark.read.format(fmt or "parquet").load(source)
    required = {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    missing = required - set(df.columns)
    if missing:
        raise ValueError(f"transcript source {source!r} missing columns {sorted(missing)}")
    return df


def conversation_stats(
    turns,
    conv_col: str = "conv_id",
    actor_col: str = "role",
    ts_col: str = "ts",
    tool_col: str | None = "tool",
):
    """Per-conversation profile: ``(conv_col, n_turns, n_actors,
    t_first_us, t_last_us, duration_us[, n_tool_turns])``.

    One partial-aggregating ``groupBy`` over the conversation key — at
    transcript scale conversations are numerous and individually small,
    so the map-side combine collapses nearly all rows before the
    shuffle; the exact distinct-actor count rides the same shuffle via
    Spark's expand rewrite (actor cardinality is a tiny enum).
    """
    from pyspark.sql import functions as F

    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct(F.col(actor_col)).alias("n_actors"),
        F.min(t).alias("t_first_us"),
        F.max(t).alias("t_last_us"),
        (F.max(t) - F.min(t)).alias("duration_us"),
    ]
    if tool_col is not None and tool_col in turns.columns:
        aggs.append(
            F.sum(F.col(tool_col).isNotNull().cast("long")).alias("n_tool_turns")
        )
    return turns.groupBy(F.col(conv_col)).agg(*aggs)


def daily_activity(
    events,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
):
    """(day, n_users, n_events, rolling_events) — daily distinct active
    users and event volume plus a trailing ``window_days``-day rolling
    event sum (the DAU/volume health profile every ingestion pipeline
    reports).

    Scale shape: one map-side-combinable groupBy over (day) computes
    both dailies — ``count_distinct`` over the user key shuffles
    (day, user) pairs once; the rolling sum is a range window over the
    DAYS frame (one row per day — driver-trivial cardinality, single
    partition is fine and explicit).
    """
    from pyspark.sql import functions as F

    day = F.to_date(F.col(ts_col)).alias("day")
    daily = (
        events.select(day, F.col(user_col))
        .groupBy("day")
        .agg(
            F.count_distinct(F.col(user_col)).alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.col("day").cast("timestamp").cast("long"))
        .rangeBetween(-(window_days - 1) * 86400, 0)
    )
    return daily.select(
        "day",
        "n_users",
        "n_events",
        F.sum("n_events").over(w).alias("rolling_events"),
    )


def dialogue_pairs(
    turns,
    prompt_role: str,
    response_role: str,
    conv_col: str = "conv_id",
    role_col: str = "role",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("turn_idx",),
    text_col: str | None = "text",
):
    """SFT pair mining: every ADJACENT (prompt_role → response_role)
    turn pair per conversation, the instruction-tuning extraction
    primitive — ``(conv_col, prompt_*, response_*, latency_us)``.

    A pair is emitted when a ``prompt_role`` turn is IMMEDIATELY
    followed (under the conversation's stable turn ordering,
    ``order_cols``) by a ``response_role`` turn — the same
    adjacency-under-stable-ordering rule the edge induction applies
    (FIXTURES.md §1), so pair extraction and graph induction see the
    identical conversation structure. ``latency_us`` is the exact
    microsecond gap; when ``text_col`` is set the prompt/response
    lengths ride along for downstream quality filtering.

    Scale shape: one ``lead`` window per conversation key — the
    sessionization envelope: conversations are numerous and short, so
    partitions hold many small groups; no joins, no driver state. At
    10^12 turns this is a single shuffle on ``conv_col``.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    order = [F.col(c) for c in order_cols]
    w = Window.partitionBy(conv_col).orderBy(*order)
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    cols = [
        F.col(conv_col),
        F.col(order_cols[0]).alias("prompt_pos"),
        F.lead(order_cols[0]).over(w).alias("response_pos"),
        F.col(role_col).alias("_r"),
        F.lead(role_col).over(w).alias("_nr"),
        (F.lead(t).over(w) - t).alias("latency_us"),
    ]
    if text_col is not None:
        cols += [
            F.length(text_col).alias("prompt_chars"),
            F.length(F.lead(text_col).over(w)).alias("response_chars"),
        ]
    flagged = turns.select(*cols)
    return flagged.filter(
        (F.col("_r") == prompt_role) & (F.col("_nr") == response_role)
    ).drop("_r", "_nr")


def user_churn(
    events,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """(day, prev_users, curr_users, common, jaccard) — day-over-day
    active-user churn: for every calendar day with an active previous
    day, the two distinct-active-set sizes, their overlap, and the
    Jaccard similarity ``common / (prev + curr - common)``. Falling
    Jaccard is the audience-turnover alarm the scalar DAU curve of
    ``daily_activity`` can't see. Days whose previous calendar day has
    no activity are omitted (no comparison set). No reference
    counterpart.

    Scale shape: one distinct over (day, user) — map-side combining
    collapses per-day multiplicity before the exchange — feeds both
    the per-day counts and the consecutive-day overlap; the overlap
    self-join keys on the USER (high-cardinality, well-spread), and
    everything after is DAY-cardinality. Exact integers everywhere;
    only the final Jaccard division floats, rounded to 6.
    """
    from pyspark.sql import functions as F

    active = (
        events.select(
            F.to_date(F.col(ts_col)).alias("day"), F.col(user_col).alias("u")
        )
        .distinct()
        .persist()
    )
    counts = active.groupBy("day").agg(F.count("*").alias("n"))
    common = (
        active.alias("cur")
        .join(
            active.alias("prv"),
            (F.col("cur.u") == F.col("prv.u"))
            & (F.col("cur.day") == F.date_add(F.col("prv.day"), 1)),
        )
        .groupBy(F.col("cur.day").alias("day"))
        .agg(F.count("*").alias("common"))
    )
    prev = counts.select(
        F.date_add(F.col("day"), 1).alias("day"), F.col("n").alias("prev_users")
    )
    return (
        counts.join(prev, "day")
        .join(common, "day", "left")
        .fillna(0, ["common"])
        .select(
            "day",
            F.col("prev_users").cast("long").alias("prev_users"),
            F.col("n").cast("long").alias("curr_users"),
            F.col("common").cast("long").alias("common"),
            F.round(
                F.col("common")
                / (F.col("prev_users") + F.col("n") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


def activation_latency(
    events,
    target_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
):
    """(hours, n_users) — the activation-funnel histogram: for every
    user who ever emitted ``target_type``, the whole-hours latency from
    their FIRST event of any kind to their FIRST target event. Users
    who never activate are simply absent (their latency is undefined —
    the count difference against the user universe is the never-rate).
    No reference counterpart.

    Scale shape: two map-side-combinable min-aggregates on the user key
    (the second over the pre-filtered target slice, so the shuffle
    carries only target events), one co-keyed join, then a rollup onto
    the HOURS-cardinality histogram. Exact integer microseconds
    end to end.
    """
    from pyspark.sql import functions as F

    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    first_any = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(t).alias("t0")
    )
    first_tgt = (
        events.filter(F.col(type_col) == target_type)
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(t).alias("tp"))
    )
    return (
        first_any.join(first_tgt, "u")
        .select(
            F.expr("CAST((tp - t0) DIV 3600000000 AS LONG)").alias("hours")
        )
        .groupBy("hours")
        .agg(F.count("*").cast("long").alias("n_users"))
    )
