"""Event sessionization via Spark's native gap-based session windows.

The reference's replay operates on one global ordered stream; user-level
sessionization (splitting each actor's event stream on inactivity gaps)
is the transcript-pipeline counterpart: session statistics feed
conversation profiling and activity labeling the same way daily
participation does in the reference's labeling layer
(``data_processing/tennis_player_processing.py:26-43`` builds per-day
participant sets; a session is the sub-day analogue).

``sessionize`` uses ``F.session_window`` — Spark's built-in gap-merge
aggregation, which runs as a single partial-mergeable aggregate keyed by
``(user, window)``: events shuffle once on the user key, session merge
happens inside the aggregation operator (no self-join, no window-sort of
the whole corpus), and the identical call works under Structured
Streaming with a watermark for live ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = "value",
    type_col: str | None = None,
    order_col: str = "event_id",
) -> DataFrame:
    """One row per (user, session): events within ``gap_minutes`` of
    their predecessor (inclusive at the exact boundary — Spark merges
    session windows whose bounds touch) belong to the same session.

    Returns ``(user, session_start_us, session_end_us, n_events[,
    total_value][, entry_type, exit_type])`` with the bounds as epoch
    microseconds of the first and last event (engine-portable — not the
    padded window end, which would bake the gap parameter into the
    output).

    ``type_col`` additionally extracts the session's OPENING and
    CLOSING event types via ``min/max(struct(t, order, type))`` — the
    same deterministic total order as :func:`session_flows`. Because
    the extraction is a plain aggregate inside the session_window
    groupBy, it STREAMS with a watermark exactly like the rest of the
    call, which is what makes the flow matrix streamable: each closed
    session is emitted exactly once in append mode, so the downstream
    ``groupBy(entry_type, exit_type).count()`` folds mergeably across
    micro-batches (tests/test_streaming.py).
    """
    gap = f"{int(gap_minutes * 60)} seconds"
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count("*").alias("n_events"),
        # cast: parquet NTZ -> TIMESTAMP is a pure type change and
        # matches DuckDB's epoch_us on the raw value
        F.unix_micros(F.min(ts_col).cast("timestamp")).alias("session_start_us"),
        F.unix_micros(F.max(ts_col).cast("timestamp")).alias("session_end_us"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    if type_col is not None:
        aggs.append(
            F.min(F.struct(t_us.alias("t"), F.col(order_col), F.col(type_col)))
            .alias("_lo")
        )
        aggs.append(
            F.max(F.struct(t_us.alias("t"), F.col(order_col), F.col(type_col)))
            .alias("_hi")
        )
    out = (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(*aggs)
        .drop("session_window")
    )
    if type_col is not None:
        out = out.withColumns(
            {
                "entry_type": F.col(f"_lo.{type_col}"),
                "exit_type": F.col(f"_hi.{type_col}"),
            }
        ).drop("_lo", "_hi")
    return out


def session_stats(sessions: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-user session summary over :func:`sessionize` output:
    ``(user, n_sessions, total_events, mean_session_events,
    mean_session_secs)``. One map-side-combinable groupBy."""
    return sessions.groupBy(user_col).agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        (F.sum("n_events") / F.count("*")).alias("mean_session_events"),
        (
            F.avg(
                (F.col("session_end_us") - F.col("session_start_us")) / 1e6
            )
        ).alias("mean_session_secs"),
    )


def response_latency(
    events: DataFrame,
    user_col: str = "user_id",
    order_col: str = "event_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-event-type response-time profile: ``(event_type, n_gaps,
    mean_gap_secs, p50_gap_secs, p90_gap_secs)`` where a gap is the time
    from a user's previous event to the current one (the "turn latency"
    of transcript streams), grouped by the CURRENT event's type.

    The lag window partitions on the user key (high-cardinality, unlike
    event_type) and the percentile aggregation is Spark's exact
    ``percentile`` — linear interpolation, matching DuckDB's
    ``quantile_cont`` so the oracle is exact after rounding. Stats are
    reported in SECONDS: round(x, 6) at microsecond magnitudes (1e10+)
    needs more mantissa than a double has, so engines would disagree in
    the last ULP; at seconds scale the rounding is exactly
    representable in both.
    """
    w = Window.partitionBy(user_col).orderBy(order_col)
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        events.select(
            F.col(type_col).alias("event_type"),
            t.alias("t"),
            F.lag(t).over(w).alias("prev_t"),
        )
        .filter(F.col("prev_t").isNotNull())
        .select("event_type", (F.col("t") - F.col("prev_t")).alias("gap_us"))
    )
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        # exact integer sum, ONE final division: summation-order float
        # noise can move round(.,6) otherwise
        F.round(
            F.sum("gap_us").cast("double") / F.count("*") / 1e6, 6
        ).alias("mean_gap_secs"),
        F.round(F.expr("percentile(gap_us, 0.5)") / 1e6, 6).alias("p50_gap_secs"),
        F.round(F.expr("percentile(gap_us, 0.9)") / 1e6, 6).alias("p90_gap_secs"),
    )


def user_burstiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    min_gaps: int = 5,
) -> DataFrame:
    """Per-user temporal burstiness ``B = (σ − μ)/(σ + μ)`` of the
    inter-event time sequence (Goh & Barabási's burstiness parameter):
    −1 ≈ periodic, 0 ≈ Poisson, →1 ≈ extreme bursts. Returns
    ``(user_id, n_gaps, mean_gap_secs, burstiness)`` for users with at
    least ``min_gaps`` gaps; ``burstiness`` is NULL for an all-zero gap
    sequence (σ + μ = 0 leaves B undefined).

    Engine-parity discipline (the `response_latency` rule, taken one
    step further because a variance is involved): gaps are truncated to
    INTEGER seconds, μ and E[x²] come from exact integer sums
    (decimal-widened so the squared sum cannot overflow int64), and the
    σ/B arithmetic is a fixed chain of IEEE-double ops — identical
    bit-for-bit in any engine, so round(·, 6) never straddles. The lag
    window partitions on the high-cardinality user key and orders by
    ``(t, order_col)`` so gaps are non-negative (negative gaps would
    make Spark's truncating ``div`` and an oracle's flooring ``//``
    disagree).
    """
    # the window runs AFTER the aliasing select, so it must partition
    # on the alias — partitioning on user_col breaks any non-default key
    w = Window.partitionBy("user_id").orderBy("t", order_col)
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        events.select(F.col(user_col).alias("user_id"), t.alias("t"), order_col)
        .select("user_id", "t", F.lag("t").over(w).alias("prev_t"), F.col(order_col))
        .filter(F.col("prev_t").isNotNull())
        .select(
            "user_id",
            F.expr("(t - prev_t) div 1000000").alias("gap_s"),
        )
    )
    agg = gaps.groupBy("user_id").agg(
        F.count("*").alias("n_gaps"),
        F.sum("gap_s").alias("s1"),
        F.sum(
            (F.col("gap_s").cast("decimal(14,0)") * F.col("gap_s").cast("decimal(14,0)"))
        ).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n_gaps")
    ex2 = F.col("s2").cast("double") / F.col("n_gaps")
    sigma = F.sqrt(F.greatest(ex2 - mu * mu, F.lit(0.0)))
    return (
        agg.filter(F.col("n_gaps") >= min_gaps)
        .select(
            "user_id",
            F.col("n_gaps").cast("long").alias("n_gaps"),
            F.round(mu, 6).alias("mean_gap_secs"),
            F.when(sigma + mu == 0.0, F.lit(None).cast("double"))
            .otherwise(F.round((sigma - mu) / (sigma + mu), 6))
            .alias("burstiness"),
        )
    )


def conversion_funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(stage_idx, stage, n_users, frac) — strict-order conversion
    funnel: a user counts at stage k iff they performed stage k's event
    STRICTLY AFTER their earliest qualifying stage k-1 event (earliest-
    completion semantics, the standard product-analytics funnel).
    ``frac`` is the conversion rate relative to stage 0.

    Scale shape: one filtered map-side min-agg plus one equi-join on
    the (high-cardinality, well-distributed) user key per stage —
    stages are few and fixed, so the chain is a constant number of
    shuffles; each stage's per-user completion frame persists because
    stage k+1 and the final count both read it. No windows, no driver
    loops; the per-stage counts are 1-row aggregates folded in one
    union.
    """
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    e = events.select(
        F.col(user_col).alias("user"),
        F.col(type_col).alias("etype"),
        t.alias("t"),
    )
    counts: list[DataFrame] = []
    cur: DataFrame | None = None
    for k, stage in enumerate(stages):
        s = e.filter(F.col("etype") == stage)
        if cur is None:
            cur = s.groupBy("user").agg(F.min("t").alias("t_done"))
        else:
            cur = (
                s.join(
                    cur.select("user", F.col("t_done").alias("t_prev")),
                    "user",
                )
                .filter(F.col("t") > F.col("t_prev"))
                .groupBy("user")
                .agg(F.min("t").alias("t_done"))
            )
        cur = cur.persist()
        counts.append(
            cur.agg(F.count("*").cast("long").alias("n_users")).select(
                F.lit(k).cast("int").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    base = counts[0].select(F.col("n_users").alias("n0"))
    return out.crossJoin(F.broadcast(base)).select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(
            F.when(F.col("n0") > 0, F.col("n_users") / F.col("n0")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("frac"),
    )


def transition_entropy(
    events: DataFrame,
    user_col: str = "user_id",
    order_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """1-row ``(n_transitions, n_states, entropy_rate)`` — the
    conditional Shannon entropy H(next | current) of the per-user
    event-type transition chain, in nats: how predictable is the next
    action given the current one? 0 = deterministic workflow,
    ln(n_states) = uniform chaos.

    The lag window partitions on the high-cardinality user key (the
    `response_latency` shape); the transition matrix that follows is
    n_states² rows — constant-sized. Each term
    ``(c_ij/N)·ln(c_ij/c_i)`` is a fixed double chain rounded to a
    scaled int64 before the EXACT sum (the `domain_divergence`
    order-independence rule).
    """
    w = Window.partitionBy(user_col).orderBy(order_col)
    pairs = (
        events.select(
            F.col(type_col).alias("cur"),
            F.lag(type_col).over(w).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
    )
    cij = pairs.groupBy("prev", "cur").agg(F.count("*").alias("cij")).persist()
    ci = cij.groupBy("prev").agg(F.sum("cij").alias("ci"))
    n = cij.agg(F.sum("cij").alias("n"))
    term = (
        (F.col("cij").cast("double") / F.col("n"))
        * F.log(F.col("cij").cast("double") / F.col("ci"))
    )
    scaled = (
        cij.join(F.broadcast(ci), "prev")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("n"),
            F.round(term * 1e12).cast("long").alias("t"),
        )
    )
    states = cij.select(F.col("prev").alias("s")).unionAll(
        cij.select(F.col("cur").alias("s"))
    ).distinct().agg(F.count("*").alias("n_states"))
    return (
        scaled.groupBy("n")
        .agg(F.sum("t").alias("ent"))
        .crossJoin(F.broadcast(states))
        .select(
            F.col("n").cast("long").alias("n_transitions"),
            F.col("n_states").cast("long").alias("n_states"),
            F.round(-F.col("ent") / 1e12, 6).alias("entropy_rate"),
        )
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """``(cohort_day, day_offset, n_active, retention)`` — the classic
    retention triangle: users are cohorted by their FIRST active day
    and each row counts how many of that cohort were active again
    ``day_offset`` days later (offset 0 is the cohort itself, so its
    retention is 1.0 by construction).

    Scale shape: one distinct over ``(user, day)``, one per-user min
    (both map-side-combinable on the high-cardinality user key), a
    user-keyed join back, then day-granularity frames (≤ days² rows).
    Retention is one exact-integer division behind round(·, 6).
    """
    # integer div, not double-divide-then-cast: a boundary timestamp
    # would misbucket under float rounding (the motifs bucketing lesson)
    act = (
        events.select(
            F.col(user_col).alias("u"),
            F.expr(
                f"unix_micros(CAST({ts_col} AS TIMESTAMP)) div {bucket_us}"
            ).alias("day"),
        )
        .distinct()
        .persist()
    )
    first = act.groupBy("u").agg(F.min("day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    ret = (
        act.join(first, "u")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    return ret.join(sizes, "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )


def activity_heatmap(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """``(dow, hour, n_events, n_users)`` — the weekly activity heatmap
    (0 = Monday ... 6 = Sunday, UTC hours). Pure integer epoch
    arithmetic — ``(epoch_days + 3) % 7`` exploits 1970-01-01 being a
    Thursday — so no engine/timezone calendar function is involved.
    One map-side-combinable groupBy over 168 cells.
    """
    t = f"unix_micros(CAST({ts_col} AS TIMESTAMP))"
    return (
        events.select(
            F.expr(f"(({t} div 86400000000) + 3) % 7").alias("dow"),
            F.expr(f"({t} div 3600000000) % 24").alias("hour"),
            F.col(user_col).alias("u"),
        )
        .groupBy("dow", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("u").cast("long").alias("n_users"),
        )
    )


def user_diversity(
    events: DataFrame, user_col: str = "user_id", type_col: str = "event_type"
) -> DataFrame:
    """``(user_id, n_events, n_types, simpson)`` — each user's Simpson
    diversity index over event types, ``1 − Σ(c_i/n)²``: 0 = does one
    thing only, → 1 = spreads evenly over many actions. The behavioral
    breadth score that pairs with `transition_entropy`'s predictability.

    Two map-side-combinable groupBys on the user key; Simpson =
    1 − (Σc²)/n² from exact int64 sums (one fixed double chain).
    """
    ct = events.groupBy(
        F.col(user_col).alias("user_id"), F.col(type_col).alias("t")
    ).agg(F.count("*").alias("c"))
    agg = ct.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("n_types"),
        F.sum(F.col("c") * F.col("c")).alias("sq"),
    )
    return agg.select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.col("n_types").cast("long").alias("n_types"),
        F.round(
            F.lit(1.0)
            - F.col("sq").cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double")),
            6,
        ).alias("simpson"),
    )


def session_flows(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    type_col: str = "event_type",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """``(entry_type, exit_type, n_sessions)`` — the session flow
    matrix: which event type OPENS a session versus which CLOSES it,
    the workflow's entry/exit fingerprint.

    Sessions come from the gap-island pattern (new session when the gap
    from the predecessor exceeds ``gap_minutes``; the exact-boundary
    event stays in the session, matching ``sessionize``'s inclusive
    merge). Entry/exit types are extracted through ``min/max(struct(t,
    order, type))`` — a deterministic total order, never min_by with
    ties. Both windows partition on the user key.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy("u").orderBy("t", order_col)
    marked = (
        events.select(
            F.col(user_col).alias("u"),
            t.alias("t"),
            F.col(order_col),
            F.col(type_col).alias("tp"),
        )
        .withColumn("prev_t", F.lag("t").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev_t").isNull()
                | (F.col("t") - F.col("prev_t") > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    per = marked.groupBy("u", "sid").agg(
        F.min(F.struct("t", order_col, "tp")).alias("lo"),
        F.max(F.struct("t", order_col, "tp")).alias("hi"),
    )
    return (
        per.groupBy(
            F.col("lo.tp").alias("entry_type"), F.col("hi.tp").alias("exit_type")
        )
        .agg(F.count("*").cast("long").alias("n_sessions"))
    )


def latency_sketch(
    events: DataFrame,
    user_col: str = "user_id",
    order_col: str = "event_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    quantiles: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """(event_type, q, bucket, est_us, n_gaps) — mergeable log-bucket
    TAIL-LATENCY sketch per event type: the scale twin of
    :func:`response_latency`'s exact per-group percentiles, over the
    same per-user turn gaps.

    Where the exact operator's ``percentile`` holds a per-group value
    map, the sketch reduces each (event_type) stratum to <= 46
    power-of-two cells that merge by addition across partitions, days,
    and clusters — the shared ``text/sketches.py:
    log_bucket_quantiles`` engine (integer bucket edges, ceil(q·N)
    IEEE selection, bit-reproducible by the SQL oracle). ``est_us`` is
    the selected bucket's lower edge (2^b - 1 microseconds; <= 2x
    relative error). Out-of-order timestamps produce negative gaps;
    they clamp to 0 (bucket 0) so counts agree with the exact
    operator's ``n_gaps``.
    """
    from ..text.sketches import log_bucket_quantiles

    w = Window.partitionBy(user_col).orderBy(order_col)
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        events.select(
            F.col(type_col).alias("event_type"),
            t.alias("t"),
            F.lag(t).over(w).alias("prev_t"),
        )
        .filter(F.col("prev_t").isNotNull())
        .select(
            "event_type",
            F.greatest(F.col("t") - F.col("prev_t"), F.lit(0)).alias("gap_us"),
        )
    )
    return log_bucket_quantiles(
        gaps, "event_type", "gap_us", quantiles, max_bucket=45
    ).select(
        F.col("stratum").alias("event_type"),
        "q",
        "bucket",
        F.col("est").alias("est_us"),
        F.col("n").alias("n_gaps"),
    )


def session_return_hist(sessions: DataFrame, user_col: str = "user_id") -> DataFrame:
    """``(hours, n_returns)`` — the return-time histogram over a
    sessionized frame (``sessionize`` output): for every consecutive
    session pair of a user, the idle gap ``next_start - prev_end``
    bucketed into whole hours. The peak structure (daily / weekly
    harmonics) is the habit signal retention cohorts
    (``cohort_retention``) aggregate away. No reference counterpart.

    Scale shape: one lag window PARTITIONED ON THE USER KEY over the
    session-cardinality frame (each task holds one user's sessions —
    bounded, well-spread, the `response_latency` envelope), then a
    map-side-combinable groupBy onto the HOURS-cardinality histogram.
    Exact integers end to end (epoch-microsecond differences, integer
    div), so the gate hash is layout-proof.
    """
    w = Window.partitionBy(user_col).orderBy("session_start_us")
    gaps = (
        sessions.select(
            F.col(user_col),
            "session_start_us",
            F.lag("session_end_us").over(w).alias("prev_end"),
        )
        .filter(F.col("prev_end").isNotNull())
        .select(
            F.expr(
                "CAST((session_start_us - prev_end) DIV 3600000000 AS LONG)"
            ).alias("hours")
        )
    )
    return gaps.groupBy("hours").agg(
        F.count("*").cast("long").alias("n_returns")
    )
