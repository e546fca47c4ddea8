"""Time-series analytics over the event stream's per-day profile.

Three classic stream-health queries — anomaly flags, autocorrelation,
and a CUSUM changepoint — all computed from EXACT integer sums
(counts, sums of counts, sums of squared counts) folded into one fixed
double expression at the very end, so a plain-SQL oracle reproduces
every float bit-for-bit regardless of partitioning: integer aggregation
is order-insensitive, and the final expression tree is identical on
both engines.

Scale shape: everything here runs downstream of ONE map-side-combinable
``groupBy(day[, type])`` over the raw stream; every later frame has
per-day (or per-type) cardinality — thousands of rows at any data
scale — so the windows/self-joins below are explicitly driver-trivial,
never proportional to event count. This mirrors the reference's
snapshot-statistics pattern (``online_centrality``'s per-interval stat
readouts, `reference/scripts/*` parameter sweeps) re-expressed as
DataFrame aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _daily_counts(events: DataFrame, ts_col: str) -> DataFrame:
    return (
        events.select(F.to_date(F.col(ts_col)).alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n_events"))
    )


def daily_anomalies(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-event-type daily volume anomalies (z-score rule).

    Returns ``(event_type, day, n_events, z)`` for every (type, day)
    whose daily count sits ``z_threshold`` sample standard deviations
    or more from that type's mean daily count. The mean/std are
    derived from exact integer sums (n, Σx, Σx²), so ``z`` is a fixed
    double expression over integers — bit-identical across engines and
    partitionings. The threshold compares the 6-decimal-rounded |z| so
    the cut is engine-deterministic at the boundary.

    Scale: one (type, day) map-side groupBy over the stream, then a
    per-type stats agg over the tiny (type, day) frame broadcast back.
    """
    per_day = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.to_date(F.col(ts_col)).alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n_events"))
    )
    stats = per_day.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("n_events").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("s2"),
    )
    j = per_day.join(F.broadcast(stats), "event_type").filter(
        (F.col("n_days") >= 2)
        & (F.col("s2") * F.col("n_days") > F.col("s1") * F.col("s1"))
    )
    z = (F.col("n_events") - F.col("s1") / F.col("n_days")) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_days"))
        / (F.col("n_days") - 1)
    )
    return (
        j.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            F.round(z, 6).alias("z"),
        )
        .filter(F.abs(F.col("z")) >= F.lit(z_threshold))
    )


def activity_autocorr(
    events: DataFrame,
    max_lag: int = 7,
    ts_col: str = "ts",
) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1..max_lag.

    Pearson r between (x_d, x_{d+lag}) over the overlapping days, from
    exact integer sums (n, Σx, Σy, Σxy, Σx², Σy²). The two variance
    terms are cast to double BEFORE multiplying (their int64 product
    can overflow; each term alone is < 2^53 so the cast is exact), and
    the final expression is shared verbatim with the SQL oracle.

    Scale: the self-join runs on the per-day frame (|days| rows), not
    the stream; missing calendar days simply drop out of the pair set
    (join on exact day+lag), matching the oracle's semantics.
    """
    daily = _daily_counts(events, ts_col)
    spark = events.sparkSession
    lags = spark.range(1, max_lag + 1).select(F.col("id").alias("lag"))
    a = daily.select(F.col("day").alias("d"), F.col("n_events").alias("x"))
    b = daily.select(F.col("day").alias("d2"), F.col("n_events").alias("y"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("d2", F.date_add(F.col("d"), F.col("lag").cast("int")))
        .join(b, "d2")
    )
    agg = pairs.groupBy("lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n_pairs")
    varx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    return (
        agg.filter((n >= 2) & (varx > 0) & (vary > 0))
        .select(
            "lag",
            "n_pairs",
            F.round(num / F.sqrt(varx * vary), 6).alias("autocorr"),
        )
    )


def activity_changepoint(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """CUSUM changepoint of the daily event-count series (one row).

    The classic offline CUSUM statistic argmax_d |Σ_{e<=d}(x_e − x̄)|
    computed EXACTLY in integers: with N days, total S, running prefix
    T_d and day rank r_d, the cusum numerator C_d = N·T_d − r_d·S is an
    integer multiple (×N) of the float statistic, so the argmax — and
    the tie-break (earliest day) — involve no float comparison at all.
    Returns ``(day, n_days, cusum_num, mean_before, mean_after)``;
    the last day (C_N = 0 by construction) is excluded so the split is
    always proper.

    Scale: prefix sums run as a window over the per-day frame only —
    |days| rows in one partition by design, independent of stream size.
    """
    daily = _daily_counts(events, ts_col)
    w = Window.orderBy("day")
    tot = daily.agg(
        F.count("*").alias("n_days"), F.sum("n_events").alias("s_total")
    )
    pre = (
        daily.select(
            "day",
            F.row_number().over(w).alias("r"),
            F.sum("n_events").over(w).alias("t"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("r") < F.col("n_days"))
    )
    c: Column = F.col("n_days") * F.col("t") - F.col("r") * F.col("s_total")
    scored = pre.select(
        "day",
        "n_days",
        c.alias("cusum_num"),
        (F.col("t") / F.col("r")).alias("mb"),
        (
            (F.col("s_total") - F.col("t")) / (F.col("n_days") - F.col("r"))
        ).alias("ma"),
    )
    return (
        scored.orderBy(F.abs(F.col("cusum_num")).desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_days",
            "cusum_num",
            F.round("mb", 6).alias("mean_before"),
            F.round("ma", 6).alias("mean_after"),
        )
    )
