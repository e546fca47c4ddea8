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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    value_col: str | None = "value",
) -> DataFrame:
    """One row per (user, session): events within ``gap_minutes`` of
    their predecessor (inclusive at the exact boundary — Spark merges
    session windows whose bounds touch) belong to the same session.

    Returns ``(user, session_start_us, session_end_us, n_events[,
    total_value])`` with the bounds as epoch microseconds of the first
    and last event (engine-portable — not the padded window end, which
    would bake the gap parameter into the output).
    """
    gap = f"{int(gap_minutes * 60)} seconds"
    aggs = [
        F.count("*").alias("n_events"),
        # cast: parquet NTZ -> TIMESTAMP is a pure type change and
        # matches DuckDB's epoch_us on the raw value
        F.unix_micros(F.min(ts_col).cast("timestamp")).alias("session_start_us"),
        F.unix_micros(F.max(ts_col).cast("timestamp")).alias("session_end_us"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(*aggs)
        .drop("session_window")
    )


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
