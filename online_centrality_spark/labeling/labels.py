"""Labeling / entity-resolution operators (SURVEY §2.6, L2-L7).

The reference builds daily ground-truth labels for Twitter accounts from
a tennis tournament schedule: epoch→local-date conversion, edit-distance
name matching between player names and screen names, per-day participant
sets, daily 0/1 (or prev/next-day graded) labels, hourly-interval label
duplication with a lookback window, and an NDCG@k prediction-metric
matrix.  Re-expressed here domain-agnostically as joins / window
functions / built-in string functions — no per-row Python, no file
copies (the reference literally copies label CSVs per hour,
``player_prediction_performance.py:15-26``; we use a range join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def epoch_to_date(col, tz: str = "UTC"):
    """L2: epoch seconds → ``YYYY-MM-DD`` in a timezone
    (``player_labeling.py:9-15``: ``datetime.fromtimestamp(epoch, tz)``)."""
    return F.date_format(
        F.from_utc_timestamp(F.from_unixtime(col), tz), "yyyy-MM-dd"
    )


def match_names(
    references: DataFrame,
    candidates: DataFrame,
    ref_key: str,
    ref_name: str,
    cand_key: str,
    cand_name: str,
) -> DataFrame:
    """L3: edit-distance entity matching
    (``tennis_player_processing.py:61-101``): lowercase, strip spaces,
    full cross-product Levenshtein, keep every candidate at the minimum
    distance per reference (multi-hit, exactly like the reference's
    min-distance match lists).

    Built-in ``levenshtein`` (JVM, codegen) replaces the Python
    ``editdistance`` double loop; the min-per-reference is a window
    aggregate instead of a dense matrix scan.
    """
    norm = lambda c: F.lower(F.regexp_replace(c, " ", ""))  # noqa: E731
    pairs = references.crossJoin(candidates).select(
        ref_key,
        cand_key,
        F.levenshtein(norm(F.col(ref_name)), norm(F.col(cand_name))).alias(
            "dist"
        ),
    )
    w = Window.partitionBy(ref_key)
    return (
        pairs.withColumn("min_dist", F.min("dist").over(w))
        .filter(F.col("dist") == F.col("min_dist"))
        .drop("min_dist")
    )


def daily_participants(
    schedule: DataFrame,
    date_col: str,
    participant_cols: list[str],
) -> DataFrame:
    """L4: per-date participant sets + counts
    (``tennis_player_processing.py:111-149``): union the participant
    columns, aggregate to ``collect_set`` per date.

    Returns ``(date, participants: array, n_participants)``.
    """
    stacked = None
    for c in participant_cols:
        part = schedule.select(
            F.col(date_col).alias("date"), F.col(c).alias("participant")
        )
        stacked = part if stacked is None else stacked.unionAll(part)
    return stacked.groupBy("date").agg(
        F.collect_set("participant").alias("participants"),
        F.countDistinct("participant").alias("n_participants"),
    )


def daily_labels(
    entity_map: DataFrame,
    participants: DataFrame,
    include_adjacent_days: bool = False,
) -> DataFrame:
    """L5: label an entity 1.0 on dates its matched participant appears
    (``player_labeling.py:98-127``).  With ``include_adjacent_days``,
    the reference's graded variant: 2.0 if it also plays the NEXT day,
    1.0 if only today, matching the 0/1/2 scheme.

    ``entity_map``: (entity_id, participant); ``participants``: output
    of :func:`daily_participants`.  Returns (date, entity_id, label).
    """
    exploded = participants.select(
        "date", F.explode("participants").alias("participant")
    )
    today = exploded.join(entity_map, "participant").select(
        "date", "entity_id", F.lit(1.0).alias("label")
    )
    if not include_adjacent_days:
        return today
    nxt = exploded.select(
        F.date_format(F.date_sub(F.to_date("date"), 1), "yyyy-MM-dd").alias(
            "date"
        ),
        "participant",
        F.lit(1.0).alias("plays_next"),
    ).join(entity_map, "participant").select("date", "entity_id", "plays_next")
    return (
        today.join(nxt, ["date", "entity_id"], "left")
        .select(
            "date",
            "entity_id",
            (F.col("label") + F.coalesce(F.col("plays_next"), F.lit(0.0))).alias(
                "label"
            ),
        )
    )


def assign_interval_labels(
    labels: DataFrame,
    intervals: DataFrame,
    intervals_per_day: int,
    lookback_intervals: int,
) -> DataFrame:
    """L6: attach each day's labels to every snapshot interval in a
    lookback window ending with that day — a RANGE JOIN replacing the
    reference's per-hour label-file duplication (``get_interval_bounds``
    + ``duplicate_label_files``,
    ``player_prediction_performance.py:6-26``).

    ``labels``: (day_index, entity_id, label); ``intervals``:
    (interval_id).  Day ``d``'s labels attach to intervals in
    ``[d*intervals_per_day - lookback_intervals,
    (d+1)*intervals_per_day)``.  The inequality join broadcasts the
    small day-keyed label dimension (BroadcastNestedLoopJoin) — no file
    copies, no driver loop.
    """
    lb = F.broadcast(labels.alias("lb"))
    iv = intervals.alias("iv")
    lo = F.col("lb.day_index") * intervals_per_day - lookback_intervals
    hi = (F.col("lb.day_index") + 1) * intervals_per_day
    return iv.join(
        lb, (F.col("iv.interval_id") >= lo) & (F.col("iv.interval_id") < hi)
    ).select("iv.interval_id", "lb.entity_id", "lb.label")


def export_label_files(labels: DataFrame, out_dir: str) -> None:
    """S8: positive labels only, one partition per day
    (``export_label_files``, ``player_labeling.py:131-149``)."""
    (
        labels.filter(F.col("label") > 0)
        .write.mode("overwrite")
        .partitionBy("date")
        .csv(out_dir, sep=" ")
    )


def prediction_metrics(
    scores: DataFrame,
    labels: DataFrame,
    k: int = 50,
) -> DataFrame:
    """L7: the prediction-metric matrix — NDCG@k of every
    (measure, param_id, snapshot) against that snapshot's labels
    (``player_prediction_performance.py:39-68``), as ONE grouped
    aggregation over the scores×labels join instead of a cached-txt
    per-day Python loop.

    ``scores``: (measure, param_id, snapshot_id, node_id, score);
    ``labels``: (snapshot_id, node_id, label).  Ties broken by node_id
    (deterministic variant of the reference's random shuffle,
    ``ndcg_computer.py:20`` — see SURVEY §5).
    """
    joined = scores.join(labels, ["snapshot_id", "node_id"], "left").select(
        "measure",
        "param_id",
        "snapshot_id",
        "node_id",
        "score",
        F.coalesce("label", F.lit(0.0)).alias("label"),
    )
    w_pred = Window.partitionBy("measure", "param_id", "snapshot_id").orderBy(
        F.desc("score"), F.asc("node_id")
    )
    w_ideal = Window.partitionBy("measure", "param_id", "snapshot_id").orderBy(
        F.desc("label"), F.asc("node_id")
    )
    ranked = joined.select(
        "measure",
        "param_id",
        "snapshot_id",
        "label",
        F.row_number().over(w_pred).alias("pos"),
        F.row_number().over(w_ideal).alias("ideal_pos"),
    )
    gain = ranked.groupBy("measure", "param_id", "snapshot_id").agg(
        F.sum(
            F.when(
                F.col("pos") <= k, F.col("label") / F.log(F.col("pos") + 1)
            ).otherwise(0.0)
        ).alias("dcg"),
        F.sum(
            F.when(
                F.col("ideal_pos") <= k,
                F.col("label") / F.log(F.col("ideal_pos") + 1),
            ).otherwise(0.0)
        ).alias("idcg"),
    )
    return gain.select(
        "measure",
        "param_id",
        "snapshot_id",
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
        .otherwise(0.0)
        .alias("ndcg"),
    )
