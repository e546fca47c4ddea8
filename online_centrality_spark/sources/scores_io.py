"""Score-snapshot interchange: reference-compatible CSV + text graph reader.

The reference persists every (measure-param, snapshot) score map as a
space-separated headerless CSV ``node_id score`` under
``<experiment>/original/<score_id>/<prefix>_<i>.csv`` (``scores2file``,
``python/centrality_utils/base_computer.py:7-10``; naming scheme
``README.md:85-94``) and re-loads them as id-indexed frames with an
optional ``+epsilon`` and include/exclude node filters
(``load_score_map``, ``python/evaluation_utils/eval_utils.py:10-28``).

Our canonical store is the parquet scores table written by
``SuperstepDriver`` (partitioned by measure/snapshot); these helpers are
the fixture-diffing compatibility layer plus a Spark-native reader for
the reference's on-disk trees.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def export_score_files(
    scores: DataFrame,
    out_dir: str,
    prefix: str = "tk",
) -> list[str]:
    """S5: write one ``node_id score`` space-separated headerless CSV per
    (param_id, snapshot_id), mirroring the reference's directory layout
    ``<out_dir>/<score_id>/<prefix>_<i>.csv`` (``base_computer.py:7-10``,
    callers e.g. ``temporal_katz_computer.py:53-62``).

    ``scores`` columns: (param_id, snapshot_id, node_id, score).  The
    per-file frames are small (one snapshot of one param) — collected
    per key; the scalable path is the parquet scores table, this is the
    fixture-compat writer only.
    """
    keys = [
        (r["param_id"], r["snapshot_id"])
        for r in scores.select("param_id", "snapshot_id").distinct().collect()
    ]
    written = []
    for param_id, snap in sorted(keys):
        sub = (
            scores.filter(
                (F.col("param_id") == param_id)
                & (F.col("snapshot_id") == snap)
            )
            .select("node_id", "score")
            .toPandas()
            .sort_values("node_id")
        )
        d = os.path.join(out_dir, str(param_id))
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"{prefix}_{int(snap)}.csv")
        sub.to_csv(path, sep=" ", header=False, index=False)
        written.append(path)
    return written


def load_score_map(
    spark: SparkSession,
    path: str,
    epsilon: float = 0.0,
    excluded_ids: list[int] | None = None,
    restricted_ids: list[int] | None = None,
) -> DataFrame:
    """S6: read one ``node_id score`` CSV back as a DataFrame with the
    reference's semantics (``eval_utils.py:10-28``): optional ``+epsilon``
    on every score, drop ``excluded_ids``, keep only ``restricted_ids``.
    """
    df = spark.read.csv(path, sep=" ", schema=SCORE_SCHEMA)
    if epsilon:
        df = df.withColumn("score", F.col("score") + F.lit(float(epsilon)))
    if excluded_ids:
        df = df.filter(~F.col("node_id").isin(list(excluded_ids)))
    if restricted_ids:
        df = df.filter(F.col("node_id").isin(list(restricted_ids)))
    return df


def read_real_graph(spark: SparkSession, path: str) -> DataFrame:
    """S7: parse ``[ts] src trg`` text lines into a timestamped edge
    DataFrame, dropping malformed lines and self-loops
    (``readRealGraph``, ``concept_drift/graph_generator.py:44-74``).

    Returns ``(t: long, src: long, dst: long)``; duplicate edges are kept
    (the reference numbers duplicates for multi-edge weighting — that is
    a ``groupBy(src, dst).count()`` away when needed).
    """
    lines = spark.read.text(path)
    pat = r"^\[?(\d+)\]?\s+(\d+)\s+(\d+)"
    # try_cast: non-matching lines extract '' -> NULL (not an ANSI error)
    parsed = lines.select(
        F.regexp_extract("value", pat, 1).try_cast("long").alias("t"),
        F.regexp_extract("value", pat, 2).try_cast("long").alias("src"),
        F.regexp_extract("value", pat, 3).try_cast("long").alias("dst"),
    )
    return parsed.filter(
        F.col("t").isNotNull()
        & F.col("src").isNotNull()
        & F.col("dst").isNotNull()
        & (F.col("src") != F.col("dst"))
    )
