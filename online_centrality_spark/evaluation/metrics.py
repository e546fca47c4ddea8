"""Per-snapshot metric fan-out (V10 dispatcher + V11 parallel map).

The reference evaluates metrics day-by-day with a multiprocessing pool
(``eval_utils.py:59-114``); here the fan-out is one grouped-map Arrow job:
``groupBy(measure, param_id, snapshot_id).applyInPandas(kernel)`` — Spark
task parallelism replaces the pool, and each group runs the vectorized
numpy kernels.

Metric ids follow the reference's ``"<name>@<k>"`` grammar
(``eval_utils.py:77-94``): pearson, spearman, kendall, w_kendall_fast,
ndcg, ndcg_lin, recall, precision. Both score maps get the reference's
load epsilon (+1e-9, ``eval_utils.py:10-28``).

- ``evaluate_pairwise``: relevance = labels table (snapshot_id, node_id,
  score), prediction = engine scores.
- ``evaluate_sequential``: snapshot s-1 vs snapshot s of the same score
  series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import kernels

LOAD_EPS = 1e-9

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("measure", T.StringType(), False),
        T.StructField("param_id", T.StringType(), False),
        T.StructField("snapshot_id", T.LongType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _parse(metric_id: str) -> tuple[str, int | None]:
    if "@" in metric_id:
        name, k = metric_id.split("@")
        return name, int(k)
    return metric_id, None


def _compute(metric_id: str, rel_ids, rel_s, pred_ids, pred_s) -> float:
    name, k = _parse(metric_id)
    if name in ("pearson", "spearman", "kendall", "w_kendall_fast"):
        if k is not None:
            sel = np.isin(rel_ids, kernels._top_order(rel_ids, rel_s, k))
            rel_ids, rel_s = rel_ids[sel], rel_s[sel]
            sel = np.isin(pred_ids, kernels._top_order(pred_ids, pred_s, k))
            pred_ids, pred_s = pred_ids[sel], pred_s[sel]
        _, a, b = kernels.align(rel_ids, rel_s, pred_ids, pred_s)
        fn = {
            "pearson": kernels.pearson,
            "spearman": kernels.spearman,
            "kendall": kernels.kendall,
            "w_kendall_fast": kernels.weighted_kendall,
        }[name]
        return fn(a, b)
    if name in ("ndcg", "ndcg_lin"):
        return kernels.ndcg(
            rel_ids, rel_s, pred_ids, pred_s, k=k, log_decay=(name == "ndcg")
        )
    if name == "recall":
        return kernels.precision_recall(rel_ids, rel_s, pred_ids, pred_s, k)[1]
    if name == "precision":
        return kernels.precision_recall(rel_ids, rel_s, pred_ids, pred_s, k)[0]
    raise ValueError(f"unknown metric id: {metric_id}")


def evaluate_pairwise(
    scores: DataFrame, labels: DataFrame, metric_ids: list[str]
) -> DataFrame:
    """labels (snapshot_id, node_id, score) vs scores (measure, param_id,
    snapshot_id, node_id, score) -> (measure, param_id, snapshot_id,
    metric, value).

    The label table never visits the driver: it is replicated per score
    series with a broadcast cross-join against the DISTINCT (measure,
    param_id) frame — param-grid-sized (dozens of rows), the one
    genuinely broadcast-safe side here — then unioned into the grouped
    frame with a ``side`` tag, exactly the ``evaluate_sequential``
    shape. At 100× label volume the labels shuffle with the scores on
    the group key instead of bottlenecking a ``collect()``.
    """
    series = scores.select("measure", "param_id").distinct()
    rel = (
        labels.select("snapshot_id", "node_id", "score")
        .crossJoin(F.broadcast(series))
        .select(
            "measure", "param_id", "snapshot_id", "node_id", "score",
            F.lit("rel").alias("side"),
        )
    )
    pred = scores.select(
        "measure", "param_id", "snapshot_id", "node_id", "score",
        F.lit("pred").alias("side"),
    )
    both = pred.unionByName(rel)

    def kernel(key, pdf):
        measure, param_id, snapshot_id = key
        r = pdf[pdf["side"] == "rel"]
        p = pdf[pdf["side"] == "pred"]
        if len(r) == 0 or len(p) == 0:
            return pd.DataFrame(columns=[f.name for f in _OUT_SCHEMA.fields])
        rel_ids = r["node_id"].to_numpy(np.int64)
        rel_s = r["score"].to_numpy(float) + LOAD_EPS
        pred_ids = p["node_id"].to_numpy(np.int64)
        pred_s = p["score"].to_numpy(float) + LOAD_EPS
        rows = [
            (measure, param_id, int(snapshot_id), mid,
             _compute(mid, rel_ids, rel_s, pred_ids, pred_s))
            for mid in metric_ids
        ]
        return pd.DataFrame(
            rows, columns=[f.name for f in _OUT_SCHEMA.fields]
        )

    return (
        both.groupBy("measure", "param_id", "snapshot_id")
        .applyInPandas(kernel, schema=_OUT_SCHEMA)
    )


def evaluate_sequential(scores: DataFrame, metric_ids: list[str]) -> DataFrame:
    """Snapshot s-1 (relevance) vs snapshot s (prediction) per series."""
    cur = scores.select(
        "measure", "param_id", "snapshot_id", "node_id", "score",
        F.lit("cur").alias("side"),
    )
    prev = scores.select(
        "measure",
        "param_id",
        (F.col("snapshot_id") + 1).alias("snapshot_id"),
        "node_id",
        "score",
        F.lit("prev").alias("side"),
    )
    max_snap = scores.agg(F.max("snapshot_id")).collect()[0][0]
    both = cur.unionByName(prev).filter(F.col("snapshot_id") <= max_snap)

    def kernel(key, pdf):
        measure, param_id, snapshot_id = key
        p = pdf[pdf["side"] == "prev"]
        c = pdf[pdf["side"] == "cur"]
        if len(p) == 0 or len(c) == 0:
            return pd.DataFrame(columns=[f.name for f in _OUT_SCHEMA.fields])
        rel_ids = p["node_id"].to_numpy(np.int64)
        rel_s = p["score"].to_numpy(float) + LOAD_EPS
        pred_ids = c["node_id"].to_numpy(np.int64)
        pred_s = c["score"].to_numpy(float) + LOAD_EPS
        rows = [
            (measure, param_id, int(snapshot_id), mid,
             _compute(mid, rel_ids, rel_s, pred_ids, pred_s))
            for mid in metric_ids
        ]
        return pd.DataFrame(rows, columns=[f.name for f in _OUT_SCHEMA.fields])

    return both.groupBy("measure", "param_id", "snapshot_id").applyInPandas(
        kernel, schema=_OUT_SCHEMA
    )
