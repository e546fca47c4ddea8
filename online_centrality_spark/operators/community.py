"""Partition-quality metrics for community assignments.

North-rule link-graph extension: Newman modularity of any node
partition (connected components, label propagation, external labels)
over the undirected simple graph. Everything is grouped aggregation +
three 1-row cross joins — no driver-side math, so the same plan runs
at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def modularity(
    edges: DataFrame,
    labels: DataFrame,
    label_col: str = "label",
    gamma: float = 1.0,
) -> DataFrame:
    """1-row (n_communities, modularity) of a partition.

    ``Q = e_in/m - gamma * sum_c (deg_c / 2m)^2`` over the undirected
    simple graph (parallel edges, direction, and self-loops dropped).
    ``labels`` maps ``node_id`` to ``label_col``; nodes without an edge
    don't affect Q and are ignored.
    """
    und = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .persist()
    )
    lab = labels.select("node_id", F.col(label_col).alias("_lbl"))
    deg = (
        und.select(F.col("a").alias("node_id"))
        .unionAll(und.select(F.col("b").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count("*").alias("d"))
    )
    m = und.agg(F.count("*").cast("double").alias("m"))
    e_in = (
        und.join(lab.withColumnRenamed("node_id", "a").withColumnRenamed("_lbl", "la"), "a")
        .join(lab.withColumnRenamed("node_id", "b").withColumnRenamed("_lbl", "lb"), "b")
        .filter(F.col("la") == F.col("lb"))
        .agg(F.count("*").cast("double").alias("e_in"))
    )
    dc = (
        deg.join(lab, "node_id")
        .groupBy("_lbl")
        .agg(F.sum("d").cast("double").alias("dsum"))
        .agg(
            F.count("*").cast("long").alias("n_communities"),
            F.sum(F.col("dsum") * F.col("dsum")).alias("s2"),
        )
    )
    return (
        dc.crossJoin(m)
        .crossJoin(e_in)
        .select(
            "n_communities",
            F.round(
                F.col("e_in") / F.col("m")
                - F.lit(gamma) * F.col("s2") / (4.0 * F.col("m") * F.col("m")),
                6,
            ).alias("modularity"),
        )
    )
