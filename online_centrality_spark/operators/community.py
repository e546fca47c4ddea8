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


def community_conductance(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """``(label, n_nodes, vol, cut, conductance)`` — per-community
    conductance φ(S) = cut(S) / min(vol(S), 2m − vol(S)) over a node
    labeling (e.g. LPA output): the community-QUALITY companion to the
    scalar modularity. NULL conductance when the denominator is 0 (a
    label owning the whole volume).

    One label join onto the undirected edge list; cut edges count
    toward BOTH sides' labels; volumes are degree sums per label; the
    2m scalar attaches as a 1-row broadcast.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
        .persist()
    )
    la = labels.select(F.col("node_id").alias("a"), F.col("label").alias("la"))
    lb = labels.select(F.col("node_id").alias("b"), F.col("label").alias("lb"))
    el = und.join(la, "a").join(lb, "b").persist()
    cut = (
        el.filter(F.col("la") != F.col("lb"))
        .select(F.col("la").alias("label"))
        .unionAll(
            el.filter(F.col("la") != F.col("lb")).select(F.col("lb").alias("label"))
        )
        .groupBy("label")
        .agg(F.count("*").alias("cut"))
    )
    deg = (
        und.select(F.col("a").alias("node_id"))
        .unionAll(und.select(F.col("b").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count("*").alias("d"))
    )
    vol = (
        labels.join(deg, "node_id", "left")
        .groupBy("label")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.coalesce(F.col("d"), F.lit(0))).alias("vol"),
        )
    )
    m2 = und.agg((F.count("*") * 2).alias("m2"))
    denom = F.least(F.col("vol"), F.col("m2") - F.col("vol"))
    return (
        vol.join(cut, "label", "left")
        .crossJoin(F.broadcast(m2))
        .select(
            "label",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("vol").cast("long").alias("vol"),
            F.coalesce(F.col("cut"), F.lit(0)).cast("long").alias("cut"),
            F.when(denom <= 0, F.lit(None).cast("double"))
            .otherwise(F.round(F.coalesce(F.col("cut"), F.lit(0)) / denom, 6))
            .alias("conductance"),
        )
    )
