"""Static indegree and negative-beta measure on a dedup digraph.

Reference semantics: ``static_indegree_computer.py:32-43`` (dedup
in-degree + epsilon so zero-indegree nodes still appear) and
``static_negative_beta_measure_computer.py:31-49`` (for each node v,
sum over in-edges (u,v) of 1/outdeg(u); outdeg 0 -> weight 1.0; + epsilon).

Pure DataFrame ops — two-stage hash aggregation handles hub skew, and
both reduce to one shuffle on the node key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dedup(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").dropDuplicates(["src", "dst"])


def _graph_nodes(dedup: DataFrame) -> DataFrame:
    return (
        dedup.select(F.col("src").alias("node_id"))
        .unionAll(dedup.select(F.col("dst").alias("node_id")))
        .distinct()
    )


def static_indegree(edges: DataFrame, epsilon: float = 0.001) -> DataFrame:
    """(node_id, score) = dedup in-degree + epsilon over all graph nodes."""
    dedup = _dedup(edges)
    indeg = dedup.groupBy(F.col("dst").alias("node_id")).agg(
        F.count("*").alias("indeg")
    )
    return (
        _graph_nodes(dedup)
        .join(indeg, "node_id", "left")
        .select(
            "node_id",
            (F.coalesce(F.col("indeg"), F.lit(0)) + F.lit(epsilon)).alias("score"),
        )
    )


def static_negative_beta(edges: DataFrame, epsilon: float = 0.001) -> DataFrame:
    """(node_id, score) = sum over in-edges of 1/outdeg(src) + epsilon."""
    dedup = _dedup(edges)
    outdeg = dedup.groupBy(F.col("src").alias("o_node")).agg(
        F.count("*").alias("outdeg")
    )
    weighted = (
        dedup.join(outdeg, dedup["src"] == outdeg["o_node"])
        .groupBy(F.col("dst").alias("node_id"))
        .agg(F.sum(F.lit(1.0) / F.col("outdeg")).alias("nbm"))
    )
    return (
        _graph_nodes(dedup)
        .join(weighted, "node_id", "left")
        .select(
            "node_id",
            (F.coalesce(F.col("nbm"), F.lit(0.0)) + F.lit(epsilon)).alias("score"),
        )
    )
