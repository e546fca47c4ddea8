"""Connected components and label propagation as iterative DataFrame joins.

North-rule additions with no reference counterpart (standard semantics,
validated against pure-python oracles in tests).

- ``connected_components``: weakly connected components by iterative
  hash-min label propagation over the symmetrized edge set. Each
  iteration is one shuffle (join + min-agg); convergence is detected with
  a changed-count aggregate and lineage is cut per iteration. Converges
  in O(diameter) rounds — acceptable for social/actor graphs (small
  diameter); a large-star/small-star variant is the O(log n) upgrade
  path.

- ``label_propagation``: synchronous LPA. Every node starts with its own
  id; each round a node adopts the most frequent label among its
  (undirected, dedup) neighbors, ties broken by the smallest label;
  isolated behavior: keep the current label. Deterministic by
  construction. Runs ``max_iter`` rounds or until no label changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """Undirected dedup neighbor pairs (a, b) for both directions."""
    e = edges.select("src", "dst")
    return (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionAll(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def _nodes(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("node_id"))
        .unionAll(edges.select(F.col("dst").alias("node_id")))
        .distinct()
    )


def connected_components(edges: DataFrame, max_iter: int = 200) -> DataFrame:
    """(node_id, component) — component = min node id in the WCC."""
    sym = _sym(edges).persist()
    labels = _nodes(edges).select(
        "node_id", F.col("node_id").alias("component")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["node_id"])
            .groupBy(F.col("b").alias("node_id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "node_id", "left")
            .select(
                "node_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("node_id", "component")
        if changed == 0:
            break
    return labels


def label_propagation(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """(node_id, label) — synchronous LPA with deterministic min-label ties."""
    sym = _sym(edges).persist()
    labels = _nodes(edges).select(
        "node_id", F.col("node_id").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        votes = (
            sym.join(labels, sym["a"] == labels["node_id"])
            .groupBy(F.col("b").alias("node_id"), F.col("label"))
            .agg(F.count("*").alias("cnt"))
        )
        w = Window.partitionBy("node_id").orderBy(
            F.col("cnt").desc(), F.col("label").asc()
        )
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node_id", F.col("label").alias("new_label"))
        )
        new_labels = (
            labels.join(best, "node_id", "left")
            .select(
                "node_id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
                (F.col("new_label") != F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("node_id", "label")
        if changed == 0:
            break
    return labels
