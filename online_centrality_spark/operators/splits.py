"""Chronological edge split for temporal-graph ML.

The standard evaluation protocol for temporal link prediction / dynamic
node embeddings: train on all interactions up to a time cutoff, test on
what follows, and report how much of the test graph is INDUCTIVE (nodes
never seen in training) — the number that decides whether a
transductive model is even applicable.

The cutoff is integer arithmetic on the time span (``lo + (hi - lo) *
num div den``), not a float quantile, so the boundary decision is exact
and identical across engines and reruns. The cut attaches as a 1-row
broadcast (the ``zipf_profile`` scalar-attach pattern); edge/node
counts are map-side-combinable aggregates and the inductive set is one
anti-join of two node projections — nothing driver-held, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_edge_split(
    pairs: DataFrame, t_col: str = "t", num: int = 4, den: int = 5
) -> DataFrame:
    """Split timestamped edges ``(src, dst, t)`` at ``lo + (hi-lo)*num
    div den``; edges with ``t <= cut`` are train, the rest test.

    Returns two rows: ``(split, n_edges, n_nodes, n_new_nodes)`` where
    ``n_new_nodes`` counts test nodes absent from the train graph (0
    for the train row by definition).
    """
    # persist the input once: the cut agg and the tagged materialization
    # would otherwise each re-run the upstream induction (the loop-input
    # persist audit rule)
    pairs = pairs.persist()
    cut = pairs.agg(
        F.expr(
            f"min({t_col}) + ((max({t_col}) - min({t_col})) * {num}) div {den}"
        ).alias("_cut")
    )
    tagged = pairs.crossJoin(F.broadcast(cut)).withColumn(
        "split",
        F.when(F.col(t_col) <= F.col("_cut"), F.lit("train")).otherwise(
            F.lit("test")
        ),
    ).persist()

    def _nodes(split: str) -> DataFrame:
        part = tagged.filter(F.col("split") == split)
        return (
            part.select(F.col("src").alias("node_id"))
            .unionAll(part.select(F.col("dst").alias("node_id")))
            .distinct()
        )

    train_nodes, test_nodes = _nodes("train"), _nodes("test")
    new_nodes = test_nodes.join(train_nodes, "node_id", "left_anti")
    counts = tagged.groupBy("split").agg(F.count("*").alias("n_edges"))
    node_counts = (
        train_nodes.select(F.lit("train").alias("split"))
        .unionAll(test_nodes.select(F.lit("test").alias("split")))
        .groupBy("split")
        .agg(F.count("*").alias("n_nodes"))
    )
    new_counts = new_nodes.agg(F.count("*").alias("n_new")).select(
        F.lit("test").alias("split"), "n_new"
    )
    return (
        counts.join(node_counts, "split")
        .join(new_counts, "split", "left")
        .select(
            "split",
            F.col("n_edges").cast("long").alias("n_edges"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.coalesce(F.col("n_new"), F.lit(0))
            .cast("long")
            .alias("n_new_nodes"),
        )
    )
