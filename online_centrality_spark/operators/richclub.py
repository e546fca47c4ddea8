"""Rich-club coefficient series over an undirected simple graph.

φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k is the number of nodes with
degree > k and E_k the number of edges whose BOTH endpoints have
degree > k — the classic probe for "do the hubs form a club?"
(Colizza et al., Nat. Phys. 2006 semantics; no null-model
normalization, which needs degree-preserving rewiring randomness).

Scale shape: one symmetric groupBy for degrees, one join of the edge
list against the degree table (broadcast-sized after aggregation for
any realistic degree range), then EVERYTHING downstream operates on
two histogram frames whose size is bounded by the number of DISTINCT
degree values — not nodes, not edges. The k-series expansion is a
theta-join of those tiny histograms, so a 100 TB edge list contributes
exactly one shuffle (the degree groupBy) before the plan drops to
kilobytes. φ is a single division of exact integer counts, so the
round(·, 6) boundary decision is identical in every engine.

No reference counterpart (the reference has no structural-graph
analytics beyond centrality); standard semantics, validated against a
brute-force oracle in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rich_club(edges: DataFrame) -> DataFrame:
    """``(k, n_rich_nodes, n_rich_edges, phi)`` for every degree
    threshold ``k`` in ``1 .. max_degree − 1`` with at least two
    surviving nodes.

    ``edges``: undirected edge list ``(src, dst)``; self-loops and
    duplicate/reversed pairs are dropped.
    """
    e = (
        edges.select(
            F.greatest("src", "dst").alias("h"), F.least("src", "dst").alias("l")
        )
        .filter(F.col("h") != F.col("l"))
        .distinct()
    )
    deg = (
        e.select(F.col("h").alias("node_id"))
        .unionAll(e.select(F.col("l").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count("*").alias("deg"))
        .persist()
    )
    # min endpoint degree per edge, then collapse both frames to
    # distinct-degree histograms — the last time anything scales with
    # the graph
    edge_hist = (
        e.join(deg.select(F.col("node_id").alias("h"), F.col("deg").alias("dh")), "h")
        .join(deg.select(F.col("node_id").alias("l"), F.col("deg").alias("dl")), "l")
        .select(F.least("dh", "dl").alias("m"))
        .groupBy("m")
        .agg(F.count("*").alias("ne"))
    )
    node_hist = deg.groupBy("deg").agg(F.count("*").alias("nn"))
    # guard: sequence(1, 0) DESCENDS in Spark (the word_ngrams hazard),
    # so a max-degree-1 graph must yield an empty k-series, matching
    # the oracle's range(1, 1)
    ks = deg.agg(F.max("deg").alias("mx")).select(
        F.explode(
            F.expr(
                "CASE WHEN mx >= 2 THEN sequence(CAST(1 AS BIGINT), mx - 1) "
                "ELSE CAST(array() AS ARRAY<BIGINT>) END"
            )
        ).alias("k")
    )
    n_k = (
        ks.join(node_hist, node_hist["deg"] > ks["k"])
        .groupBy("k")
        .agg(F.sum("nn").alias("n_rich_nodes"))
    )
    e_k = (
        ks.join(edge_hist, edge_hist["m"] > ks["k"])
        .groupBy("k")
        .agg(F.sum("ne").alias("n_rich_edges"))
    )
    return (
        n_k.join(e_k, "k", "left")
        .filter(F.col("n_rich_nodes") >= 2)
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("n_rich_nodes").cast("long").alias("n_rich_nodes"),
            F.coalesce(F.col("n_rich_edges"), F.lit(0))
            .cast("long")
            .alias("n_rich_edges"),
            F.round(
                F.coalesce(F.col("n_rich_edges"), F.lit(0))
                * 2.0
                / (F.col("n_rich_nodes") * (F.col("n_rich_nodes") - F.lit(1))),
                6,
            ).alias("phi"),
        )
    )
