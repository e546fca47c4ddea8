"""Densest subgraph via the batch greedy peel (Charikar 2000 /
Bahmani–Kumar–Vassilvitskii 2012 MapReduce variant).

Each round removes EVERY node whose degree is at most ``2(1+ε)·ρ``
(ρ = |E|/|V| of the current survivor graph) and remembers the round
with the highest density; the surviving snapshot of that round is a
``2(1+ε)``-approximation of the true densest subgraph. With ε = 1/2
the threshold is exactly ``deg·V > 3·E`` in int64 — every keep/drop
decision is INTEGER arithmetic, so engines can never disagree on
membership — and each round removes at least an ε/(1+ε) = 1/3 fraction
of the nodes, so the loop is O(log n) rounds (24 rounds cover 16M
nodes; a fixed unroll of the same schedule is the SQL oracle).

Scale shape: identical to the k-core peel — per round one map-side
degree aggregate and two semi-joins over a SHRINKING edge list,
lineage cut with ``localCheckpoint``; the only driver state is the
per-round (|V|, |E|) scalar pair.

No reference counterpart; standard semantics, brute-force-validated in
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def densest_subgraph(edges: DataFrame, max_rounds: int = 64) -> DataFrame:
    """``(node_id, density)`` — members of the best peel snapshot with
    its density ``|E|/|V|`` (rounded to 6); 3-approximation (ε = 1/2).

    Ties between equally dense rounds resolve to the EARLIEST round
    (larger subgraph), deterministically in both engines.
    """
    spark = edges.sparkSession
    cur = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True)
    )
    best_nodes: DataFrame | None = None
    best = (-1.0, 0, 0)  # (density, nE, nV)
    for _ in range(max_rounds):
        n_e = cur.count()
        if n_e == 0:
            break
        deg = (
            cur.select(F.col("a").alias("n"))
            .unionAll(cur.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count("*").alias("d"))
            .localCheckpoint(eager=True)
        )
        n_v = deg.count()
        density = n_e / n_v
        if density > best[0]:
            best = (density, n_e, n_v)
            best_nodes = deg.select(F.col("n").alias("node_id"))
        # ε = 1/2: keep iff deg·V > 3·E — exact int64 decision
        keep = deg.filter(F.col("d") * F.lit(n_v) > F.lit(3 * n_e)).select("n")
        cur = (
            cur.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    # raise only on genuinely unfinished work: the last peel may empty
    # the graph exactly on round max_rounds (the SCC guard's lesson)
    if cur.count() != 0:
        raise RuntimeError(
            f"densest-subgraph peel did not empty in {max_rounds} rounds; "
            "each round drops >= 1/3 of the nodes, so this graph is "
            "impossibly large for the bound — raise max_rounds"
        )
    if best_nodes is None:
        return spark.createDataFrame([], "node_id long, density double")
    return best_nodes.select(
        "node_id",
        F.round(F.lit(best[1]) / F.lit(best[2]), 6).alias("density"),
    )
