"""Greedy graph coloring — deterministic Jones–Plassmann rounds.

Jones & Plassmann (1993): every uncolored node whose priority beats all
its uncolored neighbors colors itself with the smallest color absent
from its already-colored neighborhood (the mex). Adjacent nodes are
never both local maxima, so each round's ready set is independent and
the coloring is always proper; the result equals the SEQUENTIAL greedy
coloring in decreasing priority order, which makes it exactly
reproducible by an unrolled SQL oracle. Expected O(log n / log log n)
rounds on bounded-degree graphs.

Determinism: the priority is the engine-portable md5 hash of the node
id with the node id as tie-break (the ``maximal_independent_set``
convention) — reruns, resumes, and the DuckDB oracle pick the identical
color for every node.

Scale shape per round: the readiness test is one join of the active
edge set against the active priority table + one map-side
``groupBy(node).max``; the mex is one join of ready nodes' incident
edges against the colored table, a per-node window over DISTINCT
neighbor colors (bounded by degree — the ``link_prediction`` wedge
envelope, not the stream), and one aggregate. Active edges shrink
geometrically as nodes retire; lineage is cut per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.common import portable_hash


def greedy_coloring(edges: DataFrame, max_iter: int = 100) -> DataFrame:
    """(node_id, color) — a proper coloring of the undirected simple
    graph of ``edges`` (src/dst; direction/multiplicity ignored,
    self-loops dropped), equal to the sequential greedy coloring in
    decreasing (portable-hash, node_id) priority order.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("src").alias("node_id")).distinct()
    pri = portable_hash(F.concat(F.lit("jp:"), F.col("node_id").cast("string")))
    active = nodes.select("node_id", pri.alias("p")).localCheckpoint(eager=True)
    ae = sym
    colored_parts: list[DataFrame] = []
    colored = spark.createDataFrame([], "node_id long, color long")
    for _ in range(max_iter):
        if active.isEmpty():
            break
        # (1) ready = active local maxima over the ACTIVE neighborhood
        nbr = (
            ae.join(
                active.select(
                    F.col("node_id").alias("dst"), F.col("p").alias("np")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node_id"))
            .agg(F.max(F.struct("np", "dst")).alias("m"))
        )
        ready = (
            active.join(nbr, "node_id", "left")
            .filter(
                F.col("m").isNull()
                | (F.struct(F.col("p"), F.col("node_id")) > F.col("m"))
            )
            .select("node_id")
            .localCheckpoint(eager=True)
        )
        # (2) mex over the colors of already-colored neighbors
        nc = (
            sym.join(ready.select(F.col("node_id").alias("src")), "src")
            .join(
                colored.select(
                    F.col("node_id").alias("dst"), F.col("color")
                ),
                "dst",
            )
            .select(F.col("src").alias("node_id"), "color")
            .distinct()
        )
        rk = nc.select(
            "node_id",
            "color",
            (
                F.row_number().over(
                    Window.partitionBy("node_id").orderBy("color")
                )
                - 1
            ).alias("rk"),
        )
        mx = rk.groupBy("node_id").agg(
            F.coalesce(
                F.min(F.when(F.col("color") != F.col("rk"), F.col("rk"))),
                F.count("*"),
            ).alias("mex")
        )
        newc = (
            ready.join(mx, "node_id", "left")
            .select(
                "node_id",
                F.coalesce(F.col("mex"), F.lit(0)).cast("long").alias("color"),
            )
            .localCheckpoint(eager=True)
        )
        colored_parts.append(newc)
        colored = colored.unionAll(newc).localCheckpoint(eager=True)
        active = active.join(ready, "node_id", "left_anti").localCheckpoint(
            eager=True
        )
        ae = (
            ae.join(ready.select(F.col("node_id").alias("src")), "src", "left_anti")
            .join(ready.select(F.col("node_id").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
    if not active.isEmpty():
        raise RuntimeError(
            f"coloring did not converge in {max_iter} JP rounds; raise max_iter"
        )
    return colored
