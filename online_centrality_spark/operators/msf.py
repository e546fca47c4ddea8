"""Minimum spanning forest via Borůvka contraction.

Borůvka is THE Spark-shaped MST algorithm: every round each component
picks its minimum incident cross edge (a map-side-combinable
`min(struct(w, a, b))` per component label) and components merge —
their count at least halves, so the loop is O(log n) rounds over a
frame that only shrinks. Ties are broken by the TOTAL order
``(w, a, b)``, which is the classic edge-id tie-break that makes
Borůvka cycle-free without distinct weights and makes the forest
UNIQUE — the property the unrolled SQL oracle relies on.

Per round: two label joins + one grouped struct-min + a
connected-components run over the CANDIDATE pick graph in LABEL space
— one edge per component, so the contraction frame is component-count
sized (shrinking geometrically), never the whole forest; labels
compose through a single join. Lineage cut with ``localCheckpoint``;
no windows, no driver state beyond the per-round cross-edge emptiness
check.

No reference counterpart; standard semantics, Kruskal-parity-validated
in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components


def minimum_spanning_forest(
    edges: DataFrame, weight_col: str = "w", max_rounds: int = 40
) -> DataFrame:
    """``(a, b, w)`` — the unique (w, a, b)-tie-broken minimum spanning
    forest of the undirected weighted edge list. Parallel edges keep
    their minimum weight; self-loops are dropped."""
    we = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .persist()
    )
    spark = we.sparkSession
    nodes = (
        we.select(F.col("a").alias("node_id"))
        .unionAll(we.select(F.col("b").alias("node_id")))
        .distinct()
        .persist()
    )
    labels = nodes.select("node_id", F.col("node_id").alias("lab")).localCheckpoint(
        eager=True
    )
    forest = spark.createDataFrame([], "w double, a long, b long")
    done = False
    for _ in range(max_rounds):
        x = (
            we.join(
                labels.select(F.col("node_id").alias("a"), F.col("lab").alias("ca")),
                "a",
            )
            .join(
                labels.select(F.col("node_id").alias("b"), F.col("lab").alias("cb")),
                "b",
            )
            .filter(F.col("ca") != F.col("cb"))
            .localCheckpoint(eager=True)
        )
        if x.isEmpty():
            done = True
            break
        both = x.select(
            F.col("ca").alias("comp"),
            F.struct("w", "a", "b", "ca", "cb").alias("e"),
        ).unionAll(
            x.select(
                F.col("cb").alias("comp"),
                F.struct("w", "a", "b", "ca", "cb").alias("e"),
            )
        )
        # struct min still orders by (w, a, b) — ca/cb ride along for
        # the label-space contraction below and never affect comparison
        # ((w, a, b) is unique per edge)
        cand = (
            both.groupBy("comp").agg(F.min("e").alias("me")).select("me.*")
        ).localCheckpoint(eager=True)
        forest = forest.unionAll(
            cand.select("w", "a", "b").distinct()
        ).localCheckpoint(eager=True)
        # contract in LABEL space: the candidate pick graph has one
        # edge per component, so this CC runs on a frame the size of
        # the CURRENT component count (shrinking geometrically) — not
        # the whole forest — and labels COMPOSE through a single join
        cc = connected_components(
            cand.select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        ).select(F.col("node_id").alias("lab"), F.col("component").alias("new_lab"))
        labels = (
            labels.join(cc, "lab", "left")
            .select(
                "node_id",
                F.coalesce(F.col("new_lab"), F.col("lab")).alias("lab"),
            )
            .localCheckpoint(eager=True)
        )
    if not done:
        # the final round may have merged the last components exactly on
        # iteration max_rounds (the SCC for/else lesson)
        rem = (
            we.join(
                labels.select(F.col("node_id").alias("a"), F.col("lab").alias("ca")),
                "a",
            )
            .join(
                labels.select(F.col("node_id").alias("b"), F.col("lab").alias("cb")),
                "b",
            )
            .filter(F.col("ca") != F.col("cb"))
        )
        if not rem.isEmpty():
            raise RuntimeError(
                f"Boruvka did not converge in {max_rounds} rounds; components "
                "at least halve per round, so this graph is impossibly large "
                "for the bound — raise max_rounds"
            )
    return forest.select("a", "b", "w")
