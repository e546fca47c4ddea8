"""Maximal independent set — deterministic distributed Luby rounds.

Classic symmetry-breaking primitive (Luby 1986): every active node
draws a priority; a node joins the MIS when its priority beats every
active neighbor's; winners and their neighbors retire. Expected
O(log n) rounds, and every round is two shuffles over a geometrically
shrinking active set — the textbook "iterative DataFrame joins" shape.

Determinism: the priority is the engine-portable md5 hash of the node
id (``dedup.common.portable_hash``), with the node id itself as the
tiebreak — so reruns, resumed jobs, and the unrolled DuckDB oracle all
pick the identical set (same philosophy as ``random_walks`` /
``hash_sample``: reproducibility beats true randomness). Luby's
O(log n) bound needs only that priorities are a permutation — a fixed
hash gives one fixed permutation, trading the adversarial-input
guarantee for cross-engine exactness.

Scale shape per round: one join of active edges against the priority
table + one ``groupBy(node).min`` for the neighborhood minimum (both
map-side combinable), then two anti-joins to retire winners and their
neighbors. Lineage is cut per round (``localCheckpoint``), and like the
engine's other fixpoint loops it raises on a hit iteration cap rather
than emitting a truncated answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.common import portable_hash


def maximal_independent_set(
    edges: DataFrame,
    max_iter: int = 100,
) -> DataFrame:
    """(node_id, in_mis) over the undirected simple graph of ``edges``
    (src/dst columns; direction and multiplicity ignored, self-loops
    dropped). ``in_mis`` marks the deterministic Luby MIS: independent
    (no edge inside the set) and maximal (every outside node has a
    neighbor inside).
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = (
        e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("src").alias("node_id")).distinct()
    pri = lambda c: portable_hash(F.concat(F.lit("mis:"), F.col(c).cast("string")))  # noqa: E731
    active = nodes.select(
        "node_id", pri("node_id").alias("p")
    ).localCheckpoint(eager=True)
    ae = sym
    winners_parts: list[DataFrame] = []
    for _ in range(max_iter):
        if active.isEmpty():
            break
        # lowest (p, node_id) among each node's ACTIVE neighbors
        nbr = (
            ae.join(
                active.select(
                    F.col("node_id").alias("dst"),
                    F.col("p").alias("np"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node_id"))
            .agg(F.min(F.struct("np", "dst")).alias("m"))
        )
        win = (
            active.join(nbr, "node_id", "left")
            .filter(
                F.col("m").isNull()
                | (F.struct(F.col("p"), F.col("node_id")) < F.col("m"))
            )
            .select("node_id")
            .localCheckpoint(eager=True)
        )
        winners_parts.append(win)
        # retire winners and their (whole) neighborhoods
        nbrs_of_win = (
            ae.join(win.select(F.col("node_id").alias("src")), "src")
            .select(F.col("dst").alias("node_id"))
            .distinct()
        )
        retired = win.unionAll(nbrs_of_win).distinct().localCheckpoint(eager=True)
        active = active.join(retired, "node_id", "left_anti").localCheckpoint(
            eager=True
        )
        ae = (
            ae.join(retired.select(F.col("node_id").alias("src")), "src", "left_anti")
            .join(retired.select(F.col("node_id").alias("dst")), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
    if not active.isEmpty():
        raise RuntimeError(
            f"MIS did not converge in {max_iter} Luby rounds; raise max_iter"
        )
    if winners_parts:
        mis = winners_parts[0]
        for part in winners_parts[1:]:
            mis = mis.unionAll(part)
    else:
        mis = spark.createDataFrame([], "node_id long")
    return nodes.join(
        mis.select("node_id", F.lit(True).alias("in_mis")), "node_id", "left"
    ).select("node_id", F.coalesce("in_mis", F.lit(False)).alias("in_mis"))
