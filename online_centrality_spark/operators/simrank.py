"""SimRank structural similarity (Jeh & Widom, KDD 2002).

North-rule link-graph addition (no reference counterpart): two nodes
are similar when their IN-neighbors are similar —

    s(a, a) = 1
    s(a, b) = C / (|I(a)||I(b)|) * sum_{u in I(a), v in I(b)} s(u, v)

iterated from the identity a fixed number of rounds (the standard
truncated power expansion; k rounds cover meeting paths of length <= k,
and the tail is geometrically C^k-bounded, so small fixed k is the
conventional operating point).

Scale design: the state is the SPARSE nonzero pair set. Each round is
two equi-joins of the state against the edge list (state pair (u, v)
fans out to u's and v's out-neighborhoods) followed by one map-side
combinable groupBy-sum and a broadcast-free indegree attach. The
fan-out per state pair is outdeg(u) * outdeg(v) — the quadratic hub
wall inherent to exact SimRank; ``min_score`` prunes pairs whose
similarity cannot matter downstream (the standard threshold-pruned
distributed SimRank), bounding state growth at the price of an
underestimate documented at the call site. No windows, no driver-side
state; the diagonal rides as a column union, not a dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simrank(
    edges: DataFrame,
    c: float = 0.8,
    iterations: int = 3,
    min_score: float = 0.0,
) -> DataFrame:
    """(a, b, s) for node pairs a < b with s > max(min_score, 0) after
    ``iterations`` rounds (the symmetric off-diagonal entries; the
    diagonal is identically 1 by definition and omitted)."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionAll(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .persist()
    )
    indeg = e.groupBy(F.col("dst").alias("node_id")).agg(
        F.count("*").alias("ind")
    )
    diag = nodes.select(
        F.col("node_id").alias("a"),
        F.col("node_id").alias("b"),
        F.lit(1.0).alias("s"),
    )
    state = diag.localCheckpoint(eager=True)
    for _ in range(iterations):
        summed = (
            state.join(e.select(F.col("src").alias("a"), F.col("dst").alias("na")), "a")
            .join(e.select(F.col("src").alias("b"), F.col("dst").alias("nb")), "b")
            .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
            .agg(F.sum("s").alias("t"))
            .filter(F.col("a") != F.col("b"))
        )
        off = (
            summed.join(indeg.select(F.col("node_id").alias("a"), F.col("ind").alias("ia")), "a")
            .join(indeg.select(F.col("node_id").alias("b"), F.col("ind").alias("ib")), "b")
            .select(
                "a",
                "b",
                (F.lit(c) * F.col("t") / (F.col("ia") * F.col("ib"))).alias("s"),
            )
        )
        if min_score > 0.0:
            off = off.filter(F.col("s") >= min_score)
        state = diag.unionByName(off).localCheckpoint(eager=True)
    return (
        state.filter(F.col("a") < F.col("b"))
        .filter(F.col("s") > F.lit(max(min_score, 0.0)))
        .select("a", "b", "s")
    )
