"""SALSA hub/authority scores (Lempel & Moran, WWW 2000).

The random-walk variant of HITS: instead of raw neighbor sums, each
step is a stochastic redistribution —

    a(j) = sum_{i -> j} h(i) / outdeg(i)
    h(i) = sum_{i -> j} a(j) / indeg(j)

so hubs split their mass across their out-links and authorities split
theirs across their in-links (the TKC-effect fix over HITS: a dense
clique cannot hoard score). No reference counterpart — part of the
standard link-graph toolkit this engine ships alongside PageRank /
HITS / eigenvector.

Determinism / oracle parity: the update is linear with FIXED degree
denominators, so running ``max_iter`` rounds unnormalized and applying
one L1 normalization per vector at the end equals any per-step
normalization schedule (scalars commute — the HITS/eigenvector
argument). Mass never grows (each half-step redistributes, and only
sink/source leakage removes mass), so the unnormalized loop is
float-safe at fixed depth.

Scale shape: degrees are two map-side-combinable groupBys computed
once and ATTACHED to the persisted edge list up front (so no
per-iteration degree join); every half-step is one equi-join of the
score vector against the weighted edge list plus a map-side
groupBy-sum; the two half-steps of a round run as ONE job (only ``h``
is checkpointed per round — lineage depth stays O(1), job count and
checkpoint I/O are halved vs checkpointing each half-step); the end
normalizers attach as 1-row broadcast cross joins. No driver-side
state, no windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salsa(edges: DataFrame, max_iter: int = 12) -> DataFrame:
    """(node_id, hub, authority) after ``max_iter`` SALSA rounds,
    each vector L1-normalized at the end; nodes the walk never reaches
    on a side carry 0.0 there."""
    p = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        p.select(F.col("src").alias("node_id"))
        .unionAll(p.select(F.col("dst").alias("node_id")))
        .distinct()
        .persist()
    )
    outd = p.groupBy(F.col("src").alias("node_id")).agg(
        F.count("*").alias("deg")
    )
    ind = p.groupBy(F.col("dst").alias("node_id")).agg(
        F.count("*").alias("deg")
    )
    # pre-weighted edge list: both degree denominators ride along, so
    # the iteration never re-joins the degree tables (division stays
    # v / deg — identical float arithmetic to the unrolled oracle)
    pw = (
        p.join(outd.select(F.col("node_id").alias("src"),
                           F.col("deg").alias("od")), "src")
        .join(ind.select(F.col("node_id").alias("dst"),
                         F.col("deg").alias("id_")), "dst")
        .select("src", "dst", "od", "id_")
        .localCheckpoint(eager=True)
    )
    h = nodes.select("node_id", F.lit(1.0).alias("v")).localCheckpoint(
        eager=True
    )
    a = None
    for i in range(max_iter):
        a = (
            pw.join(
                h.select(F.col("node_id").alias("src"), "v"), "src"
            )
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.sum(F.col("v") / F.col("od")).alias("v"))
        )
        if i == max_iter - 1:
            # the final authority vector feeds the output join twice;
            # pin it so it is not recomputed per consumer
            a = a.localCheckpoint(eager=True)
        h = (
            pw.join(
                a.select(F.col("node_id").alias("dst"), "v"), "dst"
            )
            .groupBy(F.col("src").alias("node_id"))
            .agg(F.sum(F.col("v") / F.col("id_")).alias("v"))
            .localCheckpoint(eager=True)
        )
    h_tot = h.agg(F.sum("v").alias("hs"))
    a_tot = a.agg(F.sum("v").alias("as_"))
    return (
        nodes.join(h.withColumnRenamed("v", "_h"), "node_id", "left")
        .join(a.withColumnRenamed("v", "_a"), "node_id", "left")
        .crossJoin(F.broadcast(h_tot))
        .crossJoin(F.broadcast(a_tot))
        .select(
            "node_id",
            (F.coalesce("_h", F.lit(0.0)) / F.col("hs")).alias("hub"),
            (F.coalesce("_a", F.lit(0.0)) / F.col("as_")).alias("authority"),
        )
    )
