"""Bipartite cohesion: wedge and butterfly (2×2 biclique) counting.

The butterfly is the bipartite analogue of the triangle — two left
nodes sharing two right nodes — and its count is the basis of
bipartite clustering coefficients and spam/bot detection on
user-item graphs.

Counting identity: if ``c(u, v)`` is the number of right nodes shared
by left pair ``(u, v)``, then ``butterflies = Σ C(c, 2)`` over pairs
and ``wedges = Σ C(deg(r), 2)`` over right nodes. The pair enumeration
explodes as ``Σ C(deg(r), 2)`` — so the operator enumerates pairs from
the side the CALLER puts on the right; pick the side whose degree
distribution is lighter (for supplier→customer, customers fan into few
suppliers each). Per-wedge work is one groupBy of ``(u, v)`` pairs —
map-side combinable, no windows, no driver state. Hub caps are
deliberately NOT applied: the count is exact (a capped estimate would
silently undercount); at extreme right-degree skew, cap upstream.

No reference counterpart; standard semantics (Wang et al., butterfly
counting), brute-force-validated in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def butterfly_count(
    edges: DataFrame, left_col: str = "src", right_col: str = "dst"
) -> DataFrame:
    """1-row ``(n_edges, n_wedges, n_butterflies)`` for the DISTINCT
    bipartite edge list; wedges are counted at right nodes (pairs of
    left neighbors), butterflies from the left-pair co-neighborhood
    counts."""
    e = edges.select(
        F.col(left_col).alias("u"), F.col(right_col).alias("r")
    ).distinct().persist()
    # left pairs (u1 < u2) per right node
    e2 = e.select(F.col("u").alias("u2"), "r")
    pairs = (
        e.join(e2, "r")
        .filter(F.col("u") < F.col("u2"))
        .groupBy("u", "u2")
        .agg(F.count("*").alias("c"))
    )
    # (c*(c-1)) div 2 — always-even product, INTEGER division, so the
    # combinatorial sums are exact int64 (no float-halves accumulation)
    bf = pairs.agg(
        F.expr("sum((c * (c - 1)) div 2)").cast("long").alias("n_butterflies")
    )
    wd = (
        e.groupBy("r")
        .agg(F.count("*").alias("d"))
        .agg(F.expr("sum((d * (d - 1)) div 2)").cast("long").alias("n_wedges"))
    )
    return (
        e.agg(F.count("*").alias("n_edges"))
        .crossJoin(wd)
        .crossJoin(bf)
        .select(
            "n_edges",
            F.coalesce(F.col("n_wedges"), F.lit(0)).alias("n_wedges"),
            F.coalesce(F.col("n_butterflies"), F.lit(0)).alias("n_butterflies"),
        )
    )
