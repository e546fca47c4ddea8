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


def bipartite_projection(
    edges: DataFrame,
    left_col: str = "src",
    right_col: str = "dst",
    min_shared: int = 1,
    max_right_degree: int | None = None,
) -> DataFrame:
    """(a, b, shared) — the weighted one-mode projection of the
    bipartite graph onto its LEFT side: one row per unordered left
    pair ``a < b`` that shares at least ``min_shared`` right
    neighbors, weighted by the shared-neighbor count (the classic
    co-purchase / co-occurrence graph construction).

    Scale shape: identical to the butterfly pair enumeration — the
    candidate fan-out is Σ C(deg(r), 2) over right nodes, one groupBy
    of (a, b) pairs, map-side combinable, no windows, no driver state.
    The quadratic driver is right-side hubs; ``max_right_degree`` caps
    them (frequency-cap pattern of ``dedup/ngram.py``): with the cap
    on, ``shared`` is an exact LOWER bound and hub-mediated pairs are
    dropped — a documented approximation, off by default so the
    driver-contract query stays exact. ``min_shared`` prunes the
    (typically heavy-tailed) weight-1 pair mass AFTER the aggregate,
    where it is a map-side filter on combined counts.
    """
    e = edges.select(
        F.col(left_col).alias("u"), F.col(right_col).alias("r")
    ).distinct()
    if max_right_degree is not None:
        deg = (
            e.groupBy("r")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") <= max_right_degree)
            .select("r")
        )
        e = e.join(deg, "r")
    e = e.persist()
    e2 = e.select(F.col("u").alias("u2"), "r")
    return (
        e.join(e2, "r")
        .filter(F.col("u") < F.col("u2"))
        .groupBy(F.col("u").alias("a"), F.col("u2").alias("b"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
