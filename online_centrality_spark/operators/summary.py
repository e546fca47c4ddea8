"""One-row structural summary of an undirected simple graph.

The "graph report card": size, density, the Molloy–Reed ratio
⟨k²⟩/⟨k⟩ (supercritical giant component iff > 2 under the
configuration model), Shannon entropy of the degree distribution, and
the discrete power-law MLE exponent α̂ = 1 + n · [Σ ln(2·dᵢ)]⁻¹
(Clauset–Shalizi–Newman continuous approximation at d_min = 1).

Engine-parity discipline: all counts and the moment sums are exact
int64/decimal aggregates; the two transcendental sums (Σ ln 2d and the
entropy terms) use the scaled-int64 trick — each per-row term is a
deterministic double chain, rounded to ``round(term·1e12)`` and summed
exactly, so the totals are independent of partition order in every
engine (the `domain_divergence` rule).

Scale shape: one degree shuffle; every later frame is histogram-sized
(distinct degree values). No windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """``(k, n_nodes, knn)`` — the k_nn(k) curve: for every degree
    class ``k``, the mean over class members of their average neighbor
    degree. Rising knn(k) = assortative mixing, falling = hubs feed the
    periphery — the structural companion to the scalar assortativity
    coefficient.

    One degree shuffle, one symmetric join to sum neighbor degrees,
    then degree-class frames. Each node's mean neighbor degree is an
    exact-int ratio (fixed double chain); the class average uses the
    scaled-int64 sum rule so it is partition-order independent.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("d")).persist()
    nbr = (
        sym.join(deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v")
        .groupBy("u")
        .agg(F.sum("dv").alias("s"))
    )
    per_node = deg.join(nbr, "u").select(
        "d",
        F.round((F.col("s").cast("double") / F.col("d")) * 1e12)
        .cast("long")
        .alias("t"),
    )
    return per_node.groupBy(F.col("d").alias("k")).agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.round(
            (F.sum("t").cast("double") / 1e12) / F.count("*"), 6
        ).alias("knn"),
    )


def clustering_by_degree(edges: DataFrame) -> DataFrame:
    """``(k, n_nodes, ck)`` — the C(k) curve: mean local clustering
    coefficient per degree class. Flat C(k) ≈ random graph; C(k) ~ 1/k
    signals hierarchical/modular structure (Ravasz–Barabási) — the
    curve view behind the scalar clustering numbers.

    Reuses the degree-oriented triangle counter through
    ``local_clustering`` (per-node lcc is an exact-int ratio in a fixed
    double chain); class averages use the scaled-int64 sum rule.
    """
    from .triangles import local_clustering

    per = local_clustering(edges).select(
        "degree", F.round(F.col("lcc") * 1e12).cast("long").alias("t")
    )
    return per.groupBy(F.col("degree").alias("k")).agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.round((F.sum("t").cast("double") / 1e12) / F.count("*"), 6).alias("ck"),
    )


def graph_summary(edges: DataFrame) -> DataFrame:
    """1-row ``(n_nodes, n_edges, density, mean_degree, molloy_reed,
    degree_entropy, powerlaw_alpha)``; float columns rounded to 6."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
        .persist()
    )
    base = deg.agg(
        F.count("*").alias("nn"),
        F.sum("d").alias("sum_d"),
        F.sum(
            F.col("d").cast("decimal(18,0)") * F.col("d").cast("decimal(18,0)")
        ).alias("sum_d2"),
        F.sum(F.round(F.log(F.col("d") * 2.0) * 1e12).cast("long")).alias("ln2d"),
    )
    hist = deg.groupBy("d").agg(F.count("*").alias("cnt"))
    ent = (
        hist.crossJoin(F.broadcast(base.select("nn")))
        .select(
            F.round(
                (F.col("cnt").cast("double") / F.col("nn"))
                * F.log(F.col("cnt").cast("double") / F.col("nn"))
                * 1e12
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").alias("ent"))
    )
    nn = F.col("nn").cast("double")
    ne = F.col("sum_d").cast("double") / 2.0
    return (
        base.crossJoin(ent)
        .select(
            F.col("nn").cast("long").alias("n_nodes"),
            (F.col("sum_d") / 2).cast("long").alias("n_edges"),
            F.round(ne * 2.0 / (nn * (nn - 1.0)), 6).alias("density"),
            F.round(F.col("sum_d").cast("double") / F.col("nn"), 6).alias(
                "mean_degree"
            ),
            F.round(
                F.col("sum_d2").cast("double") / F.col("sum_d"), 6
            ).alias("molloy_reed"),
            F.round(-F.col("ent") / 1e12, 6).alias("degree_entropy"),
            F.round(
                F.lit(1.0) + F.col("nn") / (F.col("ln2d").cast("double") / 1e12),
                6,
            ).alias("powerlaw_alpha"),
        )
    )
