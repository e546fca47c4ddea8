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
    # terms are quantized at 1e-6 (NOT 1e-12): mean neighbor degree is
    # UNBOUNDED, and round(x*1e12) would overflow the int64 cast once
    # it passes ~9.2e6 — at 1e6 the envelope is mean degree < 9.2e12,
    # beyond any graph with < 9e12 nodes. Both engines quantize
    # identically, so parity is unaffected.
    per_node = deg.join(nbr, "u").select(
        "d",
        F.round((F.col("s").cast("double") / F.col("d")) * 1e6)
        .cast("long")
        .alias("t"),
    )
    return per_node.groupBy(F.col("d").alias("k")).agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.round(
            (F.sum("t").cast("double") / 1e6) / F.count("*"), 6
        ).alias("knn"),
    )


def clustering_by_degree(edges: DataFrame) -> DataFrame:
    """``(k, n_nodes, ck)`` — the C(k) curve: mean local clustering
    coefficient per degree class. Flat C(k) ≈ random graph; C(k) ~ 1/k
    signals hierarchical/modular structure (Ravasz–Barabási) — the
    curve view behind the scalar clustering numbers.

    Reuses the degree-oriented triangle counter through
    ``local_clustering`` (per-node lcc is an exact-int ratio in a fixed
    double chain); class averages use the scaled-int64 sum rule. Nodes
    whose SIMPLE-graph degree is 0 (self-loop-only endpoints — present
    in ``local_clustering``'s raw-edge node universe with degree
    coalesced to 0) are excluded: a k=0 degree class has no defined
    clustering and the oracle's simple-edge node universe never emits
    it.
    """
    from .triangles import local_clustering

    per = (
        local_clustering(edges)
        .filter(F.col("degree") >= 1)
        .select("degree", F.round(F.col("lcc") * 1e12).cast("long").alias("t"))
    )
    return per.groupBy(F.col("degree").alias("k")).agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.round((F.sum("t").cast("double") / 1e12) / F.count("*"), 6).alias("ck"),
    )


def _hist_gini(hist: DataFrame, v_col: str, c_col: str, kind: str):
    """1-row ``(kind, n, gini)`` from a value histogram — the closed
    form over sorted ranks collapses per VALUE: items at value v_i
    with count c_i and cumulative count C_i contribute
    ``v_i·c_i·(C_{i-1}+C_i−n)``, all int64-exact; G = Σterm/(n·W).
    The rank window runs over the HISTOGRAM (distinct values), never
    the items."""
    from pyspark.sql import Window

    tot = hist.agg(
        F.sum(c_col).alias("nt"),
        F.sum(F.col(v_col) * F.col(c_col)).alias("wsum"),
    )
    w = Window.orderBy(v_col).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        F.col(v_col).alias("v"),
        F.col(c_col).alias("c"),
        F.sum(c_col).over(w).alias("ci"),
    ).crossJoin(F.broadcast(tot))
    return (
        cum.select(
            "nt",
            "wsum",
            # decimal-widened: the int64 product v*c*(2C-c-n) wraps
            # silently in Spark past ~1e9-node/1e9-edge graphs while
            # the HUGEINT oracle stays exact — decimal(38,0) keeps the
            # integer chain exact to 1e38 in both engines
            (
                F.col("v").cast("decimal(38,0)")
                * F.col("c")
                * (F.col("ci") * 2 - F.col("c") - F.col("nt"))
            ).alias("t"),
        )
        .groupBy("nt", "wsum")
        .agg(F.sum("t").alias("ts"))
        .select(
            F.lit(kind).alias("kind"),
            F.col("nt").cast("long").alias("n"),
            F.round(
                F.col("ts").cast("double")
                / (F.col("nt").cast("double") * F.col("wsum").cast("double")),
                6,
            ).alias("gini"),
        )
    )


def inequality_profile(edges: DataFrame) -> DataFrame:
    """Two rows ``(kind, n, gini)`` — Gini coefficients of (a) the
    degree distribution and (b) the edge-multiplicity (weight)
    distribution of the undirected interaction graph: how unequally
    are connections and interaction intensity spread?

    Everything after the degree/weight groupBys operates on
    DISTINCT-VALUE histograms; the Gini closed form is exact int64
    per histogram row (see ``_hist_gini``) with one final division.
    """
    w = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("weight"))
        .persist()
    )
    deg = (
        w.select(F.col("a").alias("n"))
        .unionAll(w.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    dh = deg.groupBy("d").agg(F.count("*").alias("c"))
    wh = w.groupBy("weight").agg(F.count("*").alias("c"))
    return _hist_gini(dh, "d", "c", "degree").unionAll(
        _hist_gini(wh, "weight", "c", "weight")
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
