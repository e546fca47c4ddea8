"""Configuration-model null statistics for an undirected simple graph.

One-row comparison of the observed triangle density against the
degree-preserving random-graph expectation (Newman's configuration
model): E[global clustering] = (⟨d²⟩−⟨d⟩)² / (n⟨d⟩³), which reduces to
the exactly-integer-derived form (S2−S1)²/S1³ with S1=Σd, S2=Σd².
A clustering ratio ≫ 1 is the standard "this graph has real community
structure" test — the null-model yardstick every link-graph report
carries next to the raw triangle count.

Scale shape: two map-side degree aggregates (n, S1, S2) + the oriented
triangle total — constant-size state end to end; the difference/square
terms are cast to double BEFORE multiplying (each term alone < 2^53 on
any graph whose S2 fits int64, so the cast is exact and the final
expression is bit-identical to the SQL oracle's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .triangles import triangle_count_per_vertex


def config_model_stats(edges: DataFrame) -> DataFrame:
    """One row: (n_nodes, n_edges, wedges, triangles, gcc,
    expected_gcc, clustering_ratio) over the undirected simple graph of
    ``edges`` (direction/multiplicity ignored, self-loops dropped).

    gcc = 3·triangles / wedges (wedges = Σ C(d,2) = (S2−S1)/2);
    expected_gcc = (S2−S1)² / S1³ (the configuration-model closed
    form); clustering_ratio = gcc / expected_gcc.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    # pinned once: the degree stats, the triangle count, and the edge
    # total all read this frame — without the checkpoint each branch
    # would recompute the upstream edge source (for the similarity
    # graph, a blocked all-pairs matmul) from scratch
    und = (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node_id"))
        .unionAll(und.select(F.col("b").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count("*").alias("d"))
    )
    dstats = deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum("d").alias("s1"),
        F.sum(F.col("d") * F.col("d")).alias("s2"),
    )
    tri = triangle_count_per_vertex(
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    ).agg(
        (F.sum("triangles") / 3).cast("long").alias("triangles")
    )
    m = und.agg(F.count("*").alias("n_edges"))
    joined = dstats.crossJoin(F.broadcast(tri)).crossJoin(F.broadcast(m))
    wedges = (F.col("s2") - F.col("s1")) / 2
    gcc = 3 * F.col("triangles") / wedges
    diff = (F.col("s2") - F.col("s1")).cast("double")
    exp_gcc = (
        diff
        * diff
        / (
            F.col("s1").cast("double")
            * F.col("s1").cast("double")
            * F.col("s1").cast("double")
        )
    )
    return joined.select(
        "n_nodes",
        "n_edges",
        ((F.col("s2") - F.col("s1")) / 2).cast("long").alias("wedges"),
        "triangles",
        F.round(gcc, 9).alias("gcc"),
        F.round(exp_gcc, 9).alias("expected_gcc"),
        F.round(gcc / exp_gcc, 6).alias("clustering_ratio"),
    )


def katz_index(
    edges: DataFrame,
    beta: float = 0.05,
    top_k: int = 50,
    max_mid_degree: int | None = None,
) -> DataFrame:
    """Truncated Katz link-prediction index (Liben-Nowell & Kleinberg):
    score(u,v) = β²·walks₂(u,v) + β³·walks₃(u,v) for NON-adjacent pairs
    u < v (the length-1 term is zero on the candidate set by
    construction), returning the ``top_k`` scored pairs.

    Walk counts come from two chained equi-joins on the symmetrized
    edge list (A², then A³ = A²·A), exactly integer, so the float score
    is one fixed expression over ints — bit-identical to the oracle.
    Deterministic output: ORDER BY (score DESC, u, v) LIMIT top_k, with
    the 9-decimal-rounded score as the sort key.

    Scale: the walk-2 self-join is the ``link_prediction`` wedge
    envelope — quadratic in hub degree. ``max_mid_degree`` caps the
    wedge midpoint (exact-lower-bound semantics, the `two_hop_reach`
    hub-cap convention) for corpus-scale runs; the gate runs uncapped.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    # pinned once: sym feeds four plan branches (two walk joins, the
    # adjacency anti-join, the optional mid-degree cap) — checkpointing
    # stops each branch re-deriving the upstream edge source
    sym = (
        e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    mid = sym
    if max_mid_degree is not None:
        middeg = (
            sym.groupBy("src").agg(F.count("*").alias("d"))
            .filter(F.col("d") <= max_mid_degree)
            .select("src")
        )
        mid = sym.join(middeg, "src")
    # walks of length 2 between ALL ordered pairs (a==b rows kept:
    # A²(a,a)=deg(a) feeds the backtracking walks inside A³)
    p2 = (
        sym.select(F.col("src").alias("a"), F.col("dst").alias("m"))
        .join(
            mid.select(F.col("src").alias("m"), F.col("dst").alias("b")),
            "m",
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("c2"))
    )
    p3 = (
        p2.select(F.col("a"), F.col("b").alias("m"), "c2")
        .join(
            sym.select(F.col("src").alias("m"), F.col("dst").alias("b")),
            "m",
        )
        .groupBy("a", "b")
        .agg(F.sum("c2").alias("c3"))
    )
    cand = (
        p2.join(p3, ["a", "b"], "outer")
        .filter(F.col("a") < F.col("b"))
        .join(
            sym.select(F.col("src").alias("a"), F.col("dst").alias("b")),
            ["a", "b"],
            "left_anti",
        )
        .select(
            "a",
            "b",
            F.coalesce("c2", F.lit(0)).alias("paths2"),
            F.coalesce("c3", F.lit(0)).alias("paths3"),
        )
    )
    score = F.round(
        F.lit(beta) * F.lit(beta) * F.col("paths2")
        + F.lit(beta) * F.lit(beta) * F.lit(beta) * F.col("paths3"),
        9,
    )
    return (
        cand.select("a", "b", "paths2", "paths3", score.alias("katz"))
        .orderBy(F.col("katz").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(top_k)
    )
