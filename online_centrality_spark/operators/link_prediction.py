"""Neighborhood-overlap link prediction: common-neighbor scores.

North-rule addition (no reference counterpart — standard link-graph
toolkit alongside PageRank / CC / LPA / triangles): for every
NON-adjacent node pair (a < b) with at least one shared neighbor,
emit the three classic overlap scores:

- ``cn``          |Γ(a) ∩ Γ(b)|   (common-neighbor count)
- ``jaccard``     |Γ(a) ∩ Γ(b)| / |Γ(a) ∪ Γ(b)|
- ``adamic_adar`` Σ_{w ∈ Γ(a)∩Γ(b)} 1 / ln(deg(w))

Scale design: candidates are generated as wedges through the shared
neighbor ``w`` (two joins on ``w``), so a hub center fans out
O(deg(w)²) pairs — the same quadratic wall every exact overlap score
has. ``max_center_degree`` caps it by skipping hub centers (the
standard LSH-style frequency cap used in ``dedup/ngram.py``); with the
cap on, scores are exact for every SURVIVING pair, and pairs whose only
witnesses are hubs are dropped (documented approximation, off by
default). Everything else is map-side-combinable groupBys + one
left-anti join against the edge set; no windows, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_prediction_scores(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """(a, b, cn, jaccard, adamic_adar) for non-adjacent a < b, cn >= 1."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    # symmetric adjacency (w, n): w's neighborhood, one row per neighbor
    adj = und.select(F.col("a").alias("w"), F.col("b").alias("n")).unionAll(
        und.select(F.col("b").alias("w"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("w").agg(F.count("*").alias("deg"))
    centers = adj.join(deg, "w")
    if max_center_degree is not None:
        centers = centers.filter(F.col("deg") <= max_center_degree)
    # wedges a - w - b with a < b; the center's degree rides along so the
    # Adamic-Adar term needs no extra join
    left = centers.select("w", F.col("n").alias("a"), "deg")
    right = centers.select("w", F.col("n").alias("b"))
    wedges = (
        left.join(right, "w")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "deg")
    )
    scored = wedges.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("cn"),
        F.sum(1.0 / F.log(F.col("deg").cast("double"))).alias("adamic_adar"),
    )
    cand = scored.join(und, ["a", "b"], "left_anti")
    da = deg.select(F.col("w").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("w").alias("b"), F.col("deg").alias("db"))
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cn",
            (F.col("cn") / (F.col("da") + F.col("db") - F.col("cn"))).alias(
                "jaccard"
            ),
            "adamic_adar",
        )
    )
