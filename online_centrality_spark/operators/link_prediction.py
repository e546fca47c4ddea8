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


def negative_edge_samples(edges: DataFrame, k: int = 8) -> DataFrame:
    """Deterministic negative-edge sampling for link-prediction training.

    For every node of the digraph, draw ``k`` candidate destinations by
    portable md5 hash (``text/packing.PORTABLE_HASH`` convention — the
    identical bucket evaluates in Spark SQL and DuckDB, so the sampled
    negative set is exactly reproducible across engines and reruns, no
    RNG state to ship to 1000 executors), map the hash into a dense
    node index, and keep the pair iff it is not a real edge and not a
    self-loop. Output: distinct ``(src, dst)`` non-edges.

    Scale design: the dense index comes from
    :func:`~online_centrality_spark.sources.edges.add_global_seq`
    (two-phase range-partitioned rank — NO single-partition window over
    the node table, which is the thing that dies at 10^9 nodes); the
    candidate attach is an equi-join on the uniformly-distributed dense
    index; the reality check is one left-anti join keyed ``(src, dst)``.
    The only driver-side value is the scalar node count (same envelope
    as the kmeans seed read). Fan-out is exactly ``k`` rows per node —
    hub-degree independent by construction.
    """
    from online_centrality_spark.sources.edges import add_global_seq

    # both frames feed two consumers each (dictionary+candidates /
    # nodes-derivation+anti-join) — persist so the upstream edge
    # induction computes once, not three times
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
    dictionary = add_global_seq(nodes, ["node_id"], seq_col="idx")
    n = dictionary.count()
    key = F.concat(
        F.col("node_id").cast("string"), F.lit("#neg#"), F.col("i").cast("string")
    )
    bucket = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    cand = (
        nodes.select(
            "node_id",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        )
        .select(
            F.col("node_id").alias("src"),
            (bucket % F.lit(n) + 1).alias("cidx"),
        )
    )
    picked = cand.join(
        dictionary.select(F.col("idx").alias("cidx"), F.col("node_id").alias("dst")),
        "cidx",
    ).select("src", "dst")
    return (
        picked.filter(F.col("src") != F.col("dst"))
        .join(e, ["src", "dst"], "left_anti")
        .distinct()
    )
