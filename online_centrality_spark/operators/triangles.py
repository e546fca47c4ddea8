"""Triangle counting via degree-ordered edge orientation.

North-rule addition (no reference counterpart). Standard shuffle-lean
algorithm: symmetrize + dedup, orient every undirected edge from the
lower (degree, id) endpoint to the higher, so each triangle is counted
exactly once as a directed two-path a->b->c closed by a->c. The
orientation bounds the join fan-out by O(sqrt(m)) per node (the classic
arboricity argument), which is what keeps the self-join tractable on
skewed graphs; AQE handles residual reducer skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b"))
    w = und.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return w.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangle_count(edges: DataFrame) -> int:
    """Total number of triangles in the undirected simple graph."""
    o = _oriented(edges).persist()
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = o.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")
    closing = o.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    return wedges.join(closing, ["x", "z"]).count()


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """(node_id, triangles) — number of triangles each vertex belongs to."""
    o = _oriented(edges).persist()
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = o.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")
    closing = o.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    tris = wedges.join(closing, ["x", "z"])
    corners = (
        tris.select(F.col("x").alias("node_id"))
        .unionAll(tris.select(F.col("y").alias("node_id")))
        .unionAll(tris.select(F.col("z").alias("node_id")))
    )
    nodes = (
        edges.select(F.col("src").alias("node_id"))
        .unionAll(edges.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    counts = corners.groupBy("node_id").agg(F.count("*").alias("t"))
    return nodes.join(counts, "node_id", "left").select(
        "node_id", F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("triangles")
    )
