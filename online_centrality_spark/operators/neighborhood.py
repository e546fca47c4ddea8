"""Exact k-hop neighborhood reach counts over a digraph edge list.

North-rule link-graph addition (no reference counterpart — the
reference, ``/root/reference/python``, has no neighborhood-expansion
analytics at all): for every node of the digraph, the number of
DISTINCT endpoints reachable in exactly one hop (out-degree over the
deduplicated edge set) and via some two-hop path (excluding the source
itself), i.e. the classic "friend-of-friend reach" profile used to
rank influence before running full centrality.

Scale design: one self-join on the mid node plus two
map-side-combinable distinct aggregations. The two-hop candidate set
fans out as sum_b indeg(b) * outdeg(b), the same quadratic hub wall
every exact wedge enumeration has (``link_prediction.py``,
``triangles.py``); ``max_mid_degree`` caps it by skipping hub
mid-nodes (frequency-cap pattern of ``dedup/ngram.py``) — with the cap
on, counts are exact lower bounds and hub-mediated reach is dropped
(documented approximation, off by default so the driver query stays
exact). No windows, no driver collects; the distinct before the join
keeps multiplicity out of the fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_hop_reach(
    edges: DataFrame, max_mid_degree: int | None = None
) -> DataFrame:
    """(node_id, reach1, reach2) for every node of the digraph.

    ``reach1``: distinct out-neighbors. ``reach2``: distinct nodes ``c``
    with a path ``v -> b -> c`` and ``c != v`` (a 1-hop neighbor that is
    also 2-hop-reachable counts in both columns).
    """
    # four consumers (node set, both join sides, the degree agg):
    # persist so the upstream induction computes once
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
    )
    first = e
    if max_mid_degree is not None:
        # cap the wedge center: drop mid nodes whose in*out product
        # explodes the candidate set (exactness traded per docstring)
        deg = (
            e.groupBy(F.col("dst").alias("mid"))
            .agg(F.count("*").alias("ind"))
            .join(
                e.groupBy(F.col("src").alias("mid")).agg(
                    F.count("*").alias("outd")
                ),
                "mid",
            )
            .filter(F.col("ind") * F.col("outd") > max_mid_degree)
            .select("mid")
        )
        first = e.join(deg.withColumnRenamed("mid", "dst"), "dst", "left_anti")
    two = (
        first.alias("a")
        .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(F.col("a.src").alias("src"), F.col("b.dst").alias("c"))
        .filter(F.col("c") != F.col("src"))
        .distinct()
    )
    r1 = e.groupBy("src").agg(F.count("*").alias("reach1"))
    r2 = two.groupBy("src").agg(F.count("*").alias("reach2"))
    return (
        nodes.join(r1.withColumnRenamed("src", "node_id"), "node_id", "left")
        .join(r2.withColumnRenamed("src", "node_id"), "node_id", "left")
        .fillna(0, ["reach1", "reach2"])
        .select(
            "node_id",
            F.col("reach1").cast("long").alias("reach1"),
            F.col("reach2").cast("long").alias("reach2"),
        )
    )
