"""Single-source BFS hop distances by frontier expansion.

North-rule addition (standard link-graph toolkit). Level-synchronous
BFS: each round joins the current frontier against the adjacency list,
anti-joins the visited set, and stamps the round number as the
distance. One shuffle join + one anti-join per level, lineage cut per
round with ``localCheckpoint`` — the same loop discipline as the
PageRank / CC / k-core iterations, so a deep traversal over a
10^12-edge table keeps O(1) plans. Unreached nodes are emitted with
``dist = NULL`` so the output covers the full node set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    source: int,
    directed: bool = False,
    max_rounds: int = 10_000,
) -> DataFrame:
    """(node_id, dist) — hop count from ``source`` (NULL if unreachable)."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    adj = e.dropDuplicates(["src", "dst"])
    if not directed:
        adj = adj.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates(["src", "dst"])
    adj = adj.persist()
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionAll(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .persist()
    )
    spark = edges.sparkSession
    frontier = nodes.filter(F.col("node_id") == source).localCheckpoint(eager=True)
    visited = frontier.select("node_id", F.lit(0).cast("long").alias("dist"))
    visited = visited.localCheckpoint(eager=True)
    for r in range(1, max_rounds + 1):
        if frontier.count() == 0:
            break
        nxt = (
            adj.join(frontier.withColumnRenamed("node_id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("node_id"))
            .distinct()
            .join(visited.select("node_id"), "node_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(
            nxt.select("node_id", F.lit(r).cast("long").alias("dist"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(f"bfs did not exhaust the frontier in {max_rounds} rounds")
    return nodes.join(visited, "node_id", "left").select("node_id", "dist")
