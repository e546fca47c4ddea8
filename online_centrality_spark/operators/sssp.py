"""Weighted single-source shortest paths (distributed Bellman-Ford).

North-rule link-graph addition: min-plus relaxation of nonnegative
edge weights to fixpoint —

    dist(v) = min over edges (u, v, w) of dist(u) + w

iterated with DELTA frontiers (only nodes whose distance improved last
round can improve their out-neighbors; the same argument as
``reachability.temporal_reachability``). Nonnegative weights make the
fixpoint monotone, so extra rounds are no-ops and an unrolled SQL
oracle at depth >= the true convergence round count is exact.

Scale shape per round: one equi-join of the (shrinking) frontier
against the persisted edge list + one map-side-combinable
``groupBy(dst).min``; improvement detection is a left join against the
settled table; lineage cut per round; loud divergence guard instead of
a silently truncated relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def weighted_sssp(
    wedges: DataFrame,
    source: int,
    max_iter: int = 200,
) -> DataFrame:
    """(node_id, dist) for every node reachable from ``source`` over
    ``wedges(src, dst, w)`` with nonnegative ``w``; unreached nodes are
    omitted. Exact double arithmetic: both engine and oracle accumulate
    path sums round-by-round, so the min candidates are bit-identical.
    """
    spark = wedges.sparkSession
    e = wedges.select(
        "src", "dst", F.col("w").cast("double").alias("w")
    ).persist()
    dist = spark.createDataFrame(
        [(int(source), 0.0)], "node_id long, dist double"
    ).localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_iter):
        relax = (
            e.join(
                frontier.select(
                    F.col("node_id").alias("src"), F.col("dist").alias("a")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.min(F.col("a") + F.col("w")).alias("cand"))
        )
        improved = (
            relax.join(dist, "node_id", "left")
            .filter(F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            .select("node_id", F.col("cand").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            return dist
        dist = (
            dist.unionAll(improved)
            .groupBy("node_id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        frontier = improved
    raise RuntimeError(
        f"weighted sssp did not converge in {max_iter} rounds; "
        "raise max_iter (rounds scale with the shortest-path hop depth)"
    )
