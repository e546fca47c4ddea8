"""Harmonic centrality: h(v) = sum over u != v of 1/d(u, v) (incoming paths).

networkx-parity (the reference calls ``nx.harmonic_centrality(G)``,
``static_harmonic_centrality_computer.py:36``; the per-graph-type variant
``harmonic_centrality_computer.py:19-38`` also supports the raw snapshot
graph). Epsilon is added by the caller-facing wrappers to mirror the
reference's "+0.001 so zero-score nodes appear" rule.

Physical strategies:

- **distributed**: multi-source BFS as DataFrame supersteps — the
  frontier table (target, node, depth) expands one hop per iteration via
  a join on reversed edges with an anti-join against visited; each new
  (target, node) pair contributes 1/depth. State is O(V^2) worst case,
  which matches the problem (all-pairs reachability) — the reference
  only ever runs this on small sliding-window graphs
  (``CentralityScoreComputer.py:128-133``).
- **compact** (below ``collect_threshold`` nodes): one Arrow task, numpy
  BFS per target.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HC_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def harmonic_numpy(src: np.ndarray, dst: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    pred: list[list[int]] = [[] for _ in range(n)]
    for s, d in zip(src, dst):
        pred[idx[d]].append(idx[s])
    out = np.zeros(n)
    for v in range(n):
        seen = np.zeros(n, dtype=bool)
        seen[v] = True
        frontier = [v]
        depth = 0
        h = 0.0
        while frontier:
            depth += 1
            nxt = []
            for node in frontier:
                for p in pred[node]:
                    if not seen[p]:
                        seen[p] = True
                        h += 1.0 / depth
                        nxt.append(p)
            frontier = nxt
        out[v] = h
    return nodes, out


def harmonic_weighted_numpy(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Weighted-distance harmonic centrality (nx ``distance=`` parity):
    Dijkstra over incoming edges per target."""
    import heapq

    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    pred: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    for s, d, wt in zip(src, dst, w):
        pred[idx[d]].append((idx[s], float(wt)))
    out = np.zeros(n)
    for v in range(n):
        dist = {v: 0.0}
        heap = [(0.0, v)]
        h = 0.0
        while heap:
            du, u = heapq.heappop(heap)
            if du > dist.get(u, np.inf):
                continue
            if u != v:
                h += 1.0 / du
            for p, wt in pred[u]:
                nd = du + wt
                if nd < dist.get(p, np.inf):
                    dist[p] = nd
                    heapq.heappush(heap, (nd, p))
        out[v] = h
    return nodes, out


def harmonic_centrality(
    edges: DataFrame,
    collect_threshold: int = 20_000,
    max_hops: int = 10_000,
    weight_col: str | None = None,
) -> DataFrame:
    """(node_id, score) harmonic centrality on the dedup digraph.

    ``weight_col`` selects the reference's weighted variant
    (``harmonic_centrality_computer.py:19-38``, nx ``distance=`` attr):
    d(u, v) becomes the min-weight path length. Parallel (src, dst)
    edges dedup to the MINIMUM weight (deterministic; shortest paths
    only ever use the cheapest parallel edge).
    """
    if weight_col is not None:
        dedup = (
            edges.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
            .groupBy("src", "dst")
            .agg(F.min("w").alias("w"))
        )
    else:
        dedup = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    n_nodes = (
        dedup.select(F.col("src").alias("n"))
        .unionAll(dedup.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    if n_nodes == 0:
        return edges.sparkSession.createDataFrame([], _HC_SCHEMA)
    if n_nodes <= collect_threshold:
        def kernel(batches):
            chunks = [pdf for pdf in batches if len(pdf)]
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            if weight_col is not None:
                nodes, scores = harmonic_weighted_numpy(
                    pdf["src"].to_numpy(np.int64),
                    pdf["dst"].to_numpy(np.int64),
                    pdf["w"].to_numpy(np.float64),
                )
            else:
                nodes, scores = harmonic_numpy(
                    pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64)
                )
            yield pd.DataFrame({"node_id": nodes.astype(np.int64), "score": scores})

        return dedup.coalesce(1).mapInPandas(kernel, schema=_HC_SCHEMA)
    if weight_col is not None:
        return _harmonic_weighted_distributed(dedup, max_hops)
    return _harmonic_distributed(dedup, max_hops)


def _harmonic_weighted_distributed(dedup: DataFrame, max_hops: int) -> DataFrame:
    """Min-plus frontier supersteps (distributed Bellman-Ford over all
    targets at once): the dist table (target, node, dist) relaxes one
    hop per round via a join on reversed weighted edges; only IMPROVED
    rows re-enter the frontier, so rounds are bounded by the max hop
    count of any shortest path and work shrinks as distances settle."""
    dedup = dedup.persist()
    nodes = (
        dedup.select(F.col("src").alias("node_id"))
        .unionAll(dedup.select(F.col("dst").alias("node_id")))
        .distinct()
        .persist()
    )
    dist = nodes.select(
        F.col("node_id").alias("target"),
        F.col("node_id").alias("node"),
        F.lit(0.0).alias("dist"),
    ).localCheckpoint(eager=True)
    frontier = dist
    for _ in range(max_hops):
        cand = (
            frontier.join(dedup, frontier["node"] == dedup["dst"])
            .select(
                "target",
                F.col("src").alias("node"),
                (F.col("dist") + F.col("w")).alias("nd"),
            )
            .groupBy("target", "node")
            .agg(F.min("nd").alias("nd"))
        )
        improved = (
            cand.join(dist, ["target", "node"], "left")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("target", "node", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.withColumnRenamed("dist", "nd"),
                      ["target", "node"], "outer")
            .select(
                "target",
                "node",
                F.least(
                    F.coalesce(F.col("dist"), F.col("nd")),
                    F.coalesce(F.col("nd"), F.col("dist")),
                ).alias("dist"),
            )
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return (
        nodes.join(
            dist.filter(F.col("node") != F.col("target"))
            .groupBy(F.col("target").alias("node_id"))
            .agg(F.sum(1.0 / F.col("dist")).alias("s")),
            "node_id",
            "left",
        )
        .select("node_id", F.coalesce(F.col("s"), F.lit(0.0)).alias("score"))
    )


def _harmonic_distributed(dedup: DataFrame, max_hops: int) -> DataFrame:
    dedup = dedup.persist()
    nodes = (
        dedup.select(F.col("src").alias("node_id"))
        .unionAll(dedup.select(F.col("dst").alias("node_id")))
        .distinct()
        .persist()
    )
    # frontier/visited: (target, node) pairs reaching `target` in `depth` hops
    visited = nodes.select(
        F.col("node_id").alias("target"), F.col("node_id").alias("node")
    ).localCheckpoint(eager=True)
    frontier = visited
    scores = nodes.select("node_id", F.lit(0.0).alias("score")).localCheckpoint(
        eager=True
    )
    depth = 0
    while depth < max_hops:
        depth += 1
        expanded = (
            frontier.join(dedup, frontier["node"] == dedup["dst"])
            .select("target", F.col("src").alias("node"))
            .distinct()
        )
        frontier = expanded.join(visited, ["target", "node"], "left_anti").localCheckpoint(
            eager=True
        )
        if frontier.isEmpty():
            break
        gain = frontier.groupBy(F.col("target").alias("node_id")).agg(
            (F.count("*") / F.lit(float(depth))).alias("gain")
        )
        scores = (
            scores.join(gain, "node_id", "left")
            .select(
                "node_id",
                (F.col("score") + F.coalesce(F.col("gain"), F.lit(0.0))).alias("score"),
            )
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    return scores
