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


def harmonic_centrality(
    edges: DataFrame, collect_threshold: int = 20_000, max_hops: int = 10_000
) -> DataFrame:
    """(node_id, score) harmonic centrality on the dedup digraph."""
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
            nodes, scores = harmonic_numpy(
                pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64)
            )
            yield pd.DataFrame({"node_id": nodes.astype(np.int64), "score": scores})

        return dedup.coalesce(1).mapInPandas(kernel, schema=_HC_SCHEMA)
    return _harmonic_distributed(dedup, max_hops)


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
