"""k-hop feature propagation (GCN-style mean aggregation).

The standard preprocessing step for graph ML over a link graph: each
node's hop-k feature is the mean of its neighbors' hop-(k-1) features,
``f_k(v) = avg_{u ~ v} f_{k-1}(u)`` over the undirected graph — exactly
one mean-aggregation GNN layer per hop, computed with plain DataFrame
joins so Catalyst keeps the whole layer in two-stage hash aggregation
(map-side partials collapse hub neighborhoods before the shuffle).

Scale shape: per hop one equi-join of the symmetric edge list against
the (node, feature) frame plus one groupBy-avg — both keyed on node
ids, no windows, no collects; the feature frame is node-bound (orders
of magnitude smaller than the edge list at link-graph densities), so
AQE broadcasts it when small and shuffles both sides otherwise. Hop
count is a constant, so plan depth is bounded.

No counterpart in the reference (it has no feature-propagation or
graph-ML preprocessing surface); this extends the §2.9 link-graph
toolkit toward training-data assembly for GNNs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def khop_feature_propagation(
    edges: DataFrame,
    features: DataFrame,
    hops: int = 2,
    id_col: str = "node_id",
    feature_col: str = "f",
) -> DataFrame:
    """Propagate a numeric node feature ``hops`` mean-aggregation layers.

    ``edges``: undirected pair list ``(src, dst)`` (each pair once).
    ``features``: one row per node, ``(id_col, feature_col)``.

    Returns ``(node_id, f0, f1, ..., f{hops})`` where ``f0`` is the
    input feature and ``f_k`` is NULL for nodes with no neighbors (SQL
    avg-over-empty semantics, identical across engines). Nodes absent
    from ``features`` contribute nothing (inner join per layer).
    """
    if hops < 1:
        raise ValueError("hops must be >= 1")
    # persisted: one consumer per hop — without this an expensive edge
    # source (the blocked cosine pair kernel) re-executes per layer
    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    out = features.select(
        F.col(id_col).alias("node_id"),
        F.col(feature_col).cast("double").alias("f0"),
    )
    for k in range(1, hops + 1):
        prev = f"f{k - 1}"
        layer = (
            sym.join(
                out.select(F.col("node_id").alias("dst"), F.col(prev).alias("_fv")),
                "dst",
            )
            .groupBy(F.col("src").alias("node_id"))
            .agg(F.avg("_fv").alias(f"f{k}"))
        )
        out = out.join(layer, "node_id", "left")
    return out
