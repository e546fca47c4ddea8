"""Near-duplicate clustering: pairs -> components -> canonical docs.

The end stage of a training-data dedup pipeline: given any near-dup
pair generator (n-gram Jaccard, MinHash-LSH, SimHash, embedding-LSH),
group transitively-connected documents into clusters and keep exactly
one canonical representative per cluster.

Scale shape: the pair set is tiny relative to the corpus (that is the
point of dedup), so the component labels computed over it are a small
dimension table — the corpus-wide join that attaches ``cluster`` /
``keep`` to every document is a broadcast join, never a corpus shuffle.
Component ids come from :func:`~..operators.components.connected_components`
(large-star/small-star, O(log n) rounds), whose label is the *minimum*
member id — so the canonical-doc rule "keep the smallest id" is simply
``doc_id == cluster``, with no extra aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.components import connected_components


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("doc_a", "doc_b"),
    broadcast_labels: bool = True,
) -> DataFrame:
    """(id_col, cluster, keep) for EVERY document.

    ``cluster`` is the minimum doc id of the near-dup component
    (singleton docs are their own cluster), ``keep`` is 1 for the one
    canonical doc per cluster and 0 for every shed duplicate.

    ``pairs`` is any (pair_cols[0], pair_cols[1]) near-dup pair frame;
    extra columns are ignored.
    """
    a, b = pair_cols
    edges = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    labels = connected_components(edges)  # (node_id, component), component = min id
    if broadcast_labels:
        labels = F.broadcast(labels)
    return (
        docs.select(F.col(id_col))
        .join(labels, docs[id_col] == labels["node_id"], "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("cluster"),
            (F.coalesce("component", F.col(id_col)) == F.col(id_col))
            .cast("int")
            .alias("keep"),
        )
    )
