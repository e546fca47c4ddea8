"""SemDeDup-style semantic deduplication: cluster, then prune within.

The corpus-scale recipe for embedding-level near-duplicate removal
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"): k-means the embedding space, then
run exact all-pairs cosine ONLY inside each cluster and drop every
document that has a higher-priority near-duplicate cluster-mate. The
quadratic stage is bounded at O(n^2/k) pair evaluations — at 100 TB,
k grows with the corpus (k ~ n / target_cluster_size) so per-cluster
work stays constant while the assignment stage stays an embarrassingly
parallel zero-shuffle projection (:func:`..similarity.kmeans.kmeans`).

Determinism contract (exact cross-engine oracle):

- cluster assignments come from the deterministic Lloyd kernel
  (seeded on the k lowest ids, index-order folds, rounded means);
- the near-dup test is ``round(cosine, 6) >= threshold`` with the
  cosine folded in index order (`cosine_expr`), the same rounded-edge
  rule the similarity-graph family uses;
- the keep rule is greedy by id: a document is DROPPED iff some
  lower-id member of its cluster is ``>= threshold`` similar, and its
  ``dup_of`` is the LOWEST such id (-1 for kept rows). Every kept
  document is therefore the local id-minimum of its within-cluster
  epsilon-neighborhood — no transitive closure, no iteration, one
  self-join plus one min-aggregate.

Spark plan: one shuffle keys the cluster self-join (AQE handles a
skewed giant cluster), the pair filter runs inside whole-stage codegen
(JVM `zip_with`/`aggregate` fold — no Python in the hot path), and the
drop list is a map-side-combinable min-groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.embedding import cosine_expr
from .kmeans import _kmeans_ctes, kmeans


def semantic_dedup(
    items: DataFrame,
    k: int = 10,
    iters: int = 4,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, keep, dup_of) — SemDeDup decision per document.

    ``keep`` is false iff a lower-id cluster-mate has rounded cosine
    >= ``threshold``; ``dup_of`` is the lowest such id (-1 when kept).
    """
    assign = kmeans(items, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    pts = items.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    )
    mem = assign.select(id_col, "cluster").join(pts, id_col).persist()

    a = mem.select(
        F.col(id_col).alias("_lo"), F.col("cluster"), F.col("_v").alias("_va")
    )
    b = mem.select(
        F.col(id_col).alias("_hi"), F.col("cluster"), F.col("_v").alias("_vb")
    )
    drops = (
        a.join(b, "cluster")
        .filter(F.col("_lo") < F.col("_hi"))
        .filter(F.round(cosine_expr("_va", "_vb"), 6) >= threshold)
        .groupBy("_hi")
        .agg(F.min("_lo").alias("_dup"))
    )
    out = (
        mem.join(drops, mem[id_col] == drops["_hi"], "left")
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.col("_dup").isNull().alias("keep"),
            F.coalesce(F.col("_dup"), F.lit(-1)).cast("long").alias("dup_of"),
        )
    )
    mem.unpersist()
    return out


def semantic_dedup_sql(
    k: int = 10,
    iters: int = 4,
    dim: int = 64,
    threshold: float = 0.4,
    round_decimals: int = 9,
) -> str:
    """Exact DuckDB twin: the unrolled k-means CTE chain (shared with
    :func:`..similarity.kmeans.kmeans_sql`) + a within-cluster pair
    join on ``round(list_cosine_similarity, 6) >= threshold`` and the
    min-id drop rule."""
    ctes = _kmeans_ctes(k=k, iters=iters, dim=dim, round_decimals=round_decimals)
    ctes.append(
        f"""mem AS MATERIALIZED (
  SELECT a.vec_id, a.cl, p.v FROM a{iters} a JOIN pts p USING (vec_id)
)"""
    )
    ctes.append(
        f"""drops AS (
  SELECT x.vec_id AS hi, min(y.vec_id) AS dup_of
  FROM mem x JOIN mem y ON x.cl = y.cl AND y.vec_id < x.vec_id
  WHERE round(list_cosine_similarity(x.v, y.v), 6) >= {threshold}
  GROUP BY x.vec_id
)"""
    )
    body = ",\n".join(ctes)
    return (
        f"WITH {body}\n"
        f"SELECT m.vec_id, CAST(m.cl AS INT) AS cluster,\n"
        f"       (d.dup_of IS NULL) AS keep,\n"
        f"       CAST(coalesce(d.dup_of, -1) AS BIGINT) AS dup_of\n"
        f"FROM mem m LEFT JOIN drops d ON m.vec_id = d.hi"
    )
