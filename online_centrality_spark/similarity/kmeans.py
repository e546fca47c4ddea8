"""Distributed Lloyd k-means over an embedding column.

The MLlib-shaped plan: per iteration, ASSIGNMENT is a pure JVM
projection against the current centroids embedded as literals (zero
shuffle — `transform`/`zip_with`/`aggregate` fold each squared
distance left-to-right inside whole-stage codegen), and the MEAN
UPDATE is one map-side-combinable groupBy over ``(cluster, dim)``.
Only the k×dim centroid matrix ever reaches the driver — model-scale
state, never corpus-scale.

Determinism contract (what makes an exact cross-engine oracle
possible): seeds are the ``k`` lowest-id vectors; distances fold in
index order (bitwise-reproducible given equal centroids); argmin
breaks ties on the lowest cluster index; updated centroid coordinates
are rounded to ``round_decimals`` so the one place summation order is
engine-dependent (the mean) cannot leak ulp drift into the next
iteration; empty clusters keep their previous centroid.

``arrow=True`` swaps the assignment projection for an Arrow-batched
numpy matmul (same loop, same update rule) — faster per row at very
high dim, but its ``x·x − 2x·c + c·c`` expansion is not bitwise equal
to the folded form, so the oracle path keeps ``arrow=False``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _centroid_literal(centroids: list[list[float]]) -> str:
    """repr() round-trips float64 exactly, so the literal the next
    iteration folds over is bit-identical to the collected mean."""
    return (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in c) + ")"
            for c in centroids
        )
        + ")"
    )


def _assign_cols(centroids: list[list[float]], vec: str = "v"):
    dists = (
        f"transform({_centroid_literal(centroids)}, "
        f"c -> aggregate(zip_with(c, {vec}, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0 AS DOUBLE), (a, z) -> a + z))"
    )
    best = (
        f"aggregate(sequence(0, {len(centroids) - 1}), "
        f"struct(CAST('Infinity' AS DOUBLE) AS d, -1 AS c), "
        f"(acc, i) -> IF(_d[i] < acc.d, struct(_d[i] AS d, i AS c), acc))"
    )
    return F.expr(dists).alias("_d"), F.expr(best)


def _assign(pts: DataFrame, centroids, id_col: str, arrow: bool) -> DataFrame:
    """(id, cluster, sq_dist) under the current centroids."""
    if not arrow:
        d_col, best = _assign_cols(centroids)
        return (
            pts.select(id_col, "v", d_col)
            .withColumn("_b", best)
            .select(
                id_col,
                F.col("_b.c").alias("cluster"),
                F.col("_b.d").alias("sq_dist"),
            )
        )
    c = np.asarray(centroids, dtype=np.float64)
    b = pts.sparkSession.sparkContext.broadcast(c)

    def kernel(batches):
        cm = b.value
        cn = (cm * cm).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            d = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ cm.T) + cn[None, :]
            yield pd.DataFrame(
                {
                    "id": pdf.iloc[:, 0].to_numpy(np.int64),
                    "cluster": d.argmin(axis=1).astype(np.int32),
                    "sq_dist": d.min(axis=1),
                }
            )

    out = pts.select(id_col, "v").mapInPandas(
        kernel, schema=f"id long, cluster int, sq_dist double"
    )
    return out.withColumnRenamed("id", id_col)


def kmeans(
    items: DataFrame,
    k: int = 10,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 9,
    arrow: bool = False,
) -> DataFrame:
    """(id, cluster, sq_dist) after ``iters`` Lloyd assignments with
    ``iters - 1`` mean updates in between (the returned assignment is
    against the final centroids)."""
    pts = items.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).persist()
    centroids = _lloyd_centroids(pts, k, iters, id_col, arrow, round_decimals)
    result = _assign(pts, centroids, id_col, arrow).select(
        id_col, "cluster", F.round("sq_dist", 6).alias("sq_dist")
    )
    pts.unpersist()
    return result


def _lloyd_centroids(
    pts: DataFrame, k, iters, id_col, arrow, round_decimals
) -> list[list[float]]:
    """Final centroids after ``iters - 1`` mean updates (seeds = the
    ``k`` lowest-id vectors). Only the k×dim matrix reaches the driver."""
    seeds = pts.orderBy(id_col).limit(k).collect()
    centroids = [list(r["v"]) for r in seeds]
    for _ in range(iters - 1):
        assigned = _assign(pts, centroids, id_col, arrow)
        means = (
            assigned.join(pts, id_col)
            .select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new_c = [list(c) for c in centroids]
        for r in means:
            new_c[r["cluster"]][r["pos"]] = round(r["m"], round_decimals)
        centroids = new_c
    return centroids


def cluster_silhouette(
    items: DataFrame,
    k: int = 10,
    iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 9,
) -> DataFrame:
    """Per-cluster SIMPLIFIED silhouette over the Lloyd assignment —
    the cluster-quality diagnostic for the kmeans/SemDeDup stages.
    s(i) = (b - a) / max(a, b) with a = distance to the OWN final
    centroid and b = the nearest OTHER centroid (Hruschka et al.'s
    centroid-based variant: the O(n·k) form used at corpus scale,
    where the classic O(n²) pairwise silhouette is off the table).

    Returns ``(cluster, n, silhouette)``; silhouette near 1 = compact
    and isolated, near 0 = boundary-dwelling, negative = likely
    mis-assigned. Per-point terms are fixed double chains over the
    bitwise-reproducible distance folds; the per-cluster MEAN follows
    the scaled-int64 sum rule (round(s·1e12) summed exactly), so the
    answer is partitioning- and engine-independent.

    Scale shape: one scan-stage projection against the k×dim centroid
    literal (zero shuffle) + one map-side-combinable groupBy on the
    cluster id. Requires k >= 2 (b is undefined for a single cluster).
    """
    if k < 2:
        raise ValueError("cluster_silhouette requires k >= 2")
    pts = items.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).persist()
    centroids = _lloyd_centroids(pts, k, iters, id_col, False, round_decimals)
    d_col, best = _assign_cols(centroids)
    per = (
        pts.select(id_col, d_col)
        .withColumn("_b", best)
        .select(
            id_col,
            F.col("_b.c").alias("cluster"),
            F.sqrt(F.col("_b.d")).alias("a"),
            F.sqrt(
                F.expr(
                    "array_min(zip_with(_d, sequence(0, size(_d) - 1), "
                    "(x, i) -> IF(i = _b.c, CAST('Infinity' AS DOUBLE), x)))"
                )
            ).alias("b"),
        )
        .withColumn(
            "s",
            F.when(F.greatest("a", "b") == 0.0, F.lit(0.0)).otherwise(
                (F.col("b") - F.col("a")) / F.greatest("a", "b")
            ),
        )
    )
    out = (
        per.select("cluster", F.round(F.col("s") * 1e12).cast("long").alias("t"))
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n"),
            F.round((F.sum("t") / F.count("*")) / 1e12, 6).alias("silhouette"),
        )
    )
    pts.unpersist()
    return out


def _kmeans_ctes(
    k: int = 10, iters: int = 4, dim: int = 64, round_decimals: int = 9
) -> list[str]:
    """The unrolled Lloyd CTE chain (pts, c0, a1..a{iters}, c1..) —
    shared by :func:`kmeans_sql` and the SemDeDup oracle
    (:func:`..similarity.semdedup.semantic_dedup_sql`); the final
    assignment lives in ``a{iters}``."""
    dist = (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"j -> (p.v[j] - c.v[j]) * (p.v[j] - c.v[j])), (a, b) -> a + b)"
    )
    ctes = [
        "pts AS MATERIALIZED (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v "
        f"FROM pts ORDER BY vec_id LIMIT {k})",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"""a{t} AS MATERIALIZED (
  SELECT vec_id, cl, d FROM (
    SELECT vec_id, cl, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
    FROM (SELECT p.vec_id, c.cl, {dist} AS d
          FROM pts p CROSS JOIN c{t - 1} c)
  ) WHERE rn = 1
)"""
        )
        if t < iters:
            ctes.append(
                f"""c{t} AS MATERIALIZED (
  SELECT o.cl, CASE WHEN m.cl IS NULL THEN o.v ELSE m.v END AS v
  FROM c{t - 1} o LEFT JOIN (
    SELECT cl, list(mx ORDER BY j) AS v FROM (
      SELECT a.cl, u.j, round(avg(p.v[u.j]), {round_decimals}) AS mx
      FROM a{t} a JOIN pts p USING (vec_id), unnest(range(1, {dim + 1})) AS u(j)
      GROUP BY a.cl, u.j
    ) GROUP BY cl
  ) m ON o.cl = m.cl
)"""
            )
    return ctes


def kmeans_sql(
    k: int = 10, iters: int = 4, dim: int = 64, round_decimals: int = 9
) -> str:
    """Exact DuckDB twin: the same seeds/fold/tie-break/rounding rules,
    iterations unrolled into a MATERIALIZED CTE chain."""
    body = ",\n".join(_kmeans_ctes(k, iters, dim, round_decimals))
    return (
        f"WITH {body}\n"
        f"SELECT vec_id, CAST(cl AS INT) AS cluster, round(d, 6) AS sq_dist "
        f"FROM a{iters}"
    )


def silhouette_sql(
    k: int = 10, iters: int = 4, dim: int = 64, round_decimals: int = 9
) -> str:
    """Exact DuckDB twin of :func:`cluster_silhouette`: the shared
    unrolled-Lloyd CTE chain, then a = the rn-1 distance and b = the
    rn-2 distance per vec (ordered by (d, cl) — rn 2 is by construction
    the nearest OTHER cluster), the same per-row s-chain, and the same
    scaled-int64 mean."""
    ctes = _kmeans_ctes(k, iters, dim, round_decimals)
    dist = (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"j -> (p.v[j] - c.v[j]) * (p.v[j] - c.v[j])), (a, b) -> a + b)"
    )
    body = ",\n".join(ctes[: 2 + 2 * (iters - 1)])  # pts, c0 .. c{iters-1}
    return f"""WITH {body},
alld AS (
  SELECT p.vec_id, c.cl, {dist} AS d
  FROM pts p CROSS JOIN c{iters - 1} c
),
rk AS (
  SELECT vec_id, cl, d,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
  FROM alld
),
ab AS (
  SELECT r1.vec_id, r1.cl, sqrt(r1.d) AS a, sqrt(r2.d) AS b
  FROM (SELECT * FROM rk WHERE rn = 1) r1
  JOIN (SELECT * FROM rk WHERE rn = 2) r2 USING (vec_id)
),
s AS (
  SELECT cl,
         CAST(round(
           (CASE WHEN greatest(a, b) = 0 THEN 0.0
                 ELSE (b - a) / greatest(a, b) END) * 1e12
         ) AS BIGINT) AS t
  FROM ab
)
SELECT CAST(cl AS INT) AS cluster, count(*) AS n,
       round((sum(t) / count(*)) / 1e12, 6) AS silhouette
FROM s GROUP BY cl"""
