"""Embedding-cosine near-duplicate detection.

Three physical strategies:

- ``embedding_near_dups_blocked`` (exact, distributed — the default for
  the query surface): rows hash into ``num_blocks`` blocks; each of the
  B(B+1)/2 block pairs is scored by ONE Arrow task with a numpy matmul.
  No driver collect, no full-matrix broadcast — shuffle volume is B x
  input (each row replicated to the B block pairs containing its
  block), task memory is two blocks (2·(n/B)·dim doubles). At 100 TB
  pick B ≈ n·dim·8B / (task budget); work stays O(n²d) in BLAS but
  spread over B(B+1)/2 independent tasks.

- ``embedding_near_dups`` (all-pairs, driver-staged): the item matrix is
  normalized once and broadcast; each Arrow batch of query rows computes
  its similarity block with one numpy matmul. Kept as the small-input
  library twin (its ``toPandas`` + broadcast caps it at what one
  executor holds) — the query surface uses the blocked path.

- ``embedding_near_dups_lsh``: hyperplane-LSH candidates + exact-cosine
  verify — the sub-quadratic path when the threshold is high enough
  that bucket recall holds.

- ``cosine_expr``: JVM ``zip_with``/``aggregate`` column expression for
  scoring small candidate-pair sets inline without Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_expr(a: str, b: str) -> Column:
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({a}, 0.0D, (acc, v) -> acc + v * v))"
    nb = f"sqrt(aggregate({b}, 0.0D, (acc, v) -> acc + v * v))"
    return F.expr(f"({dot}) / (({na}) * ({nb}))")


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.LongType(), False),
        T.StructField("doc_b", T.LongType(), False),
        T.StructField("cosine", T.DoubleType(), False),
    ]
)


def _collect_matrix(
    embeddings: DataFrame, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    pdf = embeddings.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy(np.int64)
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    return ids, mat


def embedding_near_dups(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """(doc_a, doc_b, cosine) pairs with cosine >= threshold, a < b.

    Dot products run in float64 in index order (numpy matmul), matching
    a sequential-sum oracle to ~1e-15.
    """
    spark = embeddings.sparkSession
    ids, mat = _collect_matrix(embeddings, id_col, vec_col)
    norms = np.sqrt((mat * mat).sum(axis=1))
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def kernel(batches):
        all_ids = b_ids.value
        m = b_mat.value
        nrm = b_norms.value
        pos = {int(v): i for i, v in enumerate(all_ids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_col].to_numpy(np.int64)
            rows = np.array([pos[int(i)] for i in q_ids])
            sims = (m[rows] @ m.T) / (nrm[rows][:, None] * nrm[None, :])
            qi, ij = np.nonzero(
                (sims >= threshold) & (q_ids[:, None] < all_ids[None, :])
            )
            if len(qi):
                yield pd.DataFrame(
                    {
                        "doc_a": q_ids[qi],
                        "doc_b": all_ids[ij],
                        "cosine": sims[qi, ij],
                    }
                )

    return embeddings.select(id_col).mapInPandas(kernel, schema=_PAIR_SCHEMA)


def embedding_near_dups_blocked(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_blocks: int = 8,
) -> DataFrame:
    """(doc_a, doc_b, cosine) pairs with cosine >= threshold, a < b —
    exact all-pairs semantics with a fully distributed physical plan.

    Rows are hashed into ``num_blocks`` blocks (xxhash64 of the id, so
    skew-free regardless of id distribution); every block pair
    (bi <= bj) becomes one ``applyInPandas`` group that scores the cross
    block with a single float64 numpy matmul and emits only surviving
    pairs.  Unlike :func:`embedding_near_dups` nothing is collected to
    the driver and no full matrix is broadcast: the embeddings frame is
    exploded B ways (each row joins the B pairs containing its block),
    shuffled once on (bi, bj), and reduced task-side.  Dot products are
    the same float64 BLAS matmul over the same full-length vectors as
    the all-pairs twin; the pair SET is identical and values agree to
    1 ulp (BLAS kernel choice varies with block shape), which is exact
    after the query surface's round(·, 6) (pinned by
    ``tests/test_pipeline_ops.py``).
    """
    B = int(num_blocks)
    v = embeddings.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_blk", F.pmod(F.xxhash64(F.col("_id")), F.lit(B)).cast("int"))
    rep = v.withColumn(
        "_other", F.explode(F.sequence(F.lit(0), F.lit(B - 1)))
    ).select(
        F.least("_blk", "_other").alias("_bi"),
        F.greatest("_blk", "_other").alias("_bj"),
        "_id",
        "_blk",
        "_v",
    )

    def score_block_pair(key, pdf):
        bi, bj = int(key[0]), int(key[1])
        ids = pdf["_id"].to_numpy(np.int64)
        mat = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        if bi == bj:
            a_idx = np.arange(len(pdf))
            b_idx = a_idx
        else:
            blk = pdf["_blk"].to_numpy()
            a_idx = np.nonzero(blk == bi)[0]
            b_idx = np.nonzero(blk == bj)[0]
        if len(a_idx) == 0 or len(b_idx) == 0:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "cosine": []})
        a = mat[a_idx]
        b = mat[b_idx]
        na = np.sqrt((a * a).sum(axis=1))
        nb = np.sqrt((b * b).sum(axis=1))
        sims = (a @ b.T) / (na[:, None] * nb[None, :])
        ida = ids[a_idx]
        idb = ids[b_idx]
        if bi == bj:
            # triangular: each unordered pair appears once
            mask = (sims >= threshold) & (ida[:, None] < idb[None, :])
        else:
            # cross block: every (row-in-bi, row-in-bj) pair appears
            # exactly once here; orient by id below
            mask = sims >= threshold
        ia, jb = np.nonzero(mask)
        lo = np.minimum(ida[ia], idb[jb])
        hi = np.maximum(ida[ia], idb[jb])
        return pd.DataFrame({"doc_a": lo, "doc_b": hi, "cosine": sims[ia, jb]})

    return rep.groupBy("_bi", "_bj").applyInPandas(
        score_block_pair, schema=_PAIR_SCHEMA
    )


def embedding_near_dups_lsh(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_tables: int = 16,
    num_planes: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, cosine) near-dup pairs via hyperplane LSH — the
    100 TB path: no broadcast of the full matrix, no all-pairs block.

    Candidates come from random-hyperplane buckets (the same
    deterministic planes as ``similarity.ann.lsh_topk``): two vectors
    collide in a table with probability ``(1 - theta/pi)^num_planes``,
    so recall tunes with ``num_tables x num_planes``; candidates are
    verified JVM-side with :func:`cosine_expr` and the threshold applied
    on the exact cosine — precision is always 1.0 and only bucket-mates
    are ever scored.  ``max_bucket_size`` drops degenerate hub buckets
    (quadratic fan-out) like the MinHash-LSH candidate generator.

    Physical plan: one Arrow pass to bucket (emits ``num_tables`` rows
    per vector), a bucket self-join (shuffle on (table, bucket)),
    dedup, and a verify join — every step partition-parallel.
    """
    from ..similarity.ann import _bucket_df, _hyperplanes

    dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(num_tables * num_planes, dim)
    b = _bucket_df(
        embeddings, id_col, vec_col, planes, num_tables, num_planes, "doc"
    )
    if max_bucket_size is not None:
        sizes = b.groupBy("table", "bucket").agg(F.count("*").alias("_n"))
        b = (
            b.join(sizes, ["table", "bucket"])
            .filter(F.col("_n") <= max_bucket_size)
            .drop("_n")
        )
    b2 = (
        b.withColumnRenamed("doc", "doc_b")
        .withColumnRenamed("table", "t2")
        .withColumnRenamed("bucket", "k2")
    )
    cand = (
        b.join(
            b2,
            (F.col("table") == F.col("t2"))
            & (F.col("bucket") == F.col("k2"))
            & (F.col("doc") < F.col("doc_b")),
        )
        .select(F.col("doc").alias("doc_a"), "doc_b")
        .distinct()
    )
    v = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    paired = cand.join(
        v.withColumnRenamed("_id", "doc_a").withColumnRenamed("_v", "va"), "doc_a"
    ).join(
        v.withColumnRenamed("_id", "doc_b").withColumnRenamed("_v", "vb"), "doc_b"
    )
    # bulk verify with an Arrow-batched kernel: the JVM lambda-chain
    # (aggregate/zip_with) evaluates ~3*dim interpreted steps per row —
    # fine for small candidate sets, slow for millions
    @F.pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        a = np.stack(va.to_numpy())
        b = np.stack(vb.to_numpy())
        num = np.einsum("ij,ij->i", a, b)
        den = np.sqrt(np.einsum("ij,ij->i", a, a) * np.einsum("ij,ij->i", b, b))
        return pd.Series(num / den)

    return (
        paired.select("doc_a", "doc_b", _cos("va", "vb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
