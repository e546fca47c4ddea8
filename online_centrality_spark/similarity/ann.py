"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k per query. Arrow-batched
  block matmul: the (normalized) item matrix broadcasts once; each
  Arrow batch of queries computes its similarity block with one numpy
  matmul and emits exactly k rows per query (argpartition + stable
  (score desc, id asc) tie order). No all-pairs shuffle — only k rows
  per query leave Python.

- ``lsh_topk``: random-hyperplane LSH as the scale path. Hyperplanes
  are deterministic (seeded from a fixed constant), broadcast as one
  (tables*planes, dim) matrix; bucket keys are sign-pattern integers
  computed with a single matmul per Arrow batch. Queries score only
  candidates sharing a bucket in >= 1 table; recall tunes with
  ``num_tables`` x ``num_planes``.

- ``ivf_topk``: inverted-file (coarse-quantizer) variant. Centroids are
  trained driver-side on a deterministic sample (seeded numpy Lloyd
  iterations — the trained model is tiny and broadcasts), items are
  assigned to their nearest cell with one Arrow matmul pass, and each
  query probes its ``n_probe`` nearest cells — candidate volume scales
  with ``n_probe / n_cells``, and ``n_probe == n_cells`` degrades
  gracefully to the exact search (tested equal to brute force).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("item_id", T.LongType(), False),
        T.StructField("cosine", T.DoubleType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)


def _matrix(df: DataFrame, id_col: str, vec_col: str):
    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy(np.int64)
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    return ids, mat


def _topk_rows(q_ids, sims, item_ids, k):
    """Top-k per row with (cosine desc, item_id asc) deterministic order."""
    out_q, out_i, out_c, out_r = [], [], [], []
    kk = min(k, sims.shape[1])
    for r in range(sims.shape[0]):
        row = sims[r]
        # full lexsort keeps the (cosine desc, id asc) tie order exact even
        # when equal scores straddle the k boundary
        order = np.lexsort((item_ids, -row))[:kk]
        out_q.extend([q_ids[r]] * len(order))
        out_i.extend(item_ids[order].tolist())
        out_c.extend(row[order].tolist())
        out_r.extend(range(1, len(order) + 1))
    return pd.DataFrame(
        {
            "query_id": np.array(out_q, np.int64),
            "item_id": np.array(out_i, np.int64),
            "cosine": out_c,
            "rank": np.array(out_r, np.int32),
        }
    )


def brute_force_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, item_id, cosine, rank) — exact top-k, self-match excluded."""
    spark = items.sparkSession
    item_ids, m = _matrix(items, id_col, vec_col)
    nrm = np.sqrt((m * m).sum(axis=1))
    b = spark.sparkContext.broadcast((item_ids, m, nrm))

    def kernel(batches):
        item_ids, m, nrm = b.value
        pos = {int(v): i for i, v in enumerate(item_ids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf[id_col].to_numpy(np.int64)
            qm = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            qn = np.sqrt((qm * qm).sum(axis=1))
            sims = (qm @ m.T) / (qn[:, None] * nrm[None, :])
            # exclude self-matches
            for r, qid in enumerate(q_ids):
                j = pos.get(int(qid))
                if j is not None:
                    sims[r, j] = -np.inf
            yield _topk_rows(q_ids, sims, item_ids, k)

    return queries.select(id_col, vec_col).mapInPandas(kernel, schema=_TOPK_SCHEMA)


def _hyperplanes(num: int, dim: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (fixed seed)."""
    rng = np.random.default_rng(0xC0FFEE)
    return rng.normal(size=(num, dim))


def _bucket_df(df: DataFrame, id_col, vec_col, planes, num_tables, num_planes, out_id):
    spark = df.sparkSession
    b_planes = spark.sparkContext.broadcast(planes)
    schema = T.StructType(
        [
            T.StructField(out_id, T.LongType(), False),
            T.StructField("table", T.IntegerType(), False),
            T.StructField("bucket", T.LongType(), False),
        ]
    )
    weights = (2 ** np.arange(num_planes)).astype(np.int64)

    def kernel(batches):
        hp = b_planes.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(np.int64)
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (m @ hp.T >= 0).astype(np.int64)  # (n, tables*planes)
            rows = []
            for t in range(num_tables):
                key = bits[:, t * num_planes : (t + 1) * num_planes] @ weights
                rows.append(
                    pd.DataFrame({out_id: ids, "table": np.int32(t), "bucket": key})
                )
            yield pd.concat(rows, ignore_index=True)

    return df.select(id_col, vec_col).mapInPandas(kernel, schema=schema)


def lsh_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 8,
    num_planes: int = 8,
) -> DataFrame:
    """(query_id, item_id, cosine, rank) — LSH-bucketed approximate top-k."""
    from pyspark.sql import Window

    from ..dedup.embedding import cosine_expr

    dim = len(items.select(vec_col).first()[0])
    planes = _hyperplanes(num_tables * num_planes, dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).persist()
    it = items.select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).cast("array<double>").alias("iv"),
    ).persist()
    qb = _bucket_df(
        queries, id_col, vec_col, planes, num_tables, num_planes, "query_id"
    )
    ib = _bucket_df(items, id_col, vec_col, planes, num_tables, num_planes, "item_id")
    cand = (
        qb.join(ib, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("item_id"))
        .select("query_id", "item_id")
        .distinct()
    )
    scored = (
        cand.join(q, "query_id")
        .join(it, "item_id")
        .select("query_id", "item_id", cosine_expr("qv", "iv").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def _train_centroids(
    items: DataFrame, id_col: str, vec_col: str, n_cells: int,
    sample_size: int, iters: int = 12,
) -> np.ndarray:
    """Seeded Lloyd iterations on a deterministic sample (lowest ids).

    Centroids are L2-normalized so nearest-centroid-by-dot == cosine
    assignment; empty cells re-seed from the farthest points.
    """
    sample = (
        items.select(id_col, vec_col).orderBy(id_col).limit(sample_size).toPandas()
    )
    x = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(0xC0FFEE)
    n_cells = min(n_cells, len(x))
    c = x[rng.choice(len(x), n_cells, replace=False)]
    for _ in range(iters):
        assign = (x @ c.T).argmax(axis=1)
        for j in range(n_cells):
            members = x[assign == j]
            if len(members):
                v = members.sum(axis=0)
                c[j] = v / max(np.linalg.norm(v), 1e-12)
            else:
                # re-seed an empty cell from the worst-covered point
                worst = (x @ c.T).max(axis=1).argmin()
                c[j] = x[worst]
    return c


def ivf_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 64,
    n_probe: int = 8,
    sample_size: int = 100_000,
) -> DataFrame:
    """(query_id, item_id, cosine, rank) — IVF approximate top-k.

    Plan: broadcast the (n_cells, dim) centroid matrix; one Arrow pass
    assigns every item to its nearest cell, one Arrow pass gives every
    query its ``n_probe`` nearest cells (exploded); the candidate join
    on ``cell`` shuffles only the probed fraction, candidates are
    scored with the Arrow cosine kernel and ranked per query.
    """
    from pyspark.sql import Window

    spark = items.sparkSession
    centroids = _train_centroids(items, id_col, vec_col, n_cells, sample_size)
    n_cells = len(centroids)
    n_probe = min(n_probe, n_cells)
    b_c = spark.sparkContext.broadcast(centroids)

    def assign_kernel(batches):
        c = b_c.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col].to_numpy(np.int64),
                    "cell": (m @ c.T).argmax(axis=1).astype(np.int32),
                }
            )

    def probe_kernel(batches):
        c = b_c.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ c.T
            # deterministic probe order: (sim desc, cell asc)
            cells = np.lexsort(
                (np.broadcast_to(np.arange(sims.shape[1]), sims.shape), -sims),
                axis=1,
            )[:, :n_probe]
            q_ids = pdf[id_col].to_numpy(np.int64)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n_probe),
                    "cell": cells.ravel().astype(np.int32),
                }
            )

    assigned = items.select(id_col, vec_col).mapInPandas(
        assign_kernel, schema="item_id long, cell int"
    )
    probes = queries.select(id_col, vec_col).mapInPandas(
        probe_kernel, schema="query_id long, cell int"
    )
    it = items.select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).cast("array<double>").alias("iv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    cand = (
        probes.join(assigned, "cell")
        .filter(F.col("query_id") != F.col("item_id"))
        .select("query_id", "item_id")
        .distinct()
    )
    paired = cand.join(q, "query_id").join(it, "item_id")

    @F.pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        a = np.stack(va.to_numpy())
        b = np.stack(vb.to_numpy())
        num = np.einsum("ij,ij->i", a, b)
        den = np.sqrt(np.einsum("ij,ij->i", a, a) * np.einsum("ij,ij->i", b, b))
        return pd.Series(num / den)

    scored = paired.select("query_id", "item_id", _cos("qv", "iv").alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def mutual_knn_graph(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 8,
    candidates: str = "exact",
    min_cosine: float | None = None,
    num_tables: int = 64,
    num_planes: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """``(a, b, cosine)`` — the mutual k-nearest-neighbor graph: an
    edge survives iff a is in b's top-k AND b is in a's top-k (by
    rounded cosine, id-ascending tiebreak). The standard graph
    construction for density-based clustering — mutuality prunes the
    hub edges that plain kNN graphs accumulate.

    ``min_cosine`` restricts the RANKED pair universe to rounded
    cosine >= min_cosine (mutual top-k within the near-dup candidate
    regime — the dedup-clustering use of this graph).

    ``candidates="exact"`` (the oracle path) scores every pair through
    the blocked distributed source (threshold −1 ⇒ all pairs, no
    driver collect / matrix broadcast) — inherently O(n²·d) compute.
    ``candidates="lsh"`` is the corpus-scale path (VERDICT r04
    next-round #4): candidate pairs come from the deterministic
    hyperplane-LSH buckets (:func:`~online_centrality_spark.dedup.
    embedding.embedding_near_dups_lsh`), so NO all-pairs stage exists
    in the plan (pinned by tests/test_plan_shapes.py); per-node top-k
    then runs over the node's LSH candidate list. LSH mode REQUIRES
    ``min_cosine``: hyperplane collision probability decays toward
    uninformative at low cosine, so recall toward unrestricted top-k
    (which on diffuse embeddings ranks pairs down to cosine ~0.25)
    cannot be bounded — exactly the regime the exact path exists for.
    Above the floor the measured envelope applies: at the 0.4 floor,
    64×4 tables give recall 1.0 on every SF fixture (24×4 was measured
    at 0.987 at sf0.1 — 12 of 920 pairs missed — so the default is the
    table count with VERIFIED exact recall, per-pair miss < 2e-5); the
    fixture suite and tools/sf01_invariants.py assert the LSH graph
    EQUALS the exact ``min_cosine`` graph, so the driver oracle is
    shared between both paths.

    Per-node top-k is a window over the node's OWN candidate list.
    Ranking uses the 6-ROUNDED cosine (filter applied on the SAME
    rounded value) so the boundary decision is engine-identical.
    """
    from pyspark.sql import Window

    if candidates == "exact":
        from online_centrality_spark.dedup.embedding import (
            embedding_near_dups_blocked,
        )

        src = embedding_near_dups_blocked(
            embeddings, id_col=id_col, vec_col=vec_col,
            threshold=-1.0, num_blocks=num_blocks,
        )
    elif candidates == "lsh":
        if min_cosine is None:
            raise ValueError(
                "candidates='lsh' requires min_cosine: hyperplane-LSH "
                "recall is unbounded for low-cosine neighbors, so "
                "unrestricted mutual top-k needs the exact path"
            )
        from online_centrality_spark.dedup.embedding import (
            embedding_near_dups_lsh,
        )

        # pre-filter eps below the floor; the authoritative boundary
        # decision is the rounded filter below, same as the exact path
        src = embedding_near_dups_lsh(
            embeddings, id_col=id_col, vec_col=vec_col,
            threshold=min_cosine - 1e-6, num_tables=num_tables,
            num_planes=num_planes, max_bucket_size=max_bucket_size,
        )
    else:
        raise ValueError(
            f"candidates must be 'exact' or 'lsh', got {candidates!r}"
        )
    pairs = src.select(
        F.col("doc_a").alias("u"),
        F.col("doc_b").alias("v"),
        F.round("cosine", 6).alias("c"),
    )
    if min_cosine is not None:
        pairs = pairs.filter(F.col("c") >= min_cosine)
    # one-pass symmetrization: a union of two reads would execute the
    # whole candidate pipeline (blocked matmuls / LSH bucket join +
    # verify) TWICE — explode each undirected pair into its two
    # directions inside the same scan instead
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v"), F.col("c")),
                F.struct(
                    F.col("v").alias("u"), F.col("u").alias("v"), F.col("c")
                ),
            )
        ).alias("e")
    ).select("e.u", "e.v", "e.c")
    w = Window.partitionBy("u").orderBy(F.col("c").desc(), F.col("v").asc())
    knn = (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("u", "v", "c")
        .persist()
    )
    rev = knn.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return (
        knn.join(rev, ["u", "v"], "left_semi")
        .filter(F.col("u") < F.col("v"))
        .select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("c").alias("cosine"))
    )
