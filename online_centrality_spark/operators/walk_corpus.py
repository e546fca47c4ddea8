"""Deterministic random-walk corpus generation (node2vec/DeepWalk input).

Training-data-pipeline extension: materializes fixed-length random
walks over the link graph as the (walk_id, step, node_id) long table a
skip-gram embedding trainer consumes. Walk choices are DETERMINISTIC —
neighbor picked by an engine-portable md5 hash of (walk id, step,
seed) mod out-degree — so reruns, resumed jobs, and the DuckDB oracle
all see the identical corpus (same philosophy as ``hash_sample``:
reproducibility beats true randomness in a data pipeline).

Scale shape: the adjacency gets a per-source neighbor index once via
``per_key_rank`` (range-partitioned two-phase rank — a hub's adjacency
spreads across partitions and only boundary-straddling sources are
stitched, so NO single task ever sorts a whole hub's neighbor list);
each step is then ONE equi-join of the walk frontier against that
indexed adjacency on ``(node, pick)``, so 10^9 concurrent walks are
just a partitioned join per step, no per-row Python anywhere. Dead-end
nodes terminate their walk (the standard DeepWalk rule). Hub skew: the
frontier key is the CURRENT node, and each walk contributes exactly
one row per step, so fan-out per key is walk-count-bounded, not
degree-bounded; AQE's skew-join split handles hot hubs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.common import portable_hash
from ..sources.edges import per_key_rank


def random_walks(
    edges: DataFrame,
    walk_length: int = 8,
    seed: int = 0,
    directed: bool = True,
) -> DataFrame:
    """(walk_id, step, node_id) — one walk per graph node, ``step`` in
    ``[0, walk_length]``, ``walk_id`` = the start node's id.

    Step rule: from node ``v`` at step ``s`` the walk moves to the
    neighbor with index ``md5(walk_id:s:seed) mod outdeg(v)`` in the
    dst-sorted adjacency of ``v``; if ``v`` has no out-neighbors the
    walk ends there.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    if not directed:
        e = e.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    adj = per_key_rank(e, ["src"], ["dst"], rank_col="idx").persist()
    # pinned once: every step joins the frontier against this small
    # (node, outdeg) dimension — without the checkpoint each of the
    # walk_length step jobs would re-aggregate the adjacency
    outdeg = (
        adj.groupBy("src")
        .agg(F.count("*").alias("od"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionAll(e.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    cur = nodes.select(
        F.col("node_id").alias("walk_id"),
        F.lit(0).cast("long").alias("step"),
        F.col("node_id"),
    ).localCheckpoint(eager=True)
    out = cur
    for s in range(1, walk_length + 1):
        pick = F.pmod(
            portable_hash(
                F.concat_ws(":", F.col("walk_id"), F.lit(s), F.lit(seed))
            ),
            F.col("od"),
        )
        nxt = (
            cur.join(outdeg, cur["node_id"] == outdeg["src"])
            .select("walk_id", F.col("node_id").alias("v"), pick.alias("pick"))
            .join(adj, (F.col("v") == adj["src"]) & (F.col("pick") == adj["idx"]))
            .select(
                "walk_id",
                F.lit(s).cast("long").alias("step"),
                F.col("dst").alias("node_id"),
            )
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        out = out.unionAll(nxt)
        cur = nxt
    return out


def weighted_random_walks(
    edges: DataFrame,
    weight_col: str = "w",
    walk_length: int = 8,
    seed: int = 0,
) -> DataFrame:
    """(walk_id, step, node_id) — random-walk corpus with transition
    probability PROPORTIONAL TO EDGE WEIGHT (the node2vec-style biased
    input for embedding training on weighted interaction graphs); one
    walk per graph node, ``walk_id`` = the start node.

    Step rule — the Efraimidis–Spirakis one-winner trick (shared key
    convention with ``text/packing.py: weighted_sample``): every
    out-edge of the walker's node gets key ``ln(u) / w`` with ``u`` a
    deterministic md5-uniform of ``walk_id:step:dst:seed``, and the
    LARGEST key wins — P(dst) ∝ w exactly, with NO cumulative-weight
    prefix sums and no per-node weight indexes. Each step is one
    frontier⋈adjacency join plus a per-walker top-1 window (partition
    size = the walker node's out-degree — the same bound as the LPA
    vote window); ties break to the smaller dst. Deterministic across
    engines, reruns, and partitionings; multi-edges fold into the
    weight by summation, non-positive weights are excluded.
    """
    from ..text.packing import SAMPLE_MOD

    adj = (
        edges.select("src", "dst", F.col(weight_col).alias("w"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") > 0)
        .persist()
    )
    nodes = (
        adj.select(F.col("src").alias("node_id"))
        .unionAll(adj.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    cur = nodes.select(
        F.col("node_id").alias("walk_id"),
        F.lit(0).cast("long").alias("step"),
        F.col("node_id"),
    ).localCheckpoint(eager=True)
    out = cur
    for s in range(1, walk_length + 1):
        u = (
            F.pmod(
                portable_hash(
                    F.concat_ws(
                        ":", F.col("walk_id"), F.lit(s), F.col("dst"),
                        F.lit(seed),
                    )
                ),
                F.lit(SAMPLE_MOD),
            )
            + 1
        ) / F.lit(float(SAMPLE_MOD + 1))
        w = Window.partitionBy("walk_id").orderBy(
            (F.log(u) / F.col("w")).desc(), F.col("dst").asc()
        )
        nxt = (
            cur.join(adj, cur["node_id"] == adj["src"])
            .select("walk_id", "dst", "w")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "walk_id",
                F.lit(s).cast("long").alias("step"),
                F.col("dst").alias("node_id"),
            )
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        out = out.unionAll(nxt)
        cur = nxt
    return out


def walk_cooccurrence(
    walks: DataFrame, window: int = 2, min_count: int = 1
) -> DataFrame:
    """(a, b, n_cooc) — skip-gram co-occurrence counts over a walk
    corpus: every UNORDERED node pair appearing within ``window`` steps
    of each other on the same walk, counted over all walks.

    This is the context-pair extraction a DeepWalk/node2vec trainer
    consumes (the "positive pairs" of the skip-gram objective)
    materialized as a weighted co-occurrence graph. Pairs where both
    positions hold the same node (a self-transition through a cycle)
    are kept under key (a==b) — the trainer convention: the window is
    positional, not identity-based.

    Scale shape: one equi-self-join on ``walk_id`` with the window
    predicate — fan-out per walk row is at most ``window`` (walk length
    bounds the join, never graph size or degree), then one map-side
    combinable groupBy on the pair key. Walk corpora are generated with
    walk-count ∝ nodes, so the pair table is O(n·L·window) rows before
    the combine — linear in corpus size.
    """
    left = walks.select(
        "walk_id", F.col("step").alias("i"), F.col("node_id").alias("u")
    )
    right = walks.select(
        "walk_id", F.col("step").alias("j"), F.col("node_id").alias("v")
    )
    pairs = left.join(right, "walk_id").filter(
        (F.col("j") > F.col("i")) & (F.col("j") <= F.col("i") + window)
    )
    counts = (
        pairs.select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_cooc"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("n_cooc") >= min_count)
    return counts
