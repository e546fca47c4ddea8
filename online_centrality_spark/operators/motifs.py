"""Temporal motif counts (Paranjape-style δ-bounded ordered motifs).

North-rule link-graph extension over the timestamped interaction edge
stream: counts, per initiating node, the δ-temporal 2-paths (wedges
``u -> v -> w``, ``w != u``) and 3-cycles (triangles ``u -> v -> w -> u``)
whose edge timestamps strictly increase and fit inside a ``delta``
window measured from the first edge.

Scale shape: a naive self-join on the shared node explodes when the
node-id key is low-cardinality or skewed (hub actors). Every join here
is therefore keyed on ``(node, time_bucket)`` with bucket width
``delta``: an edge at time ``t1`` only ever matches successors in
bucket ``floor(t1/δ)`` or the next one, so the probe side is exploded
into exactly those two candidate buckets and the join key carries the
time dimension — bounded fan-out per key, and hub activity spread over
the timeline parallelizes instead of landing in one task. The final
counts are one map-side-combinable ``groupBy`` each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_bucket(df: DataFrame, t_col: str, delta_us: int, out: str) -> DataFrame:
    # integer division: double-divide-then-cast is exact only below 2^53;
    # a misbucketed generic int64 timestamp would silently DROP motifs
    # (the exact time filter runs after the bucket join)
    return df.withColumn(out, F.expr(f"{t_col} div {delta_us}"))


def temporal_motifs(tedges: DataFrame, delta_us: int) -> DataFrame:
    """(node_id, n_wedges, n_triangles) over timestamped edges
    ``(src, dst, t)`` kept with multiplicity.

    A wedge is ``(e1: u->v, e2: v->w)`` with ``t1 < t2 <= t1 + delta``
    and ``w != u``; a triangle additionally closes with
    ``(e3: w->u)``, ``t2 < t3 <= t1 + delta``. Counts attach to the
    initiator ``u``; nodes that start no motif are omitted (join the
    node dictionary for a dense frame).

    ``tedges`` is consumed by three join branches and the wedge set by
    two, so both are persisted — without this the upstream induction
    would be re-executed per branch (verified via ``.explain``).
    """
    e = tedges.select("src", "dst", "t").persist()
    e2 = _with_bucket(
        e.select(
            F.col("src").alias("v2"), F.col("dst").alias("w2"), F.col("t").alias("t2")
        ),
        "t2", delta_us, "b2",
    )
    # e1 probes buckets floor(t1/δ) and floor(t1/δ)+1 — the only places
    # a successor within (t1, t1+δ] can live
    e1x = (
        _with_bucket(
            e.select(
                F.col("src").alias("u"), F.col("dst").alias("v"), F.col("t").alias("t1")
            ),
            "t1", delta_us, "b1",
        )
        .withColumn("cb", F.explode(F.array(F.col("b1"), F.col("b1") + 1)))
    )
    wedges = (
        e1x.join(e2, (e1x["v"] == e2["v2"]) & (e1x["cb"] == e2["b2"]))
        .filter(
            (F.col("t2") > F.col("t1"))
            & (F.col("t2") <= F.col("t1") + F.lit(delta_us))
            & (F.col("w2") != F.col("u"))
        )
        .select("u", "v", F.col("w2").alias("w"), "t1", "t2", "b1")
        .persist()
    )
    n_wedges = wedges.groupBy(F.col("u").alias("node_id")).agg(
        F.count("*").alias("n_wedges")
    )
    e3 = _with_bucket(
        e.select(
            F.col("src").alias("w3"), F.col("dst").alias("u3"), F.col("t").alias("t3")
        ),
        "t3", delta_us, "b3",
    )
    wx = wedges.withColumn("cb", F.explode(F.array(F.col("b1"), F.col("b1") + 1)))
    tris = (
        wx.join(
            e3,
            (wx["w"] == e3["w3"]) & (wx["u"] == e3["u3"]) & (wx["cb"] == e3["b3"]),
        )
        .filter(
            (F.col("t3") > F.col("t2"))
            & (F.col("t3") <= F.col("t1") + F.lit(delta_us))
        )
        .groupBy(F.col("u").alias("node_id"))
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        n_wedges.join(tris, "node_id", "left")
        .select(
            "node_id",
            "n_wedges",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )
