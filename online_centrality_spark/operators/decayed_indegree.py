"""Decayed indegree (online) as incremental DataFrame state + aggregation.

Reference semantics (``decayed_indegree_computer.py:36-87``, with the
``batch_score_part=""`` path — the only one exercised by the shipped
experiments, ``CentralityScoreComputer.py:140-143``; the other path hits
an undefined-name bug in the reference and is dead code):

At snapshot read-out time T, the score of every ever-active node v is

    score(v, T) = sum over *distinct* in-edges (w, v) seen so far
                  of weight(T - last_activation(w, v))

where last_activation of an edge is the last time it appeared. Unlike
Temporal Katz this is order-free — a pure aggregation over per-edge
state — so it is fully distributed: edge state is a DataFrame
``(src, dst, last_key)`` merged per superstep (groupBy max), and read-out
is one groupBy-sum with the decay as a JVM column expression (no Python
in the hot path). Hub skew on ``dst`` is handled by Spark's two-stage
(partial) aggregation + AQE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.weights import Weighter


class DecayedIndegree:
    measure = "did"

    def __init__(self, params: list[Weighter], spark, checkpoint_every: int = 8):
        self.params = params
        self.spark = spark
        self.checkpoint_every = checkpoint_every
        self.reset()

    def reset(self) -> None:
        self.edge_state: DataFrame | None = None  # (src, dst, last_key)
        self.active: DataFrame | None = None  # (node_id)
        self._steps = 0

    @property
    def param_ids(self) -> list[str]:
        return ["did_%s" % w for w in self.params]

    def superstep(self, window: DataFrame | None, hi: float | None = None) -> None:
        if window is None:
            return
        win_last = window.groupBy("src", "dst").agg(F.max("key").alias("last_key"))
        win_active = (
            window.select(F.col("src").alias("node_id"))
            .unionAll(window.select(F.col("dst").alias("node_id")))
            .distinct()
        )
        if self.edge_state is None:
            self.edge_state = win_last
            self.active = win_active
        else:
            self.edge_state = (
                self.edge_state.unionByName(win_last)
                .groupBy("src", "dst")
                .agg(F.max("last_key").alias("last_key"))
            )
            self.active = self.active.unionByName(win_active).distinct()
        self._steps += 1
        if self._steps % self.checkpoint_every == 0:
            # cut lineage so the per-superstep plan doesn't grow unboundedly
            self.edge_state = self.edge_state.localCheckpoint(eager=True)
            self.active = self.active.localCheckpoint(eager=True)

    def readout_df(self, boundary: float) -> DataFrame | None:
        """Tidy (param_id, node_id, score) as a DataFrame — the canonical
        plan: read-out stays distributed (one groupBy-sum with the decay
        as a JVM column expression + a left join against the active set);
        None when no superstep has run."""
        if self.edge_state is None:
            return None
        aggs = [
            F.sum(w.weight_col(F.lit(float(boundary)) - F.col("last_key"))).alias(
                f"s{i}"
            )
            for i, w in enumerate(self.params)
        ]
        in_scores = self.edge_state.groupBy("dst").agg(*aggs)
        joined = (
            self.active.join(
                in_scores, self.active["node_id"] == in_scores["dst"], "left"
            )
            .drop("dst")
            .fillna(0.0)
        )
        parts = [
            joined.select(
                F.lit(pid).alias("param_id"),
                "node_id",
                F.col(f"s{i}").alias("score"),
            )
            for i, pid in enumerate(self.param_ids)
        ]
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        return out

    def readout(self, boundary: float) -> pd.DataFrame:
        if self.edge_state is None:
            return pd.DataFrame(columns=["param_id", "node_id", "score"])
        aggs = [
            F.sum(w.weight_col(F.lit(float(boundary)) - F.col("last_key"))).alias(
                f"s{i}"
            )
            for i, w in enumerate(self.params)
        ]
        in_scores = self.edge_state.groupBy("dst").agg(*aggs)
        joined = (
            self.active.join(
                in_scores, self.active["node_id"] == in_scores["dst"], "left"
            )
            .drop("dst")
            .fillna(0.0)
            .toPandas()
        )
        frames = []
        for i, pid in enumerate(self.param_ids):
            frames.append(
                pd.DataFrame(
                    {
                        "param_id": pid,
                        "node_id": joined["node_id"].to_numpy(),
                        "score": joined[f"s{i}"].to_numpy(),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    # state persistence handled by the superstep driver via parquet
    def state_frames(self) -> dict[str, DataFrame | None]:
        return {"edge_state": self.edge_state, "active": self.active}

    def load_state_frames(self, edge_state: DataFrame | None, active: DataFrame | None):
        self.edge_state = edge_state
        self.active = active


class DistributedDecayedIndegree:
    """Decayed indegree with fully distributed state AND read-out
    (``distributed = True`` superstep-driver protocol, like
    :class:`DistributedTemporalKatz`): scores never visit the driver —
    no ``toPandas()`` anywhere — and a whole chunk of B snapshot
    intervals is one Spark job ending in the partitioned score sink.

    Reference semantics unchanged (``decayed_indegree_computer.py:36-87``
    via the module-level docstring): score(v, T) = sum over distinct
    in-edges (w, v) seen so far of weight(T - last_activation(w, v)).

    Per-chunk plan (all JVM column expressions, zero Python rows):

    1. collapse the chunk's events to one row per (edge, interval) —
       ``max(key)`` — and union the carried edge state in as a pseudo
       row at ``interval_id = lo - 1``;
    2. a per-edge window (``<= B + 1`` rows per edge) turns those into
       *validity segments*: running-max ``last_key`` + ``lead`` for the
       interval range over which that activation is current;
    3. ``explode(sequence(seg_lo, seg_hi))`` fans each segment out to
       the snapshot intervals it covers (``<= B + 1`` rows per edge in
       total — NOT edges x B), then one hub-skew-safe two-stage
       ``groupBy(interval, dst)`` sums ``weight(boundary_i - last_key)``
       per weighter, boundaries injected as a B-entry map literal;
    4. the ever-active node set fans out the same way (first-appearance
       interval -> covered intervals) and left-joins the sums (score 0
       for active nodes with no decayed in-edges — reference parity).

    Empty intervals need no special case: read-out rows come from the
    ``intervals`` list, not from the (possibly empty) event frame.

    Next-chunk state = each edge's final segment (``seg_hi == hi``),
    eagerly localCheckpointed so lineage stays bounded across chunks.
    """

    measure = "did"
    distributed = True
    state_frame_names = ("edge_state", "active")

    def __init__(self, params: list[Weighter]):
        self.params = params
        self.p = len(params)
        self._seg_cached: DataFrame | None = None
        self.reset()

    def reset(self) -> None:
        self.edge_state: DataFrame | None = None  # (src, dst, last_key)
        self.active: DataFrame | None = None  # (node_id)

    @property
    def param_ids(self) -> list[str]:
        return ["did_%s" % w for w in self.params]

    def can_batch(self) -> bool:
        return True

    def superstep(self, window: DataFrame | None, hi: float) -> None:
        if window is None:
            return
        # single-window path: rebase the window's interval id to 0 so the
        # segment ranges line up with the one-interval pseudo chunk
        self.run_batch(
            window.withColumn("interval_id", F.lit(0).cast("int")),
            [(0, float(hi), float(hi))],
            readouts=False,
        )

    def run_batch(
        self,
        df: DataFrame,
        intervals: list[tuple[int, float, float]],
        readouts: bool = True,
    ) -> DataFrame | None:
        from pyspark.sql import Window

        lo = min(iv for iv, _, _ in intervals)
        hi = max(iv for iv, _, _ in intervals)
        # 1. one row per (edge, interval) + carried state as a pseudo row
        upd = df.groupBy("src", "dst", "interval_id").agg(
            F.max("key").alias("k")
        )
        if self.edge_state is not None:
            upd = upd.unionByName(
                self.edge_state.select(
                    "src",
                    "dst",
                    F.lit(lo - 1).cast("int").alias("interval_id"),
                    F.col("last_key").alias("k"),
                )
            )
        # 2. validity segments via a tiny per-edge window (<= B + 1 rows)
        w = Window.partitionBy("src", "dst").orderBy("interval_id")
        segs = upd.select(
            "src",
            "dst",
            "interval_id",
            F.max("k")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("last_key"),
            F.lead("interval_id").over(w).alias("next_iv"),
        ).select(
            "src",
            "dst",
            "last_key",
            F.greatest(F.col("interval_id"), F.lit(lo)).alias("seg_lo"),
            F.coalesce(F.col("next_iv") - 1, F.lit(hi)).alias("seg_hi"),
        ).filter(F.col("seg_hi") >= F.col("seg_lo"))
        if self._seg_cached is not None:
            self._seg_cached.unpersist()
        segs = segs.persist()
        self._seg_cached = segs
        # next-chunk state: each edge's final segment (materializes the
        # cache; the read-out below then reads from it)
        self.edge_state = (
            segs.filter(F.col("seg_hi") == hi)
            .select("src", "dst", "last_key")
            .localCheckpoint(eager=True)
        )
        # node first-appearance intervals come from the CACHED segment
        # frame (edge-interval granularity, tiny), NOT from the raw event
        # frame — re-aggregating the 2x-edges node list from the source
        # would add two full input scans per chunk. Every chunk edge owns
        # at least one surviving segment and min(seg_lo) per edge is its
        # first interval, so min over a node's edge segments is exact;
        # prior-state segments clamp to ``lo``, matching how carried
        # active nodes are merged below.
        chunk_nodes = (
            segs.select(F.col("src").alias("node_id"), "seg_lo")
            .unionAll(segs.select(F.col("dst").alias("node_id"), "seg_lo"))
            .groupBy("node_id")
            .agg(F.min("seg_lo").alias("first_iv"))
        )
        if self.active is not None:
            chunk_nodes = (
                chunk_nodes.unionByName(
                    self.active.select(
                        "node_id", F.lit(lo).cast("int").alias("first_iv")
                    )
                )
                .groupBy("node_id")
                .agg(F.min("first_iv").alias("first_iv"))
            )
        self.active = chunk_nodes.select("node_id").localCheckpoint(eager=True)
        if not readouts:
            return None
        # 3. fan segments out to covered intervals; sum decayed weights
        bmap = F.create_map(
            *[
                lit
                for iv, _, b in intervals
                for lit in (F.lit(int(iv)), F.lit(float(b)))
            ]
        )
        per_iv = segs.select(
            "dst",
            "last_key",
            F.explode(F.sequence("seg_lo", "seg_hi")).alias("interval_id"),
        ).withColumn("boundary", bmap[F.col("interval_id")])
        aggs = [
            F.sum(
                wf.weight_col(F.col("boundary") - F.col("last_key"))
            ).alias(f"s{i}")
            for i, wf in enumerate(self.params)
        ]
        in_scores = per_iv.groupBy("interval_id", "dst").agg(*aggs)
        # 4. active-node fan-out + left join (score 0 when no in-edges)
        active_iv = chunk_nodes.select(
            "node_id",
            F.explode(
                F.sequence(F.greatest("first_iv", F.lit(lo)), F.lit(hi))
            ).alias("interval_id"),
        )
        joined = (
            active_iv.join(
                in_scores,
                (active_iv["node_id"] == in_scores["dst"])
                & (active_iv["interval_id"] == in_scores["interval_id"]),
                "left",
            )
            .drop("dst")
            .drop(in_scores["interval_id"])
            .fillna(0.0)
        )
        pid_arr = F.array(*[F.lit(p) for p in self.param_ids])
        return joined.select(
            "interval_id",
            "node_id",
            F.posexplode(
                F.array(*[F.col(f"s{i}") for i in range(self.p)])
            ).alias("pos", "score"),
        ).select(
            "interval_id",
            pid_arr[F.col("pos")].alias("param_id"),
            "node_id",
            "score",
        )

    def readout_df(self, boundary: float) -> DataFrame | None:
        """Scores at an arbitrary boundary from the carried state (same
        formula as the driver-state variant's canonical plan)."""
        if self.edge_state is None:
            return None
        aggs = [
            F.sum(
                wf.weight_col(F.lit(float(boundary)) - F.col("last_key"))
            ).alias(f"s{i}")
            for i, wf in enumerate(self.params)
        ]
        in_scores = self.edge_state.groupBy("dst").agg(*aggs)
        joined = (
            self.active.join(
                in_scores, self.active["node_id"] == in_scores["dst"], "left"
            )
            .drop("dst")
            .fillna(0.0)
        )
        pid_arr = F.array(*[F.lit(p) for p in self.param_ids])
        return joined.select(
            "node_id",
            F.posexplode(
                F.array(*[F.col(f"s{i}") for i in range(self.p)])
            ).alias("pos", "score"),
        ).select(pid_arr[F.col("pos")].alias("param_id"), "node_id", "score")

    def release(self) -> None:
        if self._seg_cached is not None:
            self._seg_cached.unpersist()
            self._seg_cached = None

    def state_frames(self) -> dict[str, DataFrame | None]:
        return {"edge_state": self.edge_state, "active": self.active}

    def load_state_frames(self, edge_state: DataFrame | None, active: DataFrame | None):
        self.edge_state = edge_state
        self.active = active
