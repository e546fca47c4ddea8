"""Checkpointed, resumable superstep driver for the replay engine.

Replaces the reference's single-threaded per-edge replay loop
(``graph_simulator.py:41-109``, dispatched from
``CentralityScoreComputer.py:147-150``) with one Spark job (or a few) per
snapshot interval:

1. Edges are bucketed once into snapshot intervals with a JVM column
   expression over the boundary array (Catalyst prunes on it afterwards).
2. Per emitted interval, each online measure advances one superstep over
   the interval's edge window, then reads out scores decayed to the
   boundary; static measures recompute on the total / sliding-window
   graph (plain range predicates over ``interval_id``).
3. Scores and per-interval metrics land in parquet partitioned by
   ``snapshot_id``; measure state is checkpointed per superstep, so a
   killed run resumes from the last completed interval with identical
   results (tested).
"""

from __future__ import annotations

import json
import shutil
import time as _time
from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .snapshots import SnapshotInterval, epoch_schedule, index_schedule
from ..operators.harmonic import harmonic_centrality
from ..operators.static_degree import static_indegree, static_negative_beta
from ..operators.static_pagerank import static_pagerank


@dataclass(frozen=True)
class StaticMeasure:
    """A (kind, lookback) static measure family member.

    ``lookback == 0`` → total graph; ``lookback > 0`` → union of the last
    ``lookback`` emitted interval windows (dedup), mirroring
    ``get_graph_from_snapshots`` (base_computer.py:12-23). Param-id
    strings follow the reference exactly.
    """

    kind: str  # 'indeg' | 'nbm' | 'spr' | 'hc'
    lookback: int = 0
    alpha: float = 0.85
    max_iter: int = 100

    @property
    def graph_type(self) -> str:
        return "snapshot_%i" % self.lookback if self.lookback > 0 else "total"

    @property
    def param_id(self) -> str:
        if self.kind == "spr":
            return "spr_%s_a%0.2f_i%i" % (self.graph_type, self.alpha, self.max_iter)
        return "%s_%s" % (self.kind, self.graph_type)


class SuperstepDriver:
    def __init__(
        self,
        spark: SparkSession,
        out_dir: str,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.out_dir = Path(out_dir)
        self.ckpt_dir = Path(checkpoint_dir) if checkpoint_dir else None

    # ------------------------------------------------------------------
    def run(
        self,
        edges: DataFrame,
        boundaries: list[int],
        time_type: str = "epoch",
        online: list | None = None,
        static: list[StaticMeasure] | None = None,
        max_index: int | None = None,
        resume: bool = False,
        batch_size: int = 1,
    ) -> list[SnapshotInterval]:
        """``batch_size`` > 1 groups consecutive snapshot intervals so
        scan-path temporal measures advance B windows with one Spark job
        (``run_batch``); read-outs per boundary stay driver-side. Other
        measures run one superstep per interval as usual."""
        online = online or []
        static = static or []
        key_col = "t" if time_type == "epoch" else "seq"

        if time_type == "epoch":
            t_max = edges.agg(F.max("t")).collect()[0][0]
            schedule = epoch_schedule(boundaries, t_max, max_index)
        else:
            num_edges = edges.count()
            schedule = index_schedule(boundaries, num_edges, max_index)
        if not schedule:
            return []

        bucketed = self._bucket(edges, boundaries, key_col, schedule)
        stats = self._interval_stats(bucketed, time_type)

        start_from = 0
        if resume and self.ckpt_dir is not None:
            start_from = self._restore(online) + 1

        remaining = [s for s in schedule if s.interval_id >= start_from]
        chunks = [
            remaining[i : i + batch_size]
            for i in range(0, len(remaining), batch_size)
        ]
        for chunk in chunks:
            t_chunk = _time.time()
            batched = (
                [m for m in online if getattr(m, "can_batch", lambda: False)()]
                if len(chunk) > 1
                else []
            )
            per_step = [m for m in online if m not in batched]
            batch_outs: dict[int, dict] = {}
            if batched:
                cdf = bucketed.filter(
                    (F.col("interval_id") >= chunk[0].interval_id)
                    & (F.col("interval_id") <= chunk[-1].interval_id)
                )
                intervals = [
                    (s.interval_id, float(s.hi), float(s.boundary)) for s in chunk
                ]
                for m in batched:
                    batch_outs[id(m)] = m.run_batch(cdf, intervals)
                    self._write_convergence(m, chunk[-1].interval_id)
            for snap in chunk:
                i = snap.interval_id
                t0 = _time.time()
                window = bucketed.filter(F.col("interval_id") == i)
                has_edges = stats["edge_counts"].get(i, 0) > 0
                win_or_none = window if has_edges else None
                rows = []
                for m in online:
                    if m in batched:
                        out = batch_outs[id(m)][i]
                    else:
                        m.superstep(win_or_none, float(snap.hi))
                        out = m.readout(float(snap.boundary))
                    out["measure"] = m.measure
                    rows.append(out)
                for sm in static:
                    out = self._static_scores(bucketed, sm, i)
                    out["measure"] = sm.kind
                    out["param_id"] = sm.param_id
                    rows.append(out)
                self._write_scores(rows, i)
                self._write_metrics(snap, stats, _time.time() - t0, bucketed)
            if self.ckpt_dir is not None:
                self._checkpoint(online, chunk[-1].interval_id)
            del t_chunk
        return schedule

    # ------------------------------------------------------------------
    def _bucket(
        self,
        edges: DataFrame,
        boundaries: list[int],
        key_col: str,
        schedule: list[SnapshotInterval],
    ) -> DataFrame:
        last = schedule[-1]
        barr = ",".join(str(int(b)) for b in boundaries[: last.interval_id + 1])
        # interval_id = number of boundaries strictly below the key
        expr = f"size(filter(array({barr}), b -> b < {key_col}))"
        bucketed = (
            edges.withColumn("key", F.col(key_col).cast("double"))
            .filter(F.col("key") <= F.lit(float(last.hi)))
            .withColumn("interval_id", F.expr(expr))
        )
        return bucketed.persist()

    def _interval_stats(self, bucketed: DataFrame, time_type: str) -> dict:
        """Cumulative graph stats per interval (take_snapshot parity:
        graph_simulator.py:19-30 reports total/window node+edge counts)."""
        edge_counts = {
            r["interval_id"]: r["cnt"]
            for r in bucketed.groupBy("interval_id").agg(F.count("*").alias("cnt")).collect()
        }
        # first interval each distinct edge / node appears in
        first_edge = {
            r["interval_id"]: r["cnt"]
            for r in bucketed.groupBy("src", "dst")
            .agg(F.min("interval_id").alias("interval_id"))
            .groupBy("interval_id")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        nodes_long = bucketed.select(
            "interval_id", F.col("src").alias("node")
        ).unionAll(bucketed.select("interval_id", F.col("dst").alias("node")))
        first_node = {
            r["interval_id"]: r["cnt"]
            for r in nodes_long.groupBy("node")
            .agg(F.min("interval_id").alias("interval_id"))
            .groupBy("interval_id")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        win_nodes = {
            r["interval_id"]: r["cnt"]
            for r in nodes_long.groupBy("interval_id")
            .agg(F.countDistinct("node").alias("cnt"))
            .collect()
        }
        return dict(
            edge_counts=edge_counts,
            first_edge=first_edge,
            first_node=first_node,
            win_nodes=win_nodes,
            time_type=time_type,
        )

    def _static_scores(
        self, bucketed: DataFrame, sm: StaticMeasure, i: int
    ) -> pd.DataFrame:
        if sm.lookback == 0:
            g = bucketed.filter(F.col("interval_id") <= i)
        else:
            g = bucketed.filter(
                (F.col("interval_id") >= i - sm.lookback + 1)
                & (F.col("interval_id") <= i)
            )
        if sm.kind == "indeg":
            out = static_indegree(g)
        elif sm.kind == "nbm":
            out = static_negative_beta(g)
        elif sm.kind == "spr":
            out = static_pagerank(g, alpha=sm.alpha, max_iter=sm.max_iter)
        elif sm.kind == "hc":
            out = harmonic_centrality(g).select(
                "node_id", (F.col("score") + F.lit(0.001)).alias("score")
            )
        else:
            raise ValueError(sm.kind)
        return out.toPandas()

    def _write_scores(self, rows: list[pd.DataFrame], i: int) -> None:
        frames = [r for r in rows if len(r)]
        path = self.out_dir / f"snapshot_id={i}"
        path.mkdir(parents=True, exist_ok=True)
        if frames:
            merged = pd.concat(frames, ignore_index=True)[
                ["measure", "param_id", "node_id", "score"]
            ]
            merged["node_id"] = merged["node_id"].astype("int64")
            merged["score"] = merged["score"].astype("float64")
        else:
            merged = pd.DataFrame(
                {
                    "measure": pd.Series(dtype="string"),
                    "param_id": pd.Series(dtype="string"),
                    "node_id": pd.Series(dtype="int64"),
                    "score": pd.Series(dtype="float64"),
                }
            )
        merged.to_parquet(path / "part-0.parquet", index=False)

    def _write_metrics(
        self,
        snap: SnapshotInterval,
        stats: dict,
        elapsed: float,
        bucketed: DataFrame,
    ) -> None:
        i = snap.interval_id
        cum = lambda d: sum(v for k, v in d.items() if k <= i)  # noqa: E731
        if stats["time_type"] == "epoch":
            total_edges = cum(stats["edge_counts"])  # MultiDiGraph keeps parallels
        else:
            total_edges = cum(stats["first_edge"])  # DiGraph dedups
        row = pd.DataFrame(
            [
                dict(
                    interval_id=i,
                    boundary=float(snap.boundary),
                    total_nodes=cum(stats["first_node"]),
                    total_edges=total_edges,
                    snapshot_nodes=stats["win_nodes"].get(i, 0),
                    snapshot_edges=stats["edge_counts"].get(i, 0),
                    superstep_sec=elapsed,
                    n_partitions=bucketed.rdd.getNumPartitions(),
                )
            ]
        )
        path = self.out_dir / "_metrics"
        path.mkdir(parents=True, exist_ok=True)
        row.to_parquet(path / f"interval_{i}.parquet", index=False)

    def _write_convergence(self, m, upto_interval: int) -> None:
        """Per-partition convergence/lineage rows for iterative measures
        (the north rule's per-partition lineage + convergence metrics):
        walk-path batches report (partition, edges, rounds, residual,
        kernel timings) per task."""
        mets = getattr(m, "walk_metrics", None)
        if not mets:
            return
        pdf = pd.DataFrame(mets)
        pdf.insert(0, "measure", m.measure)
        pdf.insert(1, "upto_interval", upto_interval)
        path = self.out_dir / "_metrics"
        path.mkdir(parents=True, exist_ok=True)
        pdf.to_parquet(
            path / f"convergence_{m.measure}_{upto_interval}.parquet",
            index=False,
        )

    # -- checkpoint / resume -------------------------------------------
    def _checkpoint(self, online: list, i: int) -> None:
        step = self.ckpt_dir / f"step_{i}"
        step.mkdir(parents=True, exist_ok=True)
        for m in online:
            if hasattr(m, "state_dict"):
                np.savez(step / f"{m.measure}.npz", **m.state_dict())
            elif hasattr(m, "state_frames"):
                for name, df in m.state_frames().items():
                    if df is not None:
                        df.write.mode("overwrite").parquet(
                            str(step / f"{m.measure}_{name}.parquet")
                        )
        manifest = {"completed": i}
        (self.ckpt_dir / "manifest.json").write_text(json.dumps(manifest))
        # keep only the two most recent steps
        steps = sorted(
            (p for p in self.ckpt_dir.glob("step_*")),
            key=lambda p: int(p.name.split("_")[1]),
        )
        for old in steps[:-2]:
            shutil.rmtree(old, ignore_errors=True)

    def _restore(self, online: list) -> int:
        manifest_path = self.ckpt_dir / "manifest.json"
        if not manifest_path.exists():
            return -1
        completed = json.loads(manifest_path.read_text())["completed"]
        step = self.ckpt_dir / f"step_{completed}"
        for m in online:
            if hasattr(m, "state_dict"):
                with np.load(step / f"{m.measure}.npz") as d:
                    m.load_state(dict(d.items()))
            elif hasattr(m, "state_frames"):
                frames = {}
                for name in ("edge_state", "active"):
                    p = step / f"{m.measure}_{name}.parquet"
                    if p.exists():
                        # materialize so lineage doesn't dangle on checkpoint
                        # files the rolling cleanup will delete
                        frames[name] = self.spark.read.parquet(str(p)).localCheckpoint(
                            eager=True
                        )
                    else:
                        frames[name] = None
                m.load_state_frames(frames["edge_state"], frames["active"])
        return completed

    # -- outputs ---------------------------------------------------------
    def scores(self) -> DataFrame:
        return self.spark.read.option("basePath", str(self.out_dir)).parquet(
            str(self.out_dir / "snapshot_id=*")
        )

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(str(self.out_dir / "_metrics"))
