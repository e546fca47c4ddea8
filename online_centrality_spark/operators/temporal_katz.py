"""Temporal Katz centrality (and truncated variant) as Spark supersteps.

Semantics match the reference's online computers
(``temporal_katz_computer.py:17-62`` for ``tk``, ``:79-130`` for ``ttk``):
per edge (u, v, t), lazily decay both endpoints by ``w(t - last_act)``,
then ``r(v) += beta * (r_decayed(u) + 1)``; snapshot read-out decays every
ever-active node to the boundary time. All parameterizations
(beta, weight-fn) are evaluated in one pass as vector columns.

The per-edge recurrence is order-dependent whenever edges chain through
shared nodes within a window (``graph_simulator.py:34-39``), so a window
cannot be one big commutative aggregation. Two exact execution paths:

- **fold** (any weighter): the window's edges, sorted by the stable
  global rank ``seq``, stream through one Arrow ``mapInPandas`` task that
  keeps the dense ``(P, N)`` rank matrix and applies the recurrence with
  O(P) vector ops per edge.

- **scan** (factorizing weighters — Exp/Const(1), which all of the
  reference's shipped experiments use): in the basis "decayed to window
  end ``t_hi``", the update becomes the *affine* recurrence
  ``y[:,v] += beta * (y[:,u] + w(t_hi - t))`` with no per-touch decay
  (exponential decay telescopes across a node's activation gaps). A
  window is range-partitioned on ``seq`` into contiguous segments; each
  segment is summarized *in parallel* as an affine map ``(M, c)`` with
  ``M`` built by O(P*N) vectorized row updates per edge; the driver then
  combines the summaries left-to-right — ``y <- M_i @ y + c_i`` — which
  is exact because affine maps compose associatively. This is the
  distributed-exact scale path: edges stay distributed, state is a small
  dense vector (the node space of an actor graph is tiny relative to the
  edge stream).

State lives on the driver as O(N*P) numpy arrays between supersteps
(broadcast into tasks), checkpointed by the superstep driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..functions.weights import ConstantWeighter, Weighter

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.LongType(), False),
        T.StructField("m", T.BinaryType(), False),
        T.StructField("c", T.BinaryType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("node", T.LongType(), False),
        T.StructField("ranks", T.ArrayType(T.DoubleType()), False),
        T.StructField("last", T.DoubleType(), True),  # NaN/null = never activated
    ]
)


def _can_scan(weighters: list[Weighter]) -> bool:
    return all(
        w.factorizes or (isinstance(w, ConstantWeighter) and w.c == 1.0)
        for w in weighters
    )


class TemporalKatz:
    """Param-vectorized temporal Katz over a dictionary-encoded node space.

    ``params``: list of (beta, Weighter). ``n_nodes``: size of the node
    dictionary. ``path``: 'auto' | 'fold' | 'scan'.
    """

    measure = "tk"

    def __init__(
        self,
        params: list[tuple[float, Weighter]],
        n_nodes: int,
        path: str = "auto",
        scan_partitions: int | None = None,
    ):
        for beta, _ in params:
            if not (0 <= beta <= 1):
                raise ValueError("beta must be in [0,1]")
        self.params = params
        self.betas = np.array([b for b, _ in params], dtype=np.float64)
        self.weighters = [w for _, w in params]
        self.n = n_nodes
        self.p = len(params)
        if path == "auto":
            path = "scan" if _can_scan(self.weighters) else "fold"
        if path == "scan" and not _can_scan(self.weighters):
            raise ValueError("scan path requires factorizing weighters")
        self.path = path
        self.scan_partitions = scan_partitions
        self.reset()

    # -- state ------------------------------------------------------------
    def reset(self) -> None:
        self.ranks = np.zeros((self.p, self.n), dtype=np.float64)
        self.last = np.full(self.n, np.nan)  # last activation (nan = never)
        self.basis: float | None = None  # scan path: time the ranks are decayed to

    def state_dict(self) -> dict:
        return {
            "ranks": self.ranks,
            "last": self.last,
            "basis": np.array([np.nan if self.basis is None else self.basis]),
        }

    def load_state(self, d: dict) -> None:
        self.ranks = d["ranks"]
        self.last = d["last"]
        b = float(d["basis"][0])
        self.basis = None if np.isnan(b) else b

    @property
    def param_ids(self) -> list[str]:
        return ["tk_b%0.2f_%s" % (b, w) for b, w in self.params]

    # -- superstep ---------------------------------------------------------
    def superstep(self, window: DataFrame | None, hi: float) -> None:
        """Advance state over one snapshot window ending at ``hi``.

        ``window`` must contain columns (key, src, dst, seq) where ``key``
        is the measure's time axis (epoch seconds or edge index); None or
        empty means an inactive interval (state untouched — decay is lazy).
        """
        if window is None:
            if self.path == "scan":
                self._rebase(hi)
            return
        if self.path == "fold":
            self._superstep_fold(window)
        else:
            self._superstep_scan(window, hi)

    # fold path: one ordered Arrow task, exact for every weighter
    def _superstep_fold(self, window: DataFrame) -> None:
        ranks0, last0 = self.ranks, self.last
        weighters, betas, n, p = self.weighters, self.betas, self.n, self.p

        def fold(batches):
            ranks = ranks0.copy()
            last = last0.copy()
            for pdf in batches:
                key = pdf["key"].to_numpy(dtype=np.float64)
                src = pdf["src"].to_numpy(dtype=np.int64)
                dst = pdf["dst"].to_numpy(dtype=np.int64)
                for i in range(len(pdf)):
                    u, v, t = src[i], dst[i], key[i]
                    if not np.isnan(last[u]):
                        du = t - last[u]
                        for j in range(p):
                            ranks[j, u] *= weighters[j].weight(du)
                    if v != u and not np.isnan(last[v]):
                        dv = t - last[v]
                        for j in range(p):
                            ranks[j, v] *= weighters[j].weight(dv)
                    ranks[:, v] += betas * (ranks[:, u] + 1.0)
                    last[u] = t
                    last[v] = t
            out = pd.DataFrame(
                {
                    "node": np.arange(n, dtype=np.int64),
                    "ranks": list(ranks.T),
                    "last": last,
                }
            )
            yield out

        result = (
            window.select("key", "src", "dst", "seq")
            .repartition(1)
            .sortWithinPartitions("seq")
            .mapInPandas(fold, schema=_STATE_SCHEMA)
            .toPandas()
        )
        self._absorb_state(result)

    def _absorb_state(self, result: pd.DataFrame) -> None:
        result = result.sort_values("node")
        self.ranks = np.stack(result["ranks"].to_numpy()).T.copy()
        self.last = result["last"].to_numpy(dtype=np.float64).copy()

    # scan path: distributed affine segment summaries
    def _rebase(self, new_basis: float) -> None:
        """Decay scan-path state from the current basis to ``new_basis``."""
        if self.basis is not None and new_basis != self.basis:
            dt = new_basis - self.basis
            for j, w in enumerate(self.weighters):
                self.ranks[j] *= w.weight(dt)
        self.basis = new_basis

    def _superstep_scan(self, window: DataFrame, hi: float) -> None:
        if self.basis is None:
            # first window with activity: adopt the basis; ranks are zero
            self.basis = hi
        self._rebase(hi)
        n, p = self.n, self.p
        betas = self.betas
        weighters = self.weighters

        def summarize(batches):
            m = None
            c = np.zeros((p, n), dtype=np.float64)
            pid = -1
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if m is None:
                    m = np.broadcast_to(np.eye(n), (p, n, n)).copy()
                    pid = int(pdf["pid"].iloc[0])
                key = pdf["key"].to_numpy(dtype=np.float64)
                src = pdf["src"].to_numpy(dtype=np.int64)
                dst = pdf["dst"].to_numpy(dtype=np.int64)
                wvec = np.empty((p, len(pdf)), dtype=np.float64)
                for j in range(p):
                    wvec[j] = weighters[j].weight_np(hi - key)
                for i in range(len(pdf)):
                    u, v = src[i], dst[i]
                    m[:, v, :] += betas[:, None] * m[:, u, :]
                    c[:, v] += betas * (c[:, u] + wvec[:, i])
            if m is not None:
                yield pd.DataFrame(
                    {"pid": [pid], "m": [m.tobytes()], "c": [c.tobytes()]}
                )

        nparts = self.scan_partitions or window.sparkSession.sparkContext.defaultParallelism
        from pyspark.sql import functions as F

        rows = (
            window.select("key", "src", "dst", "seq")
            .repartitionByRange(nparts, "seq")
            .sortWithinPartitions("seq")
            .withColumn("pid", F.spark_partition_id().cast("long"))
            .mapInPandas(summarize, schema=_SUMMARY_SCHEMA)
            .collect()
        )
        y = self.ranks
        for row in sorted(rows, key=lambda r: r["pid"]):
            m = np.frombuffer(row["m"], dtype=np.float64).reshape(p, n, n)
            c = np.frombuffer(row["c"], dtype=np.float64).reshape(p, n)
            y = np.einsum("pij,pj->pi", m, y) + c
        self.ranks = np.ascontiguousarray(y)
        # activation tracking (needed only for the active-node read-out set)
        acts = (
            window.groupBy().agg(
                F.collect_set("src").alias("s"), F.collect_set("dst").alias("d")
            )
        ).collect()
        if acts:
            touched = np.array(
                sorted(set(acts[0]["s"]) | set(acts[0]["d"])), dtype=np.int64
            )
            self.last[touched] = hi  # exact per-node last not needed in y-basis

    # -- read-out ----------------------------------------------------------
    def readout(self, boundary: float) -> pd.DataFrame:
        """Scores of every ever-active node, decayed to ``boundary``.

        Returns tidy (param_id, node_id, score).
        """
        active = ~np.isnan(self.last)
        idx = np.nonzero(active)[0]
        frames = []
        for j, pid in enumerate(self.param_ids):
            if self.path == "scan":
                base = self.basis if self.basis is not None else boundary
                scores = self.ranks[j, idx] * self.weighters[j].weight(boundary - base)
            else:
                dt = boundary - self.last[idx]
                scores = self.ranks[j, idx] * self.weighters[j].weight_np(dt)
            frames.append(
                pd.DataFrame({"param_id": pid, "node_id": idx, "score": scores})
            )
        if not frames:
            return pd.DataFrame(columns=["param_id", "node_id", "score"])
        return pd.concat(frames, ignore_index=True)


class TruncatedTemporalKatz(TemporalKatz):
    """k-layer truncated temporal Katz (walks of length <= layer+1).

    Layers update in descending order so layer ``l`` reads layer ``l-1``
    pre-update (``temporal_katz_computer.py:104-117``); every layer is
    exported (param id suffix ``_length_limit_<l+1>``).
    State is the stacked (P, k*N) vector; the scan path's affine maps act
    on the stacked space (block lower-triangular by layer).
    """

    measure = "ttk"

    def __init__(
        self,
        params: list[tuple[float, Weighter]],
        n_nodes: int,
        k: int = 5,
        path: str = "auto",
        scan_partitions: int | None = None,
    ):
        self.k = k
        super().__init__(params, n_nodes, path=path, scan_partitions=scan_partitions)

    def reset(self) -> None:
        self.ranks = np.zeros((self.p, self.k * self.n), dtype=np.float64)
        self.last = np.full(self.n, np.nan)
        self.basis = None

    @property
    def param_ids(self) -> list[str]:
        return [
            "ttk_b%0.2f_%s_length_limit_%i" % (b, w, layer + 1)
            for layer in range(self.k)
            for b, w in self.params
        ]

    def _superstep_fold(self, window: DataFrame) -> None:
        ranks0, last0 = self.ranks, self.last
        weighters, betas, n, p, k = self.weighters, self.betas, self.n, self.p, self.k

        def fold(batches):
            ranks = ranks0.reshape(p, k, n).copy()
            last = last0.copy()
            zeros = np.zeros(p)
            for pdf in batches:
                key = pdf["key"].to_numpy(dtype=np.float64)
                src = pdf["src"].to_numpy(dtype=np.int64)
                dst = pdf["dst"].to_numpy(dtype=np.int64)
                for i in range(len(pdf)):
                    u, v, t = src[i], dst[i], key[i]
                    wu = wv = None
                    if not np.isnan(last[u]):
                        wu = np.array(
                            [weighters[j].weight(t - last[u]) for j in range(p)]
                        )
                        ranks[:, :, u] *= wu[:, None]
                    if v != u and not np.isnan(last[v]):
                        wv = np.array(
                            [weighters[j].weight(t - last[v]) for j in range(p)]
                        )
                        ranks[:, :, v] *= wv[:, None]
                    for layer in range(k - 1, -1, -1):
                        shorter = zeros if layer == 0 else ranks[:, layer - 1, u]
                        ranks[:, layer, v] = ranks[:, layer, v] + betas * (shorter + 1.0)
                    last[u] = t
                    last[v] = t
            out = pd.DataFrame(
                {
                    "node": np.arange(n, dtype=np.int64),
                    "ranks": _stack_cols(ranks, n, p, k),
                    "last": last,
                }
            )
            yield out

        result = (
            window.select("key", "src", "dst", "seq")
            .repartition(1)
            .sortWithinPartitions("seq")
            .mapInPandas(fold, schema=_STATE_SCHEMA)
            .toPandas()
        )
        result = result.sort_values("node")
        stacked = np.stack(result["ranks"].to_numpy())  # (n, p*k)
        self.ranks = (
            stacked.reshape(self.n, self.p, self.k)
            .transpose(1, 2, 0)
            .reshape(self.p, self.k * self.n)
            .copy()
        )
        self.last = result["last"].to_numpy(dtype=np.float64).copy()

    def _superstep_scan(self, window: DataFrame, hi: float) -> None:
        if self.basis is None:
            self.basis = hi
        self._rebase(hi)
        n, p, k = self.n, self.p, self.k
        d = k * n
        betas = self.betas
        weighters = self.weighters

        def summarize(batches):
            m = None
            c = np.zeros((p, d), dtype=np.float64)
            pid = -1
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if m is None:
                    m = np.broadcast_to(np.eye(d), (p, d, d)).copy()
                    pid = int(pdf["pid"].iloc[0])
                key = pdf["key"].to_numpy(dtype=np.float64)
                src = pdf["src"].to_numpy(dtype=np.int64)
                dst = pdf["dst"].to_numpy(dtype=np.int64)
                wvec = np.empty((p, len(pdf)), dtype=np.float64)
                for j in range(p):
                    wvec[j] = weighters[j].weight_np(hi - key)
                for i in range(len(pdf)):
                    u, v = src[i], dst[i]
                    for layer in range(k - 1, -1, -1):
                        row_v = layer * n + v
                        if layer == 0:
                            c[:, row_v] += betas * wvec[:, i]
                        else:
                            row_u = (layer - 1) * n + u
                            m[:, row_v, :] += betas[:, None] * m[:, row_u, :]
                            c[:, row_v] += betas * (c[:, row_u] + wvec[:, i])
            if m is not None:
                yield pd.DataFrame(
                    {"pid": [pid], "m": [m.tobytes()], "c": [c.tobytes()]}
                )

        from pyspark.sql import functions as F

        nparts = self.scan_partitions or window.sparkSession.sparkContext.defaultParallelism
        rows = (
            window.select("key", "src", "dst", "seq")
            .repartitionByRange(nparts, "seq")
            .sortWithinPartitions("seq")
            .withColumn("pid", F.spark_partition_id().cast("long"))
            .mapInPandas(summarize, schema=_SUMMARY_SCHEMA)
            .collect()
        )
        y = self.ranks
        for row in sorted(rows, key=lambda r: r["pid"]):
            m = np.frombuffer(row["m"], dtype=np.float64).reshape(p, d, d)
            c = np.frombuffer(row["c"], dtype=np.float64).reshape(p, d)
            y = np.einsum("pij,pj->pi", m, y) + c
        self.ranks = np.ascontiguousarray(y)
        acts = (
            window.groupBy().agg(
                F.collect_set("src").alias("s"), F.collect_set("dst").alias("d")
            )
        ).collect()
        if acts:
            touched = np.array(
                sorted(set(acts[0]["s"]) | set(acts[0]["d"])), dtype=np.int64
            )
            self.last[touched] = hi

    def readout(self, boundary: float) -> pd.DataFrame:
        active = ~np.isnan(self.last)
        idx = np.nonzero(active)[0]
        ranks = self.ranks.reshape(self.p, self.k, self.n)
        frames = []
        pids = self.param_ids
        for layer in range(self.k):
            for j in range(self.p):
                pid = pids[layer * self.p + j]
                if self.path == "scan":
                    base = self.basis if self.basis is not None else boundary
                    scores = ranks[j, layer, idx] * self.weighters[j].weight(
                        boundary - base
                    )
                else:
                    dt = boundary - self.last[idx]
                    scores = ranks[j, layer, idx] * self.weighters[j].weight_np(dt)
                frames.append(
                    pd.DataFrame({"param_id": pid, "node_id": idx, "score": scores})
                )
        if not frames:
            return pd.DataFrame(columns=["param_id", "node_id", "score"])
        return pd.concat(frames, ignore_index=True)


def _stack_cols(ranks: np.ndarray, n: int, p: int, k: int) -> list[np.ndarray]:
    """(p, k, n) -> per-node flattened (p*k,) vectors for the state rows."""
    return list(ranks.reshape(p * k, n).T)
