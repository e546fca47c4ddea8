"""Temporal PageRank (Rozenshtein–Gionis) as distributed affine supersteps.

Update rule per edge (u, v) — ``temporal_pagerank.py:39-52`` in the
reference: with active-mass vector m,

    pr(u) += (1 - alpha)
    pr(v) += (m(u) + (1 - alpha)) * alpha
    m(v)  += (m(u) + (1 - alpha)) * alpha * (1 - beta)
    m(u)  *= beta

(self-loop u == v collapses by the reference's tuple-assignment order:
the pr(u) add is overwritten, and the mass beta-scale is overwritten).
The rule has no time decay, so it is a pure affine recurrence over the
stacked state (pr, m) — the same segment-summary parallel scan as
TemporalKatz applies for every parameterization: window edge segments are
summarized as (M, c) in parallel and composed in ``seq`` order.

Export keeps positive scores only (``temporal_pagerank.py:61-62``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.LongType(), False),
        T.StructField("m", T.BinaryType(), False),
        T.StructField("c", T.BinaryType(), False),
    ]
)


class TemporalPageRank:
    measure = "tpr"

    def __init__(
        self,
        params: list[tuple[float, float]],
        n_nodes: int,
        path: str = "scan",
        scan_partitions: int | None = None,
    ):
        for alpha, beta in params:
            if not (0 < alpha < 1):
                raise ValueError("alpha must be in (0,1)")
            if not (0 <= beta < 1):
                raise ValueError("beta must be in [0,1)")
        self.params = params
        self.n = n_nodes
        self.p = len(params)
        self.path = path
        self.scan_partitions = scan_partitions
        self.reset()

    def reset(self) -> None:
        # state[j] = concat(pr, mass), each length n
        self.state = np.zeros((self.p, 2 * self.n), dtype=np.float64)

    def state_dict(self) -> dict:
        return {"state": self.state}

    def load_state(self, d: dict) -> None:
        self.state = d["state"]

    @property
    def param_ids(self) -> list[str]:
        return ["tpr_a%0.2f_b%0.2f" % (a, b) for a, b in self.params]

    def superstep(self, window: DataFrame | None, hi: float | None = None) -> None:
        if window is None:
            return
        n, p = self.n, self.p
        alphas = np.array([a for a, _ in self.params])
        betas = np.array([b for _, b in self.params])

        def apply_edge_vec(y, u, v):
            """Fold-path vector update; y is (p, 2n)."""
            pu, pv, mu, mv = u, v, n + u, n + v
            if u == v:
                y[:, pv] += alphas * (y[:, mv] + (1 - alphas))
                y[:, mv] = y[:, mv] * (1 + alphas * (1 - betas)) + (
                    1 - alphas
                ) * alphas * (1 - betas)
            else:
                y[:, pv] += alphas * (y[:, mu] + (1 - alphas))
                y[:, mv] += alphas * (1 - betas) * (y[:, mu] + (1 - alphas))
                y[:, mu] *= betas
                y[:, pu] += 1 - alphas

        if self.path == "fold":
            pdf = (
                window.select("src", "dst", "seq").orderBy("seq").toPandas()
            )
            y = self.state
            src = pdf["src"].to_numpy(np.int64)
            dst = pdf["dst"].to_numpy(np.int64)
            for i in range(len(pdf)):
                apply_edge_vec(y, src[i], dst[i])
            return

        d = 2 * n

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
                src = pdf["src"].to_numpy(np.int64)
                dst = pdf["dst"].to_numpy(np.int64)
                for i in range(len(pdf)):
                    u, v = src[i], dst[i]
                    pu, pv, mu, mv = u, v, n + u, n + v
                    if u == v:
                        m[:, pv, :] += alphas[:, None] * m[:, mv, :]
                        c[:, pv] += alphas * (c[:, mv] + (1 - alphas))
                        scale = 1 + alphas * (1 - betas)
                        m[:, mv, :] *= scale[:, None]
                        c[:, mv] = c[:, mv] * scale + (1 - alphas) * alphas * (
                            1 - betas
                        )
                    else:
                        m[:, pv, :] += alphas[:, None] * m[:, mu, :]
                        c[:, pv] += alphas * (c[:, mu] + (1 - alphas))
                        ab = alphas * (1 - betas)
                        m[:, mv, :] += ab[:, None] * m[:, mu, :]
                        c[:, mv] += ab * (c[:, mu] + (1 - alphas))
                        m[:, mu, :] *= betas[:, None]
                        c[:, mu] *= betas
                        c[:, pu] += 1 - alphas
            if m is not None:
                yield pd.DataFrame(
                    {"pid": [pid], "m": [m.tobytes()], "c": [c.tobytes()]}
                )

        nparts = (
            self.scan_partitions
            or window.sparkSession.sparkContext.defaultParallelism
        )
        rows = (
            window.select("src", "dst", "seq")
            .repartitionByRange(nparts, "seq")
            .sortWithinPartitions("seq")
            .withColumn("pid", F.spark_partition_id().cast("long"))
            .mapInPandas(summarize, schema=_SUMMARY_SCHEMA)
            .collect()
        )
        y = self.state
        for row in sorted(rows, key=lambda r: r["pid"]):
            m = np.frombuffer(row["m"], dtype=np.float64).reshape(p, d, d)
            c = np.frombuffer(row["c"], dtype=np.float64).reshape(p, d)
            y = np.einsum("pij,pj->pi", m, y) + c
        self.state = np.ascontiguousarray(y)

    def readout(self, boundary: float | None = None) -> pd.DataFrame:
        frames = []
        for j, pid in enumerate(self.param_ids):
            pr = self.state[j, : self.n]
            idx = np.nonzero(pr > 0)[0]
            frames.append(
                pd.DataFrame({"param_id": pid, "node_id": idx, "score": pr[idx]})
            )
        if not frames:
            return pd.DataFrame(columns=["param_id", "node_id", "score"])
        return pd.concat(frames, ignore_index=True)
