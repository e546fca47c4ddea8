"""Event-type Markov-chain stationary distribution.

No reference counterpart (``/root/reference/python`` has no behavioral
chain analytics): the long-run occupancy of the per-user event-type
transition chain — where does user behavior settle, independent of
where sessions start? The companion to ``transition_entropy`` (how
predictable) and ``actor_transitions`` (the raw matrix).

Scale design: the ONLY data-sized stage is the transition count — one
lag window partitioned on the high-cardinality user key plus one
map-side-combinable groupBy onto the |S|² matrix (S = the event-type
alphabet, a bounded constant independent of data volume). The power
iteration then runs driver-side over that alphabet-bounded matrix —
the same "bounded by alphabet, not by data" collect rule as the
convergence scalars in ``static_pagerank`` — with dangling states
(no outgoing transitions) redistributing their mass uniformly each
step, so total probability is conserved exactly. Fixed iteration
count (no tolerance check), so the SQL oracle can replay the identical
unrolled recurrence; the output is rounded to 9 like the PageRank
family (double noise across engines is ~1e-14 on an alphabet-sized
sum, far inside the rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ITERS = 25


def markov_stationary(
    events: DataFrame,
    user_col: str = "user_id",
    order_col: str = "event_id",
    type_col: str = "event_type",
    iters: int = ITERS,
) -> DataFrame:
    """``(event_type, prob)`` — ``iters`` synchronous power-iteration
    steps of ``x' = x P`` from the uniform vector over the observed
    alphabet, dangling mass redistributed uniformly. Probabilities
    rounded to 9."""
    spark = events.sparkSession
    w = Window.partitionBy(user_col).orderBy(order_col)
    pairs = (
        events.select(
            F.col(type_col).alias("cur"),
            F.lag(type_col).over(w).alias("prev"),
        )
        .filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("c"))
    )
    states = sorted(
        r["s"]
        for r in events.select(F.col(type_col).alias("s")).distinct().collect()
    )
    if not states:
        raise ValueError("markov_stationary: no events")
    # alphabet-bounded collect (|S|^2 cells, constant in data volume)
    cij = {(r["prev"], r["cur"]): r["c"] for r in pairs.collect()}
    tot = {}
    for (p, _), c in cij.items():
        tot[p] = tot.get(p, 0) + c
    k = len(states)
    x = {s: 1.0 / k for s in states}
    for _ in range(iters):
        dangling = sum(x[s] for s in states if s not in tot)
        nxt = {s: dangling / k for s in states}
        for s in states:  # deterministic fold order (sorted states)
            if s not in tot:
                continue
            for t in states:
                c = cij.get((s, t))
                if c:
                    nxt[t] += x[s] * c / tot[s]
        x = nxt
    return spark.createDataFrame(
        [(s, round(x[s], 9)) for s in states], "event_type string, prob double"
    )
