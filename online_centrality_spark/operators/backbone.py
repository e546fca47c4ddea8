"""Disparity-filter backbone extraction (Serrano–Boguñá–Vespignani,
PNAS 2009) — the statistically significant skeleton of a weighted
graph.

For node *i* with strength ``s_i`` (sum of incident weights) and degree
``k_i``, the null hypothesis is that *i* spreads its strength uniformly
at random over its ``k_i`` edges; the p-value of edge *(i,j)* is then
``α_ij = (1 − w_ij/s_i)^(k_i − 1)``. An edge survives the filter when
EITHER endpoint finds it significant (``α < alpha``); a degree-1
endpoint has ``α = 1`` (a single edge carries trivially all of its
strength), so it can only survive through its other endpoint — the
standard convention.

Scale shape: one weight aggregation over the raw pair stream, one
strength/degree aggregation, two broadcast-sized joins back to the
edge list, every expression JVM-side. The significance test runs on
the aggregated UNDIRECTED weighted edge list — at 100 TB the raw
stream collapses by orders of magnitude at the first groupBy and
nothing downstream scales with raw events.

``(1 − w/s)`` is the exact rational ``(s − w)/s`` of two int64 sums,
so both engines raise the identical double to the identical integer
power; the residual pow() last-ulp risk sits behind a round(·, 6)
boundary (same discipline as the exp-decay oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def disparity_scores(pairs: DataFrame) -> DataFrame:
    """``(a, b, weight, alpha_min)`` — every undirected weighted edge
    built from the ``(src, dst)`` pair stream (weight = interaction
    multiplicity in either direction) with its disparity p-value from
    the better endpoint, rounded to 6. Feed to
    :func:`disparity_backbone` for thresholding or rank by
    ``(alpha_min, a, b)`` for a deterministic most-significant top-k.
    """
    w = (
        pairs.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("weight"))
        .persist()
    )
    nodes = (
        w.select(F.col("a").alias("n"), "weight")
        .unionAll(w.select(F.col("b").alias("n"), "weight"))
        .groupBy("n")
        .agg(F.sum("weight").alias("s"), F.count("*").alias("k"))
    )

    def _alpha(s, k):
        # (1 - w/s)^(k-1) as ((s-w)/s)^(k-1): exact rational base,
        # integer exponent; k = 1 -> 1.0 (pow(x, 0))
        return F.pow(
            (F.col(s) - F.col("weight")).cast("double") / F.col(s), F.col(k) - 1
        )

    return (
        w.join(nodes.select(F.col("n").alias("a"), F.col("s").alias("sa"),
                            F.col("k").alias("ka")), "a")
        .join(nodes.select(F.col("n").alias("b"), F.col("s").alias("sb"),
                           F.col("k").alias("kb")), "b")
        .select(
            "a",
            "b",
            "weight",
            F.round(F.least(_alpha("sa", "ka"), _alpha("sb", "kb")), 6).alias(
                "alpha_min"
            ),
        )
    )


def disparity_backbone(pairs: DataFrame, alpha: float = 0.05) -> DataFrame:
    """The backbone: edges of :func:`disparity_scores` whose p-value
    from the better endpoint beats ``alpha``."""
    return disparity_scores(pairs).filter(F.col("alpha_min") < alpha)


def strength_disparity(pairs: DataFrame) -> DataFrame:
    """``(node_id, k, s, y2)`` — the weighted-graph disparity
    Y₂(i) = Σ_j (w_ij/s_i)² per node (Barthélemy et al.): ≈ 1/k means
    strength spread evenly over the k edges, ≈ 1 means one edge
    dominates — the per-node companion of the disparity filter.

    Same aggregation spine as :func:`disparity_scores`; Y₂ =
    (Σw²)/s² from exact integer sums (decimal-widened squares), one
    fixed double chain behind round(·, 6).
    """
    w = (
        pairs.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("weight"))
    )
    per = w.select(F.col("a").alias("node_id"), "weight").unionAll(
        w.select(F.col("b").alias("node_id"), "weight")
    )
    agg = per.groupBy("node_id").agg(
        F.count("*").alias("k"),
        F.sum("weight").alias("s"),
        F.sum(
            F.col("weight").cast("decimal(14,0)") * F.col("weight").cast("decimal(14,0)")
        ).alias("sq"),
    )
    return agg.select(
        "node_id",
        F.col("k").cast("long").alias("k"),
        F.col("s").cast("long").alias("s"),
        F.round(
            F.col("sq").cast("double")
            / (F.col("s").cast("double") * F.col("s").cast("double")),
            6,
        ).alias("y2"),
    )
