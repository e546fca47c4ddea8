"""Day-over-day edge persistence — how stable is the interaction graph?

For each pair of consecutive time buckets, the Jaccard similarity of
the two (undirected, dedup'd) edge sets: 1.0 means the graph froze,
0.0 means complete turnover. The companion time-series to
``component_evolution`` (that one asks "does the graph fragment?",
this one asks "is it the SAME graph?").

Scale shape: one distinct over (bucket, edge), one self-equi-join on
``(a, b)`` with the bucket-successor predicate folded into the join
key (bucket+1 on the left side, so it IS an equi-join and shuffles on
the same (a, b) hash both sides), then bucket-count frames that hold
one row per bucket. Exact integer counts; the Jaccard is one division
behind round(·, 6).

No reference counterpart; standard semantics, brute-force-validated in
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_persistence(
    pairs: DataFrame, t_col: str = "t", bucket_us: int = 86_400_000_000
) -> DataFrame:
    """``(day, n_edges, n_next, n_common, jaccard)`` for every bucket
    ``day`` whose successor ``day + 1`` also has edges; ``jaccard`` is
    |E_d ∩ E_{d+1}| / |E_d ∪ E_{d+1}| rounded to 6."""
    e = (
        pairs.select(
            F.expr(f"{t_col} div {bucket_us}").alias("day"),
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    cnt = e.groupBy("day").agg(F.count("*").alias("n_edges"))
    common = (
        e.select((F.col("day")).alias("day"), "a", "b")
        .join(
            e.select((F.col("day") - 1).alias("day"), "a", "b"),
            ["day", "a", "b"],
        )
        .groupBy("day")
        .agg(F.count("*").alias("n_common"))
    )
    nxt = cnt.select((F.col("day") - 1).alias("day"), F.col("n_edges").alias("n_next"))
    return (
        cnt.join(nxt, "day")
        .join(common, "day", "left")
        .select(
            "day",
            "n_edges",
            "n_next",
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
            F.round(
                F.coalesce(F.col("n_common"), F.lit(0))
                / (
                    F.col("n_edges")
                    + F.col("n_next")
                    - F.coalesce(F.col("n_common"), F.lit(0))
                ),
                6,
            ).alias("jaccard"),
        )
    )
