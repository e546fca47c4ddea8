"""Explicit hub-skew tooling (north-rule clause: heavy conv_ids / tool
actors make per-key work pathological at 10^12-turn scale).

Three layers of defence, in order of preference:

1. **Algebraic aggregations** (count/sum/min/max) are immune: Spark's
   hash aggregate does map-side partial combine, so a hub key reduces to
   one partial row per task before the shuffle.  Every degree/weighted-
   indegree aggregation in this engine is algebraic.
2. **AQE skew-join splitting** (``spark.sql.adaptive.skewJoin``): on by
   default in the engine session; re-plans oversized join partitions at
   runtime.
3. **Explicit salting** (this module): for fact-to-dimension equi-joins
   where one fact key dominates (hub vertex joined against a per-node
   table), replicate the dimension row ``salt`` ways and scatter the
   fact side uniformly across the replicas — the hub key's rows spread
   over ``salt`` reducers deterministically, independent of AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int,
    dim_key: str | None = None,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``key`` with ``salt``-way replication
    of the (small) dimension side.

    The fact side gets a deterministic pseudo-random salt derived from
    its row content (hash of all columns mod salt — stable across
    retries, no RNG); the dimension is exploded ``salt`` ways.  Result
    columns = fact columns + dimension columns (minus its key).
    """
    if salt <= 1:
        d = dim if dim_key is None else dim.withColumnRenamed(dim_key, key)
        return fact.join(d, key)
    dk = dim_key or key
    salted_dim = (
        dim.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        ).withColumnRenamed(dk, key)
        if dk != key
        else dim.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        )
    )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(*fact.columns), F.lit(salt))
    )
    return salted_fact.join(salted_dim, [key, "_salt"]).drop("_salt")
