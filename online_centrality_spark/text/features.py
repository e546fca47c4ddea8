"""Hash-trick sparse feature extraction (feature hashing).

The standard trick for turning unbounded categorical vocabularies into
fixed-width model inputs (Weinberger et al. 2009): each feature string
is hashed into one of ``num_buckets`` indices and counts accumulate per
(id, index) cell. Output is the sparse long form ``(id, idx, n)`` — a
grouped-row sparse vector, the shape every downstream trainer ingests
and the only shape that stays bounded when ids × buckets is huge.

Scale: one unionAll of per-column projections (scan-stage expressions
only — concat + md5, no Python), then ONE map-side-combinable groupBy
on (id, idx). The hash is the repo's portable md5 prefix
(``dedup/common.py``), so the identical bucket assignment reproduces in
Spark, DuckDB, and any rerun — no trainer/pipeline hash-seed drift.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.common import portable_hash


def hashed_features(
    df: DataFrame,
    id_col: str,
    feature_cols: list[str],
    num_buckets: int = 64,
) -> DataFrame:
    """(id, idx, n) — portable hash-trick feature counts.

    Each row contributes one feature string per column in
    ``feature_cols``, namespaced as ``"<col>:<value>"`` so identical
    values in different columns land in independent buckets. NULL
    feature values contribute nothing (no NULL bucket).
    """
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    parts = [
        df.select(
            F.col(id_col).alias("id"),
            F.concat(
                F.lit(c + ":"), F.col(c).cast("string")
            ).alias("f"),
        )
        for c in feature_cols
    ]
    u = reduce(DataFrame.unionAll, parts).filter(F.col("f").isNotNull())
    return (
        u.select(
            "id",
            F.pmod(portable_hash(F.col("f")), F.lit(num_buckets)).alias(
                "idx"
            ),
        )
        .groupBy("id", "idx")
        .agg(F.count("*").alias("n"))
    )
