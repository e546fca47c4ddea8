"""Mergeable frequency sketches for corpus profiling.

Count–min sketch (Cormode–Muthukrishnan) over the token stream: the
100 TB-shaped way to get heavy-hitter frequencies without shuffling the
full (token, count) table to one place. The sketch is a (depth × width)
counter grid; each cell is a plain ``groupBy`` count, so Spark's
map-side partial aggregation IS the sketch merge — executors build
partial sketches locally and the shuffle moves at most depth × width
cells per partition, independent of corpus size. Estimates are
``min`` over the token's depth cells and never underestimate.

Hashing is the engine-portable md5 scheme shared with the dedup family
(``dedup.common.portable_hash``), so a plain-SQL oracle builds the
IDENTICAL sketch cell-for-cell — the estimates are exact-matchable
across engines, not just statistically similar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.common import TOKEN_RE, portable_hash


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("token")
    )


def _bucket(col, row: int, width: int):
    return F.pmod(
        portable_hash(F.concat(col, F.lit(f"#cms{row}"))), F.lit(width)
    )


def cms_sketch(
    docs: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """(i, bucket, c) — the count–min sketch of the corpus token stream.

    One explode per depth row (union-free: a ``sequence`` explode), one
    map-side-combinable groupBy. depth × width cells total, mergeable by
    addition across corpus shards.
    """
    toks = _tokens(docs, text_col)
    rows = toks.withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    return (
        rows.select(
            "i",
            F.pmod(
                portable_hash(
                    F.concat(F.col("token"), F.lit("#cms"), F.col("i"))
                ),
                F.lit(width),
            ).alias("bucket"),
        )
        .groupBy("i", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
    k: int = 20,
) -> DataFrame:
    """(token, n_true, n_est) for the k most frequent tokens: exact
    count next to the count–min estimate (``n_est >= n_true`` always;
    equality when the token's cells are collision-free).

    The exact side exists to certify the sketch (and is itself a global
    top-k via per-partition heaps); a pure-sketch deployment drops it
    and answers point queries from the depth × width grid alone.
    """
    sketch = cms_sketch(docs, text_col, width, depth)
    toks = _tokens(docs, text_col)
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("n_true"))
        .orderBy(F.col("n_true").desc(), F.col("token").asc())
        .limit(k)
    )
    probes = top.withColumn(
        "i", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).select(
        "token",
        "n_true",
        "i",
        F.pmod(
            portable_hash(F.concat(F.col("token"), F.lit("#cms"), F.col("i"))),
            F.lit(width),
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"])
        .groupBy("token", "n_true")
        .agg(F.min("c").alias("n_est"))
    )
