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


# --- HyperLogLog distinct-count sketch (engine-portable) -------------------
#
# Flajolet et al.'s HLL with m = 256 registers, built entirely from the
# md5 hex digest so a plain-SQL oracle reproduces the sketch (and hence
# the estimate) bit-for-bit: register = first 2 hex chars, rho = leading
# zero BITS of the next 13 hex chars (52 bits) + 1. The register table
# is mergeable by max() across corpus shards — at 100 TB each executor
# partial-aggregates its registers map-side and the shuffle moves at
# most m rows per (group, partition), independent of input size.
# Register sums use the exact-integer trick (sum 2^(53-rho) as BIGINT,
# never a float sum) so partitioning cannot perturb the estimate.

HLL_M = 256
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: alpha * m^2 * 2^53 — numerator over the exact BIGINT register sum
#: S = sum_j 2^(53 - M_j); embedded as the same double literal in the
#: SQL oracle so the one division is IEEE-identical across engines.
HLL_NUMERATOR = _HLL_ALPHA * HLL_M * HLL_M * float(1 << 53)
_TWO53 = 1 << 53


def hll_registers(
    df: DataFrame, group_cols: list[str], value_expr: str
) -> DataFrame:
    """(group..., reg, r) — the 256-register HLL sketch per group.

    ``value_expr`` is a SQL string producing the counted value (cast to
    string before hashing). Mergeable across shards via max(r).
    """
    base = df.selectExpr(*group_cols, f"md5(CAST(({value_expr}) AS STRING)) AS _h")
    parts = base.select(
        *group_cols,
        F.conv(F.substring("_h", 1, 2), 16, 10).cast("int").alias("reg"),
        F.substring("_h", 3, 13).alias("_tail"),
    )
    z = F.length(F.regexp_extract("_tail", "^(0*)", 1))
    first = F.expr(
        "substring(_tail, length(regexp_extract(_tail, '^(0*)', 1)) + 1, 1)"
    )
    lz = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when((first >= "4") & (first <= "7"), 1)
        .otherwise(0)
    )
    rho = F.when(z == 13, F.lit(53)).otherwise(z * 4 + lz + 1)
    return (
        parts.withColumn("rho", rho)
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("r"))
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], value_expr: str
) -> DataFrame:
    """(group..., n_exact, n_est, rel_err) — HLL estimate next to the
    exact distinct count that certifies it.

    Linear counting (m * ln(m / zero_registers)) takes over below the
    standard 2.5m threshold — the sf0.001 fixtures land there while
    sf0.01+ exercise the raw-HLL branch. A pure-sketch deployment drops
    the exact side and answers from the m-row register table alone.
    """
    regs = hll_registers(df, group_cols, value_expr)
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("present"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - r)")).alias("s_present"),
    )
    zeros = F.lit(HLL_M) - F.col("present")
    s_total = (F.col("s_present") + zeros.cast("long") * F.lit(_TWO53)).cast(
        "double"
    )
    e_raw = F.lit(HLL_NUMERATOR) / s_total
    est = F.round(
        F.when(
            (e_raw <= 2.5 * HLL_M) & (zeros > 0),
            F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros),
        ).otherwise(e_raw),
        4,
    )
    exact = df.selectExpr(
        *group_cols, f"CAST(({value_expr}) AS STRING) AS _v"
    ).groupBy(*group_cols).agg(F.countDistinct("_v").alias("n_exact"))
    return (
        agg.withColumn("n_est", est)
        .join(exact, group_cols)
        .select(
            *group_cols,
            "n_exact",
            "n_est",
            F.round(
                (F.col("n_est") - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_err"),
        )
    )


def log_bucket_quantiles(
    vals: DataFrame,
    stratum_col: str,
    value_col: str,
    quantiles: tuple = (0.5, 0.9, 0.99),
    max_bucket: int = 45,
) -> DataFrame:
    """(stratum, q, bucket, est, n) — generic mergeable log-bucket
    quantile sketch over a non-negative integer column, per stratum:
    the shared engine behind ``text/analysis.py: token_quantile_sketch``
    (corpus length profiles) and ``streaming/sessions.py:
    latency_sketch`` (tail-latency profiles).

    Bucket ``b`` holds values in ``[2^b - 1, 2^(b+1) - 2]``; the
    histogram is ONE broadcast range join against the literal edge
    table plus one map-side-combinable groupBy, cells merge by
    addition across partitions/days/clusters, and the estimate is the
    selected bucket's lower edge ``2^b - 1`` (deterministic,
    conservative, relative error <= 2x). Selection rank is
    ``ceil(q * N)`` as the SAME IEEE double product on every engine —
    integer bucket edges, no log() calls, bit-reproducible by a
    plain-SQL oracle. Windows run only on the aggregated
    (stratum, bucket) frame (<= ``max_bucket + 1`` rows per stratum).
    """
    from pyspark.sql import Window

    spark = vals.sparkSession
    v = vals.select(
        F.col(stratum_col).alias("stratum"),
        F.col(value_col).cast("long").alias("n"),
    )
    bk = spark.createDataFrame(
        [(b, 2 ** b - 1, 2 ** (b + 1) - 2) for b in range(max_bucket + 1)],
        "bucket long, lo long, hi long",
    )
    hist = (
        v.join(
            F.broadcast(bk),
            (F.col("n") >= F.col("lo")) & (F.col("n") <= F.col("hi")),
        )
        .groupBy("stratum", "bucket")
        .agg(F.count("*").alias("c"))
    )
    w_cum = (
        Window.partitionBy("stratum")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w_cum)).withColumn(
        "total", F.sum("c").over(Window.partitionBy("stratum"))
    )
    qf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    return (
        cum.crossJoin(F.broadcast(qf))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy("stratum", "q")
        .agg(F.min("bucket").alias("bucket"), F.max("total").alias("n"))
        .select(
            "stratum",
            "q",
            "bucket",
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT)) - 1"
            ).alias("est"),
            F.col("n").cast("long").alias("n"),
        )
    )
