"""Shared primitives for the dedup family.

The hash is deliberately *portable SQL*: ``conv(substr(md5(s),1,15),16,10)``
evaluates identically in Spark SQL and DuckDB (``('0x'||substr(md5(s),1,15))::BIGINT``),
so every dedup operator has an exact cross-engine oracle. 60 bits, JVM-side,
codegen'd — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


def spread(df, min_ratio: int = 1):
    """Repartition a small-file input up to the session's parallelism.

    Operators that EXPLODE rows (shingling, salted minhashing) multiply
    per-partition work by orders of magnitude; a single-file parquet scan
    arrives as one partition and would serialize the whole stage on one
    core. No-op when the input is already spread.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_ratio
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def portable_hash(col: Column) -> Column:
    """Deterministic 60-bit hash of a string column (md5-prefix based)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(text_col: Column) -> Column:
    """Lowercased alphanumeric tokens (array<string>)."""
    return F.expr(f"regexp_extract_all(lower({text_col._jc.toString() if hasattr(text_col, '_jc') else text_col}), '{TOKEN_RE}', 0)")


def tokens_expr(text_col_name: str) -> Column:
    return F.expr(
        f"regexp_extract_all(lower({text_col_name}), '{TOKEN_RE}', 0)"
    )


def word_ngrams(text_col_name: str, n: int) -> Column:
    """Distinct space-joined word n-grams (array<string>).

    The tokenization regex is evaluated ONCE per row via a lambda-bound
    alias: inlining it would re-run ``regexp_extract_all`` for every
    n-gram inside the ``transform`` lambda (O(tokens * doc_len) per doc
    — measured 40x slower on shingle generation).
    """
    toks = f"regexp_extract_all(lower({text_col_name}), '{TOKEN_RE}', 0)"
    # guard: sequence(1, 0) would DESCEND in Spark, so emit an empty array
    # for docs shorter than n tokens
    body = (
        f"CASE WHEN size(t) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(t) - {n - 1}), "
        f"i -> array_join(slice(t, i, {n}), ' '))) "
        f"ELSE array() END"
    )
    # bind the token array once with a single-element transform
    return F.expr(f"transform(array({toks}), t -> {body})[0]")
