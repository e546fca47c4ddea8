"""Cross-document duplicated-span removal (ExactSubstr-style).

The exact-substring dedup stage of an LLM training pipeline (Lee et
al. 2021, "Deduplicating Training Data Makes Language Models Better"),
re-expressed at word-n-gram granularity: any word n-gram occurring at
least ``min_count`` times corpus-wide marks every token position it
covers as duplicated; covered tokens are removed and the survivors are
re-joined in original order.

Scale plan: only ``(doc_id, start, gram_hash)`` triples ever shuffle
(same cardinality as the shingle table the Jaccard/MinHash family
already pays for); the duplicated-gram set is a semi-join whose build
side AQE broadcasts when small; covered positions collapse back to one
bounded-size array per document (positions per doc <= tokens per doc),
so the final reassembly is one join plus JVM higher-order ``filter``
over the token array — no Python, no window, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .common import TOKEN_RE, portable_hash, spread


def positional_ngrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """(doc_id, start, gram_hash) — every word n-gram with its 0-based
    start token position (NOT distinct: repeats inside one document
    count toward the corpus-wide occurrence total)."""
    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)"
    # bind the token array once (see word_ngrams) and keep the start index
    body = (
        f"CASE WHEN size(t) >= {n} THEN "
        f"transform(sequence(1, size(t) - {n - 1}), "
        f"i -> struct(i - 1 AS start, array_join(slice(t, i, {n}), ' ') AS gram)) "
        f"ELSE array(CAST(NULL AS struct<start:int,gram:string>)) END"
    )
    expr = F.expr(f"filter(transform(array({toks}), t -> {body})[0], s -> s IS NOT NULL)")
    return (
        spread(docs)
        .select(F.col(id_col), F.explode(expr).alias("s"))
        .select(
            id_col,
            F.col("s.start").alias("start"),
            portable_hash(F.col("s.gram")).alias("gram_hash"),
        )
    )


def remove_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Per document: duplicated-token stats and the cleaned text.

    Output: (doc_id, n_tokens, n_dup_tokens, dup_frac, clean_text)
    where a token is duplicated iff some corpus-wide duplicated n-gram
    (total occurrences >= ``min_count``) covers its position.
    """
    grams = positional_ngrams(docs, text_col, id_col, n)
    dup = (
        grams.groupBy("gram_hash")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
        .select("gram_hash")
    )
    covered = (
        grams.join(dup, "gram_hash", "left_semi")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(n - 1))
            ).alias("pos"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("pos")).alias("cov"))
    )
    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)"
    return (
        docs.join(covered, id_col, "left")
        .withColumn("t", F.expr(toks))
        .withColumn("cov", F.coalesce(F.col("cov"), F.expr("array()").cast("array<int>")))
        .select(
            id_col,
            F.size("t").alias("n_tokens"),
            F.size("cov").alias("n_dup_tokens"),
            F.round(
                F.when(F.size("t") > 0, F.size("cov") / F.size("t")).otherwise(0.0), 6
            ).alias("dup_frac"),
            F.expr(
                "array_join(filter(t, (w, i) -> NOT array_contains(cov, i)), ' ')"
            ).alias("clean_text"),
        )
    )
