"""Text-analysis operators for training-data pipelines.

All four are pure JVM column expressions (regex + string + arithmetic),
deliberately specified so a plain-SQL oracle evaluates them identically:

- ``token_count``: BPE-ish regex token count (words, numbers, and
  punctuation runs counted separately).
- ``quality_score``: bounded [0,1] heuristic from length, alpha ratio,
  stopword ratio, and mean word length.
- ``language_id``: stopword-list n-gram heuristic over {en, de, fr, es}
  with deterministic tie order (en > de > fr > es on equal hits).
- ``document_fingerprint``: 60-bit hash of whitespace/punct-normalized
  text (order-sensitive content fingerprint for exact-ish dedup and
  provenance tracking).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z0-9]+"
#: words OR punctuation runs — a cheap BPE-ish proxy. Doubly escaped:
#: this lands inside a SQL string literal, which consumes one backslash.
TOKEN_RE = "[a-z0-9]+|[^a-z0-9\\\\s]+"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "la", "los", "y", "es", "una"],
}


def _count_words(text_col: str, words: list[str]) -> Column:
    pat = "\\\\b(" + "|".join(words) + ")\\\\b"
    return F.expr(f"size(regexp_extract_all(lower({text_col}), '{pat}', 0))")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn(
        "n_tokens",
        F.expr(f"size(regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0))"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_words, alpha_ratio, stopword_ratio, mean_word_len, quality."""
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    n_words = F.expr(f"size({words})")
    n_chars = F.length(F.col(text_col))
    alpha_chars = F.expr(
        f"length(regexp_replace(lower({text_col}), '[^a-z0-9]', ''))"
    )
    sw = _count_words(text_col, STOPWORDS["en"])
    out = (
        docs.withColumn("n_words", n_words)
        .withColumn(
            "alpha_ratio",
            F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(F.col("n_words") > 0, sw / F.col("n_words")).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "mean_word_len",
            F.when(
                F.col("n_words") > 0,
                F.expr(f"aggregate({words}, 0, (a, w) -> a + length(w))")
                / F.col("n_words"),
            ).otherwise(F.lit(0.0)),
        )
    )
    # bounded heuristic: length sweet spot + mostly-alpha + some stopwords
    length_term = F.least(F.col("n_words") / F.lit(100.0), F.lit(1.0))
    alpha_term = F.col("alpha_ratio")
    stop_term = F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
    wl = F.col("mean_word_len")
    wordlen_term = F.when((wl >= 3.0) & (wl <= 8.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return out.withColumn(
        "quality",
        (length_term * 0.25 + alpha_term * 0.25 + stop_term * 0.25 + wordlen_term * 0.25),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``lang_pred`` — argmax stopword hits, deterministic tie order."""
    hits = {lang: _count_words(text_col, ws) for lang, ws in STOPWORDS.items()}
    best = F.lit("unknown")
    best_hits = F.lit(0)
    # first-processed language wins ties (strict '>'), so priority is
    # en > de > fr > es on equal hit counts — deterministic
    for lang in ["en", "de", "fr", "es"]:
        cond = hits[lang] > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, hits[lang]).otherwise(best_hits)
    out = docs
    for lang in STOPWORDS:
        out = out.withColumn(f"hits_{lang}", hits[lang])
    return out.withColumn("lang_pred", best)


def document_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``fingerprint`` — 60-bit hash of normalized text."""
    normalized = F.expr(
        f"trim(regexp_replace(regexp_replace(lower({text_col}), '[^a-z0-9 ]', ' '), ' +', ' '))"
    )
    return docs.withColumn(
        "fingerprint",
        F.conv(F.substring(F.md5(normalized), 1, 15), 16, 10).cast("long"),
    )


def gopher_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, table A1
    shape): per-document structural metrics + a single pass/fail bit.

    Adds ``n_words``, ``mean_word_len``, ``symbol_word_ratio`` ('#'
    chars + non-overlapping '...' runs per word), ``bullet_line_ratio``
    (lines opening with -, * or a bullet), ``ellipsis_line_ratio``
    (lines ending in '...'), ``stopword_hits`` and ``gopher_pass``
    (1 iff 10 <= n_words <= 100000, 3 <= mean_word_len <= 10,
    symbol_word_ratio <= 0.1, bullet_line_ratio <= 0.9,
    ellipsis_line_ratio <= 0.3, stopword_hits >= 2).

    Pure JVM column expressions (regex + higher-order array functions)
    codegen'd into the scan — at 100 TB this filter is a projection, not
    a shuffle — and every regex avoids engine-specific features so a
    plain-SQL oracle evaluates it identically.
    """
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    n_words = F.expr(f"size({words})")
    word_chars = F.expr(f"aggregate({words}, 0, (a, w) -> a + length(w))")
    n_hash = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    n_ellipsis = F.expr(
        f"size(regexp_extract_all({text_col}, '\\\\.\\\\.\\\\.', 0))"
    )
    lines = f"split({text_col}, '\\n')"
    n_lines = F.expr(f"size({lines})")
    n_bullet = F.expr(f"size(filter({lines}, l -> l rlike '^ *[-*•]'))")
    n_ell_lines = F.expr(
        f"size(filter({lines}, l -> l rlike '\\\\.\\\\.\\\\.$'))"
    )
    sw = _count_words(text_col, STOPWORDS["en"])
    out = (
        docs.withColumn("n_words", n_words)
        .withColumn(
            "mean_word_len",
            F.when(F.col("n_words") > 0, word_chars / F.col("n_words")).otherwise(
                F.lit(0.0)
            ),
        )
        .withColumn(
            "symbol_word_ratio",
            F.when(
                F.col("n_words") > 0, (n_hash + n_ellipsis) / F.col("n_words")
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "bullet_line_ratio",
            F.when(n_lines > 0, n_bullet / n_lines).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "ellipsis_line_ratio",
            F.when(n_lines > 0, n_ell_lines / n_lines).otherwise(F.lit(0.0)),
        )
        .withColumn("stopword_hits", sw)
    )
    return out.withColumn(
        "gopher_pass",
        (
            F.col("n_words").between(10, 100_000)
            & F.col("mean_word_len").between(3.0, 10.0)
            & (F.col("symbol_word_ratio") <= 0.1)
            & (F.col("bullet_line_ratio") <= 0.9)
            & (F.col("ellipsis_line_ratio") <= 0.3)
            & (F.col("stopword_hits") >= 2)
        ).cast("int"),
    )


def _ngram_expr(words_expr: str, n: int) -> str:
    """SQL expr: array of word ``n``-grams (space-joined), empty when the
    doc has fewer than ``n`` words (guards Spark's descending
    ``sequence(1, 0)``)."""
    return (
        f"CASE WHEN size({words_expr}) >= {n} THEN "
        f"transform(sequence(1, size({words_expr}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({words_expr}, i, {n}))) "
        f"ELSE array() END"
    )


#: (kind tag, n) for the word-n-gram repetition metrics
REP_GRAM_KINDS = [("g2", 2), ("g3", 3), ("g5", 5)]

#: Gopher-style repetition thresholds (Rae et al. 2021 table A1 shape)
REP_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "dup_5gram_char_frac": 0.15,
}


def repetition_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters: within-document duplicate-line
    and repeated-word-n-gram metrics plus a single ``rep_pass`` bit.

    Adds per document:

    - ``dup_line_frac``: 1 − distinct/total over trimmed non-empty lines
    - ``dup_line_char_frac``: chars in lines occurring more than once
      (all occurrences) / total line chars
    - ``top_2gram_char_frac`` / ``top_3gram_char_frac``: chars covered
      by the most frequent word n-gram (count × len) / total n-gram
      chars (count-weighted)
    - ``dup_5gram_char_frac``: chars in 5-grams occurring more than
      once / total 5-gram chars
    - ``rep_pass``: 1 iff every metric is within ``REP_THRESHOLDS``

    Documents too short for a given n-gram (or with no non-empty lines)
    score 0.0 on that metric — absence of evidence passes.

    Scale plan: one union of per-kind explodes → a single two-level
    aggregation keyed by ``(doc_id, kind, unit)`` then ``doc_id`` —
    both map-side-combinable, so only (doc_id, unit) pairs ever
    shuffle and no per-document O(len²) array scan runs row-side
    (long documents explode linearly, unlike a within-row
    ``filter(units, ...)`` mode count).
    """
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    lines = (
        f"filter(transform(split({text_col}, '\\n'), l -> trim(l)), "
        f"l -> l <> '')"
    )
    id_col = "doc_id"
    parts = [
        docs.select(
            id_col,
            F.lit(kind).alias("kind"),
            F.explode(F.expr(_ngram_expr(words, n))).alias("u"),
        )
        for kind, n in REP_GRAM_KINDS
    ]
    parts.append(
        docs.select(
            id_col, F.lit("ln").alias("kind"), F.explode(F.expr(lines)).alias("u")
        )
    )
    units = parts[0]
    for p in parts[1:]:
        units = units.unionByName(p)
    per_unit = units.groupBy(id_col, "kind", "u").agg(
        F.count("*").alias("c"), F.first(F.length("u")).alias("len")
    )
    w = F.col("c") * F.col("len")

    def _kind(k):
        return F.col("kind") == k

    def _frac(num, den):
        return F.coalesce(num / den, F.lit(0.0))

    per_doc = per_unit.groupBy(id_col).agg(
        _frac(
            (
                F.sum(F.when(_kind("ln"), F.col("c")))
                - F.count(F.when(_kind("ln"), F.lit(1)))
            ).cast("double"),
            F.sum(F.when(_kind("ln"), F.col("c"))),
        ).alias("dup_line_frac"),
        _frac(
            F.sum(F.when(_kind("ln") & (F.col("c") > 1), w).otherwise(0))
            .cast("double"),
            F.sum(F.when(_kind("ln"), w)),
        ).alias("dup_line_char_frac"),
        _frac(
            F.max(F.when(_kind("g2"), w)).cast("double"),
            F.sum(F.when(_kind("g2"), w)),
        ).alias("top_2gram_char_frac"),
        _frac(
            F.max(F.when(_kind("g3"), w)).cast("double"),
            F.sum(F.when(_kind("g3"), w)),
        ).alias("top_3gram_char_frac"),
        _frac(
            F.sum(F.when(_kind("g5") & (F.col("c") > 1), w).otherwise(0))
            .cast("double"),
            F.sum(F.when(_kind("g5"), w)),
        ).alias("dup_5gram_char_frac"),
    )
    out = docs.join(per_doc, id_col, "left").fillna(
        0.0, list(REP_THRESHOLDS.keys())
    )
    cond = F.lit(True)
    for col, thr in REP_THRESHOLDS.items():
        cond = cond & (F.col(col) <= thr)
    return out.withColumn("rep_pass", cond.cast("int"))


#: PII patterns, applied in this order (each is a full-line regex free
#: of lookarounds so Spark's and DuckDB's regex engines agree exactly)
PII_PATTERNS = [
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\\\.[a-zA-Z]{2,}", "<EMAIL>"),
    # ipv4 BEFORE phone: a dotted digit run also matches the phone shape
    ("ipv4", "([0-9]{1,3}\\\\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", "\\\\+?[0-9][0-9() .-]{7,}[0-9]", "<PHONE>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``text_redacted`` and ``n_redactions`` — emails, phone-ish
    number runs, and IPv4 literals replaced by typed placeholder tokens.

    The scrub stage of a training-data pipeline: pure JVM
    ``regexp_replace`` chain (codegen'd into the scan — scrubbing
    100 TB is a scan, not a shuffle), deterministic and
    oracle-checkable because every pattern avoids engine-specific
    regex features. ``n_redactions`` counts placeholder tokens in the
    redacted text (cheap provenance signal for downstream quality
    filters; assumes the literal placeholders don't pre-exist in the
    corpus).
    """
    red = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat.replace("\\\\", "\\"), token)
    tokens_alt = "|".join(t for _, _, t in PII_PATTERNS)
    out = docs.withColumn("text_redacted", red)
    return out.withColumn(
        "n_redactions",
        F.expr(
            f"size(regexp_extract_all(text_redacted, '{tokens_alt}', 0))"
        ).cast("int"),
    )


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(doc_id, term, tf, score) — the ``k`` highest tf-idf terms per
    document; score = tf * ln(N / df) rounded to 6 (deterministic
    tiebreak: rounded score desc, then term asc).

    Scale shape: tokenization and term-frequency both stay JVM-side
    (regexp + explode + map-side-combinable groupBy); document
    frequency is a second map-side agg; the per-doc top-k window
    partitions by doc_id, so no task holds more than one document's
    vocabulary. The N-row count attaches as a 1-row broadcast — the
    only driver value in the plan.
    """
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    terms = docs.select(
        "doc_id", F.explode(F.expr(words)).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select("doc_id").distinct().count()
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", "tf", "score", "rnk")
    )


def term_cooccurrence(
    docs: DataFrame,
    text_col: str = "text",
    vocab_size: int = 100,
    min_pair_count: int = 2,
) -> DataFrame:
    """(term_a, term_b, n_pair, pmi) — within-document co-occurrence
    counts and pointwise mutual information over a df-capped vocabulary
    (the word2vec/GloVe co-occurrence-matrix prep).

    ``term_a < term_b``; a pair counts once per document containing
    both. pmi = ln((n_pair * N) / (df_a * df_b)), N = total docs,
    rounded to 6.

    Scale shape: the vocabulary is capped to the ``vocab_size`` highest
    document-frequency terms (global top-k via TakeOrderedAndProject —
    per-partition heaps, no global sort), so the per-doc self-join
    explodes at most vocab_size^2 / 2 pairs per document and the
    (tiny) vocab table broadcasts to both join sides. Everything else
    is map-side-combinable aggregation.
    """
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    doc_terms = (
        docs.select("doc_id", F.explode(F.expr(words)).alias("term"))
        .distinct()
    )
    df_ = doc_terms.groupBy("term").agg(F.count("*").alias("df"))
    # deterministic vocab: df desc, term asc -> TakeOrderedAndProject
    vocab = df_.orderBy(F.col("df").desc(), F.col("term").asc()).limit(
        vocab_size
    )
    n_docs = docs.select("doc_id").distinct().count()
    dt = doc_terms.join(F.broadcast(vocab), "term")
    a = dt.select("doc_id", F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    b = dt.select("doc_id", F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(
            F.count("*").alias("n_pair"),
            F.first("df_a").alias("df_a"),
            F.first("df_b").alias("df_b"),
        )
        .filter(F.col("n_pair") >= min_pair_count)
    )
    return pairs.select(
        "term_a",
        "term_b",
        "n_pair",
        F.round(
            F.log(
                (F.col("n_pair") * F.lit(float(n_docs)))
                / (F.col("df_a") * F.col("df_b"))
            ),
            6,
        ).alias("pmi"),
    )


def token_percentiles(
    docs: DataFrame,
    text_col: str = "text",
    percentiles: tuple = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """(lang, p, n_tokens) — exact interpolated token-count percentiles
    per language plus an 'all' stratum (corpus length profiling for
    sequence-length budgeting).

    Exact percentiles are a full-sort-per-group operation by definition;
    Spark's ``percentile`` aggregate computes them with a per-group
    in-memory map — right for profiling runs. At 100 TB, swap to
    ``percentile_approx`` (t-digest, one pass, mergeable) — same call
    shape, bounded memory, documented trade.

    All requested percentiles come out of ONE groupBy (then a stack
    unpivot on the |langs|-cardinality frame) — a union of per-p
    aggregate branches would re-run the corpus tokenization once per
    percentile, since Spark does not dedupe common subplans across
    union branches.
    """
    tc = token_count(docs, text_col).select(
        F.col("lang"), F.col("n_tokens").cast("double").alias("n")
    )
    both = tc.unionAll(tc.select(F.lit("all").alias("lang"), "n"))
    agged = both.groupBy("lang").agg(
        *[
            F.round(F.expr(f"percentile(n, {p})"), 6).alias(f"_p{i}")
            for i, p in enumerate(percentiles)
        ]
    )
    stack = ", ".join(
        f"CAST({p} AS DOUBLE), _p{i}" for i, p in enumerate(percentiles)
    )
    return agged.select(
        "lang",
        F.expr(f"stack({len(percentiles)}, {stack}) AS (p, n_tokens)"),
    )


def zipf_profile(
    docs: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """(rank, token, freq, zipf_slope) — the corpus's Zipf profile: the
    ``top_n`` most frequent tokens with their global frequency rank,
    plus the log-log regression slope fitted over the ENTIRE vocabulary
    (a natural-text corpus sits near slope -1; synthetic / template /
    spam-heavy corpora flatten or steepen it, so the slope is a cheap
    corpus-health scalar next to the gopher rules).

    Scale design: token frequencies are one map-side-combinable groupBy;
    the global rank uses
    :func:`~online_centrality_spark.sources.edges.add_global_seq`
    (two-phase range-partitioned rank — no single-partition window over
    the vocabulary, which can be billions of tokens at 100 TB); the
    slope is a single ``regr_slope`` aggregate (mergeable sufficient
    statistics) attached to the bounded top-``top_n`` frame via the
    engine's standard 1-row scalar cross-join.
    """
    from online_centrality_spark.sources.edges import add_global_seq

    terms = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("token")
    )
    freq = terms.groupBy("token").agg(F.count("*").alias("freq"))
    ranked = add_global_seq(
        freq.withColumn("nfreq", -F.col("freq")),
        ["nfreq", "token"],
        seq_col="rank",
    ).drop("nfreq")
    slope = ranked.agg(
        F.round(
            F.regr_slope(F.log(F.col("freq")), F.log(F.col("rank"))), 6
        ).alias("zipf_slope")
    )
    return (
        ranked.filter(F.col("rank") <= top_n)
        .crossJoin(F.broadcast(slope))
        .select(
            F.col("rank").cast("long").alias("rank"),
            "token",
            F.col("freq").cast("long").alias("freq"),
            "zipf_slope",
        )
    )


def bpe_merges(
    docs: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """(pair, n) — the ``top_k`` most frequent adjacent character pairs
    weighted by corpus token frequency: the first merge round of BPE
    tokenizer induction, distributed.

    Scale design: the classic BPE trick — pair enumeration runs over
    the DISTINCT vocabulary (one row per token type, weighted by its
    corpus frequency), so the explode work is vocab-size x token-length
    regardless of corpus size; the frequency table itself is one
    map-side-combinable groupBy over the tokenized scan. Top-k via
    TakeOrderedAndProject with a deterministic (n desc, pair asc)
    tiebreak.
    """
    terms = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("token")
    )
    vocab = terms.groupBy("token").agg(F.count("*").alias("freq"))
    pairs = (
        vocab.filter(F.length("token") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(token) - 1),"
                    " i -> substr(token, i, 2))"
                )
            ).alias("pair"),
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(top_k)
    )


def domain_divergence(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(source, n_tokens, kl)`` — KL divergence of each domain's
    unigram distribution from the whole-corpus distribution, the
    standard "how far does this source drift from the mixture" score
    that drives domain reweighting (DoReMi-style diagnostics).

    Engine-parity discipline for a transcendental SUM: each per-word
    term ``p_d·ln(p_d/p)`` is a fixed IEEE-double chain (deterministic
    per row), but a float SUM is order-dependent — so every term is
    rounded to a scaled int64 (``round(term·1e12)``) and summed
    EXACTLY, making the total independent of partitioning in both
    engines.

    Scale shape: tokenize + two map-side-combinable groupBys; the
    corpus word table derives from the per-domain table (one scan);
    per-domain totals broadcast (domains are few), the 1-row corpus
    total cross-joins. The word-keyed join shuffles on the
    high-cardinality word key.
    """
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    tok = docs.select("source", F.explode(F.expr(words)).alias("w"))
    cdw = tok.groupBy("source", "w").agg(F.count("*").alias("cdw")).persist()
    cw = cdw.groupBy("w").agg(F.sum("cdw").alias("cw"))
    nd = cdw.groupBy("source").agg(F.sum("cdw").alias("nd"))
    n = cdw.agg(F.sum("cdw").alias("n"))
    pd_ = F.col("cdw").cast("double") / F.col("nd")
    p = F.col("cw").cast("double") / F.col("n")
    term = pd_ * F.log(pd_ / p)
    scaled = (
        cdw.join(cw, "w")
        .join(F.broadcast(nd), "source")
        .crossJoin(F.broadcast(n))
        .select("source", "nd", F.round(term * 1e12).cast("long").alias("t"))
    )
    return scaled.groupBy("source").agg(
        F.first("nd").cast("long").alias("n_tokens"),
        F.round(F.sum("t") / 1e12, 6).alias("kl"),
    )


def doc_surprisal(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(doc_id, n_tokens, cross_entropy)`` — each document's
    cross-entropy (nats/token) under the corpus unigram language model:
    ``H(d) = −Σ_w (c_dw/len_d)·ln(c_w/N)``. The classic cheap
    perplexity proxy for quality filtering — boilerplate and
    common-word soup scores low, rare-token noise scores high, and the
    useful corpus lives in the middle band.

    Scale shape: one tokenize + per-(doc, word) groupBy, a word-keyed
    join against the corpus counts (derived from the same frame — one
    scan), the 1-row total as a broadcast cross join; per-term values
    use the scaled-int64 sum rule (`domain_divergence`) so the per-doc
    totals are partition-order independent in both engines.
    """
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    tok = docs.select("doc_id", F.explode(F.expr(words)).alias("w"))
    cdw = tok.groupBy("doc_id", "w").agg(F.count("*").alias("cdw")).persist()
    cw = cdw.groupBy("w").agg(F.sum("cdw").alias("cw"))
    ld = cdw.groupBy("doc_id").agg(F.sum("cdw").alias("ld"))
    n = cdw.agg(F.sum("cdw").alias("n"))
    term = (
        (F.col("cdw").cast("double") / F.col("ld"))
        * F.log(F.col("cw").cast("double") / F.col("n"))
    )
    scaled = (
        cdw.join(cw, "w")
        .join(ld, "doc_id")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "ld", F.round(term * 1e12).cast("long").alias("t"))
    )
    return scaled.groupBy("doc_id").agg(
        F.first("ld").cast("long").alias("n_tokens"),
        F.round(-F.sum("t") / 1e12, 6).alias("cross_entropy"),
    )


def vocab_growth(
    docs: DataFrame, text_col: str = "text", buckets: int = 20
) -> DataFrame:
    """``(bucket, n_docs_cum, vocab_cum)`` — the Heaps'-law curve:
    cumulative distinct vocabulary as the corpus grows in doc-id order,
    sampled at ``buckets`` evenly sized id ranges. Sub-linear growth is
    healthy; a late-corpus vocabulary spike flags an unassimilated new
    source or encoding noise.

    Scale shape: each word's FIRST bucket is a map-side min; the
    cumulative curve is a theta-join of two bucket-sized histograms
    (the `rich_club` pattern) — nothing after the first groupBy scales
    with the corpus. The only driver value is the max doc id for the
    bucket width.
    """
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    mx = docs.agg(F.max("doc_id").alias("m")).first()["m"]
    if mx is None:
        return docs.sparkSession.createDataFrame(
            [], "bucket long, n_docs_cum long, vocab_cum long"
        )
    width = mx // buckets + 1
    db = docs.select(
        F.expr(f"doc_id div {width}").alias("b"), F.col(text_col)
    ).persist()
    first_b = (
        db.select("b", F.explode(F.expr(words)).alias("w"))
        .groupBy("w")
        .agg(F.min("b").alias("fb"))
        .groupBy("fb")
        .agg(F.count("*").alias("nw"))
    )
    docs_b = db.groupBy("b").agg(F.count("*").alias("nd"))
    ks = docs_b.select(F.col("b").alias("bucket"))
    vg = (
        ks.join(first_b, first_b["fb"] <= ks["bucket"])
        .groupBy("bucket")
        .agg(F.sum("nw").alias("vocab_cum"))
    )
    dg = (
        ks.join(docs_b, docs_b["b"] <= ks["bucket"])
        .groupBy("bucket")
        .agg(F.sum("nd").alias("n_docs_cum"))
    )
    return dg.join(vg, "bucket", "left").select(
        "bucket",
        F.col("n_docs_cum").cast("long").alias("n_docs_cum"),
        F.coalesce(F.col("vocab_cum"), F.lit(0)).cast("long").alias("vocab_cum"),
    )


def oov_rate(docs: DataFrame, text_col: str = "text", vocab_k: int = 1000) -> DataFrame:
    """``(doc_id, n_tokens, n_oov, oov)`` — the fraction of each
    document's token occurrences falling outside the corpus's top-``k``
    vocabulary (count desc, word asc tiebreak — deterministic at the
    boundary). High OOV = noise/encoding junk or genuinely novel
    domain; a standard cheap quality gate.

    The vocabulary is a TakeOrderedAndProject ``k``-row frame broadcast
    into one left join; everything else is the per-(doc, word) groupBy.
    """
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    cdw = (
        docs.select("doc_id", F.explode(F.expr(words)).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("cdw"))
        .persist()
    )
    vocab = (
        cdw.groupBy("w")
        .agg(F.sum("cdw").alias("cw"))
        .orderBy(F.col("cw").desc(), F.col("w").asc())
        .limit(vocab_k)
        .select("w", F.lit(1).alias("in_v"))
    )
    return (
        cdw.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("cdw").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_v").isNull(), F.col("cdw")).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov"),
        )
    )


def cramers_v(
    docs: DataFrame, a_col: str = "lang", b_col: str = "source"
) -> DataFrame:
    """1-row ``(n_docs, n_a, n_b, v)`` — Cramér's V association between
    two categorical document columns (default language × source):
    0 = independent, 1 = one determines the other. Catches skews like
    "this source is single-language" that stratified sampling must know
    about.

    The contingency grid is (distinct a)×(distinct b) rows — built by a
    cross join of the two margin frames so ZERO cells contribute their
    expected-count term; χ² cell terms use the scaled-int64 sum rule.
    """
    ct = docs.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count("*").alias("nij"))
    ra = ct.groupBy("a").agg(F.sum("nij").alias("r"))
    cb = ct.groupBy("b").agg(F.sum("nij").alias("c"))
    tot = ct.agg(F.sum("nij").alias("n"))
    grid = (
        ra.crossJoin(cb)
        .join(ct, ["a", "b"], "left")
        .select(
            "r", "c", F.coalesce(F.col("nij"), F.lit(0)).alias("nij")
        )
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    term = (F.col("nij").cast("double") - e) * (F.col("nij").cast("double") - e) / e
    agg = grid.select(
        "n", F.round(term * 1e12).cast("long").alias("t")
    ).groupBy("n").agg(F.sum("t").alias("ts"))
    counts = ra.agg(F.count("*").alias("n_a")).crossJoin(
        cb.agg(F.count("*").alias("n_b"))
    )
    m = F.least(F.col("n_a"), F.col("n_b"))
    return (
        agg.crossJoin(F.broadcast(counts))
        .select(
            F.col("n").cast("long").alias("n_docs"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.when(m <= 1, F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    F.sqrt(
                        (F.col("ts").cast("double") / 1e12)
                        / (F.col("n").cast("double") * (m - F.lit(1)))
                    ),
                    6,
                )
            )
            .alias("v"),
        )
    )


def token_quantile_sketch(
    docs: DataFrame,
    text_col: str = "text",
    quantiles: tuple = (0.5, 0.9, 0.99),
    max_bucket: int = 40,
) -> DataFrame:
    """(lang, q, bucket, est_tokens, n_docs) — log-bucket quantile
    SKETCH over per-doc token counts, per language plus 'all': the
    mergeable O(#buckets)-state twin of :func:`token_percentiles`.

    Where the exact operator needs a full per-group sort (or a
    t-digest), the sketch is a 41-cell power-of-two histogram —
    bucket ``b`` holds counts in ``[2^b - 1, 2^(b+1) - 2]`` — built by
    ONE broadcast range join against the literal bucket-edge table and
    one map-side-combinable groupBy. Cells merge by addition across
    partitions, days, and clusters, so at 100 TB the corpus-length
    profile is a reduce over 41 longs per stratum. The estimate
    ``est_tokens = 2^b - 1`` is the selected bucket's lower edge
    (deterministic, conservative, relative error bounded by 2x);
    selection rank is ``ceil(q * N)`` computed as the SAME IEEE double
    product on every engine, so the sketch is bit-reproducible by the
    plain-SQL oracle — integer bucket edges, no log() calls anywhere.

    The windows run on the AGGREGATED (lang, bucket) frame — at most
    41 rows per language — never on the corpus.
    """
    from .sketches import log_bucket_quantiles

    tc = token_count(docs, text_col).select(
        "lang", F.col("n_tokens").cast("long").alias("n")
    )
    both = tc.unionAll(tc.select(F.lit("all").alias("lang"), "n"))
    return log_bucket_quantiles(
        both, "lang", "n", quantiles, max_bucket
    ).select(
        F.col("stratum").alias("lang"),
        "q",
        "bucket",
        F.col("est").alias("est_tokens"),
        F.col("n").alias("n_docs"),
    )


def token_bucket_histogram(
    docs: DataFrame, text_col: str = "text", max_bucket: int = 40
) -> DataFrame:
    """(lang, bucket, c) — the power-of-two token-count histogram the
    quantile sketch selects from, exposed on its own because its cells
    are ADDITIVE: the same call streams in complete mode (stream-static
    broadcast range join + count agg; witnessed live in
    ``tests/test_streaming.py``), and day-partitioned batch histograms
    merge into the corpus histogram by summing ``c`` per cell."""
    spark = docs.sparkSession
    tc = token_count(docs, text_col).select(
        "lang", F.col("n_tokens").cast("long").alias("n")
    )
    both = tc.unionAll(tc.select(F.lit("all").alias("lang"), "n"))
    bk = spark.createDataFrame(
        [(b, 2 ** b - 1, 2 ** (b + 1) - 2) for b in range(max_bucket + 1)],
        "bucket long, lo long, hi long",
    )
    return (
        both.join(
            F.broadcast(bk),
            (F.col("n") >= F.col("lo")) & (F.col("n") <= F.col("hi")),
        )
        .groupBy("lang", "bucket")
        .agg(F.count("*").alias("c"))
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_df: int = 5,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(gram, df) — word n-grams appearing in at least ``min_df``
    DISTINCT documents, the ``top_k`` most widespread first: the
    boilerplate-phrase extraction pass a C4-style cleaner runs before
    stripping navigation chrome / license banners / cookie notices
    from a crawl.

    Per-doc n-grams are DISTINCT (``word_ngrams``), so a plain count
    after the explode IS the document frequency — no countDistinct
    shuffle. Scale shape: shingle explode (bounded by document length)
    → one map-side-combinable groupBy on the gram, ``min_df`` filter,
    then a TakeOrderedAndProject top-k — the df-threshold mirrors
    ``max_doc_freq`` in the Jaccard pipeline, where the SAME widespread
    grams are dropped as hubs; this operator is that hub list made
    queryable. Deterministic order: (df DESC, gram ASC).
    """
    from ..dedup.common import spread, word_ngrams

    grams = (
        spread(docs)
        .select(F.col(id_col), word_ngrams(text_col, n).alias("grams"))
        .select(F.explode("grams").alias("gram"))
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").cast("long").alias("df"))
        .filter(F.col("df") >= min_df)
        .orderBy(F.col("df").desc(), F.col("gram").asc())
        .limit(top_k)
    )


def lexical_saturation(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """``(source, n_docs, mean_tokens, mean_distinct, corr)`` — per
    group, the Pearson correlation between each document's token count
    and its DISTINCT-token count. Near-1 correlation means vocabulary
    keeps growing with length (natural text); a depressed correlation
    flags template/boilerplate strata whose vocabulary saturates — the
    per-source companion to the corpus-level ``vocab_growth`` Heaps
    curve. No reference counterpart.

    Scale shape: per-doc token/distinct counts are one explode + one
    map-side-combinable (doc, term) groupBy (the same shuffle envelope
    as ``tfidf_top_terms``); the five Pearson sufficient statistics
    are EXACT INT64 sums (both features are integer counts), so the
    per-group reduce is map-side-combinable and the gate hash is
    partition-layout-proof — only the final correlation division
    floats, rounded to 6. Degenerate groups (zero variance in either
    feature) emit corr = 0.0 by convention.
    """
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    terms = docs.select(
        "doc_id", F.col(group_col).alias("grp"), F.explode(F.expr(words)).alias("term")
    )
    per_doc = (
        terms.groupBy("doc_id", "grp")
        .agg(
            F.count("*").alias("x"),
            F.count_distinct("term").alias("y"),
        )
    )
    agg = per_doc.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    vy = agg["n"] * agg["syy"] - agg["sy"] * agg["sy"]
    cov = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("n").cast("long").alias("n_docs"),
        F.round(F.col("sx") / F.col("n"), 6).alias("mean_tokens"),
        F.round(F.col("sy") / F.col("n"), 6).alias("mean_distinct"),
        F.when(
            (vx > 0) & (vy > 0),
            # vx*vy can overflow int64 (each is O(n * sum(x^2)));
            # both engines take the double product of the exact longs
            F.round(cov / F.sqrt(vx.cast("double") * vy.cast("double")), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("corr"),
    )


def char_entropy(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """``(source, n_docs, mean_char_entropy)`` — per group, the mean
    Shannon entropy (nats) of each document's character distribution
    over ``[a-z0-9]`` — the gibberish/format screen token-level
    ``doc_surprisal`` can't see (repeated-token spam has normal token
    surprisal but collapsed character entropy; base64/hex blobs the
    reverse). Documents with no matching characters are skipped.
    No reference counterpart.

    Scale shape: one char explode + a map-side-combinable
    (doc, char) groupBy (alphabet-bounded per-doc fan-in); each
    per-doc entropy term ``-(c/n) ln(c/n)`` is a fixed double chain
    rounded to a scaled int64 BEFORE the sums (the
    ``transition_entropy`` order-independence rule), so both the
    per-doc fold and the per-group mean reduce over exact integers and
    the gate hash is layout-proof. Only the final mean floats,
    rounded to 6.
    """
    chars = docs.select(
        "doc_id",
        F.col(group_col).alias("grp"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]', 0)")
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "grp", "ch").agg(
        F.count("*").alias("c")
    )
    totals = counts.groupBy("doc_id").agg(F.sum("c").alias("n"))
    term = -(F.col("c").cast("double") / F.col("n")) * F.log(
        F.col("c").cast("double") / F.col("n")
    )
    per_doc = (
        counts.join(totals, "doc_id")
        .select(
            "doc_id", "grp", F.round(term * 1e12).cast("long").alias("t")
        )
        .groupBy("doc_id", "grp")
        .agg(F.sum("t").alias("ent"))
    )
    return per_doc.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round((F.sum("ent") / 1e12) / F.count("*"), 6).alias(
            "mean_char_entropy"
        ),
    ).select(
        F.col("grp").alias(group_col), "n_docs", "mean_char_entropy"
    )


def source_vocab_overlap(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """``(source_a, source_b, n_a, n_b, n_common, jaccard)`` for every
    unordered source pair — vocabulary-set Jaccard between corpus
    strata: the set-overlap companion to ``domain_divergence``'s
    distributional KL (two sources can share every term yet diverge in
    frequency, or vice versa). No reference counterpart.

    Scale shape: the (source, term) distinct is the one data-sized
    shuffle (map-side combining collapses within-doc repeats); the
    term-keyed self-join fans out as (#sources carrying the term)² —
    bounded by the GROUP alphabet squared, not by corpus — and the
    output is |sources|² rows. Exact integers everywhere; only the
    final Jaccard floats, rounded to 6.
    """
    words = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    vocab = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(F.expr(words)).alias("term"),
        )
        .distinct()
        .persist()
    )
    sizes = vocab.groupBy("grp").agg(F.count("*").alias("n"))
    inter = (
        vocab.select(F.col("grp").alias("ga"), "term")
        .join(vocab.select(F.col("grp").alias("gb"), "term"), "term")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.select(F.col("grp").alias("ga"), F.col("n").alias("na")), "ga")
        .join(sizes.select(F.col("grp").alias("gb"), F.col("n").alias("nb")), "gb")
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            F.col("i").cast("long").alias("n_common"),
            F.round(
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 6
            ).alias("jaccard"),
        )
    )


def word_bigram_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """1-row ``(n_bigrams, n_states, entropy_rate)`` — the corpus-level
    conditional Shannon entropy H(next word | current word) in nats
    over within-document word transitions: how predictable is text
    word-to-word? The corpus companion to the per-user
    ``transition_entropy`` (same math, word alphabet instead of event
    types) and the model-free floor for language-model perplexity on
    this corpus. No reference counterpart.

    Scale shape: bigram pairs come from a JVM zip of each document's
    token array with its own tail (``arrays_zip`` + ``slice`` — no
    window, no shuffle until the pair groupBy); the (cur, next) count
    matrix is vocabulary-bounded; each term ``(c_ij/N) ln(c_ij/c_i)``
    is rounded to a scaled int64 before the exact sum (the
    ``transition_entropy`` rule).
    """
    toks = f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)"
    pairs = docs.select(
        F.explode(
            F.expr(
                f"CASE WHEN size({toks}) >= 2 THEN "
                f"arrays_zip(slice({toks}, 1, size({toks}) - 1), "
                f"slice({toks}, 2, size({toks}) - 1)) "
                "ELSE array() END"
            )
        ).alias("p")
    ).select(
        F.col("p").getField("0").alias("cur"),
        F.col("p").getField("1").alias("nxt"),
    )
    cij = pairs.groupBy("cur", "nxt").agg(F.count("*").alias("cij")).persist()
    ci = cij.groupBy("cur").agg(F.sum("cij").alias("ci"))
    n = cij.agg(F.sum("cij").alias("n"), F.count_distinct("cur").alias("k"))
    term = -(F.col("cij").cast("double") / F.col("n")) * F.log(
        F.col("cij").cast("double") / F.col("ci")
    )
    return (
        cij.join(ci, "cur")
        .crossJoin(F.broadcast(n))
        .select("n", "k", F.round(term * 1e12).cast("long").alias("t"))
        .groupBy("n", "k")
        .agg(F.sum("t").alias("s"))
        .select(
            F.col("n").cast("long").alias("n_bigrams"),
            F.col("k").cast("long").alias("n_states"),
            F.round(F.col("s") / 1e12, 6).alias("entropy_rate"),
        )
    )


def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(grade_bucket, n_docs) — Flesch–Kincaid grade-level histogram
    of the corpus, the classic readability quality signal for training
    -data filtering (alongside ``quality_score`` / ``gopher_rules``).

    grade = 0.39 * words/sentences + 11.8 * syllables/word - 15.59,
    with syllables approximated as vowel groups (min 1 per word) and
    sentences as ``[.!?]+`` runs (min 1 per doc) — the standard
    dictionary-free approximation. All counts are exact integers
    computed in the scan (regex + higher-order array functions, no
    Python), so the grade doubles — and the floored buckets, clamped
    to [-5, 30] — are bit-identical across engines and partitionings.
    Docs with no alphabetic words are skipped (no grade is defined).
    """
    t = text_col
    per_doc = docs.select(
        F.expr(
            f"size(regexp_extract_all(lower({t}), '[a-z]+', 0))"
        ).alias("w"),
        F.expr(
            f"aggregate(transform(regexp_extract_all(lower({t}), "
            f"'[a-z]+', 0), x -> greatest(size(regexp_extract_all(x, "
            f"'[aeiouy]+', 0)), 1)), 0L, (a, x) -> a + x)"
        ).alias("sy"),
        F.expr(
            f"greatest(size(regexp_extract_all({t}, '[.!?]+', 0)), 1)"
        ).alias("se"),
    ).filter(F.col("w") > 0)
    grade = (
        F.lit(0.39) * (F.col("w") / F.col("se"))
        + F.lit(11.8) * (F.col("sy") / F.col("w"))
        - F.lit(15.59)
    )
    bucket = F.greatest(
        F.lit(-5), F.least(F.lit(30), F.floor(grade))
    ).cast("long")
    return (
        per_doc.select(bucket.alias("grade_bucket"))
        .groupBy("grade_bucket")
        .agg(F.count("*").alias("n_docs"))
    )


def dataset_card(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus summary — the "dataset card" header every
    training corpus ships with: document/character/token totals,
    language coverage, the dominant language and its share, and the
    exact-duplicate rate (md5 content hash), all from one full pass
    plus one language-cardinality aggregate.

    Scale: the main aggregate is map-side combinable except the two
    exact count-distincts (md5 hash, lang) — the same documented
    Expand price as ``table_profile``; the top-language pick runs on
    the |langs|-bounded frame and attaches via a 1-row broadcast
    crossJoin. Ratios are exact-integer divisions rounded to 6."""
    t = text_col
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(F.col(t))).alias("total_chars"),
        F.sum(
            F.expr(f"size(regexp_extract_all(lower({t}), '{TOKEN_RE}', 0))")
        ).alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5(F.col(t))).alias("n_unique_docs"),
    )
    top = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("lang").asc())
        .limit(1)
        .select(F.col("lang").alias("top_lang"), F.col("n").alias("top_n"))
    )
    return base.crossJoin(F.broadcast(top)).select(
        "n_docs",
        "total_chars",
        "total_tokens",
        "n_langs",
        "top_lang",
        F.round(F.col("top_n") / F.col("n_docs"), 6).alias("top_lang_share"),
        F.round(
            (F.col("n_docs") - F.col("n_unique_docs")) / F.col("n_docs"), 6
        ).alias("dup_rate"),
    )
