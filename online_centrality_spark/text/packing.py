"""Training-batch construction operators: sequence packing + sampling.

``pack_sequences`` assigns every document to a training bin under a
token budget with concatenate-and-chop semantics in deterministic id
order: ``bin = floor(prev / budget)`` where ``prev`` is the running
token count of all lower-id documents. A document whose tokens straddle
a bin boundary is assigned to the bin its FIRST token lands in (so
``bin_offset + n_tokens`` may exceed ``budget`` for that one straddling
document per boundary — the contract the oracle SQL and the hypothesis
property test pin). The global running token offset is a classic
distributed prefix sum, done in two phases so NO stage ever sees a
single global-ordered partition:

1. range-bucket the ids (``width_bucket``-style affine map over the id
   span, order-preserving), aggregate one partial token sum per bucket,
2. turn the tiny per-bucket partial frame into running start offsets
   (a window over B rows, B = O(parallelism), driver-scale by design),
   broadcast it back, and finish with a per-bucket ordered window
   cumsum — every bucket's window runs in parallel.

At 100 TB the only shuffles are the per-bucket partial aggregation
(map-side combined to B rows) and the bucket-partitioned window sort;
there is no global sort and no single-task window.

``hash_sample`` is deterministic stratified sampling for data mixing:
keep a document iff ``portable_hash(id) mod 1e6 < fraction * 1e6``,
with an optional per-stratum fraction map (e.g. per language). The
md5-based hash evaluates identically in Spark SQL and DuckDB, so
sampling decisions are exactly reproducible across engines and runs —
no RNG, no seed drift, rerunning a 100 TB sweep keeps the same docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.common import TOKEN_RE, portable_hash
from .analysis import token_count

#: modulus for the deterministic sampling decision
SAMPLE_MOD = 1_000_000


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    num_buckets: int | None = None,
) -> DataFrame:
    """(id_col, n_tokens, bin, bin_offset) — greedy sequential packing.

    ``bin = floor(prev / budget)`` and ``bin_offset = prev - bin*budget``
    where ``prev`` is the running token count of all lower-id documents.
    ``tokens_col`` may name a precomputed length column; otherwise the
    engine's ``token_count`` (BPE-ish regex) supplies it.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if tokens_col is None:
        counted = token_count(docs, text_col=text_col)
        tokens_col = "n_tokens"
    else:
        counted = docs.withColumn("n_tokens", F.col(tokens_col).cast("long"))
        tokens_col = "n_tokens"
    counted = counted.select(
        F.col(id_col), F.col(tokens_col).cast("long").alias("n_tokens")
    )

    bounds = counted.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return counted.select(
            id_col,
            "n_tokens",
            F.lit(0).cast("long").alias("bin"),
            F.lit(0).cast("long").alias("bin_offset"),
        ).limit(0)
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    spark = docs.sparkSession
    nb = num_buckets or spark.sparkContext.defaultParallelism * 4
    span = hi - lo + 1
    nb = max(1, min(nb, span))
    # order-preserving affine bucket map: ids in bucket b all sort below
    # ids in bucket b+1 (integer DIV — no double rounding on wide spans)
    bucket = F.expr(
        f"CAST((CAST({id_col} AS BIGINT) - {lo}) * {nb} DIV {span} AS BIGINT)"
    )
    bucketed = counted.withColumn("_bucket", bucket)

    partials = bucketed.groupBy("_bucket").agg(
        F.sum("n_tokens").alias("_bucket_sum")
    )
    w_off = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # B = O(parallelism) rows: the single-partition window here is on the
    # tiny partials frame, never on the corpus
    offsets = partials.select(
        "_bucket",
        (F.sum("_bucket_sum").over(w_off) - F.col("_bucket_sum")).alias(
            "_bucket_start"
        ),
    )

    w_local = Window.partitionBy("_bucket").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = (
        F.sum("n_tokens").over(w_local) - F.col("n_tokens") + F.col("_bucket_start")
    )
    return (
        bucketed.join(F.broadcast(offsets), "_bucket")
        .withColumn("_prev", prev)
        .select(
            id_col,
            "n_tokens",
            F.floor(F.col("_prev") / budget).cast("long").alias("bin"),
            (F.col("_prev") % budget).cast("long").alias("bin_offset"),
        )
    )


def hash_sample(
    docs: DataFrame,
    fraction: float | None = None,
    id_col: str = "doc_id",
    stratum_col: str | None = None,
    fractions: dict[str, float] | None = None,
) -> DataFrame:
    """Deterministic (re-runnable) sampling of ``docs``.

    Uniform: ``hash_sample(docs, 0.1)`` keeps ~10% of documents, the
    SAME documents every run. Stratified: ``hash_sample(docs,
    stratum_col="lang_pred", fractions={"en": 0.5, "de": 1.0})`` applies
    a per-stratum rate (strata absent from the map keep ``fraction`` if
    given, else 0 — explicit mixing weights only).
    """
    h = portable_hash(F.col(id_col).cast("string")) % SAMPLE_MOD
    if fractions is not None:
        if stratum_col is None:
            raise ValueError("fractions requires stratum_col")
        default = F.lit(int((fraction or 0.0) * SAMPLE_MOD))
        cut = default
        for k, v in sorted(fractions.items()):
            cut = F.when(
                F.col(stratum_col) == F.lit(k), F.lit(int(v * SAMPLE_MOD))
            ).otherwise(cut)
    elif fraction is not None:
        cut = F.lit(int(fraction * SAMPLE_MOD))
    else:
        raise ValueError("need fraction or fractions")
    return docs.filter(h < cut)


def weighted_sample(
    docs: DataFrame,
    weight_col: str,
    k: int = 100,
    stratum_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Weight-proportional sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES order sampling): draw ``k`` documents per stratum
    (or globally) with inclusion probability proportional to
    ``weight_col`` — the quality-weighted subsampling stage of
    training-data assembly (sample high-quality docs preferentially
    without hard-thresholding the corpus).

    Each doc gets key = ln(u) / w where u is a DETERMINISTIC
    hash-uniform in (0, 1) (portable md5 of ``id#seed`` — same sample
    every run and every engine); the k largest keys per stratum are
    the sample. Rows with non-positive weight are excluded.

    Scale shape: the key is a pure scan-stage expression. Stratified
    mode is one partitioned top-k window (hash shuffle on the stratum,
    rank truncation); global mode is sort+limit, which Spark executes
    as TakeOrderedAndProject — per-partition heaps of k rows, never a
    full sort. Adds ``sample_key`` and per-stratum ``sample_rank``.
    """
    from pyspark.sql import Window

    u = (
        (
            portable_hash(
                F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))
            )
            % SAMPLE_MOD
            + 1
        )
        / F.lit(float(SAMPLE_MOD + 1))
    )
    keyed = docs.filter(F.col(weight_col) > 0).withColumn(
        "sample_key", F.log(u) / F.col(weight_col)
    )
    order = [F.col("sample_key").desc(), F.col(id_col).asc()]
    if stratum_col is None:
        out = keyed.orderBy(*order).limit(k)
        w = Window.orderBy(*order)
    else:
        w = Window.partitionBy(stratum_col).orderBy(*order)
        out = keyed.withColumn("sample_rank", F.row_number().over(w)).filter(
            F.col("sample_rank") <= k
        )
        return out
    return out.withColumn("sample_rank", F.row_number().over(w))


def domain_mixture_weights(
    docs: DataFrame,
    stratum_col: str,
    targets: dict[str, float],
    token_col: str = "n_tokens",
    cap: float = 10.0,
) -> DataFrame:
    """Per-stratum sampling weights that steer the corpus toward a
    target token mixture (the "domain mixing" stage of training-data
    assembly): weight = target_share / actual_share, capped.

    Returns one row per stratum: ``(stratum, stratum_tokens, share,
    target_share, weight)``. Strata missing from ``targets`` get target
    0 (weight 0 — explicit mixtures only); ``targets`` is normalized to
    sum to 1. Feed ``weight`` into :func:`hash_sample` ``fractions`` (or
    an up-sampling repeat factor when > 1).

    One map-side-combinable ``groupBy`` over the corpus; the share
    normalization runs on the STRATA frame (one row per domain — an
    unpartitioned window over dozens of rows, not corpus data).
    """
    from pyspark.sql import Window

    tot = sum(targets.values())
    norm = {k: v / tot for k, v in targets.items()}
    tmap = F.create_map(
        *[lit for k, v in sorted(norm.items()) for lit in (F.lit(k), F.lit(float(v)))]
    )
    strata = (
        docs.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(F.sum(token_col).cast("long").alias("stratum_tokens"))
        .withColumn(
            "share",
            F.col("stratum_tokens")
            / F.sum("stratum_tokens").over(Window.partitionBy()),
        )
        .withColumn(
            "target_share", F.coalesce(tmap[F.col("stratum")], F.lit(0.0))
        )
    )
    return strata.withColumn(
        "weight",
        F.when(
            F.col("share") > 0,
            F.least(F.col("target_share") / F.col("share"), F.lit(float(cap))),
        ).otherwise(F.lit(0.0)),
    )


def grouped_split(
    docs: DataFrame,
    group_col: str = "source",
    test_fraction: float = 0.1,
    splits: tuple[str, str] = ("train", "test"),
) -> DataFrame:
    """Leakage-safe train/test split: the hash is taken over the GROUP
    key (source, domain, conversation id), so every row of a group
    lands in the same split — near-duplicates and shared-provenance
    documents cannot straddle the boundary, which is the contamination
    mode a row-level split invites.

    Pure scan-stage expression (the same portable md5 keep rule as
    :func:`hash_sample` — deterministic across engines and reruns), no
    shuffle: splitting a 100 TB corpus is a projection.
    """
    h = portable_hash(F.col(group_col).cast("string")) % SAMPLE_MOD
    tag = F.when(
        h < F.lit(int(test_fraction * SAMPLE_MOD)), F.lit(splits[1])
    ).otherwise(F.lit(splits[0]))
    return docs.withColumn("split", tag)


def chunk_documents(
    docs: DataFrame,
    size: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding fixed-token-window chunking — the context-window cutter
    every LLM training pipeline runs between cleaning and packing.

    Emits (id, chunk_idx, n_tok, chunk_text): windows of ``size`` tokens
    advancing by ``size - overlap``, the trailing window shorter but
    never empty (a doc with <= size tokens is one chunk; the last chunk
    starts at the final stride position, so every token is covered and
    consecutive chunks share exactly ``overlap`` tokens).

    Scale shape: a pure per-row explode in the scan stage — zero
    shuffles, zero Python; chunking 100 TB is a projection whose output
    row count is ~n_tokens/stride per document.
    """
    if not 0 <= overlap < size:
        raise ValueError(
            f"need 0 <= overlap < size, got size={size} overlap={overlap}"
        )
    step = size - overlap
    base = (
        docs.select(
            F.col(id_col),
            F.expr(
                f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)"
            ).alias("_toks"),
        )
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") >= 1)
    )
    extra = F.expr(
        f"CASE WHEN _n > {size} THEN CAST((_n - {size} + {step - 1}) DIV {step} AS INT) ELSE 0 END"
    )
    out = base.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), extra)))
    start = F.col("chunk_idx") * step + 1
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.least(F.lit(size), F.col("_n") - F.col("chunk_idx") * step)
        .cast("int")
        .alias("n_tok"),
        F.concat_ws(" ", F.slice("_toks", start, F.lit(size))).alias(
            "chunk_text"
        ),
    )


def pipeline_funnel(
    docs: DataFrame,
    quality_floor: float = 0.5,
    min_words: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(stage_idx, stage, n_docs, total_tokens) — the stage-loss funnel
    of the standard prep pipeline: raw corpus → exact-dedup survivors →
    quality floor. The "where did my data go" report every training-
    data run is judged by, composed from the already-verified operators
    (`exact_dedup`, `quality_score`, `token_count`).

    Scale shape: the per-doc token counts are computed ONCE in the scan
    stage; each later stage is a survivor-id semi-join against that
    frame plus one map-side total aggregate, so the funnel costs one
    dedup hash groupBy + one quality scan regardless of stage count.
    All outputs are exact integers.
    """
    from ..dedup.exact import exact_dedup
    from .analysis import quality_score
    from .analysis import token_count as _tc

    tc = _tc(docs, text_col).select(id_col, F.col("n_tokens").cast("long"))
    uniq = exact_dedup(docs, text_col, id_col)
    kept = quality_score(uniq, text_col).filter(
        (F.col("quality") >= quality_floor) & (F.col("n_words") >= min_words)
    )

    def stage(frame: DataFrame, idx: int, name: str) -> DataFrame:
        scoped = tc if frame is None else frame.select(id_col).join(tc, id_col)
        return scoped.agg(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        ).select("stage_idx", "stage", "n_docs", "total_tokens")

    return (
        stage(None, 1, "raw")
        .unionAll(stage(uniq, 2, "dedup"))
        .unionAll(stage(kept, 3, "quality"))
    )
