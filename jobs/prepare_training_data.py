"""spark-submit entry point: end-to-end training-data preparation.

The full corpus-prep pipeline the engine's pipeline operators exist
for, composed as ONE DataFrame program (launch with --py-files exactly
like jobs/replay_job.py):

    documents
      -> exact dedup        (content fingerprint, keep min id)
      -> near-dup clusters  (n-gram Jaccard or MinHash-LSH pairs ->
                             connected components -> canonical doc)
      -> semantic dedup     (optional: SemDeDup kmeans clusters ->
                             within-cluster cosine pruning)
      -> quality/language   (JVM column expressions)
      -> stratified sample  (deterministic md5-bucket keep rates)
      -> holdout split      (optional: leakage-safe, hashes SOURCE so
                             no provenance group straddles train/test)
      -> sequence packing   (token-budget bins, distributed prefix sum;
                             train split only when a holdout is cut)
      -> partitioned parquet sink (bin_group=<bin // bins_per_file>)

Every stage is a column expression, hash aggregation, bucketed
self-join, or broadcast join — the only corpus-wide shuffles are the
dedup bucket joins and the packing range-bucket exchange. Prints one
JSON metrics line.

    spark-submit --master local[8] \
        --py-files dist/online_centrality_spark.zip \
        jobs/prepare_training_data.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/corpus_out
"""

import argparse
import json
import time


def build_pipeline(
    spark,
    docs,
    pair_method: str = "ngram",
    jaccard_threshold: float = 0.5,
    sample_rates: dict | None = None,
    default_rate: float = 1.0,
    budget: int = 512,
    test_fraction: float = 0.0,
    chunk_size: int = 0,
    chunk_overlap: int = 16,
    embeddings=None,
    semantic_threshold: float = 0.0,
    semantic_k: int = 10,
):
    """Return (kept_docs, packed) DataFrames for the prep pipeline."""
    from pyspark.sql import functions as F

    from online_centrality_spark.dedup import (
        dedup_clusters,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from online_centrality_spark.text import (
        hash_sample,
        language_id,
        pack_sequences,
        quality_score,
        redact_pii,
    )
    from online_centrality_spark.text.analysis import document_fingerprint

    # 1. exact dedup on the content fingerprint (min id per group kept).
    # keep_exact is corpus-cardinality (one row per unique document), so
    # NO broadcast hint: a plain shuffled left-semi on doc_id is the
    # 100 TB plan, and AQE still picks broadcast when it's actually small.
    fp = document_fingerprint(docs).select("doc_id", "fingerprint")
    keep_exact = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    docs1 = docs.join(keep_exact.select("doc_id"), "doc_id", "left_semi")

    # 2. near-dup clustering -> canonical docs only
    if pair_method == "ngram":
        pairs = ngram_jaccard_pairs(docs1, n=2, threshold=jaccard_threshold)
    elif pair_method == "minhash":
        pairs = minhash_lsh_candidates(docs1, k=16, num_bands=4)
    else:
        raise ValueError(f"unknown pair_method {pair_method!r}")
    # kept-canonical ids are again corpus-cardinality — shuffled semi-join
    # (contrast dedup_clusters' internal label join, where the broadcast
    # side is pair-graph-sized and the hint is justified)
    clustered = dedup_clusters(docs1, pairs)
    docs2 = docs1.join(
        clustered.filter(F.col("keep") == 1).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 2.5 (optional) SemDeDup: kmeans the embedding space, drop docs
    # with a lower-id near-dup cluster-mate. Docs WITHOUT an embedding
    # row pass through (left-anti on the drop list, not a semi on the
    # keep list), so a partial embedding run never silently shrinks the
    # corpus. The quadratic stage is within-cluster only (O(n^2/k)).
    if embeddings is not None and semantic_threshold > 0.0:
        from online_centrality_spark.similarity import semantic_dedup

        sem = semantic_dedup(
            embeddings, k=semantic_k, threshold=semantic_threshold
        )
        docs2 = docs2.join(
            sem.filter(~F.col("keep")).select(F.col("vec_id").alias("doc_id")),
            "doc_id",
            "left_anti",
        )

    # 3. PII scrub (emails/phones/IPs -> typed tokens), then language +
    #    quality annotation — all pure JVM expressions in the scan stage
    docs2 = (
        redact_pii(docs2)
        .drop("text")
        .withColumnRenamed("text_redacted", "text")
        .drop("n_redactions")
    )
    annotated = language_id(docs2).join(
        quality_score(docs2).select("doc_id", "quality"), "doc_id"
    )

    # 4. deterministic stratified sampling (data mixing)
    sampled = hash_sample(
        annotated,
        fraction=default_rate,
        stratum_col="lang_pred",
        fractions=sample_rates or {},
    )

    # 4.5 (optional) leakage-safe holdout: hash the SOURCE so no
    # provenance group straddles train/test — near-dups share a source
    # far more often than they share a doc_id, so a row-level split
    # would leak. Pure scan-stage expression, zero extra shuffle.
    if test_fraction > 0.0:
        from online_centrality_spark.text import grouped_split

        sampled = grouped_split(
            sampled, group_col="source", test_fraction=test_fraction
        )
        to_pack = sampled.filter(F.col("split") == "train")
    else:
        to_pack = sampled

    # 4.7 (optional) context-window chunking: chunks become the packed
    # units (the real pipeline ordering — cut windows, then bin them).
    # unit_id = doc_id * 2^16 + chunk_idx keeps the packing order
    # doc-major/window-minor; chunk_idx < 65536 holds for any document
    # under ~3M tokens at the default stride.
    if chunk_size > 0:
        from online_centrality_spark.text import chunk_documents

        chunks = chunk_documents(
            to_pack, size=chunk_size, overlap=chunk_overlap
        )
        units = chunks.select(
            (F.col("doc_id") * 65536 + F.col("chunk_idx")).alias("unit_id"),
            F.col("chunk_text").alias("text"),
        )
        packed = (
            pack_sequences(units, budget=budget, id_col="unit_id")
            .join(units, "unit_id")  # re-attach the window text
            .select(
                F.expr("unit_id DIV 65536").alias("doc_id"),
                F.expr("CAST(unit_id % 65536 AS INT)").alias("chunk_idx"),
                F.col("text").alias("chunk_text"),
                "n_tokens",
                "bin",
                "bin_offset",
            )
        )
        return sampled, packed

    # 5. token-budget sequence packing (train split only when a holdout
    # is requested — the holdout ships unpacked, like an eval set)
    packed = pack_sequences(to_pack, budget=budget)
    return sampled, packed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--pair-method", choices=["ngram", "minhash"], default="ngram")
    ap.add_argument("--budget", type=int, default=512)
    ap.add_argument("--bins-per-file", type=int, default=1024)
    ap.add_argument(
        "--test-fraction",
        type=float,
        default=0.0,
        help="leakage-safe holdout rate (hashes source, not doc_id); "
        "0 disables the split stage",
    )
    ap.add_argument(
        "--chunk-size",
        type=int,
        default=0,
        help="context-window size in tokens; >0 cuts sliding windows "
        "before packing (chunks become the packed units)",
    )
    ap.add_argument("--chunk-overlap", type=int, default=16)
    ap.add_argument(
        "--semantic-threshold",
        type=float,
        default=0.0,
        help="SemDeDup cosine floor; >0 enables the embedding-cluster "
        "dedup stage (reads <sf-dir>/embeddings.parquet)",
    )
    ap.add_argument("--semantic-k", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("prepare_training_data").getOrCreate()
    t0 = time.time()
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    emb = (
        spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        if args.semantic_threshold > 0.0
        else None
    )
    sampled, packed = build_pipeline(spark, docs, pair_method=args.pair_method,
                                     budget=args.budget,
                                     test_fraction=args.test_fraction,
                                     chunk_size=args.chunk_size,
                                     chunk_overlap=args.chunk_overlap,
                                     embeddings=emb,
                                     semantic_threshold=args.semantic_threshold,
                                     semantic_k=args.semantic_k)
    # chunk-grain rows carry their window text; doc-grain rows the doc's
    meta_cols = (
        ["doc_id", "lang_pred", "quality"]
        if args.chunk_size > 0
        else ["doc_id", "text", "lang_pred", "quality"]
    )
    out = (
        sampled.select(*meta_cols)
        .join(packed, "doc_id")
        .withColumn(
            "bin_group", (F.col("bin") / args.bins_per_file).cast("long")
        )
    )
    out.write.mode("overwrite").partitionBy("bin_group").parquet(args.out)
    if args.test_fraction > 0.0:
        # unpacked leakage-safe holdout beside the packed train corpus
        (
            sampled.filter(F.col("split") == "test")
            .select("doc_id", "text", "lang_pred", "quality")
            .write.mode("overwrite")
            .parquet(args.out.rstrip("/") + "_holdout")
        )
    written = spark.read.parquet(args.out)
    n_out = written.count()
    print(
        json.dumps(
            {
                "job": "prepare_training_data",
                "n_in": docs.count(),
                "n_out": n_out,
                "n_bins": written.agg(F.countDistinct("bin")).collect()[0][0],
                "elapsed_sec": round(time.time() - t0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
