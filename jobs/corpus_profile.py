"""spark-submit entry point: one-pass corpus + activity profiling report.

The monitoring counterpart of jobs/prepare_training_data.py: before (or
after) a prep run, profile WHAT is in the corpus and how the event
stream is behaving, composed as one DataFrame program (launch with
--py-files exactly like jobs/replay_job.py):

    documents
      -> token-count percentiles per language   (length budgeting)
      -> tf-idf top terms per document          (keyword audit)
      -> PMI term co-occurrence                 (vocab health / leakage)
      -> count-min heavy hitters                (boilerplate detection)
      -> domain KL divergence                   (round 4, mixture drift)
      -> per-doc unigram surprisal              (round 4, quality proxy)
      -> trigram novelty                        (round 4, diversity)
    events
      -> daily active users + rolling volume    (ingestion health)

Each family lands under ``<out>/metric=<name>/`` (same layout and
params-manifest resume contract as jobs/graph_report.py); a JSON
metrics line with row counts and per-stage wall-clock goes to stdout.

    spark-submit --master local[8] \
        --py-files dist/online_centrality_spark.zip \
        jobs/corpus_profile.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/corpus_profile
"""

import argparse
import json
import time


def run_profile(spark, docs, events, out: str,
                top_terms_k: int = 3,
                vocab_size: int = 100,
                cms_width: int = 1024,
                cms_depth: int = 4,
                heavy_k: int = 20,
                window_days: int = 7,
                resume: bool = False) -> dict:
    from online_centrality_spark.sources.transcripts import daily_activity
    from online_centrality_spark.text.analysis import (
        term_cooccurrence,
        tfidf_top_terms,
        token_percentiles,
    )
    from online_centrality_spark.text.sketches import cms_heavy_hitters
    from pyspark.sql import functions as F

    from online_centrality_spark.sinks import metric_sink

    metrics = {}
    params = {
        "top_terms_k": top_terms_k,
        "vocab_size": vocab_size,
        "cms_width": cms_width,
        "cms_depth": cms_depth,
        "heavy_k": heavy_k,
        "window_days": window_days,
    }
    sink = metric_sink(spark, out, params, metrics, resume=resume)

    sink("token_percentiles", token_percentiles(docs))
    sink("tfidf_top_terms", tfidf_top_terms(docs, k=top_terms_k))
    sink(
        "term_cooccurrence",
        term_cooccurrence(docs, vocab_size=vocab_size, min_pair_count=2),
    )
    sink(
        "heavy_hitters",
        cms_heavy_hitters(docs, width=cms_width, depth=cms_depth, k=heavy_k),
    )
    sink(
        "daily_activity",
        daily_activity(events, window_days=window_days).select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_users",
            "n_events",
            "rolling_events",
        ),
    )
    # round-4 late families: domain drift, per-doc LM surprisal, and
    # corpus-diversity novelty — the quality-filtering trio
    from online_centrality_spark.dedup.ngram import doc_novelty
    from online_centrality_spark.text.analysis import (
        doc_surprisal,
        domain_divergence,
    )

    sink("domain_divergence", domain_divergence(docs))
    sink("doc_surprisal", doc_surprisal(docs))
    sink("doc_novelty", doc_novelty(docs))
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/corpus_profile")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from online_centrality_spark.session import get_spark

    spark = get_spark(app_name="corpus_profile")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    events = spark.read.parquet(f"{args.sf_dir}/events.parquet")
    t0 = time.time()
    metrics = run_profile(spark, docs, events, args.out, resume=args.resume)
    print(json.dumps({
        "job": "corpus_profile",
        "out": args.out,
        "total_secs": round(time.time() - t0, 2),
        "stages": metrics,
    }))


if __name__ == "__main__":
    main()
