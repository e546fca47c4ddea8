"""spark-submit entry point: Structured Streaming temporal replay.

Drives the distributed-state temporal engine from a file stream
(``--py-files`` contract identical to jobs/replay_job.py): each
micro-batch advances the cogrouped DataFrame state one interval and
appends read-outs to the partitioned score sink — the streaming
counterpart of a SuperstepDriver replay, exact vs the batch engine
(tests/test_streaming.py).

``--src-dir`` must contain parquet files in the replay edge schema
``(key double, src long, dst long, seq long, closure long)``, arriving
key-ordered across files (the ordering contract). With ``--demo N``
the job first synthesizes N time-ordered stream files from the sf
dir's event stream, then consumes them.

    spark-submit --master local[8] \
        --py-files dist/online_centrality_spark.zip \
        jobs/streaming_replay_job.py --demo 4 \
        --sf-dir /root/testdata/sf0.01 --out /tmp/stream_scores
"""

import argparse
import json
import shutil
import tempfile
import time


EDGE_SCHEMA = "key double, src long, dst long, seq long, closure long"


def demo_stream_files(spark, sf_dir: str, n_files: int, src_dir: str) -> int:
    """Write the sf event-induced edge stream as n time-ordered files,
    splitting only where ``key`` strictly increases (ordering contract)."""
    from pyspark.sql import functions as F

    from online_centrality_spark.operators import attach_closure_components
    from online_centrality_spark.sources.edges import edges_from_events

    edges, _ = edges_from_events(spark.read.parquet(f"{sf_dir}/events.parquet"))
    epdf = (
        attach_closure_components(edges)
        .selectExpr("CAST(t AS DOUBLE) AS key", "src", "dst", "seq", "closure")
        .toPandas()
        .sort_values(["key", "seq"])
        .reset_index(drop=True)
    )
    n = len(epdf)
    cuts = []
    for i in range(1, n_files):
        c = n * i // n_files
        while c < n and epdf["key"][c] == epdf["key"][c - 1]:
            c += 1
        cuts.append(c)
    bounds = [0, *cuts, n]
    for i in range(n_files):
        part = epdf.iloc[bounds[i] : bounds[i + 1]]
        if len(part) == 0:
            continue
        spark.createDataFrame(part, EDGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--src-dir", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--demo", type=int, default=0,
                    help="synthesize this many stream files from --sf-dir")
    ap.add_argument("--beta", type=float, default=0.1)
    ap.add_argument("--norm-us", type=float, default=86400.0 * 1e6)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("streaming_replay").getOrCreate()

    from online_centrality_spark.functions.weights import ExponentialWeighter
    from online_centrality_spark.operators import DistributedTemporalKatz
    from online_centrality_spark.streaming import StreamingDistributedReplay

    src_dir = args.src_dir
    n_edges = None
    if args.demo:
        src_dir = tempfile.mkdtemp(prefix="stream_src_")
        n_edges = demo_stream_files(spark, args.sf_dir, args.demo, src_dir)
    if src_dir is None:
        raise SystemExit("need --src-dir or --demo N")

    measure = DistributedTemporalKatz(
        [(args.beta, ExponentialWeighter(norm=args.norm_us, base=0.5))]
    )
    sink = StreamingDistributedReplay(measure, args.out)
    t0 = time.time()
    q = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    scores = sink.scores(spark)
    print(
        json.dumps(
            {
                "job": "streaming_replay",
                "micro_batches": len(sink.batches),
                "edges": n_edges,
                "score_rows": scores.count(),
                "elapsed_sec": round(time.time() - t0, 3),
            }
        )
    )
    if args.demo:
        shutil.rmtree(src_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
