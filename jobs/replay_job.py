"""spark-submit entry point: temporal-walk centrality replay.

The north rule requires the pipeline to launch via ``spark-submit
--py-files`` on a multi-executor cluster at two cluster sizes.  This job
is that launcher: it imports the engine ONLY from the shipped
``--py-files`` archive (no repo checkout on the executors), replays the
replicated transcript-derived edge stream through the Temporal-Katz walk
path, and prints one JSON metrics line.

Build the archive and run (see tools/spark_submit_scaling.sh):

    python tools/make_pyfiles.py                       # dist/online_centrality_spark.zip
    spark-submit --master local[8] \\
        --py-files dist/online_centrality_spark.zip \\
        jobs/replay_job.py --sf-dir /root/testdata/sf0.1 --replicas 512

On a real cluster, replace ``--master`` with the cluster master and set
``--num-executors`` for the two cluster sizes (N and 4N).
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicas", type=int, default=512)
    ap.add_argument("--windows", type=int, default=64)
    ap.add_argument(
        "--mode",
        choices=["walk", "driver-dist"],
        default="walk",
        help="walk: driver-state walk replay; driver-dist: full "
        "SuperstepDriver replay in distributed-state mode (DataFrame "
        "state + partitioned score sink, nothing driver-held)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("oc_walk_replay")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .getOrCreate()
    )
    # engine modules come from --py-files
    from online_centrality_spark.benchmark import (
        bench_tk_driver_distributed,
        bench_tk_superstep,
    )

    t0 = time.time()
    if args.mode == "driver-dist":
        elapsed, total, info = bench_tk_driver_distributed(
            spark, args.sf_dir, args.replicas, windows=args.windows
        )
    else:
        elapsed, total, info = bench_tk_superstep(
            spark, args.sf_dir, args.replicas, windows=args.windows
        )
    print(
        json.dumps(
            {
                "job": f"tk_{args.mode}_replay",
                "master": spark.sparkContext.master,
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "replay_sec": round(elapsed, 3),
                "total_sec": round(time.time() - t0, 3),
                "edges": total,
                "edges_per_sec": round(total / elapsed, 1),
                **info,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
