"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "edges_per_sec_superstep": ...}

The headline superstep metric replays a deterministically replicated
copy of the induced event edge stream (same 5-actor dictionary, time-
shifted replicas — no external data) through the temporal-Katz
distributed affine-scan superstep engine, reporting edges/sec. Replica
count via $BENCH_REPLICAS (default 32 → ~3.1M edges at sf0.1);
$BENCH_QUERIES can restrict to a comma-separated subset (used by the
scaling harness, tools/bench_scaling.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def build_replicated_edges(spark, sf_dir: str, replicas: int):
    """Edge stream from events, replicated with shifted time/seq.

    The base stream (induced once) broadcasts to the executors; each task
    *generates* a contiguous range of replicas with vectorized numpy —
    no multi-GB cache, no shuffle, and partitions are seq-contiguous by
    construction, so the affine-scan supersteps consume them with
    ``presorted=True``.
    """
    import numpy as np
    import pandas as pd

    from online_centrality_spark.sources.edges import edges_from_events

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    edges, nodes = edges_from_events(events)
    base = edges.orderBy("seq").toPandas()
    n_edges = len(base)
    t_lo, t_hi = int(base["t"].min()), int(base["t"].max())
    span = t_hi - t_lo + 1
    b = spark.sparkContext.broadcast(
        (
            base["t"].to_numpy(np.int64),
            base["src"].to_numpy(np.int64),
            base["dst"].to_numpy(np.int64),
            base["seq"].to_numpy(np.int64),
        )
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)

    def expand(batches):
        t_arr, s_arr, d_arr, q_arr = b.value
        for pdf in batches:
            for r in pdf["id"].tolist():
                yield pd.DataFrame(
                    {
                        "key": (t_arr + r * span).astype(np.float64),
                        "src": s_arr,
                        "dst": d_arr,
                        "seq": q_arr + r * n_edges,
                        "t": t_arr + r * span,
                    }
                )

    rep = spark.range(0, replicas, 1, cpus * 4).mapInPandas(
        expand, schema="key double, src long, dst long, seq long, t long"
    )
    n_nodes = nodes.count()
    return rep, n_nodes, replicas * n_edges, t_lo, span * replicas


def bench_tk_superstep(spark, sf_dir, replicas, windows=8):
    from online_centrality_spark.functions.weights import ExponentialWeighter
    from online_centrality_spark.operators.temporal_katz import TemporalKatz

    rep, n_nodes, total, t0, full_span = build_replicated_edges(
        spark, sf_dir, replicas
    )
    # param grid matching the reference's experiment shape
    # (CentralityScoreComputer.py:67-85 runs ~9 Exp weighters per pass);
    # bounded dynamics: hour-scale decay norms, beta 0.2
    n_params = int(os.environ.get("BENCH_PARAMS", "8"))
    params = [
        (0.2, ExponentialWeighter(norm=(i + 1) * 1800.0 * 1e6, base=0.5))
        for i in range(n_params)
    ]
    tk = TemporalKatz(params, n_nodes, path="scan", presorted=True)
    width = full_span // windows + 1
    # untimed warm-up superstep: spins up the Python workers / Arrow path
    warm = TemporalKatz(params, n_nodes, path="scan", presorted=True)
    warm.superstep(
        rep.filter(F.col("t") <= t0 + width // 8),
        float(t0 + width // 8),
    )
    # batched supersteps: ONE job summarizes all windows, driver replays
    # the per-window affine combines + read-outs
    intervals = [
        (i, float(t0 + (i + 1) * width), float(t0 + (i + 1) * width))
        for i in range(windows)
    ]
    t_start = time.time()
    tk.run_batch(rep, intervals)
    elapsed = time.time() - t_start
    return elapsed, total


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    replicas = int(os.environ.get("BENCH_REPLICAS", "512"))
    only = os.environ.get("BENCH_QUERIES")
    only = set(only.split(",")) if only else None

    from online_centrality_spark.session import get_spark

    spark = get_spark(
        app_name="oc_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.default.parallelism": cpus,
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "131072",
        },
    )

    import __spark_entry__ as entry_mod

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def run(name, fn):
        if only and name not in only:
            return
        t = time.time()
        fn()
        timings[name] = round(time.time() - t, 3)

    # headline: distributed affine-scan superstep throughput
    if only is None or "tk_superstep_scan" in only:
        elapsed, n_edges = bench_tk_superstep(spark, sf_dir, replicas)
        timings["tk_superstep_scan"] = round(elapsed, 3)
        extras["edges_per_sec_superstep"] = round(n_edges / elapsed, 1)
        extras["superstep_edges"] = n_edges

    run("edge_induction", lambda: entry_mod.q_edge_induction(spark, sf_dir).count())
    run(
        "decayed_indegree",
        lambda: entry_mod.q_decayed_indegree(spark, sf_dir).count(),
    )
    run(
        "static_pagerank30",
        lambda: entry_mod.q_static_pagerank(spark, sf_dir).count(),
    )
    run(
        "connected_components",
        lambda: entry_mod.q_connected_components(spark, sf_dir).count(),
    )
    run(
        "triangle_counts",
        lambda: entry_mod.q_triangle_counts(spark, sf_dir).count(),
    )
    run(
        "minhash_lsh",
        lambda: __import__(
            "online_centrality_spark.dedup.minhash", fromlist=["x"]
        ).minhash_lsh_candidates(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), k=16, num_bands=4
        ).count(),
    )
    run(
        "ann_lsh_topk",
        lambda: __import__(
            "online_centrality_spark.similarity.ann", fromlist=["x"]
        ).lsh_topk(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200),
            k=10,
        ).count(),
    )
    run("ngram_jaccard", lambda: entry_mod.q_ngram_jaccard(spark, sf_dir).count())

    sf = sf_dir.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline engine queries wallclock (tk affine-scan superstep, "
        "edge induction, did, pagerank30, cc, triangles, minhash-LSH, ANN, "
        "ngram-jaccard)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        **extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
