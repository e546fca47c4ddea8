"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR.

Prints ONE COMPACT JSON line as the LAST line of stdout:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {row: best sec}, "sf": ..., "probes": {...},
     "edges_per_sec_superstep": ...}
Full per-row trial stats (spread, all trials) go to
BENCH/last_run_stats.json — NOT stdout: the r03 driver capture
truncated the head of an oversized final line, so the machine-readable
summary stays small by contract.

The headline superstep metric replays a deterministically replicated
copy of the induced event edge stream (disjoint per-replica node
spaces, overlap-compressed time shifts — no external data) through the
temporal-Katz WALK path (decay-chunked single-job replay, chain-closed
partitions, generation fused into the kernel), reporting edges/sec over
64 snapshot read-outs with an 8-param Exp grid sized for bounded
dynamics. Replica count via $BENCH_REPLICAS (default 512 → ~50M edges
at sf0.1); $BENCH_QUERIES restricts to a comma-separated subset (used
by tools/bench_scaling.py); $BENCH_WALK_BLOCK tunes the cache block.

Noise robustness: every row runs $BENCH_TRIALS times (default 3; the
heavy full-replay rows $BENCH_HEAVY_TRIALS, default 2) with
``spark.catalog.clearCache()`` between trials; ``queries`` reports the
BEST trial (the number least contaminated by this VM's documented
±20%-3x host noise) and ``query_stats`` reports per-row
{best, spread, trials} so round-over-round deltas outside the spread
are signal, inside it are noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


from online_centrality_spark.benchmark import (  # noqa: E402
    bench_did_distributed,
    bench_tk_driver_distributed,
    bench_tk_superstep,
    bench_tpr_distributed,
    build_replicated_edges,
)


def _probe_burn(n):
    s = 0
    for i in range(n):
        s += i * i
    return s


def _probe_stream(n):
    import numpy as np

    a = np.arange(5_000_000, dtype=np.float64)
    s = 0.0
    for _ in range(n):
        s += float((a * 1.0000001 + 0.5).sum())
    return s


def hw_probe(nproc: int = 8) -> dict:
    """~4 s hardware phase probe (same kernels as tools/bench_scaling.py):
    pure-Python compute Mops/s and DRAM-streaming iters/s. Emitted at
    suite start and end so a run landing in one of this VM's documented
    slow phases (3-16x DRAM swings) is self-evident in the record."""
    import multiprocessing as mp

    N = 20_000_000
    with mp.get_context("spawn").Pool(nproc) as pool:
        pool.map(_probe_burn, [1000] * nproc)  # warm the pool
        t = time.time()
        pool.map(_probe_burn, [N] * nproc)
        burn = nproc * N / (time.time() - t) / 1e6
        t = time.time()
        pool.map(_probe_stream, [8] * nproc)
        stream = nproc * 8 / (time.time() - t)
    return {"burn_mops": round(burn, 1), "stream_iters": round(stream, 2)}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    replicas = int(os.environ.get("BENCH_REPLICAS", "512"))
    trials_n = int(os.environ.get("BENCH_TRIALS", "3"))
    heavy_n = int(os.environ.get("BENCH_HEAVY_TRIALS", "2"))
    only = os.environ.get("BENCH_QUERIES")
    only = set(only.split(",")) if only else None

    probe_start = hw_probe() if os.environ.get("BENCH_PROBES", "1") != "0" else None

    from online_centrality_spark.session import get_spark

    spark = get_spark(
        app_name="oc_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.default.parallelism": cpus,
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "131072",
            # the distributed-state replay shuffles ~50M rows twice in
            # the single local JVM; headroom avoids GC-pressure cliffs
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
        },
    )

    import __spark_entry__ as entry_mod

    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}
    extras: dict[str, float] = {}

    def record(name, trial_times):
        best = min(trial_times)
        timings[name] = round(best, 3)
        stats[name] = {
            "best": round(best, 3),
            "spread": round(max(trial_times) - best, 3),
            "trials": [round(t, 3) for t in trial_times],
        }

    def run(name, fn, n=None):
        if only and name not in only:
            return
        ts = []
        for _ in range(n or trials_n):
            spark.catalog.clearCache()
            t = time.time()
            fn()
            ts.append(time.time() - t)
        record(name, ts)

    def run_replay(name, fn, rate_key, n):
        """Heavy full-replay rows: fn() -> (elapsed, n_edges, info).
        Best trial drives both the row time and the edges/sec extra."""
        if only is not None and name not in only:
            return
        results = []
        for _ in range(n):
            spark.catalog.clearCache()
            results.append(fn())
        best = min(results, key=lambda r: r[0])
        record(name, [r[0] for r in results])
        extras[rate_key] = round(best[1] / best[0], 1)
        extras.update(best[2])
        return best

    # headline: distributed temporal-walk superstep throughput
    if only is None or "tk_superstep_walk" in only:
        best = run_replay(
            "tk_superstep_walk",
            lambda: bench_tk_superstep(spark, sf_dir, replicas),
            "edges_per_sec_superstep",
            trials_n,
        )
        extras["superstep_edges"] = best[1]

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
    # embedding near-dups via the bucketed LSH path (no full-matrix
    # broadcast): candidates from 24x4 hyperplane buckets, JVM cosine
    # verify, hub buckets capped
    run(
        "embedding_dedup_lsh",
        lambda: __import__(
            "online_centrality_spark.dedup.embedding", fromlist=["x"]
        ).embedding_near_dups_lsh(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            threshold=0.4,
            num_tables=24,
            num_planes=4,
            max_bucket_size=2000,
        ).count(),
    )
    # exact distributed near-dups: one Arrow task per block pair, no
    # driver collect — the pair source feeding the 14 graph queries
    run(
        "embedding_dedup_blocked",
        lambda: __import__(
            "online_centrality_spark.dedup.embedding", fromlist=["x"]
        ).embedding_near_dups_blocked(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            threshold=0.4,
            num_blocks=8,
        ).count(),
    )
    # scale path: cap shingle doc-frequency (drops ultra-common bigrams
    # whose candidate fan-out is quadratic; the exact uncapped variant is
    # the sf0.01 correctness query)
    run(
        "ngram_jaccard",
        lambda: __import__(
            "online_centrality_spark.dedup.ngram", fromlist=["x"]
        ).ngram_jaccard_pairs(
            spark.read.parquet(f"{sf_dir}/documents.parquet"),
            n=2,
            threshold=0.2,
            max_doc_freq=500,
        ).count(),
    )

    # round-3 link-graph extensions over the user-interaction digraph /
    # cosine graph: distributed SCC coloring, δ-bucketed temporal
    # motifs, deterministic DeepWalk corpus
    run("scc", lambda: entry_mod.q_scc(spark, sf_dir).count())
    run(
        "temporal_motifs",
        lambda: entry_mod.q_temporal_motifs(spark, sf_dir).count(),
    )
    run(
        "random_walks",
        lambda: entry_mod.q_random_walks(spark, sf_dir).count(),
    )

    # round-4 additions: spectral / BFS-envelope centralities, temporal
    # reachability, Luby MIS, neighborhood reach, negative sampling,
    # as-of state attach, Zipf corpus profile
    run("eigenvector", lambda: entry_mod.q_eigenvector(spark, sf_dir).count())
    # closeness / temporal_reachability are O(n*m) all-sources sweeps —
    # ~2 min each at sf0.1, so they run only when asked (recorded with
    # probe stamps in BENCH/BASELINE.md) to keep the per-round suite lean
    if os.environ.get("BENCH_HEAVY_EXTRAS") == "1" or (
        only and {"closeness", "temporal_reachability", "hop_distribution"} & only
    ):
        run("closeness", lambda: entry_mod.q_closeness(spark, sf_dir).count(), n=1)
        run(
            "temporal_reachability",
            lambda: entry_mod.q_temporal_reachability(spark, sf_dir).count(),
            n=1,
        )
        run(
            "hop_distribution",
            lambda: entry_mod.q_hop_distribution(spark, sf_dir).count(),
            n=1,
        )
    run("mis", lambda: entry_mod.q_mis(spark, sf_dir).count())
    # 12 lineage-cut rounds (one checkpoint per round, pre-weighted edge
    # list — 2.7x the per-half-step variant in same-window A/B); one
    # trial keeps the suite lean (spread is phase-dominated)
    run("salsa", lambda: entry_mod.q_salsa(spark, sf_dir).count(), n=1)
    run(
        "bpe_merges",
        lambda: entry_mod.q_bpe_merges(spark, sf_dir).count(),
    )
    run("funnel", lambda: entry_mod.q_funnel(spark, sf_dir).count())
    run(
        "event_trigrams",
        lambda: entry_mod.q_event_trigrams(spark, sf_dir).count(),
    )
    run(
        "two_hop_reach",
        lambda: entry_mod.q_two_hop_reach(spark, sf_dir).count(),
    )
    run(
        "negative_sampling",
        lambda: entry_mod.q_negative_sampling(spark, sf_dir).count(),
    )
    run("asof_value", lambda: entry_mod.q_asof_value(spark, sf_dir).count())
    run(
        "zipf_profile",
        lambda: entry_mod.q_zipf_profile(spark, sf_dir).count(),
    )
    # round-4 tail: GNN-style feature propagation, WL fingerprint,
    # per-label embedding outliers, leakage-safe grouped split
    run(
        "khop_features",
        lambda: entry_mod.q_khop_features(spark, sf_dir).count(),
    )
    run(
        "wl_refinement",
        lambda: entry_mod.q_wl_refinement(spark, sf_dir).count(),
    )
    run(
        "embedding_outliers",
        lambda: entry_mod.q_embedding_outliers(spark, sf_dir).count(),
    )
    run(
        "grouped_split",
        lambda: entry_mod.q_grouped_split(spark, sf_dir).count(),
    )
    run(
        "temporal_split",
        lambda: entry_mod.q_temporal_split(spark, sf_dir).count(),
    )
    run(
        "rich_club",
        lambda: entry_mod.q_rich_club(spark, sf_dir).count(),
    )
    run(
        "burstiness",
        lambda: entry_mod.q_burstiness(spark, sf_dir).count(),
    )
    run(
        "component_evolution",
        lambda: entry_mod.q_component_evolution(spark, sf_dir).count(),
    )
    run(
        "densest_subgraph",
        lambda: entry_mod.q_densest_subgraph(spark, sf_dir).count(),
    )
    run(
        "disparity_backbone",
        lambda: entry_mod.q_disparity_backbone(spark, sf_dir).count(),
    )
    run(
        "edge_persistence",
        lambda: entry_mod.q_edge_persistence(spark, sf_dir).count(),
    )
    run(
        "attack_robustness",
        lambda: entry_mod.q_attack_robustness(spark, sf_dir).count(),
    )
    run(
        "butterflies",
        lambda: entry_mod.q_butterflies(spark, sf_dir).count(),
    )
    run(
        "attribute_assortativity",
        lambda: entry_mod.q_attribute_assortativity(spark, sf_dir).count(),
    )
    run(
        "graph_summary",
        lambda: entry_mod.q_graph_summary(spark, sf_dir).count(),
    )
    run(
        "domain_divergence",
        lambda: entry_mod.q_domain_divergence(spark, sf_dir).count(),
    )
    run(
        "transition_entropy",
        lambda: entry_mod.q_transition_entropy(spark, sf_dir).count(),
    )
    run(
        "doc_novelty",
        lambda: entry_mod.q_doc_novelty(spark, sf_dir).count(),
    )
    run(
        "cohort_retention",
        lambda: entry_mod.q_cohort_retention(spark, sf_dir).count(),
    )
    run(
        "spam_mass",
        lambda: entry_mod.q_spam_mass(spark, sf_dir).count(),
    )
    run("msf", lambda: entry_mod.q_msf(spark, sf_dir).count(), n=1)
    run(
        "avg_neighbor_degree",
        lambda: entry_mod.q_avg_neighbor_degree(spark, sf_dir).count(),
    )
    run(
        "doc_surprisal",
        lambda: entry_mod.q_doc_surprisal(spark, sf_dir).count(),
    )
    run(
        "clustering_by_degree",
        lambda: entry_mod.q_clustering_by_degree(spark, sf_dir).count(),
    )
    run(
        "activity_heatmap",
        lambda: entry_mod.q_activity_heatmap(spark, sf_dir).count(),
    )
    run(
        "vocab_growth",
        lambda: entry_mod.q_vocab_growth(spark, sf_dir).count(),
    )
    run(
        "strength_disparity",
        lambda: entry_mod.q_strength_disparity(spark, sf_dir).count(),
    )
    run(
        "oov_rate",
        lambda: entry_mod.q_oov_rate(spark, sf_dir).count(),
    )
    run(
        "threshold_profile",
        lambda: entry_mod.q_threshold_profile(spark, sf_dir).count(),
    )
    run(
        "inequality_profile",
        lambda: entry_mod.q_inequality_profile(spark, sf_dir).count(),
    )
    run(
        "user_diversity",
        lambda: entry_mod.q_user_diversity(spark, sf_dir).count(),
    )
    run(
        "mutual_knn",
        lambda: entry_mod.q_mutual_knn(spark, sf_dir).count(),
    )
    run(
        "cramers_v",
        lambda: entry_mod.q_cramers_v(spark, sf_dir).count(),
    )
    run(
        "edge_overlap",
        lambda: entry_mod.q_edge_overlap(spark, sf_dir).count(),
    )
    run(
        "community_conductance",
        lambda: entry_mod.q_community_conductance(spark, sf_dir).count(),
    )
    run(
        "higher_motifs",
        lambda: entry_mod.q_higher_motifs(spark, sf_dir).count(),
    )
    run(
        "session_flows",
        lambda: entry_mod.q_session_flows(spark, sf_dir).count(),
    )
    run(
        "random_failure",
        lambda: entry_mod.q_random_failure(spark, sf_dir).count(),
    )

    # full replay through SuperstepDriver in distributed-state mode
    # (cogroup state, partitioned score sink — no driver-held arrays)
    run_replay(
        "tk_driver_distributed",
        lambda: bench_tk_driver_distributed(spark, sf_dir, replicas),
        "edges_per_sec_driver_dist",
        heavy_n,
    )

    # distributed-state Temporal PageRank (per-closure ordered fold)
    run_replay(
        "tpr_distributed",
        lambda: bench_tpr_distributed(spark, sf_dir, replicas),
        "edges_per_sec_tpr_dist",
        heavy_n,
    )

    # distributed-state decayed indegree (segment-explode batch read-out)
    run_replay(
        "did_distributed",
        lambda: bench_did_distributed(spark, sf_dir, replicas),
        "edges_per_sec_did_dist",
        heavy_n,
    )

    probe_end = hw_probe() if probe_start is not None else None

    sf = sf_dir.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline engine queries wallclock, best-of-N per row "
        "(row list in BENCH/last_run_stats.json)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        # apples-to-apples subtotal over the round-1 query set (the
        # heavy replay rows were added in rounds 2-3; comparing totals
        # across rounds must not read suite growth as regression)
        "value_r01_subset": round(
            sum(
                timings.get(q, 0.0)
                for q in (
                    "tk_superstep_walk", "edge_induction", "decayed_indegree",
                    "static_pagerank30", "connected_components",
                    "triangle_counts", "minhash_lsh", "ann_lsh_topk",
                    "ngram_jaccard",
                )
            ),
            3,
        ),
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus),
        # hardware phase stamps: compare to BENCH/BASELINE.md's quiet-host
        # readings — a row outside its recorded band with a depressed
        # probe here is host noise, not a code regression
        "probes": {"start": probe_start, "end": probe_end},
        **extras,
    }
    full = dict(result)
    full["query_stats"] = stats
    full["trials"] = trials_n
    full["heavy_trials"] = heavy_n
    try:
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/last_run_stats.json", "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout summary still complete
    # the compact summary is the LAST stdout line (driver parse contract)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
