"""spark-submit entry point: one-pass link-graph analytics report.

Composes the round-3 graph surface over the event stream into a single
job writing one partitioned parquet report per metric family (launch
with --py-files exactly like jobs/replay_job.py):

    events
      -> user-interaction digraph (bucket-stitched lag induction)
           -> SCC labels                (FW-BW coloring)
           -> reciprocity              (1 row)
           -> δ-temporal motifs        (bucketed 3-way join)
           -> random-walk corpus       (deterministic DeepWalk input)
           -> 2-hop reach profile      (round 4)
           -> negative-edge samples    (round 4, graph-ML training prep)
           -> graph summary card       (round 4, density/entropy/α̂)
           -> bow-tie macro-structure  (round 5, CORE/IN/OUT classes)
      -> timestamped pair stream (shared persist)
           -> component evolution      (round 4, per-day connectivity)
           -> edge persistence         (round 4, day-over-day Jaccard)
           -> disparity backbone       (round 4, top-20 significant)
      -> actor edge table (conv adjacency induction)
           -> HITS hubs/authorities
      -> turn-latency profile          (exact percentiles)
      -> transition entropy + cohort retention (behavioral summaries)

Each family lands under ``<out>/metric=<name>/`` so a downstream
consumer reads exactly the partitions it needs; a JSON metrics line
with row counts and wall-clock per stage goes to stdout.

    spark-submit --master local[8] \
        --py-files dist/online_centrality_spark.zip \
        jobs/graph_report.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/graph_report
"""

import argparse
import json
import time


def run_report(spark, events, out: str, gap_seconds: float = 60.0,
               motif_gap_seconds: float = 900.0,
               motif_delta_us: int = 3_600_000_000,
               walk_length: int = 8,
               resume: bool = False) -> dict:
    from online_centrality_spark.operators import (
        hits,
        random_walks,
        strongly_connected_components,
        temporal_motifs,
    )
    from online_centrality_spark.operators.triangles import edge_reciprocity
    from online_centrality_spark.sources.edges import (
        edges_from_events,
        user_interaction_pairs,
    )
    from online_centrality_spark.streaming import response_latency
    from pyspark.sql import functions as F

    from online_centrality_spark.sinks import metric_sink

    metrics = {}
    # the knobs a committed family's values depend on: resume only skips
    # a family whose manifest matches the CURRENT invocation, so
    # re-running with different parameters plus --resume can never mix
    # stale and fresh families in one report (shared contract:
    # online_centrality_spark/sinks.py, pinned by the resume tests)
    params = {
        "gap_seconds": gap_seconds,
        "motif_gap_seconds": motif_gap_seconds,
        "motif_delta_us": motif_delta_us,
        "walk_length": walk_length,
    }
    sink = metric_sink(spark, out, params, metrics, resume=resume)

    # ONE pair induction feeds both surfaces: the digraph is the
    # distinct projection of the persisted timestamped pair stream
    # (user_interaction_digraph is exactly this projection), so the
    # bucketed-lag induction runs once, not twice
    pairs = user_interaction_pairs(events, gap_seconds=gap_seconds).persist()
    dg = pairs.select("src", "dst").distinct().persist()
    sink("scc", strongly_connected_components(dg))
    # shared select with the q_reciprocity driver query — one schema
    # (n_edges, n_mutual, reciprocity) across both surfaces
    sink("reciprocity", edge_reciprocity(dg))
    sink(
        "temporal_motifs",
        temporal_motifs(
            user_interaction_pairs(events, gap_seconds=motif_gap_seconds),
            delta_us=motif_delta_us,
        ),
    )
    sink("random_walks", random_walks(dg, walk_length=walk_length))
    # round-4 families over the same cached digraph
    from online_centrality_spark.operators.link_prediction import (
        negative_edge_samples,
    )
    from online_centrality_spark.operators.neighborhood import two_hop_reach

    sink("two_hop_reach", two_hop_reach(dg))
    sink("negative_samples", negative_edge_samples(dg, k=8))
    edges, nodes = edges_from_events(events)
    sink(
        "hits",
        hits(edges, max_iter=12, tol=0.0).join(
            F.broadcast(nodes), "node_id"
        ),
    )
    sink("response_latency", response_latency(events))
    # round-4 late families: connectivity/stability time-series and the
    # behavioral summaries, over the SAME cached pair stream / digraph
    from online_centrality_spark.operators import (
        component_evolution,
        disparity_scores,
        edge_persistence,
    )
    from online_centrality_spark.operators.summary import graph_summary
    from online_centrality_spark.streaming.sessions import (
        cohort_retention,
        transition_entropy,
    )

    sink("component_evolution", component_evolution(pairs))
    sink("edge_persistence", edge_persistence(pairs))
    # shared shape with q_disparity_backbone: top-20 most significant
    sink(
        "disparity_backbone",
        disparity_scores(pairs).orderBy("alpha_min", "a", "b").limit(20),
    )
    sink("graph_summary", graph_summary(dg))
    # round-5: bow-tie macro-structure over the same cached digraph
    from online_centrality_spark.operators import bowtie_decomposition

    sink("bowtie", bowtie_decomposition(dg))
    sink("transition_entropy", transition_entropy(events))
    sink("cohort_retention", cohort_retention(events))
    return metrics


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/graph_report")
    ap.add_argument("--gap-seconds", type=float, default=60.0)
    ap.add_argument("--walk-length", type=int, default=8)
    ap.add_argument(
        "--resume", action="store_true",
        help="skip metric families whose sink already committed",
    )
    args = ap.parse_args()

    from online_centrality_spark.session import get_spark

    spark = get_spark(app_name="graph_report")
    events = spark.read.parquet(f"{args.sf_dir}/events.parquet")
    t0 = time.time()
    metrics = run_report(
        spark, events, args.out,
        gap_seconds=args.gap_seconds, walk_length=args.walk_length,
        resume=args.resume,
    )
    print(json.dumps({
        "job": "graph_report",
        "out": args.out,
        "total_secs": round(time.time() - t0, 2),
        "stages": metrics,
    }))


if __name__ == "__main__":
    main()
