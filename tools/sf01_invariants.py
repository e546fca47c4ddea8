"""Engine-side invariant checks at sf0.1 for the oracle-limited graph
queries.

The `scc` (recursive closure) and `eccentricity` (min-plus doubling)
DuckDB oracles go quadratic at sf0.1 (BENCH/BASELINE.md), so the driver
gate checks them at sf0.01 only. This tool closes the sf0.1 gap with
properties that must hold at ANY scale, checked engine-side against
independent operators:

  1. scc_idempotent   — two independent SCC runs produce the identical
                        (node_id, component) label set.
  2. condensation_dag — the SCC condensation edge set has no cycle
                        (iterative source-stripping peels every node).
  3. ecc_matches_bfs  — for a 16-node deterministic sample of the
                        cosine graph, eccentricity(v) equals the max
                        finite BFS depth from v computed by the
                        independent bfs_distances operator.
  4. walks_follow_edges — every consecutive random-walk step is a real
                        digraph edge and step-0 node == walk_id
                        (corpus validity at sf0.1).
  ... plus the round-4 robustness/evolution/densest/msf invariants,
  the round-5 pair (closeness_sampled vs independent single-source BFS,
  mutual_knn_lsh == the exact blocked-path graph at the 0.4 floor), and
  the round-5 batch-5 quartet: bowtie partitions the node universe with
  CORE == the independent SCC operator's giant component,
  triangle_estimate within 4 sigma of the exact count, label_spreading
  clamps seeds / spreads / stays inside the seed label set, and every
  weighted_walks step follows a real interaction edge.

Usage:  python tools/sf01_invariants.py [sf_dir]
Prints one JSON line; exit code 1 if any invariant fails.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from online_centrality_spark.session import get_spark

    spark = get_spark(
        app_name="sf01_invariants",
        master="local[16]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    results: dict[str, dict] = {}

    def check(name, fn):
        t0 = time.time()
        try:
            fn()
            results[name] = {"ok": True, "secs": round(time.time() - t0, 1)}
        except AssertionError as e:
            results[name] = {
                "ok": False,
                "secs": round(time.time() - t0, 1),
                "err": str(e)[:300],
            }

    # 1. SCC idempotence on the user-interaction digraph
    def scc_idempotent():
        a = {(r.node_id, r.component) for r in entry_mod.q_scc(spark, sf_dir).collect()}
        b = {(r.node_id, r.component) for r in entry_mod.q_scc(spark, sf_dir).collect()}
        assert a and a == b, f"label sets differ: {len(a)} vs {len(b)}"

    check("scc_idempotent", scc_idempotent)

    # 2. condensation DAG: source-strip until empty
    def condensation_dag():
        edges = [
            (r[0], r[1])
            for r in entry_mod.q_scc_condensation(spark, sf_dir)
            .select("src_comp", "dst_comp")
            .collect()
        ]
        if not edges:
            # a single giant SCC has an empty (trivially acyclic)
            # condensation — verify the labels say exactly that
            n_comp = (
                entry_mod.q_scc(spark, sf_dir)
                .select("component")
                .distinct()
                .count()
            )
            assert n_comp >= 1, "no SCC labels at all"
            return
        succ: dict[int, set[int]] = {}
        indeg: dict[int, int] = {}
        for a, b in edges:
            succ.setdefault(a, set()).add(b)
            indeg[b] = indeg.get(b, 0) + 1
            indeg.setdefault(a, 0)
        queue = [n for n, d in indeg.items() if d == 0]
        peeled = 0
        while queue:
            n = queue.pop()
            peeled += 1
            for m in succ.get(n, ()):  # strip outgoing edges
                indeg[m] -= 1
                if indeg[m] == 0:
                    queue.append(m)
        assert peeled == len(indeg), (
            f"cycle: peeled {peeled} of {len(indeg)} condensation nodes"
        )

    check("condensation_dag", condensation_dag)

    # 3. eccentricity == max BFS depth, 16-node deterministic sample
    def ecc_matches_bfs():
        from online_centrality_spark.operators import bfs_distances

        cos = entry_mod._cos_edges(spark, sf_dir).persist()
        ecc = {
            r.node_id: r.ecc
            for r in entry_mod.q_eccentricity(spark, sf_dir).collect()
        }
        sample = sorted(ecc)[:16]
        for v in sample:
            depth = (
                bfs_distances(cos, v)
                .agg(F.max("dist").alias("d"))
                .collect()[0]["d"]
            )
            assert ecc[v] == depth, f"node {v}: ecc {ecc[v]} != bfs max {depth}"
        cos.unpersist()

    check("ecc_matches_bfs", ecc_matches_bfs)

    # 4. walk corpus validity: consecutive steps are digraph edges
    def walks_follow_edges():
        from online_centrality_spark.sources.edges import user_interaction_digraph

        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        dg = user_interaction_digraph(events, gap_seconds=60.0)
        walks = entry_mod.q_random_walks(spark, sf_dir)
        nxt = walks.select(
            "walk_id",
            (F.col("step") + 1).alias("step"),
            F.col("node_id").alias("src"),
        )
        steps = walks.filter(F.col("step") > 0).join(
            nxt, ["walk_id", "step"]
        ).select("src", F.col("node_id").alias("dst"))
        bad = steps.join(dg, ["src", "dst"], "left_anti").count()
        assert bad == 0, f"{bad} walk transitions are not digraph edges"
        starts = walks.filter(
            (F.col("step") == 0) & (F.col("walk_id") != F.col("node_id"))
        ).count()
        assert starts == 0, f"{starts} walks do not start at walk_id"

    check("walks_follow_edges", walks_follow_edges)

    # 5. hop-distribution mass == ordered reachable pairs from the
    #    INDEPENDENT connected-components operator: for an undirected
    #    graph, sum(n_pairs) must equal sum over components of
    #    |c|*(|c|-1); eff_diameter must be a realized distance
    def hop_mass_matches_components():
        hd = entry_mod.q_hop_distribution(spark, sf_dir).collect()
        assert hd, "empty hop distribution"
        total = sum(r.n_pairs for r in hd)
        eff = hd[0].eff_diameter
        assert eff in {r.d for r in hd}, f"eff_diameter {eff} not a realized d"
        comp_sizes = [
            r.n
            for r in entry_mod.q_connected_components(spark, sf_dir)
            .groupBy("component")
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        expect = sum(n * (n - 1) for n in comp_sizes)
        assert total == expect, f"pair mass {total} != components {expect}"

    check("hop_mass_matches_components", hop_mass_matches_components)

    def robustness_level0_matches_cc():
        # attack level 0 removes nothing: its component stats must equal
        # an independent whole-graph connected_components run, and the
        # giant-component size must be non-increasing in the level
        rows = sorted(
            entry_mod.q_attack_robustness(spark, sf_dir).collect(),
            key=lambda r: r["level"],
        )
        assert rows and rows[0]["level"] == 0
        comp_sizes = [
            r.n
            for r in entry_mod.q_connected_components(spark, sf_dir)
            .groupBy("component")
            .agg(F.count("*").alias("n"))
            .collect()
        ]
        l0 = rows[0]
        assert l0["n_components"] == len(comp_sizes)
        assert l0["n_nodes"] == sum(comp_sizes)
        assert l0["largest"] == max(comp_sizes)
        for a, b in zip(rows, rows[1:]):
            assert b["n_edges"] <= a["n_edges"], "edges grew with removals"
            assert b["largest"] <= a["largest"], "giant grew with removals"

    check("robustness_level0_matches_cc", robustness_level0_matches_cc)

    def evolution_days_match_persistence():
        # the two time-series operators must agree on which days carry
        # edges, and per-day node counts bound the giant component
        ev = {
            r["day"]: r
            for r in entry_mod.q_component_evolution(spark, sf_dir).collect()
        }
        assert ev, "no days with edges"
        pe = entry_mod.q_edge_persistence(spark, sf_dir).collect()
        for r in pe:
            assert r["day"] in ev and (r["day"] + 1) in ev
            assert 0.0 <= r["jaccard"] <= 1.0
        for r in ev.values():
            assert r["largest"] <= r["n_nodes"]
            assert r["n_components"] <= r["n_nodes"]

    check("evolution_days_match_persistence", evolution_days_match_persistence)

    def densest_beats_whole_graph_density():
        # the peel's best snapshot can only DENSIFY relative to the
        # whole graph (round 0 is the whole graph, best is max)
        rows = entry_mod.q_densest_subgraph(spark, sf_dir).collect()
        assert rows
        gs = entry_mod.q_graph_summary(spark, sf_dir).collect()[0]
        whole = round(gs["n_edges"] / gs["n_nodes"], 6)
        assert rows[0]["density"] >= whole

    check("densest_beats_whole_graph_density", densest_beats_whole_graph_density)

    def msf_weight_matches_networkx():
        # the msf ORACLE is quadratic (minimax closure, like ecc/scc) so
        # the gate checks it at sf0.01; here the engine forest at sf0.1
        # must carry the UNIQUE minimum total weight (invariant across
        # all MSFs even under ties) and the exact forest cardinality
        import networkx as nx

        rows = entry_mod.q_msf(spark, sf_dir).collect()
        cc = entry_mod.q_connected_components(spark, sf_dir)
        n_nodes = cc.count()
        n_comp = cc.select("component").distinct().count()
        assert len(rows) == n_nodes - n_comp, (len(rows), n_nodes, n_comp)
        g = nx.Graph()
        # independent weighted edge list via the same blocked pair source
        from online_centrality_spark.dedup.embedding import (
            embedding_near_dups_blocked,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pairs = embedding_near_dups_blocked(emb, threshold=0.35 - 1e-6)
        for r in pairs.collect():
            w = round(r["cosine"], 6)
            if w >= 0.35:
                g.add_edge(r["doc_a"], r["doc_b"], weight=w)
        t = nx.minimum_spanning_edges(g, data=True)
        nx_weight = round(sum(d["weight"] for _, _, d in t), 6)
        assert round(sum(r["w"] for r in rows), 6) == nx_weight

    check("msf_weight_matches_networkx", msf_weight_matches_networkx)

    # round 5: closeness_sampled's oracle is the same quadratic minimax
    # closure (sf0.01-gated), so at sf0.1 each sampled row must agree
    # with the independent single-source bfs_distances operator
    def closeness_sampled_matches_bfs():
        from online_centrality_spark.operators import bfs_distances

        cos = entry_mod._cos_edges(spark, sf_dir).persist()
        rows = {
            r.node_id: r
            for r in entry_mod.q_closeness_sampled(spark, sf_dir).collect()
        }
        assert len(rows) == 32, len(rows)
        for v in sorted(rows)[:6]:
            d = (
                bfs_distances(cos, v)
                .filter(F.col("dist").isNotNull() & (F.col("dist") > 0))
                .agg(
                    F.count("*").alias("reach"),
                    F.sum("dist").alias("total"),
                )
                .collect()[0]
            )
            r = rows[v]
            assert r.reach == d["reach"], (v, r.reach, d["reach"])
            assert r.total_dist == d["total"], (v, r.total_dist, d["total"])
            want = round(d["reach"] / d["total"], 6) if d["total"] else 0.0
            assert abs(r.closeness - want) < 1e-9, (v, r.closeness, want)
        cos.unpersist()

    check("closeness_sampled_matches_bfs", closeness_sampled_matches_bfs)

    # round 5: mutual_knn_lsh's recall-1.0 claim, engine-side at sf0.1 —
    # the LSH-candidate graph must EQUAL the exact blocked-path graph
    # restricted to the same 0.4 floor
    def mutual_knn_lsh_matches_exact():
        from online_centrality_spark.similarity.ann import mutual_knn_graph

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        exact = {
            (r.a, r.b): r.cosine
            for r in mutual_knn_graph(emb, k=5, min_cosine=0.4).collect()
        }
        lsh = {
            (r.a, r.b): r.cosine
            for r in entry_mod.q_mutual_knn_lsh(spark, sf_dir).collect()
        }
        assert exact, "vacuous: no pairs above the 0.4 floor"
        assert set(exact) == set(lsh), (
            f"missing={list(set(exact) - set(lsh))[:5]} "
            f"extra={list(set(lsh) - set(exact))[:5]}"
        )
        for k2, v in exact.items():
            assert abs(lsh[k2] - v) < 1e-9, (k2, lsh[k2], v)

    check("mutual_knn_lsh_matches_exact", mutual_knn_lsh_matches_exact)

    # round 5: embedding_dedup_lsh's exact-recall claim at sf0.1 (its
    # gate row runs at sf0.01; this caught the 24x4 -> 64x4 envelope
    # correction: 24x4 missed 12 of 920 sf0.1 pairs)
    def embedding_dedup_lsh_matches_blocked():
        from online_centrality_spark.dedup.embedding import (
            embedding_near_dups_blocked,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        ex = {
            (r.doc_a, r.doc_b)
            for r in embedding_near_dups_blocked(
                emb, threshold=0.4 - 1e-6
            ).collect()
            if round(r.cosine, 6) >= 0.4
        }
        ls = {
            (r[0], r[1])
            for r in entry_mod.q_embedding_dedup_lsh(spark, sf_dir).collect()
        }
        assert ex and ex == ls, (
            f"n_exact={len(ex)} n_lsh={len(ls)} "
            f"missing={list(ex - ls)[:5]} extra={list(ls - ex)[:5]}"
        )

    check(
        "embedding_dedup_lsh_matches_blocked",
        embedding_dedup_lsh_matches_blocked,
    )

    # round 5 batch 3: SemDeDup keep rule vs an independent driver-side
    # numpy oracle (full cosine matrix + the greedy lowest-id rule) —
    # 2000 vectors at sf0.1, tool-side collect is fine here
    def semantic_dedup_matches_numpy():
        import numpy as np

        from online_centrality_spark.similarity import kmeans, semantic_dedup

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        got = {
            r.vec_id: (r.cluster, r.keep, r.dup_of)
            for r in semantic_dedup(emb, k=10, iters=4, threshold=0.4).collect()
        }
        cl = {
            r.vec_id: r.cluster for r in kmeans(emb, k=10, iters=4).collect()
        }
        rows = sorted(
            (r.vec_id, list(r.embedding)) for r in emb.collect()
        )
        ids = np.array([i for i, _ in rows])
        m = np.array([v for _, v in rows], dtype=np.float64)
        sims = np.round(
            (m @ m.T)
            / (np.linalg.norm(m, axis=1)[:, None] * np.linalg.norm(m, axis=1)[None, :]),
            6,
        )
        n_dropped = 0
        for j, vid in enumerate(ids):
            assert got[vid][0] == cl[vid], (vid, got[vid][0], cl[vid])
            lower = [
                int(ids[i])
                for i in range(len(ids))
                if ids[i] < vid and cl[int(ids[i])] == cl[vid]
                and sims[i, j] >= 0.4
            ]
            if lower:
                n_dropped += 1
                assert got[vid][1:] == (False, min(lower)), (vid, got[vid])
            else:
                assert got[vid][1:] == (True, -1), (vid, got[vid])
        assert n_dropped > 0, "vacuous: no semantic dups at sf0.1"

    check("semantic_dedup_matches_numpy", semantic_dedup_matches_numpy)

    def bowtie_partitions_and_core_is_giant_scc():
        # classes partition the digraph node universe; CORE == the
        # largest SCC produced by the independent SCC operator
        from online_centrality_spark.operators import (
            bowtie_decomposition,
            strongly_connected_components,
        )
        from online_centrality_spark.sources.edges import (
            user_interaction_digraph,
        )

        dg = user_interaction_digraph(
            spark.read.parquet(f"{sf_dir}/events.parquet"), gap_seconds=60.0
        ).persist()
        got = {
            r.node_id: r.bowtie_class
            for r in bowtie_decomposition(dg).collect()
        }
        labels = strongly_connected_components(dg).collect()
        nodes = {r.node_id for r in labels}
        assert set(got) == nodes
        from collections import Counter

        sizes = Counter(r.component for r in labels)
        giant = min(
            (c for c in sizes if sizes[c] == max(sizes.values()))
        )
        core = {r.node_id for r in labels if r.component == giant}
        assert {v for v, c in got.items() if c == "CORE"} == core

    check("bowtie_partitions_and_core_is_giant_scc",
          bowtie_partitions_and_core_is_giant_scc)

    def triangle_estimate_within_tolerance_of_exact():
        from online_centrality_spark.operators.triangles import (
            triangle_count,
            triangle_estimate,
        )

        e = entry_mod._cos_edges(spark, sf_dir).persist()
        exact = triangle_count(e)
        row = triangle_estimate(e, num_samples=20_000).collect()[0]
        import math

        p = 3.0 * exact / row["n_wedges"]
        sigma = (
            math.sqrt(max(p * (1 - p), 1e-12) / row["n_sampled"])
            * row["n_wedges"] / 3.0
        )
        assert abs(row["est_triangles"] - exact) <= 4 * sigma + 1, (
            row["est_triangles"], exact, sigma,
        )

    check("triangle_estimate_within_tolerance_of_exact",
          triangle_estimate_within_tolerance_of_exact)

    def label_spreading_clamps_and_reaches():
        got = {
            r.node_id: r.label
            for r in entry_mod.q_label_spreading(spark, sf_dir).collect()
        }
        seeds = {
            v: f"c{v % 3}" for v in got if v % 7 == 0
        }
        assert seeds, "vacuous: no seeds at this sf"
        for v, lab in seeds.items():
            assert got[v] == lab, (v, got[v], lab)
        assert set(got.values()) <= {"c0", "c1", "c2"}
        assert len(got) > len(seeds), "labels never spread"

    check("label_spreading_clamps_and_reaches",
          label_spreading_clamps_and_reaches)

    def weighted_walks_follow_edges():
        from online_centrality_spark.sources.edges import (
            user_interaction_pairs,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        pairs = user_interaction_pairs(ev, gap_seconds=60.0)
        adj = {
            (r.src, r.dst)
            for r in pairs.select("src", "dst").distinct().collect()
        }
        walks = {}
        for r in sorted(
            entry_mod.q_weighted_walks(spark, sf_dir).collect(),
            key=lambda r: (r.walk_id, r.step),
        ):
            walks.setdefault(r.walk_id, []).append(r.node_id)
        assert walks
        for wid, path in walks.items():
            assert path[0] == wid
            for a, b in zip(path, path[1:]):
                assert (a, b) in adj, (wid, a, b)

    check("weighted_walks_follow_edges", weighted_walks_follow_edges)

    # round-5 batch 15/16 heavy ops (edge_betweenness / weighted
    # clustering oracles are unrolled-CTE-heavy at sf0.1)
    def weighted_clustering_bounded_by_binary():
        wcc = {
            r.node_id: (r.degree, r.wcc)
            for r in entry_mod.q_weighted_clustering(spark, sf_dir).collect()
        }
        lcc = {
            r.node_id: r.lcc
            for r in entry_mod.q_local_clustering(spark, sf_dir).collect()
            if r.degree >= 1
        }
        assert set(wcc) == set(lcc), (len(wcc), len(lcc))
        for v, (d, w) in wcc.items():
            assert 0.0 <= w <= 1.0 + 1e-9, (v, w)
            # normalized weights <= 1, so every triangle term <= 1:
            # Onnela wcc can never exceed the binary coefficient
            assert w <= lcc[v] + 1e-6, (v, w, lcc[v])
            if d < 2:
                assert w == 0.0, (v, w)

    check("weighted_clustering_bounded_by_binary",
          weighted_clustering_bounded_by_binary)

    def edge_betweenness_total_identity():
        # sum_e ebc == sum_v bc + (reachable ordered pivot pairs)/2:
        # per source, every shortest path crosses one more edge than it
        # has interior vertices. Three independent operators meet here.
        eb = entry_mod.q_edge_betweenness(spark, sf_dir).collect()
        assert all(r.ebc >= -1e-9 for r in eb)
        sum_e = sum(r.ebc for r in eb)
        nb = entry_mod.q_betweenness(spark, sf_dir).collect()
        sum_v = sum(r.bc for r in nb)
        comp = {
            r.node_id: r.component
            for r in entry_mod.q_connected_components(spark, sf_dir).collect()
        }
        sizes: dict[int, int] = {}
        for c in comp.values():
            sizes[c] = sizes.get(c, 0) + 1
        pivots = sorted(comp)[:8]
        reach = sum(sizes[comp[s]] - 1 for s in pivots)
        assert abs(sum_e - (sum_v + reach / 2.0)) < 1e-4, (
            sum_e, sum_v, reach,
        )

    check("edge_betweenness_total_identity", edge_betweenness_total_identity)

    def square_census_bounds():
        r = entry_mod.q_square_census(spark, sf_dir).collect()[0]
        assert r.n_diag_pairs <= r.n_wedge_pairs
        assert r.n_wedge_pairs + r.n_diag_pairs <= r.n_wedges
        assert r.n_squares >= 0

    check("square_census_bounds", square_census_bounds)

    def dedup_thresholds_match_jaccard_query():
        prof = {
            r.threshold: (r.n_pairs, r.n_docs)
            for r in entry_mod.q_dedup_thresholds(spark, sf_dir).collect()
        }
        assert len(prof) == 9
        ts = sorted(prof)
        for a, b in zip(ts, ts[1:]):  # survival curves are monotone
            assert prof[a][0] >= prof[b][0] and prof[a][1] >= prof[b][1]
        # the 0.2 rung equals the exact ngram_jaccard query's pair count
        # (integer bucket rule <=> the engine's float floor at rational
        # boundaries, same n=2 shingles)
        n_at_02 = entry_mod.q_ngram_jaccard(spark, sf_dir).count()
        assert prof[0.2][0] == n_at_02, (prof[0.2][0], n_at_02)

    check("dedup_thresholds_match_jaccard_query",
          dedup_thresholds_match_jaccard_query)

    def markov_stationary_is_distribution():
        rows = entry_mod.q_markov_stationary(spark, sf_dir).collect()
        assert all(r.prob >= 0 for r in rows)
        assert abs(sum(r.prob for r in rows) - 1.0) < 1e-6

    check("markov_stationary_is_distribution",
          markov_stationary_is_distribution)

    def bigram_entropy_bounded():
        import math

        r = entry_mod.q_bigram_entropy(spark, sf_dir).collect()[0]
        assert 0.0 <= r.entropy_rate <= math.log(max(r.n_states, 2)) + 1e-6

    check("bigram_entropy_bounded", bigram_entropy_bounded)

    def bridges_disjoint_from_truss_and_forest_bounded():
        """Cross-operator: a bridge lies on NO cycle, so it can never
        survive the 3-truss peel (truss edges sit in triangles); and
        bridges are a subset of any spanning forest, so their count is
        bounded by n_nodes - n_components."""
        br = entry_mod.q_bridges(spark, sf_dir).persist()
        tr = entry_mod.q_k_truss(spark, sf_dir).select("a", "b")
        overlap = br.join(tr, ["a", "b"]).count()
        assert overlap == 0, f"{overlap} bridges inside the 3-truss"
        cc = entry_mod.q_connected_components(spark, sf_dir)
        n_nodes = cc.count()
        n_comp = cc.select("component").distinct().count()
        n_br = br.count()
        assert n_br <= n_nodes - n_comp, (n_br, n_nodes, n_comp)

    check("bridges_disjoint_from_truss_and_forest_bounded",
          bridges_disjoint_from_truss_and_forest_bounded)

    def integrity_checks_clean_at_sf01():
        rows = entry_mod.q_integrity_checks(spark, sf_dir).collect()
        assert len(rows) == 9
        bad = {r["check"]: r["n_violations"] for r in rows
               if r["n_violations"] != 0}
        assert not bad, bad

    check("integrity_checks_clean_at_sf01", integrity_checks_clean_at_sf01)

    def rank_overlap_bounded():
        r = entry_mod.q_rank_overlap(spark, sf_dir).collect()[0]
        assert 0.0 <= r["rbo"] <= 1.0, r
        assert 0 <= r["overlap_at_depth"] <= r["depth"], r

    check("rank_overlap_bounded", rank_overlap_bounded)

    def scd2_intervals_chain():
        """Per user: closed intervals are positive-length, exactly one
        open (current) interval, and consecutive intervals chain
        exactly (next valid_from == previous valid_to)."""
        df = entry_mod.q_scd2_history(spark, sf_dir).persist()
        assert df.filter(
            F.col("valid_to_us").isNotNull()
            & (F.col("valid_to_us") <= F.col("valid_from_us"))
        ).count() == 0
        per_user_open = (
            df.filter(F.col("valid_to_us").isNull())
            .groupBy("user_id")
            .count()
            .filter(F.col("count") != 1)
            .count()
        )
        assert per_user_open == 0
        from pyspark.sql import Window as W

        w = W.partitionBy("user_id").orderBy("valid_from_us")
        broken = (
            df.select(
                "user_id",
                "valid_from_us",
                F.lag("valid_to_us").over(w).alias("prev_to"),
            )
            .filter(
                F.col("prev_to").isNotNull()
                & (F.col("prev_to") != F.col("valid_from_us"))
            )
            .count()
        )
        assert broken == 0

    check("scd2_intervals_chain", scd2_intervals_chain)

    ok = all(v["ok"] for v in results.values())
    print(json.dumps({"sf_dir": sf_dir, "pass": ok, "invariants": results}))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
