"""Round-5 additions: ADVICE fixes (input validation, node-universe
hygiene, loud oracle guards) and the scale escape hatches (sampled
all-sources BFS, LSH mutual-kNN candidates)."""

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------------------- ADVICE


def test_random_failure_rejects_bad_percents(spark):
    from online_centrality_spark.operators.robustness import random_failure

    e = _edges(spark, [(1, 2), (2, 3)])
    with pytest.raises(ValueError, match="integers"):
        random_failure(e, percents=[0, 12.5])
    with pytest.raises(ValueError, match="integers"):
        random_failure(e, percents=[-1, 10])
    with pytest.raises(ValueError, match="integers"):
        random_failure(e, percents=[101])
    # integer-valued floats are fine (int(p) == p)
    assert random_failure(e, percents=[0, 50.0]).count() >= 1


def test_clustering_by_degree_ignores_selfloop_only_nodes(spark):
    """A self-loop-only endpoint has no simple-graph degree: it must not
    create a spurious k=0 class (the SQL oracle's node universe comes
    from the deduped simple edge list and never emits one)."""
    from online_centrality_spark.operators.summary import clustering_by_degree

    tri = [(1, 2), (2, 3), (1, 3), (9, 9)]  # triangle + self-loop-only node 9
    out = clustering_by_degree(_edges(spark, tri)).collect()
    ks = {r["k"] for r in out}
    assert 0 not in ks
    assert ks == {2}
    row = out[0]
    assert row["n_nodes"] == 3 and abs(row["ck"] - 1.0) < 1e-9


def test_msf_oracle_guards_fire():
    """The MSF oracle must fail LOUD (DuckDB error()) instead of
    returning a wrong forest when the BIGINT key order breaks (node id
    >= 1e5) or the doubling closure has not converged."""

    import duckdb

    import __spark_entry__ as entry_mod

    sql = entry_mod.oracle_sql()["msf"]

    # embeddings crafted so every pair clears the cosine threshold:
    # a 100001-id row breaks the key order -> guard must raise
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        "(100001, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [1.0, 0.2])"
        ") t(vec_id, embedding)"
    )
    with pytest.raises(Exception, match="key order"):
        con.sql(sql).fetchall()

    # a 12-node chain in embedding space (v_i = e_i + 0.5*e_{i+1}:
    # adjacent cosine 0.4 >= COS_TH, non-adjacent 0) with the closure
    # truncated to ONE doubling round (2-hop paths) -> convergence
    # guard must raise instead of emitting a wrong forest
    trunc = entry_mod._msf_sql(rounds=1)
    n = 12
    vecs = []
    for i in range(n):
        v = [0.0] * (n + 1)
        v[i] = 1.0
        v[i + 1] = 0.5
        vecs.append(f"({i}, {v})")
    con2 = duckdb.connect()
    con2.sql(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        + ", ".join(vecs)
        + ") t(vec_id, embedding)"
    )
    with pytest.raises(Exception, match="not converged"):
        con2.sql(trunc).fetchall()


# ------------------------------------------------- sampled BFS family


def _cycle(spark, n=12):
    return _edges(spark, [(i, (i + 1) % n) for i in range(n)])


def test_closeness_sampled_exact_on_sample(spark):
    """targets=k computes EXACT closeness for the k smallest node ids —
    identical rows to the all-sources run filtered to the sample."""
    from online_centrality_spark.operators.bfs import closeness_centrality

    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 1), (4, 5), (7, 8)],  # cycle+tail+island
    )
    exact = {
        r["node_id"]: (r["reach"], r["total_dist"], r["closeness"])
        for r in closeness_centrality(e).collect()
    }
    samp = closeness_centrality(e, targets=3).collect()
    assert sorted(r["node_id"] for r in samp) == [1, 2, 3]
    for r in samp:
        assert (r["reach"], r["total_dist"], r["closeness"]) == exact[r["node_id"]]


def test_eccentricity_sampled_exact_on_sample(spark):
    from online_centrality_spark.operators.bfs import eccentricity

    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    exact = {r["node_id"]: r["ecc"] for r in eccentricity(e).collect()}
    samp = eccentricity(e, targets=2).collect()
    assert sorted(r["node_id"] for r in samp) == [1, 2]
    for r in samp:
        assert r["ecc"] == exact[r["node_id"]]


def test_targets_dataframe_intersects_graph_nodes(spark):
    from online_centrality_spark.operators.bfs import eccentricity

    e = _edges(spark, [(1, 2), (2, 3)])
    tgt = spark.createDataFrame([(2,), (99,)], "node_id long")  # 99 not in graph
    out = eccentricity(e, targets=tgt).collect()
    assert [r["node_id"] for r in out] == [2]
    assert out[0]["ecc"] == 1


def test_hop_distribution_sampled_estimator(spark):
    """On a vertex-transitive graph (cycle) every source sees the same
    distance profile, so the n/k-rescaled sampled estimate EQUALS the
    exact distribution; cum_frac and eff_diameter are scale-invariant."""
    from online_centrality_spark.operators.bfs import hop_distribution

    e = _cycle(spark, 12)
    exact = {r["d"]: r for r in hop_distribution(e).collect()}
    samp = hop_distribution(e, targets=3).collect()
    assert {r["d"] for r in samp} == set(exact)
    for r in samp:
        x = exact[r["d"]]
        assert abs(r["est_pairs"] - x["n_pairs"]) < 1e-6
        assert abs(r["cum_frac"] - x["cum_frac"]) < 1e-9
        assert r["eff_diameter"] == x["eff_diameter"]
        assert r["n_pairs"] * 4 == x["n_pairs"]  # k=3 of n=12 sources


def test_hop_distribution_sampled_estimator_tolerance(spark):
    """On a non-transitive graph the sampled estimate is within a loose
    tolerance of exact (unbiased over source choice, not exact)."""
    from online_centrality_spark.operators.bfs import hop_distribution

    pairs = [(i, i + 1) for i in range(20)] + [(0, 10), (5, 15)]
    e = _edges(spark, pairs)
    exact_total = sum(r["n_pairs"] for r in hop_distribution(e).collect())
    samp = hop_distribution(e, targets=7).collect()
    est_total = sum(r["est_pairs"] for r in samp)
    assert abs(est_total - exact_total) / exact_total < 0.35


def test_bfs_targets_validation(spark):
    import pytest as _pt

    from online_centrality_spark.operators.bfs import closeness_centrality

    e = _edges(spark, [(1, 2)])
    with _pt.raises(ValueError, match="positive"):
        closeness_centrality(e, targets=0)


# ------------------------------------------------- mutual-kNN LSH path


def test_mutual_knn_lsh_equals_exact_on_sf(spark):
    """Recall 1.0 at the 0.4 floor: the LSH candidate path produces the
    IDENTICAL mutual-kNN graph to the exact blocked path, so the two
    driver queries can share oracle semantics."""
    from online_centrality_spark.similarity.ann import mutual_knn_graph

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = mutual_knn_graph(emb, k=5, min_cosine=0.4).collect()
    lsh = mutual_knn_graph(
        emb, k=5, candidates="lsh", min_cosine=0.4, num_tables=64, num_planes=4
    ).collect()
    key = lambda r: (r["a"], r["b"])  # noqa: E731
    assert sorted(map(key, exact)) == sorted(map(key, lsh))
    ec = {key(r): r["cosine"] for r in exact}
    for r in lsh:
        assert abs(ec[key(r)] - r["cosine"]) < 1e-9
    assert len(exact) > 0  # non-vacuous


def test_mutual_knn_lsh_requires_floor(spark):
    import pytest as _pt

    from online_centrality_spark.similarity.ann import mutual_knn_graph

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with _pt.raises(ValueError, match="min_cosine"):
        mutual_knn_graph(emb, k=5, candidates="lsh")
    with _pt.raises(ValueError, match="exact.*lsh"):
        mutual_knn_graph(emb, k=5, candidates="ivf")


def test_mutual_knn_lsh_plan_has_no_all_pairs_stage(spark):
    """The blocked all-pairs source is an applyInPandas over block
    pairs (FlatMapGroupsInPandas); LSH mode must not contain it."""
    from online_centrality_spark.similarity.ann import mutual_knn_graph

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lsh_plan = (
        mutual_knn_graph(emb, k=5, candidates="lsh", min_cosine=0.4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapGroupsInPandas" not in lsh_plan
    exact_plan = (
        mutual_knn_graph(emb, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "FlatMapGroupsInPandas" in exact_plan  # marker is real


# ------------------------------------------------- round-5 new operators


def test_hll_registers_mergeable(spark):
    """max-merging per-shard register tables == the whole-corpus sketch
    (the property that makes HLL shuffle-bounded at 100 TB)."""
    from online_centrality_spark.text.sketches import hll_registers

    rows = [("g", f"v{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v string")
    whole = {
        (r["reg"],): r["r"]
        for r in hll_registers(df, ["g"], "v").collect()
    }
    a = hll_registers(df.filter(F.length("v") <= 3), ["g"], "v")
    b = hll_registers(df.filter(F.length("v") > 3), ["g"], "v")
    merged = {
        (r["reg"],): r["r"]
        for r in a.unionByName(b)
        .groupBy("g", "reg")
        .agg(F.max("r").alias("r"))
        .collect()
    }
    assert merged == whole


def test_hll_estimate_within_envelope(spark):
    """Raw-HLL branch: relative error within 4 standard errors
    (1.04/sqrt(256) = 6.5% -> 26%) at n = 5000 >> 2.5m."""
    from online_centrality_spark.text.sketches import hll_distinct

    df = spark.createDataFrame(
        [("g", f"item{i}") for i in range(5000)], "g string, v string"
    )
    row = hll_distinct(df, ["g"], "v").collect()[0]
    assert row["n_exact"] == 5000
    assert abs(row["rel_err"]) < 0.26


def test_hll_linear_counting_small_n(spark):
    """n << m lands in the linear-counting branch, which is near-exact
    there (collision-free registers -> m*ln(m/(m-n)) ~ n)."""
    from online_centrality_spark.text.sketches import hll_distinct

    df = spark.createDataFrame(
        [("g", f"x{i}") for i in range(20)], "g string, v string"
    )
    row = hll_distinct(df, ["g"], "v").collect()[0]
    assert row["n_exact"] == 20
    assert abs(row["n_est"] - 20) <= 2


def test_chunk_documents_coverage_and_overlap(spark):
    from online_centrality_spark.text.packing import chunk_documents

    text = " ".join(f"t{i:03d}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(df, size=4, overlap=1).orderBy("chunk_idx").collect()
    # stride 3: starts at tokens 0,3,6 then the 9-token tail chunk
    chunks = [r["chunk_text"].split(" ") for r in out]
    assert [r["chunk_idx"] for r in out] == [0, 1, 2]
    assert [r["n_tok"] for r in out] == [4, 4, 4]
    assert chunks[0] == ["t000", "t001", "t002", "t003"]
    assert chunks[1][0] == "t003"  # exactly `overlap` shared tokens
    assert chunks[2] == ["t006", "t007", "t008", "t009"]
    # every token covered
    assert set().union(*chunks) == {f"t{i:03d}" for i in range(10)}


def test_chunk_documents_short_doc_single_chunk(spark):
    from online_centrality_spark.text.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "!!!")], "doc_id long, text string"
    )
    out = chunk_documents(df, size=64, overlap=16).collect()
    assert len(out) == 1  # the all-punctuation doc has no tokens
    assert out[0]["doc_id"] == 1 and out[0]["n_tok"] == 2


def test_chunk_documents_validates_params(spark):
    from online_centrality_spark.text.packing import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, size=8, overlap=8)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, size=8, overlap=-1)


def test_training_mix_dedups_and_filters(spark):
    """The composed pipeline drops exact duplicates and quality-floor
    failures before chunking."""
    import __spark_entry__ as entry

    good = (
        "the quick brown fox jumps over the lazy dog and then runs "
        "into the quiet forest to find some food for the long winter"
    )
    df = spark.createDataFrame(
        [
            (1, good, "en", "web"),
            (2, good, "en", "web"),  # exact duplicate of 1
            (3, "zzz", "en", "web"),  # fails the n_words floor
        ],
        "doc_id long, text string, lang string, source string",
    )
    from online_centrality_spark.dedup.exact import exact_dedup
    from online_centrality_spark.text.analysis import quality_score
    from online_centrality_spark.text.packing import chunk_documents

    uniq = exact_dedup(df)
    assert uniq.count() == 2  # duplicate collapsed
    kept = quality_score(uniq).filter(
        (F.col("quality") >= 0.5) & (F.col("n_words") >= 10)
    )
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {1}
    chunks = chunk_documents(kept.select("doc_id", "text"), size=16, overlap=4)
    n_tok = sum(r["n_tok"] for r in chunks.collect())
    n_words = kept.collect()[0]["n_words"]
    # overlap tokens are counted once per chunk boundary crossed
    n_chunks = chunks.count()
    assert n_tok == n_words + 4 * (n_chunks - 1)


# ------------------------------------------------------ semantic dedup


def test_semantic_dedup_keep_rule(spark):
    """Two well-separated embedding clusters, exact dups inside each:
    the lowest-id member of every within-cluster near-dup neighborhood
    survives; cross-cluster twins are NOT deduped (the SemDeDup
    contract — only cluster-mates are compared)."""
    from online_centrality_spark.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0]),   # seed A (seeds = k lowest ids)
        (2, [0.0, 1.0, 0.0]),   # seed B
        (3, [0.0, 0.0, 1.0]),   # seed C — no neighbors, kept
        (4, [1.0, 0.01, 0.0]),  # cluster A, near-dup of 1 -> dup_of=1
        (5, [0.99, 0.02, 0.0]), # cluster A, near 1 AND 4 -> dup_of=1 (min)
        (11, [0.0, 1.0, 0.01]), # cluster B, near-dup of 2 -> dup_of=2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["keep"], r["dup_of"])
        for r in semantic_dedup(df, k=3, iters=2, threshold=0.9).collect()
    }
    assert out[1] == (True, -1)
    assert out[2] == (True, -1)
    assert out[3] == (True, -1)
    assert out[4] == (False, 1)
    assert out[5] == (False, 1)
    assert out[11] == (False, 2)


def test_semantic_dedup_respects_cluster_boundary(spark):
    """An exact twin assigned to a different cluster is not compared:
    with k=n every document is its own cluster and everything is kept."""
    from online_centrality_spark.similarity import semantic_dedup

    rows = [(i, [1.0, float(i) * 1e-6]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, k=4, iters=1, threshold=0.99).collect()
    assert all(r["keep"] for r in out)
    assert {r["cluster"] for r in out} == {0, 1, 2, 3}


# ------------------------------------------------------------------- ANF


def _anf_fixture_edges(spark, n=150, m=420, seed=5):
    import random

    rng = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return _edges(spark, sorted(pairs))


def test_anf_tracks_exact_ball_mass(spark):
    """FM estimates certify against the exact per-radius ball masses:
    converged total within the r=32 error envelope, effective diameter
    within one hop, estimates monotone in h."""
    nx = pytest.importorskip("networkx")
    from online_centrality_spark.operators.anf import anf_reach

    edges = _anf_fixture_edges(spark)
    out = sorted(anf_reach(edges, trials=32).collect(), key=lambda r: r.h)

    g = nx.Graph((r.src, r.dst) for r in edges.collect())
    dists = dict(nx.all_pairs_shortest_path_length(g))
    max_d = max(d for row in dists.values() for d in row.values())
    exact = {
        h: sum(1 for row in dists.values() for d in row.values() if d <= h)
        for h in range(max_d + 1)
    }

    ests = [r.pairs_est for r in out]
    assert all(a <= b + 1e-9 for a, b in zip(ests, ests[1:]))  # monotone
    # converged mass: the FM mean with 32 trials lands well inside 35%
    assert out[-1].pairs_est == pytest.approx(exact[max_d], rel=0.35)
    # effective diameter within one hop of the exact 90% radius
    exact_eff = min(
        h for h, c in exact.items() if c >= 0.9 * exact[max_d]
    )
    assert abs(out[-1].eff_diameter - exact_eff) <= 1
    # fixpoint reached: last two radii carry identical sketch mass
    assert out[-1].pairs_est == out[-2].pairs_est


def test_anf_fixed_rounds_is_fixpoint_prefix(spark):
    """max_rounds=k reproduces the first k+1 rows of the fixpoint run
    (pairs_est is per-round deterministic; only the cum_frac
    denominator depends on how far the run went)."""
    from online_centrality_spark.operators.anf import anf_reach

    edges = _anf_fixture_edges(spark, n=60, m=110)
    full = {r.h: r.pairs_est for r in anf_reach(edges, trials=16).collect()}
    part = {
        r.h: r.pairs_est
        for r in anf_reach(edges, trials=16, max_rounds=2).collect()
    }
    assert set(part) == {0, 1, 2}
    for h, v in part.items():
        assert v == full[h]


def test_anf_partitioning_invariance(spark):
    """Scaled-int64 estimate sums: the numbers cannot move when the
    input partitioning does."""
    from online_centrality_spark.operators.anf import anf_reach

    edges = _anf_fixture_edges(spark, n=60, m=110)
    a = anf_reach(edges.repartition(1), trials=16, max_rounds=3).collect()
    b = anf_reach(edges.repartition(13), trials=16, max_rounds=3).collect()
    key = lambda r: r.h  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_anf_empty_and_selfloop_inputs(spark):
    from online_centrality_spark.operators.anf import anf_reach

    empty = _edges(spark, [])
    out = anf_reach(empty, trials=8)
    assert out.columns == [
        "h", "nodes", "pairs_est", "cum_frac", "eff_diameter",
    ]
    assert out.count() == 0
    loops = _edges(spark, [(3, 3)])
    assert anf_reach(loops, trials=8).count() == 0


def test_anf_round_plan_moves_only_the_aggregate(spark):
    """The per-round plan pin: E' is shuffled once at build, so a round
    (join + bit_or groupBy) contains exactly ONE Exchange — the
    map-side-combined aggregate — when AQE/broadcast can't hide it."""
    from online_centrality_spark.operators.anf import fm_node_sketches

    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        edges = _anf_fixture_edges(spark, n=40, m=60)
        e = edges.filter(F.col("src") != F.col("dst"))
        adj = (
            e.unionAll(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .dropDuplicates(["src", "dst"])
        )
        nodes = adj.select(F.col("src").alias("node_id")).distinct()
        eplus = (
            adj.unionByName(
                nodes.select(
                    F.col("node_id").alias("src"),
                    F.col("node_id").alias("dst"),
                )
            )
            .repartition("dst")
            .localCheckpoint(eager=True)
        )
        sk = (
            fm_node_sketches(nodes, 8)
            .repartition("node_id")
            .localCheckpoint(eager=True)
        )
        nxt = (
            eplus.join(sk, eplus["dst"] == sk["node_id"])
            .groupBy(eplus["src"].alias("node_id"))
            .agg(*[F.bit_or(f"c{t}").alias(f"c{t}") for t in range(8)])
        )
        plan = nxt._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "partial_bit_or" in plan  # map-side combine
        assert "BatchEvalPython" not in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# weighted_sample (A-ES order sampling)
# ---------------------------------------------------------------------------


def _ws_docs(spark, n=400):
    import pandas as pd

    # two planted weight classes: heavy docs weigh 50x the light ones
    # i % 8 < 2 hits both parities, so each stratum gets 25% heavy docs
    rows = [
        (i, "s%d" % (i % 2), 5000 if i % 8 < 2 else 100) for i in range(n)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "n_chars"])
    )


def test_weighted_sample_deterministic_and_ranked(spark):
    from online_centrality_spark.text import weighted_sample

    docs = _ws_docs(spark)
    a = weighted_sample(docs, "n_chars", k=15, stratum_col="source")
    b = weighted_sample(docs, "n_chars", k=15, stratum_col="source")
    ra = sorted((r["source"], r["sample_rank"], r["doc_id"]) for r in a.collect())
    rb = sorted((r["source"], r["sample_rank"], r["doc_id"]) for r in b.collect())
    assert ra == rb  # same sample on every run
    per = {}
    for s, rk, _ in ra:
        per.setdefault(s, []).append(rk)
    assert set(per) == {"s0", "s1"}
    assert all(sorted(v) == list(range(1, 16)) for v in per.values())
    # different seed -> different sample
    c = weighted_sample(docs, "n_chars", k=15, stratum_col="source", seed=7)
    rc = sorted((r["source"], r["sample_rank"], r["doc_id"]) for r in c.collect())
    assert rc != ra


def test_weighted_sample_biases_toward_heavy_weights(spark):
    from online_centrality_spark.text import weighted_sample

    docs = _ws_docs(spark)  # 25% heavy docs carrying ~94% of total weight
    got = weighted_sample(docs, "n_chars", k=30, stratum_col="source").collect()
    heavy = sum(1 for r in got if r["n_chars"] == 5000)
    # E[heavy] ~ 0.94 * 60; a uniform sampler would give ~15
    assert heavy >= 40, heavy


def test_weighted_sample_excludes_nonpositive_and_validates(spark):
    import pandas as pd

    from online_centrality_spark.text import weighted_sample

    docs = spark.createDataFrame(
        pd.DataFrame(
            [(0, "a", 10), (1, "a", 0), (2, "a", -5), (3, "a", 10)],
            columns=["doc_id", "source", "w"],
        )
    )
    got = weighted_sample(docs, "w", k=10, stratum_col="source").collect()
    assert sorted(r["doc_id"] for r in got) == [0, 3]


def test_weighted_sample_global_mode_is_takeordered(spark):
    from online_centrality_spark.text import weighted_sample

    docs = _ws_docs(spark)
    out = weighted_sample(docs, "n_chars", k=10)
    rows = out.collect()
    assert len(rows) == 10
    assert sorted(r["sample_rank"] for r in rows) == list(range(1, 11))
    # scale pin: global selection must be per-partition top-k heaps,
    # never a full sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
