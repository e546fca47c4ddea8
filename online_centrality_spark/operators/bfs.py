"""Single-source BFS hop distances by frontier expansion.

North-rule addition (standard link-graph toolkit). Level-synchronous
BFS: each round joins the current frontier against the adjacency list,
anti-joins the visited set, and stamps the round number as the
distance. One shuffle join + one anti-join per level, lineage cut per
round with ``localCheckpoint`` — the same loop discipline as the
PageRank / CC / k-core iterations, so a deep traversal over a
10^12-edge table keeps O(1) plans. Unreached nodes are emitted with
``dist = NULL`` so the output covers the full node set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    source: int,
    directed: bool = False,
    max_rounds: int = 10_000,
) -> DataFrame:
    """(node_id, dist) — hop count from ``source`` (NULL if unreachable)."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    adj = e.dropDuplicates(["src", "dst"])
    if not directed:
        adj = adj.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates(["src", "dst"])
    adj = adj.persist()
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionAll(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .persist()
    )
    spark = edges.sparkSession
    frontier = nodes.filter(F.col("node_id") == source).localCheckpoint(eager=True)
    visited = frontier.select("node_id", F.lit(0).cast("long").alias("dist"))
    visited = visited.localCheckpoint(eager=True)
    for r in range(1, max_rounds + 1):
        if frontier.count() == 0:
            break
        nxt = (
            adj.join(frontier.withColumnRenamed("node_id", "src"), "src", "left_semi")
            .select(F.col("dst").alias("node_id"))
            .distinct()
            .join(visited.select("node_id"), "node_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(
            nxt.select("node_id", F.lit(r).cast("long").alias("dist"))
        ).localCheckpoint(eager=True)
        frontier = nxt
    else:
        raise RuntimeError(f"bfs did not exhaust the frontier in {max_rounds} rounds")
    return nodes.join(visited, "node_id", "left").select("node_id", "dist")


def _sym_adjacency(edges: DataFrame, directed: bool):
    """(adj, nodes) for the all-sources sweeps — deduplicated adjacency
    (symmetrized unless directed) and the distinct node set, both
    persisted (each feeds every BFS round)."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    adj = e.dropDuplicates(["src", "dst"])
    if not directed:
        adj = adj.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates(["src", "dst"])
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionAll(e.select(F.col("dst").alias("node_id")))
        .distinct()
        .persist()
    )
    return adj.persist(), nodes


def _resolve_targets(nodes: DataFrame, targets) -> DataFrame:
    """Resolve the BFS source set: ``None`` -> every node (exact
    all-sources), ``int k`` -> the k smallest node ids (the same
    deterministic pivot rule as ``betweenness_from_pivots`` — a
    distributed top-k, no global sort task), DataFrame -> its
    ``node_id`` column intersected with the graph's nodes."""
    if targets is None:
        return nodes
    if isinstance(targets, int):
        if targets <= 0:
            raise ValueError(f"targets must be positive, got {targets}")
        return nodes.orderBy("node_id").limit(targets)
    return (
        targets.select("node_id")
        .distinct()
        .join(nodes, "node_id", "left_semi")
    )


def _all_pairs_frontiers(adj, seeds, max_rounds: int, tag: str):
    """Shared all-sources level-synchronous BFS envelope: yields
    ``(depth, frontier)`` where the frontier is exactly the (target,
    node) pairs at shortest distance ``depth``, for every target in
    ``seeds``. With seeds = all nodes, state is the quadratic (target,
    node) visited relation — the price of exact all-pairs hop metrics;
    with a k-node target sample (the 10^12-edge escape hatch) state is
    k rows per node, the ``betweenness_from_pivots`` envelope.
    Frontiers shrink monotonically as components saturate.
    One shuffle join + one anti-join per depth, lineage cut per round.
    Raises instead of yielding a truncated relation when ``max_rounds``
    is hit (the engine's standard fixpoint discipline)."""
    visited = seeds.select(
        F.col("node_id").alias("target"), F.col("node_id").alias("node")
    ).localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, max_rounds + 1):
        expanded = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .select("target", F.col("dst").alias("node"))
            .distinct()
        )
        frontier = expanded.join(
            visited, ["target", "node"], "left_anti"
        ).localCheckpoint(eager=True)
        if frontier.isEmpty():
            return
        yield depth, frontier
        visited = visited.unionByName(frontier).localCheckpoint(eager=True)
    raise RuntimeError(f"{tag} did not saturate in {max_rounds} rounds")


def eccentricity(
    edges: DataFrame,
    directed: bool = False,
    max_rounds: int = 10_000,
    targets: DataFrame | int | None = None,
) -> DataFrame:
    """(node_id, ecc) — max hop distance from each node to any node it
    can reach (its connected component in the undirected default).

    All-sources BFS (:func:`_all_pairs_frontiers`); the targets that
    still gained nodes this round bump their eccentricity to the
    current depth. ``targets`` (int k = the k smallest node ids, or a
    node_id frame — the ``betweenness_from_pivots`` pivot rule) is the
    10^12-edge escape hatch: EXACT eccentricities for just the sampled
    nodes, BFS state k rows per node instead of n^2; max over a target
    sample lower-bounds the diameter, min upper-bounds the radius."""
    adj, nodes = _sym_adjacency(edges, directed)
    seeds = _resolve_targets(nodes, targets)
    ecc = seeds.select("node_id", F.lit(0).cast("long").alias("ecc"))
    ecc = ecc.localCheckpoint(eager=True)
    for depth, frontier in _all_pairs_frontiers(
        adj, seeds, max_rounds, "eccentricity"
    ):
        grew = frontier.select(F.col("target").alias("node_id")).distinct()
        ecc = (
            ecc.join(grew.withColumn("_g", F.lit(1)), "node_id", "left")
            .select(
                "node_id",
                F.when(F.col("_g").isNotNull(), F.lit(depth).cast("long"))
                .otherwise(F.col("ecc"))
                .alias("ecc"),
            )
            .localCheckpoint(eager=True)
        )
    return ecc


def closeness_centrality(
    edges: DataFrame,
    directed: bool = False,
    max_rounds: int = 10_000,
    targets: DataFrame | int | None = None,
) -> DataFrame:
    """(node_id, reach, total_dist, closeness) — per-component exact
    closeness: ``reach`` = nodes reachable from v (excluding v),
    ``total_dist`` = sum of hop distances to them, ``closeness`` =
    reach / total_dist (0.0 when nothing is reachable).

    Same envelope as :func:`eccentricity`, but instead of a per-round
    score join it emits each round's tiny ``(target, gained-count,
    depth)`` aggregate and folds them in ONE final union + groupBy —
    no per-round update join at all. ``targets`` (int k = the k
    smallest node ids, or a node_id frame) is the 10^12-edge escape
    hatch: one row per sampled node with its EXACT closeness (each
    sampled BFS still reaches the node's whole component), state k
    rows per node instead of n^2."""
    adj, nodes = _sym_adjacency(edges, directed)
    seeds = _resolve_targets(nodes, targets)
    per_depth: list[DataFrame] = []
    for depth, frontier in _all_pairs_frontiers(
        adj, seeds, max_rounds, "closeness"
    ):
        per_depth.append(
            frontier.groupBy("target")
            .agg(F.count("*").alias("cnt"))
            .withColumn("depth", F.lit(depth).cast("long"))
            .localCheckpoint(eager=True)
        )
    if not per_depth:
        return seeds.select(
            "node_id",
            F.lit(0).cast("long").alias("reach"),
            F.lit(0).cast("long").alias("total_dist"),
            F.lit(0.0).alias("closeness"),
        )
    gains = per_depth[0]
    for g in per_depth[1:]:
        gains = gains.unionByName(g)
    stats = gains.groupBy(F.col("target").alias("node_id")).agg(
        F.sum("cnt").cast("long").alias("reach"),
        F.sum(F.col("cnt") * F.col("depth")).cast("long").alias("total_dist"),
    )
    return (
        seeds.join(stats, "node_id", "left")
        .fillna(0, ["reach", "total_dist"])
        .select(
            "node_id",
            "reach",
            "total_dist",
            F.when(
                F.col("total_dist") > 0,
                F.col("reach").cast("double") / F.col("total_dist"),
            )
            .otherwise(F.lit(0.0))
            .alias("closeness"),
        )
    )


def hop_distribution(
    edges: DataFrame,
    directed: bool = False,
    eff_quantile: float = 0.9,
    max_rounds: int = 10_000,
    targets: DataFrame | int | None = None,
) -> DataFrame:
    """(d, n_pairs, cum_frac, eff_diameter) — the exact hop-distance
    distribution of the graph: how many ordered reachable pairs sit at
    shortest distance ``d``, the cumulative fraction, and the effective
    diameter (smallest ``d`` covering ``eff_quantile`` of all reachable
    pairs — the standard small-world headline metric).

    Same envelope as :func:`eccentricity`: each round's frontier IS the
    pair set at distance ``depth``, so the distribution falls out as
    one scalar count per round; the rounds fold in a single union over
    the (diameter-bounded) depth frame, where the cumulative window is
    explicitly safe. The cumulative fraction is a single division of
    exact integer sums, so engines agree bit-for-bit before rounding.

    ``targets`` (int k = the k smallest node ids, or a node_id frame)
    is the 10^12-edge escape hatch: pairs are counted from the sampled
    sources only (state k rows per node), ``n_pairs`` is the exact
    sampled count, and an extra ``est_pairs`` column carries the
    Eppstein–Wang-style ``n/k``-rescaled estimate of the full count;
    ``cum_frac`` / ``eff_diameter`` are ratios, invariant under the
    rescale. The exact path (targets=None) keeps its 4-column schema."""
    adj, nodes = _sym_adjacency(edges, directed)
    seeds = _resolve_targets(nodes, targets)
    sampled = targets is not None
    spark = edges.sparkSession
    per_depth: list[DataFrame] = []
    for depth, frontier in _all_pairs_frontiers(
        adj, seeds, max_rounds, "hop_distribution"
    ):
        per_depth.append(
            frontier.agg(F.count("*").alias("n_pairs")).select(
                F.lit(depth).cast("long").alias("d"), "n_pairs"
            )
        )
    if not per_depth:
        schema = "d long, n_pairs long, cum_frac double, eff_diameter long"
        if sampled:
            schema = (
                "d long, n_pairs long, est_pairs double, cum_frac double,"
                " eff_diameter long"
            )
        return spark.createDataFrame([], schema)
    hd = per_depth[0]
    for g in per_depth[1:]:
        hd = hd.unionByName(g)
    # depth frame is diameter-bounded — the global windows are explicit
    # and safe (same envelope as edge_stream_growth's day frame)
    from pyspark.sql import Window

    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = hd.select(
        "d",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        (F.sum("n_pairs").over(w_cum) / F.sum("n_pairs").over(w_all)).alias(
            "raw_frac"
        ),
    )
    eff = c.filter(F.col("raw_frac") >= F.lit(eff_quantile)).agg(
        F.min("d").alias("eff_diameter")
    )
    out = c.crossJoin(F.broadcast(eff))
    if sampled:
        # n/k rescale: two 1-row scalar aggregates broadcast onto the
        # diameter-bounded depth frame
        scale = (
            nodes.agg(F.count("*").alias("n_nodes"))
            .crossJoin(F.broadcast(seeds.agg(F.count("*").alias("k_targets"))))
        )
        return out.crossJoin(F.broadcast(scale)).select(
            "d",
            "n_pairs",
            F.round(
                F.col("n_pairs")
                * (F.col("n_nodes").cast("double") / F.col("k_targets")),
                6,
            ).alias("est_pairs"),
            F.round("raw_frac", 6).alias("cum_frac"),
            "eff_diameter",
        )
    return out.select(
        "d",
        "n_pairs",
        F.round("raw_frac", 6).alias("cum_frac"),
        "eff_diameter",
    )
