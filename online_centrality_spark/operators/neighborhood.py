"""Exact k-hop neighborhood reach counts over a digraph edge list.

North-rule link-graph addition (no reference counterpart — the
reference, ``/root/reference/python``, has no neighborhood-expansion
analytics at all): for every node of the digraph, the number of
DISTINCT endpoints reachable in exactly one hop (out-degree over the
deduplicated edge set) and via some two-hop path (excluding the source
itself), i.e. the classic "friend-of-friend reach" profile used to
rank influence before running full centrality.

Scale design: one self-join on the mid node plus two
map-side-combinable distinct aggregations. The two-hop candidate set
fans out as sum_b indeg(b) * outdeg(b), the same quadratic hub wall
every exact wedge enumeration has (``link_prediction.py``,
``triangles.py``); ``max_mid_degree`` caps it by skipping hub
mid-nodes (frequency-cap pattern of ``dedup/ngram.py``) — with the cap
on, counts are exact lower bounds and hub-mediated reach is dropped
(documented approximation, off by default so the driver query stays
exact). No windows, no driver collects; the distinct before the join
keeps multiplicity out of the fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def two_hop_reach(
    edges: DataFrame, max_mid_degree: int | None = None
) -> DataFrame:
    """(node_id, reach1, reach2) for every node of the digraph.

    ``reach1``: distinct out-neighbors. ``reach2``: distinct nodes ``c``
    with a path ``v -> b -> c`` and ``c != v`` (a 1-hop neighbor that is
    also 2-hop-reachable counts in both columns).
    """
    # four consumers (node set, both join sides, the degree agg):
    # persist so the upstream induction computes once
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionAll(e.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    first = e
    if max_mid_degree is not None:
        # cap the wedge center: drop mid nodes whose in*out product
        # explodes the candidate set (exactness traded per docstring)
        deg = (
            e.groupBy(F.col("dst").alias("mid"))
            .agg(F.count("*").alias("ind"))
            .join(
                e.groupBy(F.col("src").alias("mid")).agg(
                    F.count("*").alias("outd")
                ),
                "mid",
            )
            .filter(F.col("ind") * F.col("outd") > max_mid_degree)
            .select("mid")
        )
        first = e.join(deg.withColumnRenamed("mid", "dst"), "dst", "left_anti")
    two = (
        first.alias("a")
        .join(e.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(F.col("a.src").alias("src"), F.col("b.dst").alias("c"))
        .filter(F.col("c") != F.col("src"))
        .distinct()
    )
    r1 = e.groupBy("src").agg(F.count("*").alias("reach1"))
    r2 = two.groupBy("src").agg(F.count("*").alias("reach2"))
    return (
        nodes.join(r1.withColumnRenamed("src", "node_id"), "node_id", "left")
        .join(r2.withColumnRenamed("src", "node_id"), "node_id", "left")
        .fillna(0, ["reach1", "reach2"])
        .select(
            "node_id",
            F.col("reach1").cast("long").alias("reach1"),
            F.col("reach2").cast("long").alias("reach2"),
        )
    )


def collective_influence(edges: DataFrame) -> DataFrame:
    """``(node_id, degree, ci)`` — Morone–Makse collective influence at
    radius l=1 over the UNDIRECTED simple graph:
    ``ci(i) = (k_i - 1) * sum_{j in N(i)} (k_j - 1)``.

    The l=1 CI score is the optimal-percolation ranking of
    "Influence maximization in complex networks through optimal
    percolation" (Morone & Makse, Nature 2015) — the hub-aware
    influence measure that beats plain degree for dismantling: a
    node matters because its NEIGHBORS have spare edges, not just
    because it has many. No reference counterpart
    (``/root/reference/python`` ranks by centrality only).

    Integer-exact end to end (degrees are counts), so the oracle hash
    is noise-free. Scale shape: one symmetric-edge shuffle for the
    degree table, one join of the symmetric edge list against it on
    the neighbor key, one map-side-combinable sum per node — linear in
    |E|, no wedge fan-out, no windows, no collects. Hub rows skew the
    neighbor join exactly like every degree join here: AQE skew-split
    handles it (same envelope as ``avg_neighbor_degree``).
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = und.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(und.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("d")).persist()
    return (
        sym.join(deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v")
        .groupBy("u")
        .agg(F.sum(F.col("dv") - F.lit(1)).alias("nsum"))
        .join(deg, "u")
        .select(
            F.col("u").alias("node_id"),
            F.col("d").cast("long").alias("degree"),
            ((F.col("d") - F.lit(1)) * F.col("nsum"))
            .cast("long")
            .alias("ci"),
        )
    )


def neighborhood_overlap(edges: DataFrame) -> DataFrame:
    """``(src, dst, cn, deg_src, deg_dst, overlap)`` per undirected
    edge — common-neighbor count and the Onnela et al. (PNAS 2007)
    neighborhood-overlap coefficient
    ``O = cn / (k_u + k_v - 2 - cn)`` (0.0 when the denominator is 0,
    i.e. an isolated pair). ``overlap = 0`` with a positive
    denominator marks a LOCAL BRIDGE (Granovetter's weak tie): the
    only edge connecting two otherwise-disjoint neighborhoods —
    the structural tie-strength test used to prune redundant edges
    before community detection. No reference counterpart.

    Scale shape: the per-edge common-neighbor count is the same wedge
    enumeration as triangle counting — fan-out sum_w d(w)^2 on the
    wedge center, the known hub wall (``triangles.py``,
    ``link_prediction.py``); both joins are plain shuffle-hash joins
    on node keys that AQE skew-splits. Everything after the wedge
    count is edge-sized. cn is exact (no cap) so the driver query
    stays oracle-identical; overlap rounded to 6 so both engines make
    the identical boundary decision.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    sym = und.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionAll(und.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    cn = (
        und.join(
            sym.select(F.col("u").alias("src"), F.col("v").alias("w")), "src"
        )
        .join(
            sym.select(F.col("u").alias("dst"), F.col("v").alias("w")),
            ["dst", "w"],
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("cn"))
    )
    denom = F.col("deg_src") + F.col("deg_dst") - F.lit(2) - F.col("cn")
    return (
        und.join(cn, ["src", "dst"], "left")
        .fillna(0, ["cn"])
        .join(deg.select(F.col("u").alias("src"), F.col("d").alias("deg_src")), "src")
        .join(deg.select(F.col("u").alias("dst"), F.col("d").alias("deg_dst")), "dst")
        .select(
            "src",
            "dst",
            F.col("cn").cast("long").alias("cn"),
            F.col("deg_src").cast("long").alias("deg_src"),
            F.col("deg_dst").cast("long").alias("deg_dst"),
            F.when(denom > 0, F.round(F.col("cn") / denom, 6))
            .otherwise(F.lit(0.0))
            .alias("overlap"),
        )
    )


def square_census(edges: DataFrame) -> DataFrame:
    """One-row exact 4-cycle census of the UNDIRECTED simple graph:
    ``(n_wedge_pairs, n_diag_pairs, n_wedges, n_squares)`` —
    distinct node pairs joined by >= 1 two-hop path, pairs with >= 2
    common neighbors (the potential square diagonals), total wedges,
    and the exact number of 4-cycles
    ``C4 = (1/2) * sum_pairs C(w, 2)`` (each square is counted once by
    each of its two diagonals, so the wedge-pair sum is always even
    and the division is exact in integers). The square census is the
    bipartite-community signal triangles can't see — dense C4 with few
    triangles means two-mode structure. No reference counterpart.

    Scale design: the wedge enumeration is the one heavy stage —
    fan-out ``sum_c d(c)^2`` on the wedge center, the SAME hub wall as
    ``triangles.py`` / ``neighborhood_overlap`` (AQE skew-split on the
    center key); everything downstream of the ``(u, v)`` groupBy is a
    single map-side-combinable 1-row aggregate. Integer-exact end to
    end, so the oracle hash is noise-free.
    """
    und = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = und.select(
        F.col("src").alias("c"), F.col("dst").alias("n")
    ).unionAll(und.select(F.col("dst").alias("c"), F.col("src").alias("n")))
    wedge = (
        sym.select("c", F.col("n").alias("a"))
        .join(sym.select("c", F.col("n").alias("b")), "c")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("w"))
    )
    return wedge.agg(
        F.count("*").cast("long").alias("n_wedge_pairs"),
        F.sum((F.col("w") >= 2).cast("long")).cast("long").alias("n_diag_pairs"),
        F.sum("w").cast("long").alias("n_wedges"),
        # sum w(w-1) counts each square 4x (2 diagonals x 2 ordered
        # choices of the neighbor pair) -> exact integer division
        F.expr("sum(w * (w - 1)) div 4").cast("long").alias("n_squares"),
    )


def neighbor_sampling(
    edges: DataFrame,
    seeds: DataFrame | int = 16,
    fanout: tuple[int, ...] = (5, 5),
) -> DataFrame:
    """(seed, hop, src, dst) — deterministic GraphSAGE-style k-hop
    neighbor sampling: the mini-batch subgraph extraction every GNN
    training pipeline runs over the full graph.

    Per hop h (1-based), each frontier node keeps at most ``fanout[h-1]``
    outgoing edges, ranked by the portable md5 hash of the edge (so the
    sample is reproducible across engines, runs, and partitionings —
    no RNG, the ``hash_sample`` philosophy). ``seeds`` is a node_id
    DataFrame or an int k (the k smallest node ids, the deterministic
    pivot rule of ``betweenness_from_pivots``). Sampled rows are
    distinct per (seed, hop, src, dst): a node reached through two
    paths contributes its sample once.

    Scale: the capped adjacency is computed ONCE with the
    supernode-safe ``per_key_rank`` (hub nodes never serialize a
    single-task sort) and reused by every hop; each hop is one join of
    the (bounded: |seeds| * prod(fanout)) frontier against it.
    """
    from ..dedup.common import portable_hash
    from ..sources.edges import per_key_rank

    if not fanout or any(k <= 0 for k in fanout):
        raise ValueError(f"fanout must be positive per hop, got {fanout}")
    e = edges.select("src", "dst").filter(
        F.col("src") != F.col("dst")
    ).distinct()
    max_fan = max(fanout)
    ranked = per_key_rank(
        e.withColumn(
            "__h",
            portable_hash(
                F.concat_ws("#", F.col("src"), F.col("dst"))
            ),
        ),
        ["src"],
        ["__h", "dst"],
    )
    adj = (
        ranked.filter(F.col("rank") < max_fan)
        .select("src", "dst", "rank")
        .persist()
    )
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionAll(e.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    if isinstance(seeds, int):
        if seeds <= 0:
            raise ValueError(f"seeds must be positive, got {seeds}")
        seed_df = nodes.orderBy("node_id").limit(seeds)
    else:
        seed_df = seeds.select("node_id").distinct().join(
            nodes, "node_id", "left_semi"
        )
    frontier = seed_df.select(F.col("node_id").alias("seed"),
                              F.col("node_id").alias("node"))
    out = None
    for h, k in enumerate(fanout, start=1):
        hop = (
            frontier.join(adj, frontier["node"] == adj["src"])
            .filter(F.col("rank") < k)
            .select(
                "seed",
                F.lit(h).cast("long").alias("hop"),
                "src",
                "dst",
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        out = hop if out is None else out.unionByName(hop)
        frontier = hop.select("seed", F.col("dst").alias("node")).distinct()
    return out
