"""Triangle counting via degree-ordered edge orientation.

North-rule addition (no reference counterpart). Standard shuffle-lean
algorithm: symmetrize + dedup, orient every undirected edge from the
lower (degree, id) endpoint to the higher, so each triangle is counted
exactly once as a directed two-path a->b->c closed by a->c. The
orientation bounds the join fan-out by O(sqrt(m)) per node (the classic
arboricity argument), which is what keeps the self-join tractable on
skewed graphs; AQE handles residual reducer skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("n").alias("b"), F.col("deg").alias("deg_b"))
    w = und.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return w.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangle_count(edges: DataFrame) -> int:
    """Total number of triangles in the undirected simple graph."""
    o = _oriented(edges).persist()
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = o.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")
    closing = o.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    return wedges.join(closing, ["x", "z"]).count()


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """(node_id, triangles) — number of triangles each vertex belongs to."""
    o = _oriented(edges).persist()
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = o.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")
    closing = o.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    tris = wedges.join(closing, ["x", "z"])
    corners = (
        tris.select(F.col("x").alias("node_id"))
        .unionAll(tris.select(F.col("y").alias("node_id")))
        .unionAll(tris.select(F.col("z").alias("node_id")))
    )
    nodes = (
        edges.select(F.col("src").alias("node_id"))
        .unionAll(edges.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    counts = corners.groupBy("node_id").agg(F.count("*").alias("t"))
    return nodes.join(counts, "node_id", "left").select(
        "node_id", F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("triangles")
    )


def local_clustering(edges: DataFrame) -> DataFrame:
    """(node_id, degree, lcc) — local clustering coefficient.

    ``lcc(v) = 2 * T(v) / (deg(v) * (deg(v) - 1))`` over the undirected
    simple graph (0.0 when deg < 2). Degree is the simple-graph degree
    (dedup'd, self-loops dropped) so the ratio is well-defined. Reuses
    the degree-oriented triangle counter, so the heavy self-join keeps
    its O(sqrt(m)) fan-out bound; the degree frame is a map-side
    combinable groupBy joined back on node_id.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        und.select(F.col("a").alias("node_id"))
        .unionAll(und.select(F.col("b").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count("*").alias("degree"))
    )
    tri = triangle_count_per_vertex(edges)
    return tri.join(deg, "node_id", "left").select(
        "node_id",
        F.coalesce(F.col("degree"), F.lit(0)).cast("long").alias("degree"),
        F.when(
            F.col("degree") >= 2,
            2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("lcc"),
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """1-row (assortativity, n_edges) — degree assortativity coefficient.

    Pearson correlation of (deg(a), deg(b)) over the undirected edge
    list with BOTH orientations of every edge (the standard Newman
    definition). Everything is a single pass of map-side-combinable
    aggregates over the symmetrized edge frame — no window, no collect.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("double").alias("d"))
    )
    sym = und.select("a", "b").unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    da = deg.select(F.col("n").alias("a"), F.col("d").alias("dx"))
    db = deg.select(F.col("n").alias("b"), F.col("d").alias("dy"))
    j = sym.join(da, "a").join(db, "b")
    return j.agg(
        F.corr("dx", "dy").alias("assortativity"),
        (F.count("*") / 2).cast("long").alias("n_edges"),
    )


def attribute_assortativity(
    edges: DataFrame, attrs: DataFrame, attr_col: str = "attr"
) -> DataFrame:
    """1-row ``(assortativity, n_edges)`` — Newman's CATEGORICAL
    assortativity coefficient ``r = (Σe_ii − Σa_i²)/(1 − Σa_i²)`` over
    the undirected edge list, where ``e`` is the mixing matrix of the
    node attribute in ``attrs`` (``node_id``, ``attr_col``) and ``a``
    its marginals.

    Every matrix entry is an exact int64 half-edge count (each
    undirected edge contributes both orientations); ``Σa_i²`` uses
    decimal-widened squares so it stays exact, and the final r is a
    fixed IEEE-double chain — engine-identical after round(·, 6), the
    `user_burstiness` discipline. Edges with an endpoint missing from
    ``attrs`` are dropped (attribute unknown ⇒ no mixing evidence).
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    at = attrs.select(F.col("node_id"), F.col(attr_col).alias("t"))
    sym = und.select("a", "b").unionAll(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    labeled = (
        sym.join(at.select(F.col("node_id").alias("a"), F.col("t").alias("ta")), "a")
        .join(at.select(F.col("node_id").alias("b"), F.col("t").alias("tb")), "b")
        .persist()
    )
    same = labeled.agg(
        F.count("*").alias("m"),
        F.sum(F.when(F.col("ta") == F.col("tb"), 1).otherwise(0)).alias("same"),
    )
    marg = (
        labeled.groupBy("ta")
        .agg(F.count("*").alias("cnt"))
        .agg(
            F.sum(
                F.col("cnt").cast("decimal(18,0)") * F.col("cnt").cast("decimal(18,0)")
            ).alias("sumsq")
        )
    )
    tr = F.col("same").cast("double") / F.col("m")
    # m*m as a DOUBLE product: int64 m*m would overflow past ~3e9 edges
    sq = F.col("sumsq").cast("double") / (
        F.col("m").cast("double") * F.col("m").cast("double")
    )
    return (
        same.crossJoin(marg)
        .select(
            F.when(sq == 1.0, F.lit(None).cast("double"))
            .otherwise(F.round((tr - sq) / (F.lit(1.0) - sq), 6))
            .alias("assortativity"),
            (F.col("m") / 2).cast("long").alias("n_edges"),
        )
    )


def edge_reciprocity(edges: DataFrame) -> DataFrame:
    """1-row (n_edges, n_mutual, reciprocity) — fraction of directed
    edges whose reverse edge also exists. One left-semi self-join +
    a scalar agg; the shared select for BOTH the driver query and
    jobs/graph_report.py, so the two surfaces cannot drift schema.
    ``edges`` must already be a DISTINCT directed edge list (e.g.
    ``user_interaction_digraph``) — no re-dedup shuffle here."""
    dg = edges.select("src", "dst")
    rev = dg.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = dg.join(rev, ["src", "dst"], "left_semi")
    return (
        dg.agg(F.count("*").alias("n_edges"))
        .crossJoin(mutual.agg(F.count("*").alias("n_mutual")))
        .select(
            "n_edges",
            "n_mutual",
            F.round(F.col("n_mutual") / F.col("n_edges"), 6).alias(
                "reciprocity"
            ),
        )
    )


def edge_overlap(edges: DataFrame) -> DataFrame:
    """``(a, b, cn, overlap, is_local_bridge)`` — Onnela et al.
    neighborhood overlap per edge: ``cn / (deg(a)+deg(b)−cn−2)``, the
    tie-strength measure of weak-tie theory; ``overlap`` is NULL when
    both endpoints are degree-1 (empty union) and ``is_local_bridge``
    marks Granovetter local bridges (edges in no triangle).

    One wedge self-join for common-neighbor counts (the link-prediction
    spine, here joined back onto the ADJACENT pairs), one degree join;
    exact integer counts, a single division behind round(·, 6).
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
        .persist()
    )
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("x")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("x"))
    )
    wedges = (
        sym.select("u", "x")
        .join(
            sym.select(F.col("u").alias("v"), "x"),
            "x",
        )
        .filter(F.col("u") < F.col("v"))
        .groupBy(F.col("u").alias("a"), F.col("v").alias("b"))
        .agg(F.count("*").alias("cn"))
    )
    deg = sym.groupBy("u").agg(F.count("*").alias("d"))
    denom = F.col("da") + F.col("db") - F.col("cn") - 2
    return (
        und.join(wedges, ["a", "b"], "left")
        .select("a", "b", F.coalesce(F.col("cn"), F.lit(0)).alias("cn"))
        .join(deg.select(F.col("u").alias("a"), F.col("d").alias("da")), "a")
        .join(deg.select(F.col("u").alias("b"), F.col("d").alias("db")), "b")
        .select(
            "a",
            "b",
            F.col("cn").cast("long").alias("cn"),
            F.when(denom <= 0, F.lit(None).cast("double"))
            .otherwise(F.round(F.col("cn") / denom, 6))
            .alias("overlap"),
            (F.col("cn") == 0).cast("long").alias("is_local_bridge"),
        )
    )


def higher_motifs(edges: DataFrame) -> DataFrame:
    """1-row ``(n_edges, n_wedges, n_triangles, n_four_cycles,
    n_diamonds, n_k4)`` — the higher-order motif census of the
    undirected simple graph (SUBGRAPH counts, not induced):

    - four-cycles: each C4 is counted once per diagonal pair, so
      ``C4 = Σ_{u<v} C(cn(u,v), 2) div 2`` over ALL vertex pairs with
      common neighbors (the unipartite butterfly identity);
    - diamonds (two triangles sharing an edge): ``Σ_edge C(cn_e, 2)``;
    - K4: canonical triangles (t1<t2<t3) extended by a fourth vertex
      ``d > t3`` adjacent to all three — each 4-clique exactly once.

    Wedge/common-neighbor frames reuse the link-prediction self-join
    spine; every combinatorial sum is exact int64 via the
    always-even-product ``(c·(c−1)) div 2``.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
        .persist()
    )
    sym = und.select(F.col("a").alias("u"), F.col("b").alias("x")).unionAll(
        und.select(F.col("b").alias("u"), F.col("a").alias("x"))
    )
    cn = (
        sym.join(sym.select(F.col("u").alias("v"), "x"), "x")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    wedges = sym.groupBy("u").agg(F.count("*").alias("d")).agg(
        F.expr("sum((d * (d - 1)) div 2)").alias("n_wedges")
    )
    c4 = cn.agg(
        F.expr("sum((c * (c - 1)) div 2) div 2").alias("n_four_cycles")
    )
    # triangles + diamonds live on ADJACENT pairs' common-neighbor counts
    adj_cn = und.join(
        cn.select(F.col("u").alias("a"), F.col("v").alias("b"), "c"),
        ["a", "b"],
    ).persist()
    tri = adj_cn.agg(F.expr("sum(c) div 3").alias("n_triangles"))
    diam = adj_cn.agg(F.expr("sum((c * (c - 1)) div 2)").alias("n_diamonds"))
    # canonical triangle list for the K4 extension
    s12 = und.select(F.col("a").alias("t1"), F.col("b").alias("t2"))
    tris = (
        s12.join(und.select(F.col("a").alias("t2"), F.col("b").alias("t3")), "t2")
        .join(
            und.select(F.col("a").alias("t1"), F.col("b").alias("t3")),
            ["t1", "t3"],
        )
    )
    k4 = (
        tris.join(und.select(F.col("a").alias("t1"), F.col("b").alias("d1")), "t1")
        .filter(F.col("d1") > F.col("t3"))
        .join(
            und.select(F.col("a").alias("t2"), F.col("b").alias("d1")),
            ["t2", "d1"],
        )
        .join(
            und.select(F.col("a").alias("t3"), F.col("b").alias("d1")),
            ["t3", "d1"],
        )
        .agg(F.count("*").alias("n_k4"))
    )
    return (
        und.agg(F.count("*").alias("n_edges"))
        .crossJoin(wedges)
        .crossJoin(tri)
        .crossJoin(c4)
        .crossJoin(diam)
        .crossJoin(k4)
        .select(
            "n_edges",
            F.coalesce(F.col("n_wedges"), F.lit(0)).cast("long").alias("n_wedges"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
            F.coalesce(F.col("n_four_cycles"), F.lit(0)).cast("long").alias("n_four_cycles"),
            F.coalesce(F.col("n_diamonds"), F.lit(0)).cast("long").alias("n_diamonds"),
            F.coalesce(F.col("n_k4"), F.lit(0)).cast("long").alias("n_k4"),
        )
    )


def triangle_estimate(
    edges: DataFrame, num_samples: int = 10_000, seed: int = 0
) -> DataFrame:
    """1-row ``(n_wedges, n_sampled, n_closed, gcc_est,
    est_triangles)`` — wedge-sampling triangle estimation
    (Seshadhri-Pinar-Kolda, SDM '13): the sub-quadratic scale twin of
    the exact enumeration above.

    The exact count pays the oriented wedge join — Σ C(deg, 2)
    candidate rows, the quadratic hub wall every exact triangle method
    has. The estimator touches ~``num_samples`` wedges total: sample a
    wedge uniformly (center ∝ C(deg, 2), then a uniform neighbor
    pair), test closure against the edge set, and scale the closed
    fraction — ``gcc_est`` estimates the global clustering coefficient
    directly, ``est_triangles = gcc_est * n_wedges / 3``. Standard
    error ~ 1/sqrt(num_samples), independent of graph size.

    Everything is HASH-deterministic (md5 portable hash — slot
    allocation by randomized rounding, neighbor indices into the
    dst-sorted adjacency), so the same sample — and the same estimate
    bit-for-bit — comes out of every engine, rerun, and partitioning,
    and the plain-SQL oracle replays it exactly. Adjacency indexing
    uses :func:`per_key_rank` (range-partitioned rank — no hub-sized
    window task). Per-slot work is two index joins + one closure
    lookup; driver state is two bounded scalars (wedge total, sample
    aggregate). Int64 bound: ``num_samples * max C(deg,2)`` must stay
    below 2^63 — chunk ``num_samples`` past ~10^14 wedges.
    """
    from ..dedup.common import portable_hash
    from ..sources.edges import per_key_rank

    spark = edges.sparkSession
    out_schema = (
        "n_wedges long, n_sampled long, n_closed long,"
        " gcc_est double, est_triangles double"
    )
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .dropDuplicates(["a", "b"])
        .persist()
    )
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    adj = per_key_rank(sym, ["src"], ["dst"], rank_col="idx").persist()
    deg = adj.groupBy("src").agg(F.count("*").alias("d"))
    n_wedges = (
        deg.agg(
            F.sum(F.expr("(d * (d - 1)) div 2")).alias("nw")
        ).collect()[0]["nw"]
        or 0
    )
    if n_wedges == 0:
        return spark.createDataFrame(
            [(0, 0, 0, 0.0, 0.0)], out_schema
        )
    alloc_h = portable_hash(
        F.concat_ws(":", F.col("src"), F.lit("alloc"), F.lit(seed))
    )
    slots = (
        deg.filter(F.col("d") >= 2)
        .withColumn("_ah", F.pmod(alloc_h, F.lit(n_wedges)))
        # exact int64 randomized rounding — never a double division
        .select(
            "src",
            "d",
            F.expr(
                f"(({num_samples} * ((d * (d - 1)) div 2)) + _ah)"
                f" div {n_wedges}"
            ).alias("s"),
        )
        .filter(F.col("s") > 0)
        .select(
            "src", "d", F.explode(F.expr("sequence(0, s - 1)")).alias("i")
        )
    )
    h = lambda tag: portable_hash(  # noqa: E731
        F.concat_ws(":", F.col("src"), F.col("i"), F.lit(tag), F.lit(seed))
    )
    picks = slots.select(
        "src",
        "i",
        F.pmod(h("a"), F.col("d")).alias("j1"),
        F.pmod(h("b"), F.col("d") - 1).alias("r2"),
    ).withColumn(
        "j2",
        F.col("r2") + F.when(F.col("r2") >= F.col("j1"), 1).otherwise(0),
    )
    a1 = adj.select(F.col("src"), F.col("idx").alias("j1"), F.col("dst").alias("u"))
    a2 = adj.select(F.col("src"), F.col("idx").alias("j2"), F.col("dst").alias("w"))
    wedges = picks.join(a1, ["src", "j1"]).join(a2, ["src", "j2"])
    closed = wedges.join(
        und.select(
            F.col("a").alias("_ca"), F.col("b").alias("_cb"), F.lit(1).alias("hit")
        ),
        (F.least("u", "w") == F.col("_ca"))
        & (F.greatest("u", "w") == F.col("_cb")),
        "left",
    )
    row = closed.agg(
        F.count("*").alias("ns"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("nc"),
    ).collect()[0]
    ns, nc = int(row["ns"]), int(row["nc"] or 0)
    # rounding happens ENGINE-side (Spark round == SQL round, half-up
    # for positives) — Python's round() is half-even and would diverge
    # from the oracle on exact boundaries
    return spark.createDataFrame(
        [(int(n_wedges), ns, nc)],
        "n_wedges long, n_sampled long, n_closed long",
    ).select(
        "n_wedges",
        "n_sampled",
        "n_closed",
        F.round(F.col("n_closed") / F.col("n_sampled"), 6).alias("gcc_est"),
        F.round(
            F.col("n_closed") / F.col("n_sampled") * F.col("n_wedges") / 3.0,
            2,
        ).alias("est_triangles"),
    )


def reciprocity_latency(pairs: DataFrame) -> DataFrame:
    """(initiator, responder, t_initiate_us, latency_us) — for every
    RECIPROCATED unordered node pair of a timestamped directed
    interaction stream ``(src, dst, t)``, how long the first
    interaction waited for its first reverse interaction.

    The temporal refinement of ``edge_reciprocity``'s scalar rate: the
    same mutual-edge set, but with the reply delay resolved per pair —
    the "time to reciprocation" distribution a conversation-graph
    report carries next to the reciprocity fraction. The initiating
    direction is the one with the earlier first-interaction time
    (exact tie → smaller src id), so each mutual pair emits exactly
    one row and latency_us >= 0 always.

    Scale shape: one map-side-combinable min-aggregate per directed
    pair (multiplicity collapses before anything joins), then ONE
    self-equi-join on the reversed key — no windows, no driver state;
    all arithmetic on exact microsecond integers.
    """
    first = (
        pairs.filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("t").alias("t_first"))
    )
    rev = first.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.col("t_first").alias("t_rev"),
    )
    return (
        first.join(rev, ["src", "dst"])
        .filter(
            (F.col("t_first") < F.col("t_rev"))
            | (
                (F.col("t_first") == F.col("t_rev"))
                & (F.col("src") < F.col("dst"))
            )
        )
        .select(
            F.col("src").alias("initiator"),
            F.col("dst").alias("responder"),
            F.col("t_first").alias("t_initiate_us"),
            (F.col("t_rev") - F.col("t_first")).alias("latency_us"),
        )
    )


def weighted_clustering(edges: DataFrame, weight_col: str = "w") -> DataFrame:
    """``(node_id, degree, wcc)`` — the Onnela et al. (PRE 2005)
    weighted clustering coefficient over the undirected weighted simple
    graph: ``wcc(i) = 2/(k_i(k_i-1)) * sum_triangles
    cbrt(w1 w2 w3 / max_w^3)`` (weights normalized by the global max;
    0.0 when ``k_i < 2``). The weighted refinement of
    ``local_clustering``: a node in many WEAK triangles scores below
    one in few strong ones — the cohesion signal thresholded binary
    triangles throw away. Parallel edges collapse to their max weight
    (deterministic), self-loops drop. No reference counterpart.

    Scale shape: the same oriented wedge enumeration as
    ``triangle_count_per_vertex`` (fan-out sum_c d(c)^2 on the wedge
    center — the known hub wall, AQE skew-split) with the three edge
    weights carried along; the global max attaches as a 1-row
    broadcast. Each per-triangle cbrt term is a fixed double chain
    rounded to a scaled int64 BEFORE the per-node sums (the
    ``transition_entropy`` order-independence rule), so the reduce is
    exact and layout-proof; only the final ratio floats, rounded to 6.
    """
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.max("w").alias("w"))
        .persist()
    )
    mx = e.agg(F.max("w").alias("mw"))
    tri = (
        e.select(F.col("a").alias("x"), F.col("b").alias("y"), F.col("w").alias("w1"))
        .join(
            e.select(
                F.col("a").alias("x"), F.col("b").alias("z"), F.col("w").alias("w2")
            ),
            "x",
        )
        .filter(F.col("y") < F.col("z"))
        .join(
            e.select(
                F.col("a").alias("y"), F.col("b").alias("z"), F.col("w").alias("w3")
            ),
            ["y", "z"],
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "x",
            "y",
            "z",
            F.round(
                F.cbrt(
                    (F.col("w1") / F.col("mw"))
                    * (F.col("w2") / F.col("mw"))
                    * (F.col("w3") / F.col("mw"))
                )
                * 1e12
            )
            .cast("long")
            .alias("t"),
        )
    )
    contrib = (
        tri.select(F.col("x").alias("n"), "t")
        .unionAll(tri.select(F.col("y").alias("n"), "t"))
        .unionAll(tri.select(F.col("z").alias("n"), "t"))
        .groupBy("n")
        .agg(F.sum("t").alias("s"))
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    return (
        deg.join(contrib, "n", "left")
        .fillna(0, ["s"])
        .select(
            F.col("n").alias("node_id"),
            F.col("d").cast("long").alias("degree"),
            F.when(
                F.col("d") >= 2,
                F.round(
                    2 * (F.col("s") / 1e12) / (F.col("d") * (F.col("d") - 1)), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("wcc"),
        )
    )


def directed_assortativity(edges: DataFrame) -> DataFrame:
    """``(mode, n_edges, corr)`` — the four directed degree
    assortativity coefficients of Foster et al. (PNAS 2010): for every
    directed edge u→v, the Pearson correlation of (src-degree,
    dst-degree) for the four degree-type combinations ``out-in``,
    ``out-out``, ``in-in``, ``in-out`` (plain degrees, not excess
    degrees — documented convention; zero-variance modes emit 0.0).
    A digraph can be assortative in one mode and disassortative in
    another — the single undirected coefficient
    (``degree_assortativity``) can't see that. No reference
    counterpart.

    Scale shape: two degree aggregations + two broadcast-sized joins
    attach the four degree columns to each deduplicated edge; a
    JVM-side explode of a 4-struct array fans each edge to its four
    (mode, x, y) rows; the five Pearson sufficient statistics are
    EXACT INT64 sums per mode (degrees are counts), so the reduce is
    map-side-combinable and layout-proof — only the final correlation
    floats, rounded to 6 (vx·vy sqrt'd in double, the
    ``lexical_saturation`` overflow rule).
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    outd = e.groupBy(F.col("src").alias("n")).agg(F.count("*").alias("od"))
    ind = e.groupBy(F.col("dst").alias("n")).agg(F.count("*").alias("id_"))
    deg = (
        e.select(F.col("src").alias("n"))
        .unionAll(e.select(F.col("dst").alias("n")))
        .distinct()
        .join(outd, "n", "left")
        .join(ind, "n", "left")
        .fillna(0, ["od", "id_"])
    )
    withdeg = (
        e.join(
            deg.select(
                F.col("n").alias("src"),
                F.col("od").alias("u_out"),
                F.col("id_").alias("u_in"),
            ),
            "src",
        )
        .join(
            deg.select(
                F.col("n").alias("dst"),
                F.col("od").alias("v_out"),
                F.col("id_").alias("v_in"),
            ),
            "dst",
        )
    )
    long_ = withdeg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("out-in").alias("mode"),
                    F.col("u_out").alias("x"),
                    F.col("v_in").alias("y"),
                ),
                F.struct(
                    F.lit("out-out").alias("mode"),
                    F.col("u_out").alias("x"),
                    F.col("v_out").alias("y"),
                ),
                F.struct(
                    F.lit("in-in").alias("mode"),
                    F.col("u_in").alias("x"),
                    F.col("v_in").alias("y"),
                ),
                F.struct(
                    F.lit("in-out").alias("mode"),
                    F.col("u_in").alias("x"),
                    F.col("v_out").alias("y"),
                ),
            )
        ).alias("r")
    ).select("r.mode", "r.x", "r.y")
    agg = long_.groupBy("mode").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    vx = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    vy = agg["n"] * agg["syy"] - agg["sy"] * agg["sy"]
    cov = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    return agg.select(
        "mode",
        F.col("n").cast("long").alias("n_edges"),
        F.when(
            (vx > 0) & (vy > 0),
            F.round(cov / F.sqrt(vx.cast("double") * vy.cast("double")), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("corr"),
    )
