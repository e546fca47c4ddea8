"""Bridge (cut-edge) detection — 2-edge-connectivity, distributed.

A bridge is an edge whose removal disconnects its endpoints. The
classic sequential algorithm is Tarjan's DFS low-link, which does not
parallelize; this operator uses the spanning-tree covering lemma that
holds for ANY rooted spanning forest (not just DFS trees), so the tree
can come from level-synchronous BFS — the only traversal that
distributes:

    tree edge (parent, c) is a bridge
      <=>  no non-tree edge "covers" it
      <=>  min over x in subtree(c) of
             mindepth(x) := min over non-tree edges (x, y)
                              of depth(lca(x, y))
           is >= depth(c),

because a non-tree edge (u, v) has exactly one endpoint inside
subtree(c) iff c lies strictly below lca(u, v) on one of the two tree
paths — i.e. iff some subtree member's lca-depth is < depth(c).
Non-tree edges always sit on a cycle themselves (their endpoints stay
connected through the tree), so the bridge set is a subset of the
forest, and it is independent of WHICH spanning forest was built
(bridges are a graph property). The BFS forest here is nevertheless
deterministic (min-id parent rule) so runs reproduce row-for-row.

Pipeline (all DataFrame joins, lineage cut per round):
  1. BFS forest from each component's min node (roots from the star-CC
     operator): O(diameter) frontier rounds, min-parent tie-break.
  2. Binary-lifting ancestor tables anc[2^k] (O(log depth) self-joins,
     O(n log depth) total state — never the O(n * depth) ancestor
     closure).
  3. depth(lca) per non-tree edge: equalize depths along the set bits
     of the depth difference, then binary-descend from the top bit —
     O(log depth) joins on the non-tree frame, original endpoints
     carried alongside the moving pointers.
  4. Subtree-min of mindepth by bottom-up depth layers: one per-level
     aggregation, active frame shrinking with the layer.
  5. Bridge rule above; output (a, b) with a < b.

Scale: every step shuffles on node keys; per-round state is O(n) rows
(plus O(n log D) lifting tables). Depth of a BFS forest on small-world
graphs is O(log n); a pathological path graph costs O(n) rounds — the
same envelope as every frontier traversal in this repo.

Reference parity: the reference repo has no 2-edge-connectivity
operator; this extends the link-graph toolkit (SURVEY §2.9 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: sentinel "no covering edge" depth — deeper than any real tree level
_INF = 1 << 62


def _bfs_forest(adj: DataFrame, roots: DataFrame, max_rounds: int):
    """(node_id, depth, parent) for every reachable node; parent NULL
    on roots. Deterministic: first reach wins, min-id parent breaks
    same-level ties. Returns (tree, max_depth_reached)."""
    visited = roots.select(
        "node_id",
        F.lit(0).cast("long").alias("depth"),
        F.lit(None).cast("long").alias("parent"),
    ).localCheckpoint(eager=True)
    frontier = visited.select("node_id")
    max_depth = 0
    for r in range(1, max_rounds + 1):
        if frontier.isEmpty():
            return visited, max_depth
        nxt = (
            adj.join(
                frontier.withColumnRenamed("node_id", "src"), "src"
            )
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.min("src").alias("parent"))
            .join(visited.select("node_id"), "node_id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            return visited, max_depth
        visited = visited.unionByName(
            nxt.select(
                "node_id", F.lit(r).cast("long").alias("depth"), "parent"
            )
        ).localCheckpoint(eager=True)
        frontier = nxt.select("node_id")
        max_depth = r
    raise RuntimeError(f"bridges BFS did not saturate in {max_rounds} rounds")


def _lift_tables(tree: DataFrame, max_depth: int) -> list[DataFrame]:
    """anc[k] = 2^k-th-ancestor tables (node, anc), k = 0..K."""
    tables = [
        tree.filter(F.col("parent").isNotNull())
        .select(
            F.col("node_id").alias("node"), F.col("parent").alias("anc")
        )
        .persist()
    ]
    k = 1
    while (1 << k) <= max_depth:
        prev = tables[-1]
        nxt = (
            prev.alias("lo")
            .join(prev.alias("hi"), F.col("lo.anc") == F.col("hi.node"))
            .select(
                F.col("lo.node").alias("node"),
                F.col("hi.anc").alias("anc"),
            )
            .persist()
        )
        tables.append(nxt)
        k += 1
    return tables


def _nte_lca_depth(
    nte: DataFrame, tree: DataFrame, tables: list[DataFrame]
) -> DataFrame:
    """(n, dlca) scatter rows: for each non-tree edge, its lca depth
    attached to BOTH original endpoints."""
    depth_of = tree.select(
        F.col("node_id").alias("__dn"), F.col("depth").alias("__dd")
    )
    nt = nte.select(F.col("a").alias("oa"), F.col("b").alias("ob"))
    nt = (
        nt.join(depth_of, nt["oa"] == F.col("__dn"))
        .withColumn("da", F.col("__dd"))
        .drop("__dn", "__dd")
    )
    nt = (
        nt.join(depth_of, nt["ob"] == F.col("__dn"))
        .withColumn("db", F.col("__dd"))
        .drop("__dn", "__dd")
    )
    # moving pointers u (deeper) / v, depths du >= dv
    nt = nt.select(
        "oa",
        "ob",
        F.when(F.col("da") >= F.col("db"), F.col("oa"))
        .otherwise(F.col("ob"))
        .alias("u"),
        F.when(F.col("da") >= F.col("db"), F.col("ob"))
        .otherwise(F.col("oa"))
        .alias("v"),
        F.greatest("da", "db").alias("du"),
        F.least("da", "db").alias("dv"),
    )
    # 1) equalize: lift u by (du - dv) along its set bits
    for k in range(len(tables) - 1, -1, -1):
        bit = 1 << k
        take = ((F.col("du") - F.col("dv")).bitwiseAND(F.lit(bit))) != 0
        t = tables[k].select(
            F.col("node").alias("__n"), F.col("anc").alias("__a")
        )
        nt = (
            nt.join(t, nt["u"] == t["__n"], "left")
            .withColumn(
                "new_u", F.when(take, F.col("__a")).otherwise(F.col("u"))
            )
            .withColumn(
                "new_du",
                F.when(take, F.col("du") - bit).otherwise(F.col("du")),
            )
            .drop("__n", "__a", "u", "du")
            .withColumnRenamed("new_u", "u")
            .withColumnRenamed("new_du", "du")
        )
    nt = nt.localCheckpoint(eager=True)
    # 2) descend: advance both pointers while their 2^k ancestors differ
    for k in range(len(tables) - 1, -1, -1):
        t_u = tables[k].select(
            F.col("node").alias("__un"), F.col("anc").alias("__ua")
        )
        t_v = tables[k].select(
            F.col("node").alias("__vn"), F.col("anc").alias("__va")
        )
        nt = nt.join(t_u, nt["u"] == t_u["__un"], "left").join(
            t_v, nt["v"] == t_v["__vn"], "left"
        )
        move = (
            (F.col("u") != F.col("v"))
            & F.col("__ua").isNotNull()
            & F.col("__va").isNotNull()
            & (F.col("__ua") != F.col("__va"))
        )
        nt = (
            nt.withColumn(
                "new_u", F.when(move, F.col("__ua")).otherwise(F.col("u"))
            )
            .withColumn(
                "new_v", F.when(move, F.col("__va")).otherwise(F.col("v"))
            )
            .withColumn(
                "new_dv",
                F.when(move, F.col("dv") - (1 << k)).otherwise(
                    F.col("dv")
                ),
            )
            .drop("__un", "__ua", "__vn", "__va", "u", "v", "dv")
            .withColumnRenamed("new_u", "u")
            .withColumnRenamed("new_v", "v")
            .withColumnRenamed("new_dv", "dv")
        )
        # lazy: no action is needed between descent rounds — the final
        # scatter aggregation materializes the whole chain in one job
        nt = nt.localCheckpoint(eager=False)
    dlca = F.when(F.col("u") == F.col("v"), F.col("dv")).otherwise(
        F.col("dv") - 1
    )
    nt = nt.withColumn("dlca", dlca)
    return nt.select(F.col("oa").alias("n"), "dlca").unionAll(
        nt.select(F.col("ob").alias("n"), "dlca")
    )


def bridges(edges: DataFrame, max_rounds: int = 10_000) -> DataFrame:
    """(a, b) with a < b — every bridge of the undirected simple graph.

    Self-loops are dropped; duplicate rows and opposite orientations
    collapse into one undirected edge.
    """
    spark = edges.sparkSession
    e = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    if e.isEmpty():
        return spark.createDataFrame([], "a long, b long")
    adj = (
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(
            e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .persist()
    )
    from .components import connected_components

    comp = connected_components(
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    roots = comp.select(F.col("component").alias("node_id")).distinct()
    tree, max_depth = _bfs_forest(adj, roots, max_rounds)
    tree = tree.persist()

    tree_edges = (
        tree.filter(F.col("parent").isNotNull())
        .select(
            F.least("parent", "node_id").alias("a"),
            F.greatest("parent", "node_id").alias("b"),
            F.col("node_id").alias("child"),
            F.col("depth").alias("child_depth"),
        )
        .persist()
    )
    nte = e.join(tree_edges.select("a", "b"), ["a", "b"], "left_anti")

    if nte.isEmpty():
        # forest graph: every edge is a bridge
        return tree_edges.select("a", "b")

    tables = _lift_tables(tree, max(max_depth, 1))
    scatter = _nte_lca_depth(nte, tree, tables)
    mdr = scatter.groupBy(F.col("n").alias("node_id")).agg(
        F.min("dlca").alias("md")
    )

    # bottom-up subtree-min by depth layers
    work = (
        tree.join(mdr, "node_id", "left")
        .select(
            "node_id",
            "depth",
            "parent",
            F.coalesce(F.col("md"), F.lit(_INF)).alias("m"),
        )
        .localCheckpoint(eager=True)
    )
    for d in range(max_depth, 0, -1):
        up = (
            work.filter(F.col("depth") == d)
            .groupBy(F.col("parent").alias("node_id"))
            .agg(F.min("m").alias("child_m"))
        )
        work = (
            work.join(up, "node_id", "left")
            .select(
                "node_id",
                "depth",
                "parent",
                F.least(
                    F.col("m"), F.coalesce(F.col("child_m"), F.lit(_INF))
                ).alias("m"),
            )
            # lazy: the layer loop builds one plan; the final bridge
            # filter is the only action
            .localCheckpoint(eager=False)
        )

    return (
        tree_edges.join(
            work.select(F.col("node_id").alias("child"), "m"), "child"
        )
        .filter(F.col("m") >= F.col("child_depth"))
        .select("a", "b")
    )
