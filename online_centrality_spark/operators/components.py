"""Connected components and label propagation as iterative DataFrame joins.

North-rule additions with no reference counterpart (standard semantics,
validated against pure-python oracles in tests).

- ``connected_components``: weakly connected components, two physical
  strategies behind one surface (component = min node id in the WCC,
  identical output either way):

  * ``algorithm="star"`` (default): alternating large-star / small-star
    contractions — O(log n) rounds regardless of diameter, the
    100 TB-scale plan (each round is two grouped shuffles over the
    current edge set, which SHRINKS towards one star per component).
  * ``algorithm="hashmin"``: iterative hash-min label propagation — one
    shuffle per round but O(diameter) rounds; kept for low-diameter
    graphs and as the cross-check.

- ``label_propagation``: synchronous LPA. Every node starts with its own
  id; each round a node adopts the most frequent label among its
  (undirected, dedup) neighbors, ties broken by the smallest label;
  isolated behavior: keep the current label. Deterministic by
  construction. Runs ``max_iter`` rounds or until no label changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """Undirected dedup neighbor pairs (a, b) for both directions."""
    e = edges.select("src", "dst")
    return (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionAll(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )


def _nodes(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("node_id"))
        .unionAll(edges.select(F.col("dst").alias("node_id")))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 200,
    algorithm: str = "star",
    collect_threshold: int = 100_000,
) -> DataFrame:
    """(node_id, component) — component = min node id in the WCC."""
    labels, _ = connected_components_detail(
        edges, max_iter, algorithm, collect_threshold
    )
    return labels


def connected_components_detail(
    edges: DataFrame,
    max_iter: int = 200,
    algorithm: str = "star",
    collect_threshold: int = 100_000,
) -> tuple[DataFrame, int]:
    """Like :func:`connected_components` but also returns the number of
    rounds taken (convergence lineage for tests / metrics).

    ``collect_threshold``: when the dedup'd canonical edge set fits a
    single task (count <= threshold), a one-pass union-find kernel
    replaces the round loop — identical output (component = min member
    id) without per-round job latency, the same adaptive small-graph
    fallback the harmonic operator uses. Pass 0 to force the
    distributed algorithm (tests pinning round behavior do)."""
    if algorithm == "star":
        return _cc_star(edges, max_iter, collect_threshold)
    if algorithm == "hashmin":
        return _cc_hashmin(edges, max_iter)
    raise ValueError(f"unknown algorithm {algorithm!r}")


def _cc_local(cur: DataFrame, nodes: DataFrame) -> DataFrame:
    """Single-task union-find over the canonical pair set (small-graph
    fast path; semantics identical to the round loop by construction)."""
    import pandas as pd

    rows = cur.unionAll(
        nodes.select(F.col("node_id").alias("h"), F.col("node_id").alias("l"))
    ).coalesce(1)

    def kernel(batches):
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != r:
                parent[x], x = r, parent[x]
            return r

        seen: set = set()
        for pdf in batches:
            for h, l in zip(pdf["h"].tolist(), pdf["l"].tolist()):
                seen.add(h)
                seen.add(l)
                ra, rb = find(h), find(l)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        members: dict = {}
        for n in seen:
            members.setdefault(find(n), []).append(n)
        out_n, out_c = [], []
        for ms in members.values():
            m = min(ms)
            for n in ms:
                out_n.append(n)
                out_c.append(m)
        yield pd.DataFrame({"node_id": out_n, "component": out_c})

    return rows.mapInPandas(kernel, schema="node_id long, component long")


def _cc_hashmin(edges: DataFrame, max_iter: int) -> tuple[DataFrame, int]:
    sym = _sym(edges).persist()
    labels = _nodes(edges).select(
        "node_id", F.col("node_id").alias("component")
    ).localCheckpoint(eager=True)
    rounds = 0
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["a"] == labels["node_id"])
            .groupBy(F.col("b").alias("node_id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "node_id", "left")
            .select(
                "node_id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("node_id", "component")
        rounds += 1
        if changed == 0:
            break
    return labels, rounds


def _cc_star(
    edges: DataFrame, max_iter: int, collect_threshold: int = 0
) -> tuple[DataFrame, int]:
    """Alternating large-star / small-star contractions (the classic
    MapReduce CC algorithm): the edge set converges in O(log n) rounds
    to one star per component, rooted at the component minimum.

    Round = large-star (every node hooks its LARGER neighbors onto the
    minimum of its closed neighborhood) then small-star (every node
    hooks its smaller-or-equal neighbors onto that minimum). Both
    preserve connectivity; the fixed point is a star forest. Each round
    is two grouped shuffles over the CURRENT edge set, which shrinks as
    components contract — unlike hash-min, rounds do not scale with the
    graph diameter.
    """
    nodes = _nodes(edges).persist()
    # canonical undirected pairs (h > l)
    cur = (
        edges.select(
            F.greatest("src", "dst").alias("h"), F.least("src", "dst").alias("l")
        )
        .filter(F.col("h") != F.col("l"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # adaptive small-graph fallback: the pair set is already
    # materialized, so this count is nearly free
    if collect_threshold and cur.count() <= collect_threshold:
        return _cc_local(cur, nodes), 0
    rounds = 0
    for _ in range(max_iter):
        # large-star: neighbors from both directions; for node u emit
        # (v, min(N(u) + {u})) for every neighbor v > u
        sym = cur.select(F.col("h").alias("u"), F.col("l").alias("v")).unionAll(
            cur.select(F.col("l").alias("u"), F.col("h").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
        ls = (
            sym.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(
                F.col("v").alias("h"),
                F.least(F.col("mn"), F.col("u")).alias("l"),
            )
            .filter(F.col("h") != F.col("l"))
            .distinct()
        )
        # small-star: pairs are canonical (h > l); for node h emit
        # (l, min(N_small(h))) for every smaller neighbor l, plus
        # (h, min) itself
        mins2 = ls.groupBy("h").agg(F.min("l").alias("m"))
        joined = ls.join(mins2, "h")
        out = joined.select(
            F.col("l").alias("x"), F.col("m").alias("y")
        ).unionAll(joined.select(F.col("h").alias("x"), F.col("m").alias("y")))
        new = (
            out.filter(F.col("x") != F.col("y"))
            .select(F.greatest("x", "y").alias("h"), F.least("x", "y").alias("l"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        rounds += 1
        same_size = new.count() == cur.count()
        if same_size and new.join(cur, ["h", "l"], "left_anti").count() == 0:
            cur = new
            converged = True
            break
        cur = new
    else:
        converged = False
    if not converged:
        # outside the star-forest fixpoint a node can carry several l
        # labels, and the final left join would emit duplicate node_id
        # rows — silently corrupting every downstream consumer (e.g.
        # attach_closure_components would duplicate edges). Fail loudly,
        # matching the divergence guards elsewhere in the engine.
        raise RuntimeError(
            f"star CC did not reach the star-forest fixpoint in {max_iter} "
            "rounds; raise max_iter (convergence is O(log n) rounds)"
        )
    labels = (
        nodes.join(
            cur.select(F.col("h").alias("node_id"), F.col("l").alias("component")),
            "node_id",
            "left",
        )
        .select(
            "node_id",
            F.coalesce(F.col("component"), F.col("node_id")).alias("component"),
        )
    )
    return labels, rounds


def bucketed_component_sizes(e: DataFrame, **cc_kwargs) -> DataFrame:
    """``(bkt, component, sz)`` — per-bucket WCC sizes of a ``(bkt,
    src, dst)`` edge frame, every bucket solved in ONE run of the
    star-contraction CC by encoding the composite key ``(bkt, node)``
    as the single long ``bkt * off + node`` with ``off > max node id``
    — buckets can never merge because no edge crosses an encoding
    stripe, so the per-bucket component minimum decodes back exactly.
    The only driver-held values are the encoding scalars (the k-means
    seed-read pattern). Shared harness of :func:`component_evolution`
    and the attack-robustness operator.
    """
    # persist: the encoding-scalar agg and the CC's first checkpoint
    # both read this frame (loop-input persist audit rule)
    e = e.persist()
    mx = e.agg(
        F.greatest(F.max("src"), F.max("dst")).alias("mxn"),
        F.least(F.min("src"), F.min("dst")).alias("mnn"),
        F.max("bkt").alias("mxd"),
        F.min("bkt").alias("mnd"),
    ).first()
    if mx["mxn"] is None:
        return e.sparkSession.createDataFrame(
            [], "bkt long, component long, sz long"
        )
    if mx["mnn"] < 0 or mx["mnd"] < 0:
        raise ValueError(
            "bucketed components need non-negative node ids and buckets"
        )
    off = mx["mxn"] + 1
    if (mx["mxd"] + 1) * off >= 2**62:
        raise ValueError(
            "bucket*offset encoding would overflow int64; densify node ids "
            "(e.g. via add_global_seq) first"
        )
    enc = e.select(
        (F.col("bkt") * F.lit(off) + F.col("src")).alias("src"),
        (F.col("bkt") * F.lit(off) + F.col("dst")).alias("dst"),
    )
    labels = connected_components(enc, **cc_kwargs)
    return labels.groupBy(
        F.expr(f"node_id div {off}").alias("bkt"), "component"
    ).agg(F.count("*").alias("sz"))


def threshold_profile(
    wedges: DataFrame,
    thresholds: list,
    weight_col: str = "w",
    **cc_kwargs,
) -> DataFrame:
    """``(threshold, n_edges, n_nodes, n_components, largest)`` — the
    percolation profile of a weighted graph: component structure of the
    subgraph ``w >= threshold`` for every rung of the ladder that
    leaves at least one edge (rungs where the cut kills every edge are
    omitted, like :func:`attack_robustness`'s levels), revealing where
    the giant component breaks apart as the similarity cut tightens.

    One star-CC run covers the whole ladder: each edge explodes into
    the rungs it survives (bounded ``len(thresholds)``× blowup), and
    the rung index feeds :func:`bucketed_component_sizes`'s stripe
    encoding — exactly the `attack_robustness` shape with thresholds in
    place of removal levels.
    """
    ladder = sorted(thresholds)
    spark = wedges.sparkSession
    lad = spark.createDataFrame(
        [(i, float(t)) for i, t in enumerate(ladder)], "bkt long, th double"
    )
    e = wedges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        F.col(weight_col).alias("w"),
    ).filter(F.col("src") != F.col("dst"))
    tagged = (
        e.crossJoin(F.broadcast(lad))
        .filter(F.col("w") >= F.col("th"))
        .select("bkt", "src", "dst")
        .dropDuplicates(["bkt", "src", "dst"])
        .persist()
    )
    sizes = bucketed_component_sizes(tagged, **cc_kwargs)
    comp = sizes.groupBy("bkt").agg(
        F.count("*").alias("n_components"),
        F.sum("sz").cast("long").alias("n_nodes"),
        F.max("sz").alias("largest"),
    )
    ecnt = tagged.groupBy("bkt").agg(F.count("*").alias("n_edges"))
    return (
        ecnt.join(comp, "bkt")
        .join(F.broadcast(lad), "bkt")
        .select(
            F.col("th").alias("threshold"),
            "n_edges",
            "n_nodes",
            "n_components",
            "largest",
        )
    )


def component_evolution(
    pairs: DataFrame,
    t_col: str = "t",
    bucket_us: int = 86_400_000_000,
    **cc_kwargs,
) -> DataFrame:
    """Per-time-bucket connectivity profile of a timestamped edge
    stream: ``(day, n_components, n_nodes, largest)`` where ``day`` is
    the integer bucket ``t div bucket_us`` and the three counts describe
    the weakly connected components of the edges falling in that bucket
    — the "does the interaction graph fragment or coalesce over time"
    series. One star-CC run for all buckets via
    :func:`bucketed_component_sizes`.
    """
    e = pairs.select(
        F.expr(f"{t_col} div {bucket_us}").alias("bkt"),
        "src",
        "dst",
    ).filter(F.col("src") != F.col("dst"))
    sizes = bucketed_component_sizes(e, **cc_kwargs)
    return sizes.groupBy(F.col("bkt").alias("day")).agg(
        F.count("*").alias("n_components"),
        F.sum("sz").cast("long").alias("n_nodes"),
        F.max("sz").alias("largest"),
    )


def label_propagation(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """(node_id, label) — synchronous LPA with deterministic min-label ties."""
    sym = _sym(edges).persist()
    labels = _nodes(edges).select(
        "node_id", F.col("node_id").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        votes = (
            sym.join(labels, sym["a"] == labels["node_id"])
            .groupBy(F.col("b").alias("node_id"), F.col("label"))
            .agg(F.count("*").alias("cnt"))
        )
        w = Window.partitionBy("node_id").orderBy(
            F.col("cnt").desc(), F.col("label").asc()
        )
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node_id", F.col("label").alias("new_label"))
        )
        new_labels = (
            labels.join(best, "node_id", "left")
            .select(
                "node_id",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
                (F.col("new_label") != F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("changed")).count()
        labels = new_labels.select("node_id", "label")
        if changed == 0:
            break
    return labels


def seeded_label_spreading(
    edges: DataFrame, seeds: DataFrame, max_iter: int = 5
) -> DataFrame:
    """(node_id, label) — semi-supervised label spreading with clamped
    seeds: the weak-supervision primitive (spread a small
    hand/heuristic-labeled set — spam/quality/topic — over the graph).

    ``seeds`` is (node_id, label); seed labels never change. Each
    synchronous round, every NON-seed node takes the majority label
    among its currently-labeled neighbors (ties broken by the smallest
    label; no labeled neighbor → keeps its current label, initially
    unlabeled). Runs exactly ``max_iter`` rounds unless a round changes
    nothing — majority vote is idempotent at the fixpoint, so an
    early-exited engine state equals the oracle's fixed unroll, while a
    2-cycle oscillation (sync LPA can oscillate) never converges and
    both sides stop at the same round count. Nodes still unlabeled
    after the last round are omitted.

    Scale shape per round: one edge-keyed join + one
    map-side-combinable (node, label) vote count + one per-node
    top-1 window on the vote frame (bounded by the node's distinct
    neighbor-label count, not its degree), lineage cut per round —
    the same superstep discipline as :func:`label_propagation`, with
    the label frame carrying an ``is_seed`` clamp bit.
    """
    sym = _sym(edges).persist()
    state = (
        _nodes(edges)
        .join(
            seeds.select("node_id", F.col("label").alias("_sl")),
            "node_id",
            "left",
        )
        .select(
            "node_id",
            F.col("_sl").alias("label"),
            F.col("_sl").isNotNull().alias("is_seed"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        votes = (
            sym.join(
                state.filter(F.col("label").isNotNull()).select(
                    F.col("node_id").alias("a"), "label"
                ),
                "a",
            )
            .groupBy(F.col("b").alias("node_id"), F.col("label"))
            .agg(F.count("*").alias("cnt"))
        )
        w = Window.partitionBy("node_id").orderBy(
            F.col("cnt").desc(), F.col("label").asc()
        )
        best = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node_id", F.col("label").alias("best"))
        )
        nxt = (
            state.join(best, "node_id", "left")
            .select(
                "node_id",
                F.when(F.col("is_seed"), F.col("label"))
                .otherwise(F.coalesce(F.col("best"), F.col("label")))
                .alias("label"),
                "is_seed",
                (
                    ~F.col("is_seed")
                    & F.col("best").isNotNull()
                    & (
                        F.col("label").isNull()
                        | (F.col("best") != F.col("label"))
                    )
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = nxt.filter(F.col("changed")).count()
        state = nxt.select("node_id", "label", "is_seed")
        if changed == 0:
            break
    return state.filter(F.col("label").isNotNull()).select(
        "node_id", "label"
    )
