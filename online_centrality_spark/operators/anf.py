"""Approximate neighborhood function (ANF) via Flajolet-Martin sketches.

The 100 TB twin of the exact all-sources BFS family (``operators/
bfs.py``): Palmer-Gibbons-Faloutsos ANF (KDD '02). Every node carries
``trials`` OR-mergeable FM bitmasks (one packed 64-bit word each);
round ``h`` ORs each node's sketch into its neighbours', so after
``h`` rounds node ``v``'s sketch summarises the ball
``N(v, h) = {u : dist(v, u) <= h}`` and the neighbourhood function
``B(h) = sum_v |N(v, h)|`` falls out as one tiny aggregate per round.

Scale shape: per-round state is ``trials`` BIGINT words per node
(constant), per-round work is ONE |E'|-row shuffle into a map-side-
combinable ``bit_or`` groupBy — linear in edges, where the exact
envelope must carry the O(n^2) (target, node) visited relation. This
is the classic answer for effective diameter / reachability profiles
at 10^12 edges; the exact path stays the correctness oracle at small
scale (``tests`` certify the estimate against it).

Engine-portable determinism (so a plain-SQL oracle reproduces the
numbers bit-for-bit, not just statistically):

- bit indices come from the md5 hex scheme shared with
  ``text/sketches.py`` (leading zero BITS of a 52-bit hex tail,
  geometric exactly as FM requires), capped at 51;
- merges are integer ORs; the lowest-zero-bit readout is the pure
  integer identity ``bit_count(x & ~(x + 1))``;
- the FM mean ``2^(sumR / trials)`` is decomposed as
  ``shiftleft(1, sumR div trials) * TAB[sumR % trials]`` over a
  ``trials``-entry double-literal table, so every arithmetic step is
  an IEEE-exact base operation (no cross-engine ``pow``/``exp``);
- per-node estimates are summed under the scaled-int64 rule
  (``round(est * 1e6)`` as BIGINT, exact integer sum), and the
  cumulative fraction is a ratio of those exact integers.

Reference parity: the reference engine has no approximate
reachability; this extends the same graph inputs the exact trio reads
(SURVEY §2.9 scale extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Magic constant of the Flajolet-Martin estimator: E[2^R] ~= phi * n.
FM_PHI = 0.77351

#: 2^(f / trials) lookup for the fractional part of the FM mean —
#: double literals shared verbatim with the SQL oracle.
def fm_tab(trials: int) -> list[float]:
    return [2.0 ** (f / trials) for f in range(trials)]


def _fm_bit(node_col, t: int):
    """Deterministic FM bit index for (node, trial): leading zero BITS
    of the 52-bit md5 hex tail (P[bit = i] = 2^-(i+1)), capped at 51."""
    tail = F.substring(
        F.md5(F.concat(node_col.cast("string"), F.lit(f"#anf{t}"))), 1, 13
    )
    z = F.length(F.regexp_extract(tail, "^(0*)", 1))
    first = tail.substr(z + 1, F.lit(1))
    lz = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when((first >= "4") & (first <= "7"), 1)
        .otherwise(0)
    )
    return F.least(z * 4 + lz, F.lit(51))


def fm_node_sketches(nodes: DataFrame, trials: int) -> DataFrame:
    """(node_id, c0..c{trials-1}) — each node's initial FM sketch:
    one packed 64-bit word per trial with that node's bit set."""
    base = nodes.select(
        "node_id",
        *[_fm_bit(F.col("node_id"), t).alias(f"b{t}") for t in range(trials)],
    )
    return base.select(
        "node_id",
        *[
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(b{t} AS INT))").alias(
                f"c{t}"
            )
            for t in range(trials)
        ],
    )


def _estimate(sk: DataFrame, trials: int) -> tuple[int, int]:
    """(nodes, pairs_scaled) from a sketch frame: per-node FM ball
    estimates summed as exact scaled int64 — ONE bounded scalar read
    per round (rounds are diameter-bounded, never data-bounded)."""
    tab = F.array(*[F.lit(v) for v in fm_tab(trials)])
    rr = [F.bit_count(F.expr(f"c{t} & ~(c{t} + 1)")) for t in range(trials)]
    sum_r = rr[0]
    for r in rr[1:]:
        sum_r = sum_r + r
    e = sk.select(sum_r.cast("long").alias("sumr"))
    est = (
        F.expr(
            f"CAST(shiftleft(CAST(1 AS BIGINT),"
            f" CAST(sumr div {trials} AS INT)) AS DOUBLE)"
        )
        * F.element_at(tab, (F.col("sumr") % trials).cast("int") + 1)
        / F.lit(FM_PHI)
    )
    row = (
        e.select(F.round(est * 1e6).cast("long").alias("term"))
        .agg(F.count("*").alias("nodes"), F.sum("term").alias("pairs_scaled"))
        .collect()[0]
    )
    return int(row["nodes"]), int(row["pairs_scaled"])


def anf_reach(
    edges: DataFrame,
    trials: int = 32,
    max_rounds: int | None = None,
    directed: bool = False,
    eff_quantile: float = 0.9,
) -> DataFrame:
    """(h, nodes, pairs_est, cum_frac, eff_diameter) — the approximate
    neighbourhood function of the graph: for every radius ``h`` the
    FM-estimated ball mass ``B(h) = sum_v |{u : dist(v,u) <= h}|``
    (self-pairs included), its fraction of the final ball mass, and the
    ANF effective diameter (smallest ``h`` covering ``eff_quantile`` of
    the converged mass).

    ``max_rounds=None`` iterates to the sketch fixpoint (the total OR'd
    bit count is monotone, so equality is exact convergence — one
    bounded scalar read per round). A fixed ``max_rounds`` runs exactly
    that many rounds regardless of convergence: the contract-query mode,
    so the unrolled SQL oracle is round-for-round identical.
    """
    spark = edges.sparkSession
    # one materialization of the (possibly expensive) edge source: the
    # symmetric deduped adjacency, checkpointed; everything else —
    # node universe, self-loops, every round — reads the checkpoint
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    adj = e.dropDuplicates(["src", "dst"])
    if not directed:
        adj = adj.unionAll(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).dropDuplicates(["src", "dst"])
    adj = adj.localCheckpoint(eager=True)
    if directed:
        nodes = (
            adj.select(F.col("src").alias("node_id"))
            .unionAll(adj.select(F.col("dst").alias("node_id")))
            .distinct()
        )
    else:  # symmetric: every endpoint appears as src
        nodes = adj.select(F.col("src").alias("node_id")).distinct()
    if nodes.limit(1).count() == 0:
        return spark.createDataFrame(
            [], "h long, nodes long, pairs_est double, cum_frac double,"
            " eff_diameter long"
        )
    # E' = adjacency + self-loops: one join per round covers both the
    # neighbour merge and keeping the node's own sketch. E' is
    # pre-partitioned on the join key ONCE (and the checkpoint keeps
    # the partitioning), and each round's groupBy output is already
    # hash-partitioned on node_id — so the per-round plan moves only
    # the map-side-combined aggregate exchange, never E' again.
    eplus = (
        adj.unionByName(
            nodes.select(
                F.col("node_id").alias("src"), F.col("node_id").alias("dst")
            )
        )
        .repartition("dst")
        .localCheckpoint(eager=True)
    )

    sk = (
        fm_node_sketches(nodes, trials)
        .repartition("node_id")
        .localCheckpoint(eager=True)
    )
    agg_cols = [F.bit_or(f"c{t}").alias(f"c{t}") for t in range(trials)]

    def bits_of(frame: DataFrame) -> int:
        # monotone convergence witness: total set bits across all
        # sketches (bounded by 52 * trials * n, one scalar per round)
        total = sum(
            (F.bit_count(F.col(f"c{t}")) for t in range(trials)), F.lit(0)
        )
        return frame.select(total.alias("b")).agg(F.sum("b")).collect()[0][0]

    per_h = [(0, *_estimate(sk, trials))]
    prev_bits = bits_of(sk) if max_rounds is None else None
    h = 0
    cap = max_rounds if max_rounds is not None else 10_000
    while h < cap:
        h += 1
        sk = (
            eplus.join(sk, eplus["dst"] == sk["node_id"])
            .groupBy(eplus["src"].alias("node_id"))
            .agg(*agg_cols)
            .localCheckpoint(eager=True)
        )
        per_h.append((h, *_estimate(sk, trials)))
        if max_rounds is None:
            cur_bits = bits_of(sk)
            if cur_bits == prev_bits:
                break
            prev_bits = cur_bits

    # the per-round scalars are round-count-bounded (diameter, never
    # data): rebuilt as a tiny frame so the ratio/round semantics stay
    # engine-side, identical to the SQL oracle's
    hd = spark.createDataFrame(
        per_h, "h long, nodes long, pairs_scaled long"
    )
    top = hd.agg(F.max("pairs_scaled").alias("top"))
    c = hd.crossJoin(F.broadcast(top)).select(
        "h",
        "nodes",
        F.round(F.col("pairs_scaled").cast("double") / 1e6, 4).alias(
            "pairs_est"
        ),
        # exact-integer ratio: both engines agree bit-for-bit pre-round
        (
            F.col("pairs_scaled").cast("double")
            / F.col("top").cast("double")
        ).alias("raw_frac"),
    )
    eff = c.filter(F.col("raw_frac") >= F.lit(eff_quantile)).agg(
        F.min("h").alias("eff_diameter")
    )
    return c.crossJoin(F.broadcast(eff)).select(
        "h",
        "nodes",
        "pairs_est",
        F.round("raw_frac", 6).alias("cum_frac"),
        "eff_diameter",
    )
