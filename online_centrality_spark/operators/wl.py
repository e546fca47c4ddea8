"""Weisfeiler-Leman (1-WL) color refinement.

Iterative structural relabeling — the standard graph-fingerprint /
graph-isomorphism feature (WL subtree kernel, GIN expressiveness
bound): each round a node's color becomes a hash of (own color,
multiset of neighbor colors). Two graphs with different WL color
histograms are non-isomorphic; per-node colors are structural-role
features for graph ML.

Scale design: the textbook formulation sorts each node's neighbor-color
list — a per-node sort that puts a 10^8-degree hub's whole adjacency in
one task (the supernode trap ``per_key_rank`` exists to avoid). This
implementation replaces the sorted list with a COMMUTATIVE multiset
digest: sum of per-neighbor color hashes (each pre-reduced mod 1e9, so
int64 holds exact sums beyond 10^9-degree hubs). Sum is algebraic —
map-side partials collapse hub neighborhoods before the shuffle — and
order-free, so no sort, no collect_list, no window. The digest then
folds with the node's own color through the engine's portable md5
(identical bit-for-bit in DuckDB), keeping every round one equi-join +
one two-stage aggregation. Round count is a constant: plan depth is
bounded, lineage is cut per round upstream of any fixpoint use.

No counterpart in the reference (no WL / isomorphism surface there);
extends the §2.9 link-graph toolkit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.common import portable_hash

# per-neighbor hashes are reduced mod 1e9 before summing so the int64
# sum is exact up to ~9.2e9 neighbors per node
_ELEM_MOD = 1_000_000_000


def wl_refinement(
    edges: DataFrame, rounds: int = 2, mod: int = _ELEM_MOD
) -> DataFrame:
    """``rounds`` of 1-WL color refinement over an undirected pair list.

    ``edges``: ``(src, dst)``, each undirected pair once. Initial color
    is the node degree. Returns ``(node_id, wl_color)`` with the final
    color in ``[0, mod)``; equal colors <=> equal WL colors up to hash
    collision (md5-backed, ~1e-9 per pair at the default mod).
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    # the symmetric edge list feeds the degree seed plus one join per
    # round — persist it or an expensive upstream (e.g. the blocked
    # cosine pair kernel) re-executes once per lineage branch (the
    # round-4 loop-input-persist audit lesson)
    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    cur = sym.groupBy(F.col("src").alias("node_id")).agg(
        F.count("*").cast("long").alias("wl_color")
    )
    for _ in range(rounds):
        digest = (
            sym.join(
                cur.select(
                    F.col("node_id").alias("dst"), F.col("wl_color").alias("_c")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node_id"))
            .agg(
                F.sum(
                    portable_hash(F.col("_c").cast("string")) % _ELEM_MOD
                ).alias("_digest")
            )
        )
        cur = cur.join(digest, "node_id").select(
            "node_id",
            (
                portable_hash(
                    F.concat_ws(":", F.col("wl_color"), F.col("_digest"))
                )
                % mod
            ).alias("wl_color"),
        )
    return cur


def wl_histogram(colors: DataFrame) -> DataFrame:
    """Color histogram of a WL refinement — the graph's WL fingerprint
    (one map-side-combinable groupBy)."""
    return colors.groupBy("wl_color").agg(F.count("*").cast("long").alias("n"))
