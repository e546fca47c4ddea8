"""online_centrality_spark — a PySpark-native link-graph analytics engine.

A from-scratch engine (not a port) with the query and data-processing
capabilities of ferencberes/online-centrality: temporal-walk centrality
(Temporal Katz and truncated variant, temporal PageRank, decayed indegree),
static baselines (PageRank, indegree, harmonic centrality, negative-beta
measure), standard link-graph algorithms (connected components, label
propagation, triangle count), a ranking/correlation evaluation layer, and
large-scale training-data pipeline operators (dedup, similarity search,
text analysis) — all expressed DataFrame-first so Catalyst/Tungsten pick
the physical strategy, with vectorized pandas/Arrow UDFs only where the
semantics genuinely need imperative per-partition logic.
"""

__version__ = "0.1.0"
