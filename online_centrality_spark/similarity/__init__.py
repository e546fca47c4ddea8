from .ann import brute_force_topk, ivf_topk, lsh_topk
from .kmeans import cluster_silhouette, kmeans, kmeans_sql, silhouette_sql
from .outliers import embedding_outliers
from .semdedup import semantic_dedup, semantic_dedup_sql

__all__ = [
    "brute_force_topk",
    "ivf_topk",
    "lsh_topk",
    "kmeans",
    "kmeans_sql",
    "cluster_silhouette",
    "silhouette_sql",
    "embedding_outliers",
    "semantic_dedup",
    "semantic_dedup_sql",
]
