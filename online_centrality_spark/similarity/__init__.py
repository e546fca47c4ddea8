from .ann import brute_force_topk, ivf_topk, lsh_topk
from .kmeans import kmeans, kmeans_sql
from .outliers import embedding_outliers

__all__ = ["brute_force_topk", "ivf_topk", "lsh_topk", "kmeans", "kmeans_sql", "embedding_outliers"]
