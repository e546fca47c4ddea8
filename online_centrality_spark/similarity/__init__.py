from .ann import brute_force_topk, ivf_topk, lsh_topk

__all__ = ["brute_force_topk", "ivf_topk", "lsh_topk"]
