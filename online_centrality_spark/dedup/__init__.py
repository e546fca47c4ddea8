from .exact import exact_dedup, exact_duplicate_groups, soft_dedup_weights
from .minhash import minhash_lsh_candidates, minhash_signatures
from .ngram import (
    decontaminate,
    duplication_flow,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    shingles,
)
from .simhash import simhash_fingerprints, simhash_near_dups
from .embedding import (
    embedding_near_dups,
    embedding_near_dups_blocked,
    embedding_near_dups_lsh,
)
from .clusters import dedup_clusters
from .spans import positional_ngrams, remove_duplicated_spans

__all__ = [
    "dedup_clusters",
    "positional_ngrams",
    "remove_duplicated_spans",
    "exact_dedup",
    "duplication_flow",
    "soft_dedup_weights",
    "exact_duplicate_groups",
    "shingles",
    "ngram_jaccard_pairs",
    "ngram_containment_pairs",
    "decontaminate",
    "minhash_signatures",
    "minhash_lsh_candidates",
    "simhash_fingerprints",
    "simhash_near_dups",
    "embedding_near_dups",
    "embedding_near_dups_blocked",
    "embedding_near_dups_lsh",
]
