from .analysis import (
    boilerplate_ngrams,
    document_fingerprint,
    gopher_rules,
    redact_pii,
    repetition_rules,
    language_id,
    quality_score,
    token_count,
)
from .features import hashed_features
from .packing import (
    chunk_documents,
    domain_mixture_weights,
    grouped_split,
    hash_sample,
    pack_sequences,
    pipeline_funnel,
    weighted_sample,
)

__all__ = [
    "token_count",
    "quality_score",
    "language_id",
    "document_fingerprint",
    "redact_pii",
    "pack_sequences",
    "hash_sample",
    "weighted_sample",
    "gopher_rules",
    "boilerplate_ngrams",
    "repetition_rules",
    "domain_mixture_weights",
    "grouped_split",
    "chunk_documents",
    "pipeline_funnel",
    "hashed_features",
]
