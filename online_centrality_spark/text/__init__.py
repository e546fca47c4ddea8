from .analysis import (
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
)

__all__ = ["token_count", "quality_score", "language_id", "document_fingerprint"]
