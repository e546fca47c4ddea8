from .media import (
    decode_media,
    extract_features,
    generate_fake_media,
    resize_images,
    sample_frames,
)

__all__ = [
    "generate_fake_media",
    "decode_media",
    "extract_features",
    "resize_images",
    "sample_frames",
]
