"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels so bytes never round-trip through per-row Python.

The decoders for real formats (JPEG/PNG/WAV/MP4) are STUBS — the image
and audio libraries are not available in this environment, so anything
that is not the deterministic FAKE container raises
``NotImplementedError`` at the clearly marked point below. Everything
around the decode — schemas, partitioning, UDF signatures, Arrow batch
shapes, the deterministic fake codec used by tests — is real, so
swapping in Pillow/libav later only touches ``_decode_payload``.

FAKE container layout (big-endian):
    magic   7 bytes  b"FAKEMM1"
    kind    1 byte   0=image 1=audio 2=video
    width   4 bytes  (image/video) | sample_rate (audio)
    height  4 bytes  (image/video) | n_samples   (audio)
    frames  4 bytes  (video; 1 otherwise)
    body    width*height*frames bytes (image/video) | n_samples (audio)
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FAKEMM1"
KINDS = {"image": 0, "audio": 1, "video": 2}
KIND_NAMES = {v: k for k, v in KINDS.items()}


def _encode(kind: str, a: int, b: int, frames: int, body: np.ndarray) -> bytes:
    return MAGIC + struct.pack(">BIII", KINDS[kind], a, b, frames) + body.tobytes()


def _decode_payload(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Decode one media payload. STUB BOUNDARY: real formats unsupported."""
    if payload[:7] != MAGIC:
        # STUB: real codecs (JPEG/PNG/WAV/MP4) would be dispatched here.
        raise NotImplementedError(
            "only the deterministic FAKE container is decodable in this "
            "environment; plug a real codec into _decode_payload"
        )
    kind_b, a, b, frames = struct.unpack(">BIII", payload[7:20])
    body = np.frombuffer(payload[20:], dtype=np.uint8)
    return KIND_NAMES[kind_b], a, b, frames, body


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def generate_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (no external data)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h, fr = int(rng.integers(8, 32)), int(rng.integers(8, 32)), 1
            body = rng.integers(0, 256, w * h, dtype=np.uint8)
            rows.append((i, kind, _encode(kind, w, h, fr, body), w, h, fr))
        elif kind == "audio":
            sr, ns = 16000, int(rng.integers(100, 1000))
            body = rng.integers(0, 256, ns, dtype=np.uint8)
            rows.append((i, kind, _encode(kind, sr, ns, 1, body), sr, ns, 1))
        else:
            w, h, fr = 16, 16, int(rng.integers(2, 12))
            body = rng.integers(0, 256, w * h * fr, dtype=np.uint8)
            rows.append((i, kind, _encode(kind, w, h, fr, body), w, h, fr))
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_intensity", T.DoubleType(), False),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode metadata + intensity stats from payload bytes."""

    def kernel(batches):
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, a, b, fr, body = _decode_payload(bytes(payload))
                out.append(
                    (int(mid), kind, a, b, fr, len(body), float(body.mean()))
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in _DECODE_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=_DECODE_SCHEMA
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(media: DataFrame, n_bins: int = 8) -> DataFrame:
    """Byte-histogram feature vector per media item (Arrow-batched)."""

    def kernel(batches):
        for pdf in batches:
            ids, feats = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _, _, _, _, body = _decode_payload(bytes(payload))
                hist, _ = np.histogram(body, bins=n_bins, range=(0, 256))
                feats.append((hist / max(len(body), 1)).astype(float).tolist())
                ids.append(int(mid))
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media.select("media_id", "payload").mapInPandas(
        kernel, schema=_FEATURE_SCHEMA
    )


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Nearest-neighbor resize of FAKE images; re-encoded payloads."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, w, h, fr, body = _decode_payload(bytes(payload))
                if kind != "image":
                    continue
                img = body.reshape(h, w)
                yi = (np.arange(target_h) * h // target_h).clip(0, h - 1)
                xi = (np.arange(target_w) * w // target_w).clip(0, w - 1)
                resized = img[np.ix_(yi, xi)].astype(np.uint8)
                rows.append(
                    (
                        int(mid),
                        "image",
                        _encode("image", target_w, target_h, 1, resized.ravel()),
                        target_w,
                        target_h,
                        1,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, schema=MEDIA_SCHEMA
    )


def sample_frames(media: DataFrame, every_k: int = 2) -> DataFrame:
    """Every k-th frame of FAKE videos as standalone image rows."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, w, h, fr, body = _decode_payload(bytes(payload))
                if kind != "video":
                    continue
                frames = body.reshape(fr, h, w)
                for fi in range(0, fr, every_k):
                    rows.append(
                        (
                            int(mid),
                            fi,
                            _encode("image", w, h, 1, frames[fi].ravel()),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.filter(F.col("kind") == "video").mapInPandas(
        kernel, schema=out_schema
    )
