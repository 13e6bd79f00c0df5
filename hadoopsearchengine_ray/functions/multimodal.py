"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video payloads are opaque Arrow ``binary`` columns with a
metadata struct; decode/resize/feature stages are actor-pool
``map_batches`` with REAL Ray-side plumbing (schema, batching, actor
lifecycle) and a STUBBED codec: the decode libraries (PIL/ffmpeg/…)
are not in this container, so ``decode_fn=None`` uses a deterministic
fake decoder, and requesting a real codec raises NotImplementedError.
Batch sizes stay small — payloads are wide rows (SURVEY.md §7.4).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synthetic_media(num: int, seed: int = 3, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(num)]
    return pa.table({
        "media_id": pa.array(range(num), pa.int64()),
        "kind": pa.array([kinds[i % 3] for i in range(num)], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([64 + (i % 8) * 32 for i in range(num)], pa.int32()),
        "height": pa.array([64 + (i % 5) * 32 for i in range(num)], pa.int32()),
        "duration_ms": pa.array([0 if i % 3 == 0 else 1000 + i for i in range(num)],
                                pa.int32()),
    })


class MediaFeatureExtractor:
    """Actor-pool stage: payload -> fixed-size feature vector.

    ``codec='fake'`` (default) derives a deterministic 16-dim feature from
    the payload bytes (stands in for a real decode+model forward pass);
    any other codec raises NotImplementedError — the real decode libs are
    not available in this environment."""

    FEAT_DIM = 16

    def __init__(self, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r}: real image/audio decoding not available "
                "in this environment; plumbing is exercised with the fake codec")
        self.codec = codec

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            h = hashlib.blake2b(payload, digest_size=self.FEAT_DIM * 4).digest()
            feats.append(
                (np.frombuffer(h, dtype=np.uint32).astype(np.float32)
                 / np.float32(2**32)).tolist())
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "feature": pa.array(feats, pa.list_(pa.float32(), self.FEAT_DIM)),
        })


def extract_features(media: rd.Dataset, concurrency: int = 2,
                     batch_size: int = 64) -> rd.Dataset:
    """Small batches (wide binary rows), actor pool for codec state."""
    return media.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
