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


class MediaResizer:
    """Actor-pool stage: image payload -> resized payload + new dims.

    The reference routes image hits separately (IMAGE term_type,
    FileStorage.h:31-45); training pipelines need resize-on-ingest.
    ``codec='fake'`` performs a deterministic byte-level downsample that
    preserves payload determinism (stride-sampled bytes + size header)
    — the stand-in for a real decode->resize->encode; real codecs raise
    NotImplementedError (libs not in this container)."""

    def __init__(self, target_w: int = 32, target_h: int = 32,
                 codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r}: real image decoding not available here")
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload, out_w, out_h = [], [], []
        widths = batch["width"].to_numpy(zero_copy_only=False)
        heights = batch["height"].to_numpy(zero_copy_only=False)
        for payload, w, h, kind in zip(batch["payload"].to_pylist(), widths,
                                       heights, batch["kind"].to_pylist()):
            if kind != "image":
                # resize is an IMAGE transform — audio/video payloads and
                # dims pass through untouched (the frame sampler owns
                # video handling)
                out_payload.append(payload)
                out_w.append(int(w))
                out_h.append(int(h))
                continue
            scale = max(1, (int(w) * int(h)) // (self.tw * self.th))
            out_payload.append(payload[::scale])
            out_w.append(self.tw)
            out_h.append(self.th)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload": pa.array(out_payload, pa.binary()),
            "width": pa.array(out_w, pa.int32()),
            "height": pa.array(out_h, pa.int32()),
            "duration_ms": batch["duration_ms"],
        })


class FrameSampler:
    """Actor-pool stage: video payload -> one row PER SAMPLED FRAME.

    Emits ``fps``-spaced frames as independent payload rows (frame_idx
    column added) so downstream feature extraction parallelizes per
    frame; non-video rows pass through as frame_idx=0.  Deterministic
    fake frame slicing; real demuxers raise NotImplementedError."""

    def __init__(self, frames_per_clip: int = 4, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError(
                f"codec {codec!r}: real video demuxing not available here")
        self.n = frames_per_clip

    def __call__(self, batch: pa.Table) -> pa.Table:
        mid, kind, frame, payload = [], [], [], []
        durs = batch["duration_ms"].to_numpy(zero_copy_only=False)
        for m, k, p, d in zip(batch["media_id"].to_pylist(),
                              batch["kind"].to_pylist(),
                              batch["payload"].to_pylist(), durs):
            if k != "video" or d <= 0:
                mid.append(m); kind.append(k); frame.append(0); payload.append(p)
                continue
            span = max(1, len(p) // self.n)
            for fi in range(self.n):
                mid.append(m); kind.append(k); frame.append(fi)
                payload.append(p[fi * span:(fi + 1) * span])
        return pa.table({
            "media_id": pa.array(mid, pa.int64()),
            "kind": pa.array(kind, pa.string()),
            "frame_idx": pa.array(frame, pa.int32()),
            "payload": pa.array(payload, pa.binary()),
        })


def media_pipeline(media: rd.Dataset, target_w: int = 32, target_h: int = 32,
                   frames_per_clip: int = 4, concurrency: int = 2,
                   batch_size: int = 32) -> rd.Dataset:
    """Ingest-shaped multimodal chain: resize (images) -> frame-sample
    (videos) -> per-frame features.  Every stage is an actor pool with
    small batches (wide binary rows); output one feature row per frame."""
    resized = media.map_batches(
        MediaResizer, fn_constructor_kwargs={"target_w": target_w,
                                             "target_h": target_h},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True)
    frames = resized.map_batches(
        FrameSampler, fn_constructor_kwargs={"frames_per_clip": frames_per_clip},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True)

    class _FrameFeatures(MediaFeatureExtractor):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            return out.append_column("frame_idx", batch["frame_idx"])

    return frames.map_batches(
        _FrameFeatures, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, zero_copy_batch=True)
