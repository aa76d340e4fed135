"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``.

The decode kernels are STUBS in this sandbox (no image/audio libraries
baked in): ``decoder="stub"`` produces deterministic fake features so
the Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested; ``decoder="pillow"``/``"librosa"`` raise a
clear ``NotImplementedError`` until the libraries exist in the runtime.

Batch-size guidance (BASELINE scale notes): binary payloads are large —
size ``batch_size`` so ``batch_size × payload × concurrency`` fits the
worker heap (e.g. 1 MiB images → batch_size ≤ 64 per 1 GiB heap actor).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from merge_machine_ray.functions.hashing import crc_hash64

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),           # -1 when unknown / not applicable
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _require(decoder: str, lib: str):
    raise NotImplementedError(
        f"decoder={decoder!r} needs {lib}, which is not available in this "
        f"runtime; use decoder='stub' for deterministic fake features")


class ImageFeatures:
    """Actor-pool stage: image binary → fixed-size feature vector +
    thumbnail metadata. Stub path derives deterministic pseudo-features
    from the payload bytes (stable across workers)."""

    def __init__(self, decoder: str = "stub", feature_dim: int = 16,
                 thumb_size: int = 32):
        if decoder == "pillow":
            _require(decoder, "PIL")
        self.decoder = decoder
        self.feature_dim = feature_dim
        self.thumb_size = thumb_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, thumbs_w, thumbs_h = [], [], []
        for payload, w, h in zip(batch["payload"].to_pylist(),
                                 batch["width"].to_pylist(),
                                 batch["height"].to_pylist()):
            h64 = crc_hash64(payload or b"")
            rng = np.random.RandomState(h64 & 0x7FFFFFFF)
            feats.append(rng.standard_normal(self.feature_dim)
                         .astype(np.float32).tolist())
            scale = max(1, max(w or 1, h or 1) // self.thumb_size)
            thumbs_w.append(max(1, (w or 1) // scale))
            thumbs_h.append(max(1, (h or 1) // scale))
        return pa.table({
            "media_id": batch["media_id"],
            "features": pa.array(feats, pa.list_(pa.float32())),
            "thumb_w": pa.array(thumbs_w, pa.int32()),
            "thumb_h": pa.array(thumbs_h, pa.int32()),
        })


class AudioFeatures:
    """Actor-pool stage: audio binary → frame-level summary features."""

    def __init__(self, decoder: str = "stub", n_mfcc: int = 8):
        if decoder == "librosa":
            _require(decoder, "librosa")
        self.n_mfcc = n_mfcc

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, n_frames = [], []
        for payload, dur in zip(batch["payload"].to_pylist(),
                                batch["duration_ms"].to_pylist()):
            h64 = crc_hash64(payload or b"")
            rng = np.random.RandomState(h64 & 0x7FFFFFFF)
            feats.append(rng.standard_normal(self.n_mfcc)
                         .astype(np.float32).tolist())
            n_frames.append(max(1, (dur or 0) // 20))
        return pa.table({
            "media_id": batch["media_id"],
            "mfcc_mean": pa.array(feats, pa.list_(pa.float32())),
            "n_frames": pa.array(n_frames, pa.int32()),
        })


class FrameSampler:
    """Actor-pool stage: video binary → K deterministic frame offsets
    (the decode itself is stubbed; offsets + per-frame ids are real)."""

    def __init__(self, decoder: str = "stub", frames_per_video: int = 4):
        if decoder == "ffmpeg":
            _require(decoder, "ffmpeg")
        self.k = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_off, out_frame = [], [], []
        for mid, dur in zip(batch["media_id"].to_pylist(),
                            batch["duration_ms"].to_pylist()):
            d = max(1, dur or 1)
            for i in range(self.k):
                out_id.append(mid)
                out_off.append((d * (2 * i + 1)) // (2 * self.k))
                out_frame.append(i)
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "offset_ms": pa.array(out_off, pa.int32()),
        })


def image_pipeline(ds, concurrency=(1, 4), batch_size: int = 64):
    """Wire-up helper: small batches (binary payloads), actor pool."""
    return ds.map_batches(ImageFeatures, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def synth_media_table(n: int, kind: str = "image", seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for tests (payload = seeded bytes)."""
    import random

    rows = []
    for i in range(n):
        rng = random.Random(f"{seed}:media:{i}")
        rows.append({
            "media_id": i,
            "kind": kind,
            "payload": bytes(rng.getrandbits(8) for _ in range(256)),
            "mime": {"image": "image/png", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
            "width": rng.choice([640, 800, 1024]) if kind == "image" else -1,
            "height": rng.choice([480, 600, 768]) if kind == "image" else -1,
            "duration_ms": rng.randint(1000, 60000) if kind != "image" else -1,
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
