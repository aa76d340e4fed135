"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``.

Two decode tiers:

* **Real decode — uncompressed formats** (pure numpy, no external
  libs; ``functions/codecs.py``): ``decoder="ppm"`` (binary P6 images),
  ``decoder="wav"`` (16-bit PCM RIFF), ``decoder="rawvideo"`` (in-repo
  uncompressed frame container with random-access frame reads). These
  run the full decode → feature-extract / resize / frame-sample path
  on real pixel/sample data.
* **Stubs — compressed formats**: PNG/JPEG/MP3/MP4 need libraries this
  runtime lacks; ``decoder="pillow"``/``"librosa"``/``"ffmpeg"`` raise
  a clear ``NotImplementedError``, and ``decoder="stub"`` produces
  deterministic fake features so the Ray-side plumbing stays testable
  for those kinds too.

Batch-size guidance (BASELINE scale notes): binary payloads are large —
size ``batch_size`` so ``batch_size × payload × concurrency`` fits the
worker heap (e.g. 1 MiB images → batch_size ≤ 64 per 1 GiB heap actor).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from merge_machine_ray.functions.codecs import (
    decode_ppm,
    decode_rawvideo_frame,
    decode_wav,
    encode_ppm,
    encode_rawvideo,
    encode_wav,
    rawvideo_info,
    resize_nearest,
)
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
        f"runtime; use decoder='ppm'/'wav'/'rawvideo' for real decode of "
        f"uncompressed payloads or decoder='stub' for deterministic fakes")


def _stub_features(payload: bytes, dim: int) -> list[float]:
    h64 = crc_hash64(payload or b"")
    rng = np.random.RandomState(h64 & 0x7FFFFFFF)
    return rng.standard_normal(dim).astype(np.float32).tolist()


def _image_features(img: np.ndarray, dim: int) -> list[float]:
    """Real image features: per-channel mean/std (6), 8-bin luminance
    histogram, aspect ratio — padded/truncated to ``dim``."""
    f = np.asarray(img, dtype=np.float64) / 255.0
    lum = f @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 1.0))
    hist = hist / max(1, lum.size)
    feats = np.concatenate([
        f.reshape(-1, 3).mean(0), f.reshape(-1, 3).std(0), hist,
        [img.shape[1] / max(1, img.shape[0])]])
    out = np.zeros(dim)
    out[:min(dim, feats.size)] = feats[:dim]
    return out.astype(np.float32).tolist()


class ImageFeatures:
    """Actor-pool stage: image binary → fixed-size feature vector +
    real nearest-neighbor thumbnail (PPM bytes) for decodable payloads."""

    def __init__(self, decoder: str = "ppm", feature_dim: int = 16,
                 thumb_size: int = 32):
        if decoder == "pillow":
            _require(decoder, "PIL")
        self.decoder = decoder
        self.feature_dim = feature_dim
        self.thumb_size = thumb_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, thumbs_w, thumbs_h, thumbs = [], [], [], []
        for payload, w, h in zip(batch["payload"].to_pylist(),
                                 batch["width"].to_pylist(),
                                 batch["height"].to_pylist()):
            if self.decoder == "ppm":
                img = decode_ppm(payload)
                feats.append(_image_features(img, self.feature_dim))
                ih, iw = img.shape[:2]
                scale = max(1, max(iw, ih) // self.thumb_size)
                tw, th = max(1, iw // scale), max(1, ih // scale)
                thumbs.append(encode_ppm(resize_nearest(img, tw, th)))
                thumbs_w.append(tw)
                thumbs_h.append(th)
            else:  # stub tier (compressed payloads)
                feats.append(_stub_features(payload, self.feature_dim))
                scale = max(1, max(w or 1, h or 1) // self.thumb_size)
                thumbs_w.append(max(1, (w or 1) // scale))
                thumbs_h.append(max(1, (h or 1) // scale))
                thumbs.append(b"")
        return pa.table({
            "media_id": batch["media_id"],
            "features": pa.array(feats, pa.list_(pa.float32())),
            "thumb_w": pa.array(thumbs_w, pa.int32()),
            "thumb_h": pa.array(thumbs_h, pa.int32()),
            "thumbnail": pa.array(thumbs, pa.binary()),
        })


def _audio_features(samples: np.ndarray, rate: int, dim: int) -> list[float]:
    """Real audio features: RMS, zero-crossing rate, spectral centroid
    (Hz, rFFT), then log-energies of ``dim−3`` equal FFT bands."""
    if samples.size == 0:
        return [0.0] * dim
    rms = float(np.sqrt((samples ** 2).mean()))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples)))))
    spec = np.abs(np.fft.rfft(samples))
    freqs = np.fft.rfftfreq(samples.size, d=1.0 / rate)
    centroid = float((spec * freqs).sum() / max(spec.sum(), 1e-12))
    n_bands = max(0, dim - 3)
    bands = []
    if n_bands:
        edges = np.linspace(0, spec.size, n_bands + 1).astype(int)
        for i in range(n_bands):
            seg = spec[edges[i]:max(edges[i] + 1, edges[i + 1])]
            bands.append(float(np.log1p((seg ** 2).mean())))
    return np.asarray([rms, zcr, centroid] + bands,
                      dtype=np.float32).tolist()


class AudioFeatures:
    """Actor-pool stage: audio binary → summary feature vector
    (RMS / zero-crossings / spectral centroid / band log-energies for
    PCM WAV; deterministic fakes for compressed payloads)."""

    def __init__(self, decoder: str = "wav", n_mfcc: int = 8):
        if decoder == "librosa":
            _require(decoder, "librosa")
        self.decoder = decoder
        self.n_mfcc = n_mfcc

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, n_frames = [], []
        for payload, dur in zip(batch["payload"].to_pylist(),
                                batch["duration_ms"].to_pylist()):
            if self.decoder == "wav":
                samples, rate = decode_wav(payload)
                feats.append(_audio_features(samples, rate, self.n_mfcc))
                n_frames.append(max(1, int(samples.size / rate * 50)))
            else:
                feats.append(_stub_features(payload, self.n_mfcc))
                n_frames.append(max(1, (dur or 0) // 20))
        return pa.table({
            "media_id": batch["media_id"],
            "mfcc_mean": pa.array(feats, pa.list_(pa.float32())),
            "n_frames": pa.array(n_frames, pa.int32()),
        })


class FrameSampler:
    """Actor-pool stage: video binary → K evenly-spread frames. For the
    rawvideo container each sampled frame is RANDOM-ACCESS decoded
    (only its bytes are read) and summarized by mean RGB; for
    compressed payloads the offsets/ids plumbing runs with the decode
    stubbed out."""

    def __init__(self, decoder: str = "rawvideo", frames_per_video: int = 4):
        if decoder == "ffmpeg":
            _require(decoder, "ffmpeg")
        self.decoder = decoder
        self.k = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_off, out_frame, out_rgb = [], [], [], []
        for mid, payload, dur in zip(batch["media_id"].to_pylist(),
                                     batch["payload"].to_pylist(),
                                     batch["duration_ms"].to_pylist()):
            if self.decoder == "rawvideo":
                n, _w, _h = rawvideo_info(payload)
                d = max(1, dur or n)
                for i in range(self.k):
                    fi = min(n - 1, (n * (2 * i + 1)) // (2 * self.k))
                    frame = decode_rawvideo_frame(payload, fi)
                    out_id.append(mid)
                    out_frame.append(fi)
                    out_off.append((d * (2 * i + 1)) // (2 * self.k))
                    out_rgb.append(
                        (frame.reshape(-1, 3).mean(0) / 255.0)
                        .astype(np.float32).tolist())
            else:
                d = max(1, dur or 1)
                for i in range(self.k):
                    out_id.append(mid)
                    out_frame.append(i)
                    out_off.append((d * (2 * i + 1)) // (2 * self.k))
                    out_rgb.append([0.0, 0.0, 0.0])
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "offset_ms": pa.array(out_off, pa.int32()),
            "mean_rgb": pa.array(out_rgb, pa.list_(pa.float32())),
        })


def image_pipeline(ds, concurrency=(1, 4), batch_size: int = 64,
                   decoder: str = "ppm"):
    """Wire-up helper: small batches (binary payloads), actor pool."""
    return ds.map_batches(ImageFeatures,
                          fn_constructor_kwargs={"decoder": decoder},
                          batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


class ImagePHash:
    """Actor-pool stage: image binary → 64-bit DCT perceptual hash
    (``functions/phash.py``) — the visual near-dup fingerprint.
    Decodable payloads hash real pixels; the stub tier hashes the
    payload BYTES (crc64) so compressed corpora still exercise the
    plumbing (exact-duplicate detection only, honestly weaker)."""

    def __init__(self, decoder: str = "ppm"):
        if decoder == "pillow":
            _require(decoder, "PIL")
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        from merge_machine_ray.functions.phash import phash64_i64

        hashes = []
        for payload in batch["payload"].to_pylist():
            if self.decoder == "ppm":
                h = phash64_i64(decode_ppm(payload))
            else:  # stub tier: byte-exact fingerprint only
                u = crc_hash64(payload or b"")
                h = u - (1 << 64) if u >= (1 << 63) else u
            hashes.append(h)
        return pa.table({"media_id": batch["media_id"].cast(pa.int64()),
                         "phash": pa.array(hashes, pa.int64())})


class VideoPHash:
    """Actor-pool stage: video binary → 64-bit clip hash = per-bit
    MAJORITY of the pHashes of K evenly-spread random-access-decoded
    frames (strict >half; deterministic). Majority pooling keeps the
    clip hash stable when a few frames differ (re-encodes, inserted
    titles) while temporally-different clips diverge. Stub tier
    hashes payload bytes."""

    def __init__(self, decoder: str = "rawvideo",
                 frames_per_video: int = 4):
        if decoder == "ffmpeg":
            _require(decoder, "ffmpeg")
        self.decoder = decoder
        self.k = frames_per_video

    def __call__(self, batch: pa.Table) -> pa.Table:
        from merge_machine_ray.functions.phash import phash64

        hashes = []
        for payload in batch["payload"].to_pylist():
            if self.decoder == "rawvideo":
                # Zero-frame / malformed payloads hash to 0 (the same
                # empty-input convention as audio_fp64) instead of
                # killing the whole actor-pool stage on one bad row.
                try:
                    n, _w, _h = rawvideo_info(payload)
                except (ValueError, TypeError, struct.error):
                    n = 0
                if n <= 0:
                    hashes.append(0)
                    continue
                counts = np.zeros(64, np.int64)
                k = min(self.k, n)
                for i in range(k):
                    fi = min(n - 1, (n * (2 * i + 1)) // (2 * k))
                    fh = np.uint64(phash64(
                        decode_rawvideo_frame(payload, fi)))
                    counts += ((fh >> np.arange(64, dtype=np.uint64))
                               & np.uint64(1)).astype(np.int64)
                maj = counts * 2 > k
                u = np.uint64(0)
                for b in np.flatnonzero(maj):
                    u |= np.uint64(1) << np.uint64(int(b))
                h = int(u)
                h = h - (1 << 64) if h >= (1 << 63) else h
            else:
                u = crc_hash64(payload or b"")
                h = u - (1 << 64) if u >= (1 << 63) else u
            hashes.append(h)
        return pa.table({"media_id": batch["media_id"].cast(pa.int64()),
                         "vphash": pa.array(hashes, pa.int64())})


def video_near_dup_pairs(ds, decoder: str = "rawvideo",
                         max_hamming: int = 6, bands: int = 8,
                         frames_per_video: int = 4, block_cap: int = 256,
                         batch_size: int = 16, concurrency=(1, 16),
                         num_buckets: int | None = None):
    """Video near-duplicate pairs over MEDIA_SCHEMA rows: frame-majority
    pHash per clip in an actor pool (small batches — video payloads are
    the largest), then the generic banded-Hamming self-join. Payloads
    never ride the pair shuffle. Returns (id_a, id_b, hamming)."""
    from merge_machine_ray.stages.dedup import hamming_near_dup_pairs

    sigs = ds.map_batches(VideoPHash,
                          fn_constructor_kwargs={
                              "decoder": decoder,
                              "frames_per_video": frames_per_video},
                          batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
    return hamming_near_dup_pairs(sigs, hash_col="vphash",
                                  id_col="media_id", bands=bands,
                                  max_hamming=max_hamming,
                                  block_cap=block_cap,
                                  num_buckets=num_buckets)


class AudioFPrint:
    """Actor-pool stage: audio binary → 64-bit perceptual fingerprint
    (``functions/audiofp.py``: 8×8 log-spectrogram energy grid,
    double-centered per row and column, sign bits). Decodable WAV
    hashes real samples; the stub tier hashes payload bytes (crc64)
    — exact-duplicate detection only."""

    def __init__(self, decoder: str = "wav"):
        if decoder == "librosa":
            _require(decoder, "librosa")
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        from merge_machine_ray.functions.audiofp import audio_fp64_i64

        hashes = []
        for payload in batch["payload"].to_pylist():
            if self.decoder == "wav":
                samples, rate = decode_wav(payload)
                hashes.append(audio_fp64_i64(samples, rate))
            else:
                u = crc_hash64(payload or b"")
                hashes.append(u - (1 << 64) if u >= (1 << 63) else u)
        return pa.table({"media_id": batch["media_id"].cast(pa.int64()),
                         "afp": pa.array(hashes, pa.int64())})


def audio_near_dup_pairs(ds, decoder: str = "wav", max_hamming: int = 6,
                         bands: int = 8, block_cap: int = 256,
                         batch_size: int = 64, concurrency=(1, 16),
                         num_buckets: int | None = None):
    """Audio near-duplicate pairs over MEDIA_SCHEMA rows: fingerprint
    per clip in an actor pool, then the generic banded-Hamming
    self-join (``stages/dedup.hamming_near_dup_pairs``). Payloads never
    ride the pair shuffle. Returns (id_a, id_b, hamming)."""
    from merge_machine_ray.stages.dedup import hamming_near_dup_pairs

    sigs = ds.map_batches(AudioFPrint,
                          fn_constructor_kwargs={"decoder": decoder},
                          batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
    return hamming_near_dup_pairs(sigs, hash_col="afp",
                                  id_col="media_id", bands=bands,
                                  max_hamming=max_hamming,
                                  block_cap=block_cap,
                                  num_buckets=num_buckets)


def image_near_dup_pairs(ds, decoder: str = "ppm", max_hamming: int = 6,
                         bands: int = 8, block_cap: int = 256,
                         batch_size: int = 64, concurrency=(1, 16),
                         num_buckets: int | None = None):
    """Visual near-duplicate pairs over an image table (MEDIA_SCHEMA):
    pHash per image in an actor pool (small batches — binary payloads),
    then the generic banded-Hamming self-join of
    ``stages/dedup.hamming_near_dup_pairs`` (8 × 8-bit segments; images
    within ``max_hamming`` ≤ 7 bits collide on ≥1 segment). The image
    payload never rides the pair shuffle — only 16-byte (band_key, id)
    rows and the 8-byte hashes do. Returns (id_a, id_b, hamming)."""
    from merge_machine_ray.stages.dedup import hamming_near_dup_pairs

    sigs = ds.map_batches(ImagePHash,
                          fn_constructor_kwargs={"decoder": decoder},
                          batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
    return hamming_near_dup_pairs(sigs, hash_col="phash",
                                  id_col="media_id", bands=bands,
                                  max_hamming=max_hamming,
                                  block_cap=block_cap,
                                  num_buckets=num_buckets)


def synth_media_table(n: int, kind: str = "image", seed: int = 42,
                      real: bool = True) -> pa.Table:
    """Deterministic media corpus for tests. ``real=True`` generates
    DECODABLE payloads (P6 PPM gradients / PCM WAV tones / rawvideo
    frame sequences); ``real=False`` keeps the opaque seeded bytes used
    to exercise the stub tier."""
    import random

    rows = []
    for i in range(n):
        rng = random.Random(f"{seed}:media:{i}")
        w = rng.choice([64, 80, 96]) if real else rng.choice([640, 800, 1024])
        h = rng.choice([48, 64]) if real else rng.choice([480, 600, 768])
        if not real:
            payload = bytes(rng.getrandbits(8) for _ in range(256))
            mime = {"image": "image/png", "audio": "audio/wav",
                    "video": "video/mp4"}[kind]
            dur = rng.randint(1000, 60000) if kind != "image" else -1
        elif kind == "image":
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([(xx * 255 // max(1, w - 1)),
                            (yy * 255 // max(1, h - 1)),
                            np.full((h, w), (i * 37) % 256)],
                           axis=-1).astype(np.uint8)
            payload, mime, dur = encode_ppm(img), "image/x-portable-pixmap", -1
        elif kind == "audio":
            rate, secs = 8000, 0.25
            t = np.arange(int(rate * secs)) / rate
            f0 = 200.0 + 50.0 * (i % 8)
            payload = encode_wav(0.5 * np.sin(2 * np.pi * f0 * t), rate)
            mime, dur = "audio/wav", int(secs * 1000)
            w = h = -1
        else:  # video
            nf = 4 + (i % 5)
            shade = np.arange(nf, dtype=np.uint8)[:, None, None, None]
            frames = np.broadcast_to(
                shade * (255 // max(1, nf - 1)), (nf, 16, 16, 3)).copy()
            payload = encode_rawvideo(frames)
            mime, dur = "video/x-raw", nf * 40
            w = h = 16
        rows.append({
            "media_id": i, "kind": kind, "payload": payload, "mime": mime,
            "width": w if kind == "image" else -1,
            "height": h if kind == "image" else -1,
            "duration_ms": dur if kind != "image" else -1,
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)
