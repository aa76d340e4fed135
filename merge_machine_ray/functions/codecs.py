"""Pure-numpy codecs for UNCOMPRESSED media formats.

The sandbox has no image/audio libraries, but uncompressed formats need
none: P6 PPM is a text header + raw RGB bytes, PCM WAV is RIFF chunks +
raw samples, and the in-repo "rawvideo" container is a fixed header +
concatenated RGB frames. These make the multimodal stages REAL decode →
feature pipelines for such payloads; compressed formats (PNG/JPEG, MP3,
MP4) still require external decoders and raise ``NotImplementedError``
in the stages (`stages/multimodal.py`).
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------ PPM (P6)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 PPM."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM → (h, w, 3) uint8. Handles comment lines and
    arbitrary whitespace in the header per the netpbm spec."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":          # comment to end of line
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1                                       # single ws after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                         offset=pos)
    return data.reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index arrays — one numpy gather."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(max=h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(max=w - 1)
    return img[ys[:, None], xs[None, :]]


# ------------------------------------------------------------------ PCM WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float [-1, 1] mono → 16-bit PCM WAV."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ",
        16, 1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(pcm))
    return hdr + pcm


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """16-bit PCM WAV → (float64 samples in [-1, 1] of channel 0,
    sample_rate). Walks RIFF chunks, so extra chunks (LIST etc.) are
    tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, n_ch, bits, data = 12, None, 1, 16, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos:pos + 4], struct.unpack(
            "<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt, n_ch, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise ValueError("only 16-bit PCM WAV supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)               # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    if n_ch > 1:
        samples = samples[::n_ch]                  # channel 0
    return samples, rate


# --------------------------------------------------------------- raw video
#: magic + n_frames + w + h, then n_frames raw (h, w, 3) uint8 frames
_RAWVIDEO_MAGIC = b"RVID"


def encode_rawvideo(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 → in-repo uncompressed video container."""
    n, h, w = frames.shape[:3]
    return _RAWVIDEO_MAGIC + struct.pack("<III", n, w, h) + \
        frames.astype(np.uint8).tobytes()


def rawvideo_info(payload: bytes) -> tuple[int, int, int]:
    """→ (n_frames, w, h) without touching the frame data."""
    if payload[:4] != _RAWVIDEO_MAGIC:
        raise ValueError("not a rawvideo payload")
    return struct.unpack("<III", payload[4:16])


def decode_rawvideo_frame(payload: bytes, idx: int) -> np.ndarray:
    """Random-access decode of ONE frame — reads only that frame's
    bytes, the point of frame-sampling a video column."""
    n, w, h = rawvideo_info(payload)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} of {n}")
    frame_bytes = w * h * 3
    data = np.frombuffer(payload, dtype=np.uint8, count=frame_bytes,
                         offset=16 + idx * frame_bytes)
    return data.reshape(h, w, 3)
