"""Perceptual audio fingerprinting — pure numpy, deterministic.

The audio analogue of image pHash: a 64-bit clip fingerprint from the
sign structure of a coarse log-spectrogram. The clip is framed
(Hann-windowed rFFT power), pooled into an 8 time-segment × 8
log-band energy grid, log-taken, then DOUBLE-CENTERED (subtract row
and column means, add the grand mean) and thresholded at zero — one
bit per cell, row-major. Double-centering removes the per-segment
loudness profile and the global spectral tilt (what all clips of a
genre share), keeping the clip-specific time×frequency interaction
structure; log + centering makes the hash EXACTLY gain-invariant.

Measured on synthetic corpora (see tests): re-gained copies flip 0
bits, 2–10 % additive noise flips ≤3 bits on broadband clips (narrow
tonal clips are softer — their off-bands are noise-dominated — ~12
bits at 5 % noise), unrelated clips differ by ~28–36. Pairs are found
by the same banded Hamming self-join the text SimHash and image pHash
paths use (`stages/dedup.hamming_near_dup_pairs`).

Construction follows the public spectrogram-hash family (Haitsma &
Kalker 2002's band-energy sign features; pHash-style
median/mean-threshold pooling); no external-library code involved.
"""

from __future__ import annotations

import numpy as np

_LOG_FLOOR = 1e-300


def _strictly_increasing(edges: np.ndarray, hi: int) -> np.ndarray:
    for i in range(1, len(edges)):
        if edges[i] <= edges[i - 1]:
            edges[i] = edges[i - 1] + 1
    return np.minimum(edges, hi)


def audio_fp64(samples: np.ndarray, rate: int, frame: int = 512,
               hop: int = 256, n_time: int = 8, n_bands: int = 8) -> int:
    """64-bit clip fingerprint of a mono float signal (see module
    docstring). Empty / too-short clips (< frame+hop samples) hash
    to 0."""
    x = np.asarray(samples, dtype=np.float64)
    if x.size < frame + hop:
        return 0
    n_frames = 1 + (x.size - frame) // hop
    idx = (np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None])
    win = x[idx] * np.hanning(frame)[None, :]
    spec = np.abs(np.fft.rfft(win, axis=1)) ** 2
    n_bins = spec.shape[1]

    # 8 log-spaced bands between 50 Hz and 0.45·rate
    freqs = np.geomspace(50.0, 0.45 * rate, n_bands + 1)
    edges = _strictly_increasing(
        np.clip((freqs * frame / rate).astype(np.int64), 1, n_bins - 1),
        n_bins - 1)
    cum = np.concatenate([np.zeros((n_frames, 1)), np.cumsum(spec, 1)], 1)
    e = cum[:, edges[1:]] - cum[:, edges[:-1]]            # (frames, nb)

    # 8 equal time segments (boundaries bumped when frames < 8)
    tb = _strictly_increasing(
        (np.arange(n_time + 1, dtype=np.int64) * n_frames) // n_time,
        n_frames)
    tb[0] = 0
    ecum = np.concatenate([np.zeros((1, n_bands)), np.cumsum(e, 0)], 0)
    g = ecum[tb[1:], :] - ecum[tb[:-1], :]                # (nt, nb)

    lg = np.log(np.maximum(g, _LOG_FLOOR))
    dc = (lg - lg.mean(axis=1, keepdims=True)
          - lg.mean(axis=0, keepdims=True) + lg.mean())
    bits = (dc > 0).ravel()
    h = np.uint64(0)
    for i in np.flatnonzero(bits):
        h |= np.uint64(1) << np.uint64(int(i))
    return int(h)


def audio_fp64_i64(samples: np.ndarray, rate: int) -> int:
    """audio_fp64 reinterpreted as signed int64 (Arrow carrier)."""
    u = audio_fp64(samples, rate)
    return u - (1 << 64) if u >= (1 << 63) else u
