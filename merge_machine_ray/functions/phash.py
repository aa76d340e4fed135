"""Perceptual image hashing (DCT pHash) — pure numpy, deterministic.

The standard image near-dup primitive (the visual analogue of
SimHash): luminance → exact integer-boundary area-mean resize to
32×32 → 2-D DCT-II → the 8×8 low-frequency block thresholded at its
median → 64 bits. Re-encodes, mild brightness shifts and small noise
move few bits; unrelated images differ in ~32. Pairs are then found
by the SAME banded Hamming self-join the text SimHash path uses
(`stages/dedup.hamming_near_dup_pairs`), so the multimodal axis rides
the proven light-shuffle machinery instead of growing its own.

Reference parity: Merge-Machine is text/CSV-only (no image surface);
this module belongs to the training-data extension surface. Algorithm
is the classic public pHash construction (Zauner 2010; the
`imagehash` library's `phash` uses the same DCT/median scheme).
"""

from __future__ import annotations

import numpy as np

_DCT_CACHE: dict[int, np.ndarray] = {}


def _dct_basis(n: int) -> np.ndarray:
    """Orthogonal DCT-II basis rows: B[k, m] = cos(pi*(m+0.5)*k/n).
    (No normalization — the median threshold is scale-invariant.)"""
    got = _DCT_CACHE.get(n)
    if got is None:
        k = np.arange(n, dtype=np.float64)[:, None]
        m = np.arange(n, dtype=np.float64)[None, :]
        got = np.cos(np.pi * (m + 0.5) * k / n)
        _DCT_CACHE[n] = got
    return got


def _area_mean_resize(gray: np.ndarray, out: int) -> np.ndarray:
    """Deterministic area-mean downscale to (out, out) with exact
    integer cell boundaries (boundary i = i*size // out). Inputs
    smaller than ``out`` on an axis are first nearest-upsampled by an
    integer factor so boundaries stay strictly increasing."""
    g = np.asarray(gray, dtype=np.float64)
    h, w = g.shape
    if h < out:
        g = np.repeat(g, -(-out // h), axis=0)
        h = g.shape[0]
    if w < out:
        g = np.repeat(g, -(-out // w), axis=1)
        w = g.shape[1]
    rb = (np.arange(out + 1, dtype=np.int64) * h) // out
    cb = (np.arange(out + 1, dtype=np.int64) * w) // out
    s = np.add.reduceat(np.add.reduceat(g, rb[:-1], axis=0), cb[:-1], axis=1)
    area = np.diff(rb)[:, None] * np.diff(cb)[None, :]
    return s / area


def phash64(img: np.ndarray, hash_size: int = 8,
            highfreq_factor: int = 4) -> int:
    """64-bit perceptual hash of an image array (H×W gray or H×W×3
    RGB, any numeric dtype). Bits are the row-major 8×8 low-frequency
    DCT block compared against its median (strictly-greater → 1), the
    exact `imagehash.phash` convention."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 3:
        a = a @ np.array([0.299, 0.587, 0.114])
    n = hash_size * highfreq_factor
    g = _area_mean_resize(a, n)
    basis = _dct_basis(n)
    low = (basis @ g @ basis.T)[:hash_size, :hash_size]
    bits = (low > np.median(low)).ravel()
    h = np.uint64(0)
    for i in np.flatnonzero(bits):
        h |= np.uint64(1) << np.uint64(int(i))
    return int(h)


def phash64_i64(img: np.ndarray) -> int:
    """phash64 reinterpreted as signed int64 (Arrow carrier form)."""
    u = phash64(img)
    return u - (1 << 64) if u >= (1 << 63) else u
