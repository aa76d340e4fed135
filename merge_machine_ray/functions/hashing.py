"""Stable, process-independent hashing.

Python's builtin ``hash`` is salted per process (PYTHONHASHSEED) and
therefore unusable for distributed keys: a blocking key computed in one
Ray worker must equal the same key computed in another worker or in the
sequential oracle. Everything here is deterministic across processes.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_MASK64 = (1 << 64) - 1


def stable_hash64(s: str | bytes) -> int:
    """64-bit deterministic hash of a string (blake2b-based).

    Used for doc ids, pair keys and shingle hashing where collisions
    must be ~2^-64. Returns an unsigned 64-bit int.
    """
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")


def crc_hash64(s: str | bytes) -> int:
    """Fast 64-bit hash built from two crc32 passes (C speed).

    Weaker than blake2b but deterministic; used for shingle hashing in
    hot loops where blake2b per-shingle would dominate.
    """
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogatepass")
    # NOTE: the two passes must differ in message CONTENT, not crc seed —
    # crc32 is affine in the seed, so seed-salting yields hi = lo ^ f(len)
    # (only 32 bits of real entropy). Appending a salt byte makes the two
    # halves effectively independent.
    lo = zlib.crc32(s)
    hi = zlib.crc32(s + b"\x9e\x37")
    return ((hi << 32) | lo) & _MASK64


def hash_tokens_u64(tokens: list[str]) -> np.ndarray:
    """Vectorize-ish hashing of a token list to uint64 (deduplicated)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    seen = {crc_hash64(t) for t in tokens}
    return np.fromiter(seen, dtype=np.uint64, count=len(seen))
