"""MinHash / LSH banding / SimHash — deterministic, numpy-vectorized.

The Ray-native replacement for the reference's inverted-index candidate
retrieval (ES queries over analyzer sub-fields, SURVEY.md §2.5 J1): the
engine generates LSH band keys per document, groups by band key
(one shuffle), and emits candidate pairs inside each block.

All permutation parameters are derived from a pinned seed so signatures
are identical in every worker and the sequential oracle.
"""

from __future__ import annotations

import numpy as np

from merge_machine_ray.functions.hashing import crc_hash64, hash_tokens_u64

_MERSENNE61 = np.uint64((1 << 61) - 1)
_SEED = 42


def _permutations(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    # Random ODD 64-bit multipliers: multiplicative hashing mod 2^64
    # (natural uint64 wraparound). A small-modulus (a*x+b) mod p with
    # few wraps nearly preserves magnitude order and is NOT min-wise —
    # it produced Jaccard estimates biased by 2x in either direction.
    rng = np.random.RandomState(_SEED)
    a = ((rng.randint(1, 1 << 62, size=num_perm).astype(np.uint64)
          << np.uint64(1)) | np.uint64(1))
    b = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
    return a, b


_PERM_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _perms(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    if num_perm not in _PERM_CACHE:
        _PERM_CACHE[num_perm] = _permutations(num_perm)
    return _PERM_CACHE[num_perm]


def token_shingles(tokens: list[str], width: int = 3) -> list[str]:
    """w-token shingles joined by space; falls back to the tokens
    themselves when the doc is shorter than the shingle width."""
    if len(tokens) < width:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + width]) for i in range(len(tokens) - width + 1)]


def minhash_signature(shingles: list[str], num_perm: int = 128) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle set.

    h_i(x) = (a_i * h(x) + b_i) mod 2^61-1, min over shingles — the
    classic universal-hash construction; empty input → all MAX."""
    hashes = hash_tokens_u64(shingles)
    if hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    a, b = _perms(num_perm)
    # (num_perm, n): wraparound multiply + xorshift finalizer — unbiased
    # min-wise behavior verified empirically (J estimate within ±0.03)
    with np.errstate(over="ignore"):
        v = a[:, None] * hashes[None, :] + b[:, None]
        v ^= v >> np.uint64(33)
    return v.min(axis=1)


def band_keys(sig: np.ndarray, num_bands: int = 16, prefix: str = "") -> list[str]:
    """LSH band keys: split the signature into ``num_bands`` rows and
    hash each band. Two docs share a key iff a whole band matches."""
    rows = sig.size // num_bands
    keys = []
    for b in range(num_bands):
        band = sig[b * rows : (b + 1) * rows]
        keys.append(f"{prefix}{b}:{crc_hash64(band.tobytes()):016x}")
    return keys


# --------------------------------------------------------------------------
# Vectorized flat-array core (round 3). The per-row path above builds w-token
# shingle STRINGS and crc-hashes each one — measured ~8 s of pure python per
# 1.05M docs in the blocking stage. The flat core hashes every document of a
# batch in a handful of numpy passes: element hashes → polynomial window
# hashes (one fused multiply-add per window position) → min-wise signatures
# via ``np.minimum.reduceat`` over per-doc segments → band keys by a second
# polynomial fold. All wraparound-uint64, deterministic across processes.
# --------------------------------------------------------------------------

_POLY = np.uint64(0x9E3779B97F4A7C15)  # odd golden-gamma multiplier
_SM1 = np.uint64(0xBF58476D1CE4E5B9)
_SM2 = np.uint64(0x94D049BB133111EB)
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_MASK63 = np.uint64((1 << 63) - 1)


def mix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, elementwise uint64 (wraparound multiply)."""
    v = np.asarray(v, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        v ^= v >> np.uint64(30)
        v *= _SM1
        v ^= v >> np.uint64(27)
        v *= _SM2
        v ^= v >> np.uint64(31)
    return v


def poly_window_hashes(elems: np.ndarray, offsets: np.ndarray,
                       width: int) -> tuple[np.ndarray, np.ndarray]:
    """Window (shingle) hashes of every segment of a flat element array.

    ``elems``: uint64 element hashes of all docs concatenated;
    ``offsets``: int64[n+1] segment bounds. Per segment of length m:
    m-width+1 windows of ``width`` elements (one window of all m when
    0 < m < width, zero when m == 0), hash = mix64(polynomial fold).
    Returns (window_hashes, window_offsets) in segment order — the same
    semantics as ``token_shingles`` + per-shingle hashing, minus the
    string building.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    assert offsets[0] == 0 and offsets[-1] == elems.size, \
        "offsets must compactly span elems (offsets[0]==0)"
    n = offsets.size - 1
    lengths = np.diff(offsets)
    counts = np.where(lengths == 0, 0,
                      np.where(lengths < width, 1, lengths - width + 1))
    sh_off = np.concatenate(([0], np.cumsum(counts)))
    sh = np.empty(sh_off[-1], dtype=np.uint64)
    if elems.size:
        doc_of = np.repeat(np.arange(n), lengths)
        within = np.arange(elems.size) - offsets[:-1][doc_of]
        full = (lengths[doc_of] >= width) & (within <= lengths[doc_of] - width)
        starts = np.flatnonzero(full)
        with np.errstate(over="ignore"):
            acc = elems[starts].copy()
            for k in range(1, width):
                acc *= _POLY
                acc += elems[starts + k]
        sh[sh_off[doc_of[starts]] + within[starts]] = mix64(acc)
        for ell in range(1, width):
            short = np.flatnonzero(lengths == ell)
            if not short.size:
                continue
            st = offsets[:-1][short]
            with np.errstate(over="ignore"):
                acc = elems[st].copy()
                for k in range(1, ell):
                    acc *= _POLY
                    acc += elems[st + k]
            sh[sh_off[short]] = mix64(acc)
    return sh, sh_off


#: transient-size caps for the (perm_chunk × window_chunk) hash matrix.
#: The transient must stay CACHE-resident: perm_chunk 16 × window_chunk
#: 2^15 × 8 B = 4 MB. The previous 2^19 window chunk (64 MB) thrashed
#: L3 and ran this exact function 13× slower (13.1 s vs 1.0 s per 2.4M
#: windows, byte-identical output) — and worse under 32-way task
#: contention for the shared cache.
_PERM_CHUNK = 16
_WINDOW_CHUNK = 1 << 15


def minhash_from_flat(sh: np.ndarray, sh_off: np.ndarray,
                      num_perm: int = 128) -> np.ndarray:
    """Min-wise signatures (n_docs × num_perm uint64) of flat window
    hashes: v = mix(a_p·x + b_p), min per segment via
    ``np.minimum.reduceat``. Empty segments get all-MAX (same convention
    as :func:`minhash_signature`). Chunked over perms and docs so the
    transient matrix stays cache-resident (see _WINDOW_CHUNK note)."""
    sh_off = np.asarray(sh_off, dtype=np.int64)
    n = sh_off.size - 1
    out = np.full((n, num_perm), _U64_MAX, dtype=np.uint64)
    if sh.size == 0 or n == 0:
        return out
    a, b = _perms(num_perm)
    counts = np.diff(sh_off)
    nonempty = np.flatnonzero(counts)
    ends = sh_off[nonempty + 1]
    # greedy doc sub-ranges whose window span stays under the chunk cap
    # (one searchsorted per CHUNK, not per doc)
    cuts = [0]
    while True:
        start = cuts[-1]
        j = int(np.searchsorted(
            ends, sh_off[nonempty[start]] + _WINDOW_CHUNK, side="right"))
        j = max(j, start + 1)  # an oversized single doc still processes
        if j >= nonempty.size:
            break
        cuts.append(j)
    cuts.append(nonempty.size)
    for c0, c1 in zip(cuts[:-1], cuts[1:]):
        docs = nonempty[c0:c1]
        if not docs.size:
            continue
        lo = sh_off[docs[0]]
        hi = sh_off[docs[-1] + 1]
        seg = sh[lo:hi]
        red_idx = (sh_off[docs] - lo).astype(np.int64)
        for p0 in range(0, num_perm, _PERM_CHUNK):
            ap = a[p0:p0 + _PERM_CHUNK]
            bp = b[p0:p0 + _PERM_CHUNK]
            with np.errstate(over="ignore"):
                v = ap[:, None] * seg[None, :] + bp[:, None]
                v ^= v >> np.uint64(33)
            out[docs, p0:p0 + ap.size] = \
                np.minimum.reduceat(v, red_idx, axis=1).T
    return out


def band_keys_from_sigs(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """LSH band keys (n_docs × num_bands int64, 63-bit non-negative)
    from signature rows: polynomial fold of each band's r signature
    values seeded by the band index, splitmix-finalized."""
    n, num_perm = sigs.shape
    r = num_perm // num_bands
    s3 = sigs[:, : num_bands * r].reshape(n, num_bands, r)
    acc = np.broadcast_to(
        np.arange(1, num_bands + 1, dtype=np.uint64), (n, num_bands)).copy()
    with np.errstate(over="ignore"):
        for j in range(r):
            acc *= _POLY
            acc += s3[:, :, j]
    return (mix64(acc) & _MASK63).astype(np.int64)


def banded_minhash(elems: np.ndarray, offsets: np.ndarray, num_perm: int,
                   num_bands: int, width: int,
                   scheme: str = "kperm") -> np.ndarray:
    """elems+offsets → (n_docs × num_bands) band keys (the fused path
    used by the blocking / linking / near-dup band stages).

    ``scheme="kperm"`` (default) is the classic k-permutation minhash;
    ``"oph"`` opts into one-permutation hashing — O(windows) instead of
    O(windows × num_perm), sound only for long documents (see the OPH
    block comment at the bottom of this module for the measured
    trade-off)."""
    sh, sh_off = poly_window_hashes(elems, offsets, width)
    fn = minhash_from_flat if scheme == "kperm" else minhash_from_flat_oph
    return band_keys_from_sigs(fn(sh, sh_off, num_perm), num_bands)


def string_shingle_hashes(flat_tokens, offsets: np.ndarray,
                          width: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized twin of ``token_shingles`` + per-shingle
    ``crc_hash64`` over every row of a flat token column: w-token
    space-joined shingle STRINGS built with Arrow take+join (short rows
    0<m<width give one shingle of all m tokens; empty rows none), crc
    computed once per DISTINCT shingle via dictionary encoding.
    Returns (shingle_hashes uint64 flat, shingle_offsets int64[n+1]) in
    row order — byte-identical hash values to the scalar path."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from merge_machine_ray.functions.hashing import crc_hash64

    if not isinstance(flat_tokens, (pa.Array, pa.ChunkedArray)):
        flat_tokens = pa.array(flat_tokens, pa.string())
    if isinstance(flat_tokens, pa.ChunkedArray):
        flat_tokens = flat_tokens.combine_chunks()
    offsets = np.asarray(offsets, dtype=np.int64)
    n = offsets.size - 1
    lengths = np.diff(offsets)
    counts = np.where(lengths == 0, 0,
                      np.where(lengths < width, 1, lengths - width + 1))
    sh_off = np.concatenate(([0], np.cumsum(counts)))
    total = int(sh_off[-1])
    if total == 0:
        return np.empty(0, np.uint64), sh_off
    # shingle strings, grouped by arity: full windows (width tokens)
    # in one join; short rows of length ell in one join per ell < width
    parts: list[tuple[np.ndarray, pa.Array]] = []  # (dest slots, strings)
    full_rows = lengths >= width
    if full_rows.any():
        starts_per_row = offsets[:-1][full_rows]
        cnt_full = (lengths[full_rows] - width + 1)
        base = np.repeat(starts_per_row, cnt_full)
        within = (np.arange(int(cnt_full.sum()))
                  - np.repeat(np.concatenate(
                      ([0], np.cumsum(cnt_full)))[:-1], cnt_full))
        w0 = base + within
        cols = [flat_tokens.take(pa.array(w0 + k)) for k in range(width)]
        sep = pa.nulls(w0.size, pa.string()).fill_null(" ")
        joined = (pc.binary_join_element_wise(*cols, sep)
                  if width > 1 else cols[0])
        dest = np.repeat(sh_off[:-1][full_rows], cnt_full) + within
        parts.append((dest, joined))
    for ell in range(1, width):
        rows = lengths == ell
        if not rows.any():
            continue
        st = offsets[:-1][rows]
        cols = [flat_tokens.take(pa.array(st + k)) for k in range(ell)]
        if ell > 1:
            sep = pa.nulls(st.size, pa.string()).fill_null(" ")
            joined = pc.binary_join_element_wise(*cols, sep)
        else:
            joined = cols[0]
        parts.append((sh_off[:-1][rows], joined))
    all_str = pa.concat_arrays([p[1].combine_chunks()
                                if isinstance(p[1], pa.ChunkedArray)
                                else p[1] for p in parts])
    enc = pc.dictionary_encode(all_str)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    vocab_h = np.fromiter((crc_hash64(s)
                           for s in enc.dictionary.to_pylist()),
                          dtype=np.uint64, count=len(enc.dictionary))
    flat_h = vocab_h[enc.indices.to_numpy(zero_copy_only=False)
                     .astype(np.int64)]
    sh = np.empty(total, np.uint64)
    pos = 0
    for dest, arr in parts:
        sh[dest] = flat_h[pos:pos + len(arr)]
        pos += len(arr)
    return sh, sh_off


def band_crc_keys(sigs: np.ndarray, num_bands: int) -> np.ndarray:
    """(n × num_bands) int64 band keys with the SCALAR family:
    ``crc_hash64(bytes([b]) + sig_band.tobytes()) & MASK63`` — the
    per-(row, band) crc stays a python loop (zlib has no batch API) but
    everything else is vectorized; used by the string-shingle consumers
    (near-dup MinHashFeatures, LinkBandKeys) for key stability."""
    import zlib

    n, num_perm = sigs.shape
    r = num_perm // num_bands
    out = np.empty((n, num_bands), np.int64)
    mask = int(_MASK63)
    sig_v = np.ascontiguousarray(sigs[:, :num_bands * r]).view(np.uint8) \
        .reshape(n, num_bands, r * 8)
    # streaming form of hashing.crc_hash64(prefix + data):
    # crc32(prefix+data) == crc32(data, crc32(prefix)) and the salted
    # high half appends AFTER the payload, so both halves compute with
    # zero per-call byte concatenation (numpy rows pass as buffers)
    crc32 = zlib.crc32
    pre = [crc32(bytes([b])) for b in range(num_bands)]
    salt = b"\x9e\x37"
    for i in range(n):
        row = sig_v[i]
        for b in range(num_bands):
            lo = crc32(row[b], pre[b])
            hi = crc32(salt, lo)
            out[i, b] = ((hi << 32) | lo) & mask
    return out


def str_elem_hashes(flat_tokens, crc=None) -> np.ndarray:
    """uint64 element hashes of a flat token sequence (pyarrow
    StringArray or python list), crc-hashed ONCE PER DISTINCT token via
    dictionary encoding, then splitmix-mixed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from merge_machine_ray.functions.hashing import crc_hash64

    crc = crc or crc_hash64
    if not isinstance(flat_tokens, (pa.Array, pa.ChunkedArray)):
        flat_tokens = pa.array(flat_tokens, pa.string())
    if len(flat_tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    enc = pc.dictionary_encode(flat_tokens)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    vocab = enc.dictionary.to_pylist()
    uh = mix64(np.fromiter((crc(t) for t in vocab), dtype=np.uint64,
                           count=len(vocab)))
    return uh[enc.indices.to_numpy(zero_copy_only=False)]


def int_elem_hashes(values: np.ndarray) -> np.ndarray:
    """uint64 element hashes of integer token hashes (sign-extended then
    splitmix-mixed; int32 and int64 inputs agree on shared values)."""
    return mix64(np.asarray(values).astype(np.int64).astype(np.uint64))


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash of a token multiset (weighted bit-vote)."""
    if not tokens:
        return 0
    votes = np.zeros(64, dtype=np.int64)
    from collections import Counter

    for tok, w in Counter(tokens).items():
        h = crc_hash64(tok)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes += np.where(bits.astype(bool), w, -w)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash64_batch(tok_hashes: np.ndarray, offsets: np.ndarray,
                    n: int) -> np.ndarray:
    """Vectorized :func:`simhash64` over a flat token-hash array with
    per-doc ``offsets`` (occurrences row-grouped, as flat tokenizers
    emit them): positive-bit counts accumulate per doc with contiguous
    ``np.add.reduceat`` (no elementwise scatter), and the sign rule
    votes > 0 ⟺ 2·pos_count > total reproduces the scalar form exactly
    (per-occurrence ±1 == Counter-weighted ±w; empty doc → 0)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    counts = np.diff(offsets)
    out = np.zeros(n, np.uint64)
    nonempty = np.flatnonzero(counts > 0)
    if nonempty.size == 0:
        return out
    red = offsets[:-1][nonempty]
    h = tok_hashes.astype(np.uint64, copy=False)
    shifts = np.arange(64, dtype=np.uint64)
    votes_pos = np.empty((nonempty.size, 64), np.int64)
    CH = 16  # bit-group chunk: bits matrix stays ~occurrences×16 bytes
    for b0 in range(0, 64, CH):
        bits = ((h[:, None] >> shifts[None, b0:b0 + CH])
                & np.uint64(1)).astype(np.uint8)
        votes_pos[:, b0:b0 + CH] = np.add.reduceat(
            bits, red, axis=0, dtype=np.int64)
    tot = counts[nonempty][:, None]
    pos = (votes_pos * 2) > tot
    acc = np.zeros(nonempty.size, np.uint64)
    for b in range(64):
        acc |= pos[:, b].astype(np.uint64) << np.uint64(b)
    out[nonempty] = acc
    return out


# --------------------------------------------------------------------------
# One-permutation hashing (OPH) — OPT-IN scale path for LONG documents.
#
# Li/Owen/Zhang (NIPS 2012) hash each window ONCE and bucket it by its
# top log2(num_perm) bits; Shrivastava/Li (ICML 2014) rotation
# densification fills empty buckets from the nearest occupied one. That
# replaces the k-permutation O(windows × num_perm) matrix with
# O(windows) — but it is only SOUND when the window set is much larger
# than the bucket count. Measured on this repo's bench corpus (median
# ~33 tokens/doc → ~31 windows into 128 buckets): densified runs copy a
# shared minimum across whole bands, band collisions go spurious, and
# candidate pairs exploded 0.6M → 5.6M with scoring CPU 6.9 s → 429 s —
# strictly worse than k-perm. For corpora of real web pages (10³–10⁵
# windows/doc) the occupancy condition holds and OPH is the right
# default; callers opt in per corpus.
# --------------------------------------------------------------------------


def _oph_shift(num_perm: int) -> np.uint64:
    """Right-shift mapping a uint64 hash's top bits to a bucket index;
    one-permutation bucketing needs a power-of-two bucket count."""
    assert num_perm > 0 and (num_perm & (num_perm - 1)) == 0, \
        f"num_perm must be a power of two for one-permutation hashing " \
        f"(got {num_perm})"
    return np.uint64(65 - num_perm.bit_length())


def _oph_densify(out: np.ndarray) -> np.ndarray:
    """Rotation densification of an (n_docs × num_perm) one-permutation
    bucket-minimum matrix, in place: every EMPTY bucket (MAX sentinel)
    borrows the value of the nearest occupied bucket to its left,
    wrapping circularly. Fully-empty rows (empty docs) stay all-MAX."""
    filled = out != _U64_MAX
    rows_any = filled.any(axis=1)
    todo = rows_any & ~filled.all(axis=1)
    if not todo.any():
        return out
    sub = out[todo]
    f = filled[todo]
    n, k = sub.shape
    idx = np.where(f, np.arange(k, dtype=np.int64)[None, :], -1)
    ff = np.maximum.accumulate(idx, axis=1)   # last occupied col ≤ j
    ff = np.where(ff < 0, ff[:, -1][:, None], ff)  # wrap leading empties
    out[todo] = sub[np.arange(n)[:, None], ff]
    return out


def minhash_from_flat_oph(sh: np.ndarray, sh_off: np.ndarray,
                          num_perm: int = 128) -> np.ndarray:
    """OPH twin of :func:`minhash_from_flat` (see block comment above
    for when to use it): per-(doc, bucket) minima via one argsort +
    ``np.minimum.reduceat`` over the flat (doc·num_perm + bucket) key,
    then rotation densification. Empty segments get all-MAX."""
    sh_off = np.asarray(sh_off, dtype=np.int64)
    n = sh_off.size - 1
    out = np.full((n, num_perm), _U64_MAX, dtype=np.uint64)
    if sh.size == 0 or n == 0:
        return out
    counts = np.diff(sh_off)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    key = doc_of * num_perm + (sh >> _oph_shift(num_perm)).astype(np.int64)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
    out.ravel()[ks[starts]] = np.minimum.reduceat(sh[order], starts)
    return _oph_densify(out)
