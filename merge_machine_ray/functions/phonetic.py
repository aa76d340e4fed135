"""Phonetic encoding for record-linkage blocking — SOUNDEX, the
classic name-matching key (Russell 1918; the standard cheap blocking
key for person/company names in every RL textbook, e.g. Christen's
"Data Matching" ch. 4). Two names that sound alike but are spelled
differently ("Smith"/"Smyth") collapse to the same 4-char code, so a
soundex blocking pass catches phonetic misspellings that prefix or
n-gram blocking miss.

Variant note (defined semantics, identical on both engines): the
simplified Soundex where ``h``/``w`` act like vowels (mapped to 0 and
removed after the adjacent-duplicate collapse) — the common database
variant; classic Soundex instead lets h/w join the digits around them.
Mapping: b f p v → 1 · c g j k q s x z → 2 · d t → 3 · l → 4 ·
m n → 5 · r → 6 · a e i o u y h w → 0. Code = first LETTER +
first three non-zero collapsed digits after the first, zero-padded;
non-letters are stripped first; a letterless input encodes as ''.

The batch kernel is fully vectorized: one flat uint8 byte scan over
the whole column (no per-row python), LUT digit mapping, row-tagged
adjacent-collapse, rank-limited scatter into an (n,4) byte matrix.
The SQL twin is GENERATED (``soundex_sql_expr``) as a translate +
bounded replace-chain — collapsing one digit's runs can never create
a new adjacency of another digit, so per-digit chains compose."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["soundex", "soundex_batch", "soundex_sql_expr"]

_CODES = "01230120022455012623010202"  # a..z


def soundex(name: str) -> str:
    """Scalar reference implementation (the batch kernel's oracle)."""
    letters = [c for c in name.lower() if "a" <= c <= "z"]
    if not letters:
        return ""
    digits = [_CODES[ord(c) - 97] for c in letters]
    collapsed = [digits[0]]
    for d in digits[1:]:
        if d != collapsed[-1]:
            collapsed.append(d)
    tail = [d for d in collapsed[1:] if d != "0"][:3]
    return (letters[0].upper() + "".join(tail)).ljust(4, "0")


def soundex_batch(names) -> pa.Array:
    """Vectorized soundex over a string Array/ChunkedArray; nulls and
    letterless values encode as ''."""
    import pyarrow.compute as pc

    if isinstance(names, pa.ChunkedArray):
        names = names.combine_chunks()
    n = len(names)
    if n == 0:
        return pa.array([], pa.string())
    low = pc.fill_null(pc.utf8_lower(names), "")
    if isinstance(low, pa.ChunkedArray):
        low = low.combine_chunks()
    buf_off = np.frombuffer(low.buffers()[1], dtype=np.int32,
                            count=n + 1 + low.offset)[low.offset:]
    data = np.frombuffer(low.buffers()[2], dtype=np.uint8)
    start, end = buf_off[0], buf_off[-1]
    flat = data[start:end]
    rows = np.repeat(np.arange(n), np.diff(buf_off))

    is_letter = (flat >= 97) & (flat <= 122)
    flat, rows = flat[is_letter], rows[is_letter]
    if flat.size == 0:  # no letters anywhere → every code is ''
        return pa.array([""] * n, pa.string())
    lut = np.zeros(256, np.uint8)
    lut[97:123] = np.frombuffer(_CODES.encode(), dtype=np.uint8) - 48
    d = lut[flat]

    # adjacent-duplicate collapse within each row
    keep = np.ones(flat.size, bool)
    keep[1:] = (rows[1:] != rows[:-1]) | (d[1:] != d[:-1])
    flat, rows, d = flat[keep], rows[keep], d[keep]

    # per-row rank after collapse
    starts = np.flatnonzero(np.concatenate(
        ([True], rows[1:] != rows[:-1])))
    sizes = np.diff(np.concatenate((starts, [rows.size])))
    rank = np.arange(rows.size) - np.repeat(starts, sizes)

    out = np.full((n, 4), ord("0"), np.uint8)
    has = np.zeros(n, bool)
    first = rank == 0
    has[rows[first]] = True
    out[rows[first], 0] = flat[first] - 32  # upper-case the letter

    dig = (rank >= 1) & (d != 0)
    # rank among the kept digits of the same row: running count minus
    # the count accumulated before the row started
    c = np.cumsum(dig)
    row_base = np.repeat(c[starts] - dig[starts].astype(np.int64), sizes)
    r2 = c - 1 - row_base
    sel = dig & (r2 < 3)
    out[rows[sel], 1 + r2[sel]] = d[sel] + 48

    codes = out.view("S4").ravel().astype("U4")
    codes[~has] = ""
    return pa.array(codes)


def soundex_sql_expr(col: str) -> str:
    """DuckDB expression computing the same simplified soundex —
    translate to digits, bounded per-digit replace chains for the
    adjacent collapse (inputs up to 2^5-long runs), then assemble."""
    letters = f"regexp_replace(lower({col}), '[^a-z]', '', 'g')"
    s = (f"translate({letters}, 'abcdefghijklmnopqrstuvwxyz', "
         f"'{_CODES}')")
    for dch in "0123456":
        for _ in range(5):
            s = f"replace({s}, '{dch}{dch}', '{dch}')"
    tail = f"substr(replace(substr({s}, 2), '0', ''), 1, 3)"
    return (f"CASE WHEN {letters} = '' THEN '' "
            f"ELSE rpad(upper(substr({letters}, 1, 1)) || {tail}, "
            f"4, '0') END")
