"""Tokenizers ("analyzers") — pure-function re-implementations of the
reference's Elasticsearch analyzers (SURVEY.md §2.3).

Each analyzer maps one string → list of tokens, deterministically. The
reference executes these inside ES/Lucene as JSON configs
(``merge_machine/analyzers/no_resource_analyzer_definitions.py``,
``resource_analyzer_definitions.py``); here they are plain Python used
by blocking-key generation and by the pairwise scorer's features.

Registry: :data:`ANALYZERS` name → fn, mirroring the reference's
``ANALYZERS`` dict (``merge_machine/analyzers/__init__.py:13-26``).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from merge_machine_ray.functions.normalize import normalize_text

_WORD_RE = re.compile(r"[a-z0-9]+")
_WORD_ACCENT_RE = re.compile(r"[^\W_]+", re.UNICODE)
_INT_RE = re.compile(r"\d+")

# RE2 twin of python's word class [^\W_]: python \w ⊂ RE2 [\p{L}\p{N}]
# exactly, EXCEPT 4388 codepoints RE2's newer Unicode tables classify
# as letters/digits that python 3.11's do not (all SMP, 16 contiguous
# ranges, verified by exhaustive scan over every assigned codepoint).
# The separator pattern below therefore also breaks on those extras —
# split output equals _WORD_ACCENT_RE.findall byte-for-byte.
_RE2_WORD_EXTRAS = (
    r"\x{1123F}-\x{11240}\x{11F02}\x{11F04}-\x{11F10}"
    r"\x{11F12}-\x{11F33}\x{11F50}-\x{11F59}\x{1342F}"
    r"\x{13441}-\x{13446}\x{1B132}\x{1B155}\x{1D2C0}-\x{1D2D3}"
    r"\x{1DF25}-\x{1DF2A}\x{1E030}-\x{1E06D}\x{1E4D0}-\x{1E4EB}"
    r"\x{1E4F0}-\x{1E4F9}\x{2B739}\x{31350}-\x{323AF}"
)
_RE2_SEP_PLUS = r"(?:[^\p{L}\p{N}]|[" + _RE2_WORD_EXTRAS + r"])+"
# same story for \d vs \p{Nd}: two Unicode-15 digit ranges RE2 knows
# and python 3.11 does not (exhaustive scan)
_RE2_DIGIT_SEP_PLUS = (
    r"(?:[^\p{Nd}]|[\x{11F50}-\x{11F59}\x{1E4F0}-\x{1E4F9}])+")


def standard_tokens_flat(arr):
    """Vectorized twin of ``standard`` over a whole Arrow string column:
    → (flat token StringArray, int64 offsets[n+1]) in row order,
    byte-identical to ``[_WORD_ACCENT_RE.findall(s.lower()) ...]``.

    Exactness (property-tested): the RE2 separator class above matches
    python's \\w complement exactly; the one str.lower/utf8_lower
    divergence (U+0130 → 'i'+U+0307 in python, 'i' in Arrow) is
    pre-substituted."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    arr = pc.fill_null(arr, "")
    arr = pc.replace_substring(arr, "İ", "i̇")
    low = pc.utf8_lower(arr)
    la = pc.split_pattern_regex(low, _RE2_SEP_PLUS)
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    off = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = la.values.slice(off[0], int(off[-1] - off[0])) if n \
        else pa.array([], pa.string())
    off = off - off[0]
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False) \
        if len(flat) else np.empty(0, bool)
    rows = np.repeat(np.arange(n), np.diff(off))
    counts = np.bincount(rows[nonempty], minlength=n)
    new_off = np.concatenate(([0], np.cumsum(counts)))
    return flat.filter(pa.array(nonempty)), new_off


def integer_tokens_flat(arr):
    """Vectorized twin of ``integers`` (``_INT_RE.findall``, python \\d
    digit runs) over an Arrow string column → (flat tokens, offsets);
    byte-identical by the digit-class scan above (no lowering — \\d is
    case-free)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    la = pc.split_pattern_regex(pc.fill_null(arr, ""),
                                _RE2_DIGIT_SEP_PLUS)
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    off = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = la.values.slice(off[0], int(off[-1] - off[0])) if n \
        else pa.array([], pa.string())
    off = off - off[0]
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False) \
        if len(flat) else np.empty(0, bool)
    rows = np.repeat(np.arange(n), np.diff(off))
    counts = np.bincount(rows[nonempty], minlength=n)
    new_off = np.concatenate(([0], np.cumsum(counts)))
    return flat.filter(pa.array(nonempty)), new_off
_ELISION_RE = re.compile(r"^(l|d|j|m|t|s|c|n|qu|jusqu|lorsqu|puisqu)'")

# French stopwords (subset of Lucene's french stop set — pinned).
FRENCH_STOP = frozenset(
    "au aux avec ce ces dans de des du elle en et eux il ils je la le les leur lui "
    "ma mais me meme mes moi mon ne nos notre nous on ou par pas pour qu que qui sa "
    "se ses son sur ta te tes toi ton tu un une vos votre vous".split()
)
ENGLISH_STOP = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such that "
    "the their then there these they this to was will with".split()
)
# Domain stopwords of the reference's french_estab analyzer
# (no_resource_analyzer_definitions.py:16-97).
ESTAB_STOP = frozenset("cedex sas sarl sa eurl sasu snc scop ste societe".split())
# Abbreviation + acronym synonym rules of french_estab (same citation);
# one-way canonicalization abbreviation → expansion.
ESTAB_SYNONYMS: dict[str, str] = {
    "lyc": "lycee", "lyc.": "lycee", "lp": "lycee", "lgt": "lycee",
    "col": "college", "coll": "college", "clg": "college",
    "ec": "ecole", "elem": "elementaire", "mat": "maternelle",
    "univ": "universite", "fac": "universite", "iut": "institut",
    "assoc": "association", "asso": "association",
    "st": "saint", "ste": "sainte", "gal": "general", "gd": "grand",
    "av": "avenue", "bd": "boulevard", "pl": "place", "rte": "route",
    "cnrs": "centre national de la recherche scientifique",
    "inra": "institut national de la recherche agronomique",
    "cea": "commissariat a l energie atomique",
    "inserm": "institut national de la sante et de la recherche medicale",
    "inria": "institut national de recherche en informatique et en automatique",
}
_STEM_SUFFIXES = ("issements", "issement", "ements", "ement", "euses", "euse",
                  "istes", "iste", "ives", "ive", "es", "s")


def special_keyword(s: str) -> list[str]:
    """A1 (default analyzer): '-'→space, accent fold, lowercase, one
    token = whole field (reference no_resource_analyzer_definitions.py:105-119)."""
    t = normalize_text(s.replace("-", " ") if isinstance(s, str) else s)
    return [t] if t else []


def standard(s: str) -> list[str]:
    """A7 'standard': unicode word tokens, lowercased (accents kept,
    as ES standard does not fold)."""
    if not isinstance(s, str):
        return []
    return _WORD_ACCENT_RE.findall(s.lower())


def whitespace(s: str) -> list[str]:
    if not isinstance(s, str):
        return []
    return s.split()


def n_grams(s: str, n: int = 3) -> list[str]:
    """A2: char n-grams over letter+digit runs of the normalized string
    (reference no_resource_analyzer_definitions.py:125-144: token_chars
    letters+digits, min=max=3, lowercase)."""
    out: list[str] = []
    for run in _WORD_RE.findall(normalize_text(s)):
        if len(run) < n:
            out.append(run)
        else:
            out.extend(run[i : i + n] for i in range(len(run) - n + 1))
    return out


def integers(s: str, max_shingle: int = 5) -> list[str]:
    """A3: digit runs → trim leading zeros → shingles up to 5 joined by ''
    (reference no_resource_analyzer_definitions.py:152-182)."""
    if not isinstance(s, str):
        return []
    ints = [run.lstrip("0") or "0" for run in _INT_RE.findall(s)]
    out: list[str] = []
    for size in range(1, max_shingle + 1):
        if len(ints) < size:
            break
        out.extend("".join(ints[i : i + size]) for i in range(len(ints) - size + 1))
    return out


def integer_shingle_tokens_flat(arr, max_shingle: int = 5):
    """Vectorized twin of ``integers`` over an Arrow string column →
    (row_ids int64, shingle tokens StringArray) as an UNORDERED
    (row, token) multiset — per-row token SETS equal the scalar
    analyzer's (consumers hash + dedupe per row, so emission order is
    immaterial)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    iflat, ioff = integer_tokens_flat(arr)
    if len(iflat):
        trimmed = pc.utf8_ltrim(iflat, "0")
        iflat = pc.if_else(pc.equal(trimmed, ""), pa.scalar("0"), trimmed)
        if isinstance(iflat, pa.ChunkedArray):
            iflat = iflat.combine_chunks()
    n = ioff.size - 1
    lens = np.diff(ioff)
    rows_parts: list[np.ndarray] = []
    tok_parts: list[pa.Array] = []
    for size in range(1, max_shingle + 1):
        cnt = np.maximum(lens - size + 1, 0) * (lens >= size)
        total = int(cnt.sum())
        if total == 0:
            continue
        base = np.repeat(ioff[:-1], cnt)
        within = (np.arange(total)
                  - np.repeat(np.concatenate(
                      ([0], np.cumsum(cnt)))[:-1], cnt))
        w0 = base + within
        cols = [iflat.take(pa.array(w0 + k)) for k in range(size)]
        if size > 1:
            sep = pa.nulls(total, pa.string()).fill_null("")
            joined = pc.binary_join_element_wise(*cols, sep)
            if isinstance(joined, pa.ChunkedArray):
                joined = joined.combine_chunks()
        else:
            joined = cols[0]
        rows_parts.append(np.repeat(np.arange(n), cnt))
        tok_parts.append(joined)
    if not rows_parts:
        return np.empty(0, np.int64), pa.array([], pa.string())
    return (np.concatenate(rows_parts),
            pa.concat_arrays([t.combine_chunks()
                              if isinstance(t, pa.ChunkedArray) else t
                              for t in tok_parts]))


def _light_stem_fr(tok: str) -> str:
    for suf in _STEM_SUFFIXES:
        if tok.endswith(suf) and len(tok) - len(suf) >= 3:
            return tok[: -len(suf)]
    return tok


def french_estab(s: str) -> list[str]:
    """A4: standard tokens → elision → stop (french + domain) →
    abbreviation/acronym synonyms → light french stem
    (reference no_resource_analyzer_definitions.py:16-97)."""
    out: list[str] = []
    for tok in _WORD_RE.findall(normalize_text(s).replace("'", "' ")):
        tok = _ELISION_RE.sub("", tok)
        if not tok or tok in FRENCH_STOP or tok in ESTAB_STOP:
            continue
        expanded = ESTAB_SYNONYMS.get(tok, tok)
        for part in expanded.split():
            if part not in FRENCH_STOP:
                out.append(_light_stem_fr(part))
    return out


def french(s: str) -> list[str]:
    """A7 stock 'french': normalized word tokens minus stopwords, light stem."""
    return [
        _light_stem_fr(t)
        for t in _WORD_RE.findall(normalize_text(s))
        if t not in FRENCH_STOP
    ]


def english(s: str) -> list[str]:
    return [t for t in _WORD_RE.findall(normalize_text(s)) if t not in ENGLISH_STOP]


def city(s: str, keep: frozenset[str] | None = None,
         synonyms: dict[str, str] | None = None) -> list[str]:
    """A5 resource analyzer: shingled tokens (space-joined, the stock
    ``shingle`` filter) → length ≥ 4 → keep list → synonym
    canonicalization (reference resource_analyzer_definitions.py:
    116-170, chain asciifolding→shingle→city_length→city_keep→
    city_synonym). Defaults to the shipped public city tables
    (functions/resources.py); custom tables are injectable."""
    if keep is None and synonyms is None:
        from merge_machine_ray.functions.resources import (
            CITY_KEEP,
            CITY_SYNONYMS,
        )

        keep, synonyms = CITY_KEEP, CITY_SYNONYMS
    toks = _WORD_RE.findall(normalize_text(s))
    shingles = toks + [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    out = []
    for sh in shingles:
        if len(sh) < 4:
            continue
        if keep is not None and sh not in keep:
            continue
        out.append((synonyms or {}).get(sh, sh))
    return out


def country(s: str, keep: frozenset[str] | None = None,
            synonyms: dict[str, str] | None = None) -> list[str]:
    """A6 resource analyzer: like :func:`city` but shingles join with
    '_' (the reference's ``my_shingle`` token_separator) and there is
    NO length filter in the chain (reference
    resource_analyzer_definitions.py:172-233, chain asciifolding→
    my_shingle→country_keep→country_synonym). Canonical form is
    ISO-3166 alpha-3."""
    if keep is None and synonyms is None:
        from merge_machine_ray.functions.resources import (
            COUNTRY_KEEP,
            COUNTRY_SYNONYMS,
        )

        keep, synonyms = COUNTRY_KEEP, COUNTRY_SYNONYMS
    toks = _WORD_RE.findall(normalize_text(s))
    shingles = toks + ["_".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    out = []
    for sh in shingles:
        if keep is not None and sh not in keep:
            continue
        out.append((synonyms or {}).get(sh, sh))
    return out


def soundex_tokens(s: str) -> list[str]:
    """EXTENSION analyzer (not in the reference's registry — its
    analyzers target French orthography via asciifolding + synonym
    chains; Soundex is the classic phonetic-key equivalent for name
    fields): one simplified-Soundex code per ``standard`` token,
    empty codes dropped. Registered as ``'soundex'`` so linking
    templates / blocking configs can address it like any stock
    analyzer (reference field addressing ``col + '.analyzer'``)."""
    from merge_machine_ray.functions.phonetic import soundex

    return [c for c in (soundex(t) for t in standard(s)) if c]


ANALYZERS: dict[str, Callable[[str], list[str]]] = {
    "special_keyword": special_keyword,
    "standard": standard,
    "whitespace": whitespace,
    "n_grams": n_grams,
    "integers": integers,
    "french_estab": french_estab,
    "french": french,
    "english": english,
    "city": city,
    "country": country,
    "soundex": soundex_tokens,
}


def analyze(name: str, s: str) -> list[str]:
    """Apply analyzer `name` (reference field addressing
    ``ref_col + '.analyzer'``, es_labeller.py:67-96)."""
    return ANALYZERS[name](s)
