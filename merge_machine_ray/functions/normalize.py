"""Text normalization + HTML extraction.

Ray-native equivalent of the reference's pre-analysis normalization:
``_my_unidecode`` (reference ``merge_machine/helpers.py:18-23``), the
``special_keyword`` analyzer's char-map + accent folding (reference
``merge_machine/analyzers/no_resource_analyzer_definitions.py:105-119``)
and insert-time stripping (``merge_machine/es_insert.py:22-27``).

Two implementations of the same semantics exist on purpose:

* :func:`normalize_text` — the canonical pure-Python per-row definition
  (used by the sequential oracle);
* :func:`normalize_column` — a vectorized ``pyarrow.compute`` chain used
  inside ``map_batches`` by the pipeline.

The pytest suite asserts byte-identity between the two on fixture and
property-generated inputs (the BASELINE.json per-row invariant).
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa
import pyarrow.compute as pc

# Fixed transliteration table (Latin-1 Supplement + common Latin
# Extended-A). Applied AFTER lowercasing, so only lowercase keys are
# needed. Pinned here — never derived from the environment — so the
# mapping is identical in every worker and in the oracle.
TRANSLIT: dict[str, str] = {
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a", "æ": "ae",
    "ç": "c", "è": "e", "é": "e", "ê": "e", "ë": "e", "ì": "i", "í": "i",
    "î": "i", "ï": "i", "ñ": "n", "ò": "o", "ó": "o", "ô": "o", "õ": "o",
    "ö": "o", "ø": "o", "ù": "u", "ú": "u", "û": "u", "ü": "u", "ý": "y",
    "ÿ": "y", "œ": "oe", "š": "s", "ž": "z", "ß": "ss", "ā": "a", "ē": "e",
    "ī": "i", "ō": "o", "ū": "u", "ć": "c", "č": "c", "ł": "l", "ń": "n",
    "ś": "s", "ř": "r", "ż": "z", "đ": "d", "ğ": "g", "ș": "s", "ț": "t",
    "'": "'", "’": "'", "‘": "'", "“": '"', "”": '"', "–": "-", "—": "-",
    " ": " ",
}

_TRANSLIT_TABLE = str.maketrans(TRANSLIT)
# RE2 character class matching ANY transliteration key (minus the
# identity space entry): one cheap presence probe per batch lets
# normalize_column skip all 46 replace passes on ASCII-only batches
# (measured 0.038 s → 0.003 s per 7k-page batch; output identical —
# skipped replaces had nothing to replace)
_TRANSLIT_CLASS = "[" + "".join(re.escape(k) for k in TRANSLIT
                                if k != " ") + "]"
_WS_RE = re.compile(r"\s+")

# Python ``re`` matches \s against the full unicode whitespace set;
# Arrow's RE2 \s is ASCII-only. The vectorized path spells the exact
# Python set out (verified equal to both ``re`` \s and ``str.isspace``
# over the whole BMP+SMP) so the two normalize implementations stay
# byte-identical on exotic whitespace (U+2009, U+3000, U+2028, …).
_WS_CODEPOINTS = (list(range(0x09, 0x0E)) + list(range(0x1C, 0x21))
                  + [0x85, 0xA0, 0x1680] + list(range(0x2000, 0x200B))
                  + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000])
_WS_CHARS = "".join(chr(c) for c in _WS_CODEPOINTS)
_WS_CLASS_RE = "[" + "".join(f"\\x{{{c:04X}}}" for c in _WS_CODEPOINTS) + "]+"


def normalize_text(s: str | None) -> str:
    """Canonical normalization: lower → transliterate → collapse ws → strip.

    Non-strings map to '' (reference ``helpers.py:21-22`` returns '' for
    non-str input).
    """
    if not isinstance(s, str):
        return ""
    s = s.lower().translate(_TRANSLIT_TABLE)
    return _WS_RE.sub(" ", s).strip()


def normalize_column(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized Arrow equivalent of :func:`normalize_text`.

    Chain of C-speed kernels: utf8_lower → one replace_substring pass
    per transliteration entry → whitespace collapse → trim. Nulls → ''.
    """
    arr = pc.fill_null(arr, "")
    arr = pc.utf8_lower(arr)
    if pc.any(pc.match_substring_regex(arr, _TRANSLIT_CLASS)).as_py():
        for src, dst in TRANSLIT.items():
            arr = pc.replace_substring(arr, src, dst)
    arr = pc.replace_substring_regex(arr, _WS_CLASS_RE, " ")
    return pc.utf8_trim(arr, _WS_CHARS)


# --- HTML extraction ---------------------------------------------------------
# The reference never parses HTML (its inputs are CSVs); the graft input
# (BASELINE.json input_hint) carries `html:binary` pages. Extraction is
# defined here as the canonical deterministic function the fixture
# generator inverts: drop script/style subtrees, strip tags, unescape
# entities, collapse whitespace.

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def extract_text_from_html(html: bytes | str | None) -> str:
    """Extract visible text from an HTML page, byte-deterministically."""
    if html is None:
        return ""
    if isinstance(html, bytes):
        html = html.decode("utf-8", "replace")
    html = _SCRIPT_STYLE_RE.sub(" ", html)
    html = _COMMENT_RE.sub(" ", html)
    html = _TAG_RE.sub(" ", html)
    html = _html.unescape(html)
    return _WS_RE.sub(" ", html).strip()


# RE2 (Arrow) has no backreferences — spell the script/style subtree
# pattern as an alternation; (?is) = case-insensitive + dot-matches-\n,
# matching the scalar pattern's IGNORECASE | DOTALL
_SCRIPT_STYLE_RE2 = (r"(?is)<script\b[^>]*>.*?</script\s*>"
                     r"|<style\b[^>]*>.*?</style\s*>")


def extract_text_column(col) -> pa.Array:
    """Vectorized Arrow twin of :func:`extract_text_from_html` for a
    STRING html column (byte-identity property-tested): the three
    strip passes run as RE2 kernels over the whole column; entity
    unescape stays the stdlib scalar (python's full named-entity table
    has no RE2 equivalent); whitespace collapse uses the spelled-out
    unicode class shared with :func:`normalize_column`. A binary
    column casts to utf8 in C when valid, falling back to the scalar
    errors='replace' decode otherwise (byte-identical either way)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        try:
            col = col.cast(pa.string())
        except pa.ArrowInvalid:
            col = pa.array(
                [x.decode("utf-8", "replace") if x is not None else None
                 for x in col.to_pylist()], pa.string())
    s = pc.fill_null(col, "")
    s = pc.replace_substring_regex(s, _SCRIPT_STYLE_RE2, " ")
    s = pc.replace_substring_regex(s, r"(?s)<!--.*?-->", " ")
    s = pc.replace_substring_regex(s, r"<[^>]+>", " ")
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    out = pa.array([_html.unescape(x) for x in s.to_pylist()], pa.string())
    out = pc.replace_substring_regex(out, _WS_CLASS_RE, " ")
    return pc.utf8_trim(out, _WS_CHARS)


_HOST_RE = re.compile(r"^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)")


def url_host(url: str | None) -> str:
    """Lowercased host part of a url ('' when unparseable)."""
    if not isinstance(url, str):
        return ""
    m = _HOST_RE.match(url.lower())
    return m.group(1) if m else ""
