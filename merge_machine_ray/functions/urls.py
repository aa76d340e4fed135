"""Vectorized URL decomposition for web-page tables.

Every web-scale corpus pipeline (C4, RefinedWeb, Common-Crawl derived
sets) filters and aggregates at the HOST / registered-domain level
before any per-document work — blocklists, per-domain quotas, crawl
recency windows. These helpers give that axis as zero-copy Arrow
kernels over the ``url`` column of the input-hint pages shape
(url:string, warc_ts:timestamp, html:binary, lang:string); no per-row
python. Reference parity: Merge-Machine has no URL tooling (its unit
is the CSV row, `merge_machine/es_match.py`), so this module is part
of the training-data-pipeline extension surface, not a port.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme "://" [userinfo "@"] host [":" port] [/ path] [? query] [# frag]
# RE2-safe (pyarrow uses RE2): no backrefs, no lookarounds.
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?(?P<host>[^/:?#]+)"
_PATH_RE = (r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
            r"(?P<path>/[^?#]*)")


def _utf8(arr):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.fill_null(arr.cast(pa.string()), "")


def url_host(arr) -> pa.Array:
    """Lower-cased authority host of each url; '' when unparseable.
    One RE2 extract over the column."""
    m = pc.extract_regex(_utf8(arr), _HOST_RE)
    return pc.utf8_lower(pc.fill_null(pc.struct_field(m, "host"), ""))


def url_path(arr) -> pa.Array:
    """Path component ('/'-prefixed); '/' when the url has none."""
    m = pc.extract_regex(_utf8(arr), _PATH_RE)
    return pc.fill_null(pc.struct_field(m, "path"), "/")


def registered_domain(host_arr, labels: int = 2) -> pa.Array:
    """Last ``labels`` dot-labels of a host (suffix heuristic —
     'news.ex3.example.com' → 'example.com'). A public-suffix list
    would be a broadcast lookup table in the same shape; the heuristic
    keeps the kernel dependency-free and deterministic."""
    host = _utf8(host_arr)
    # last `labels` dot-labels == the shortest suffix with labels-1
    # dots: one anchored RE2 extract, no per-row list slicing
    pat = r"(?P<dom>[^.]+" + (r"\.[^.]+" * (labels - 1)) + r")$"
    m = pc.extract_regex(host, pat)
    return pc.fill_null(pc.struct_field(m, "dom"), host)


# --------------------------------------------------- canonicalization
# One rewrite chain, applied by BOTH engines: `canonical_url` runs it
# as Arrow RE2 kernels, `canonical_url_sql_expr` emits the identical
# chain as nested DuckDB regexp_replace calls (DuckDB is RE2 too, so
# the semantics match byte-for-byte). Plain (pattern, rewrite,
# global) steps live in _CANON_STEPS; the two non-replace steps
# (prefix lowercasing, orphan-'&' promotion) are handled explicitly
# in both emitters.
_PRE_RE = (r"^(?P<pre>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
           r"(?P<rest>.*)$")
_CANON_STEPS = [
    # fragment
    (r"#.*", "", False),
    # tracking params (heuristic: utm_*, fbclid, gclid, ref)
    (r"[?&](utm_[A-Za-z0-9_]*|fbclid|gclid|ref)=[^&#]*", "", True),
    # (orphan-& promotion happens here, between these steps)
    # empty trailing query separator
    (r"[?&]$", "", False),
    # default ports
    (r"^(https://[^/:?#]+):443(.*)$", r"\1\2", False),
    (r"^(http://[^/:?#]+):80(.*)$", r"\1\2", False),
    # www prefix
    (r"^(https?://)www\.", r"\1", False),
    # trailing slash
    (r"/$", "", False),
]
# steps applied BEFORE the orphan-& promotion (see chain comment)
_CANON_PRE_AMP = 2


def canonical_url(arr) -> pa.Array:
    """Canonical form of each url: lowercase scheme+authority, strip
    fragment, strip tracking query params (utm_*/fbclid/gclid/ref),
    strip default ports and a leading ``www.``, drop a trailing slash.
    Heuristic by design (a bare ``&`` in a query-less path would be
    promoted to ``?``); every step is one RE2 kernel over the column."""
    u = _utf8(arr)
    m = pc.extract_regex(u, _PRE_RE)
    pre = pc.struct_field(m, "pre")
    rest = pc.struct_field(m, "rest")
    lowered = pc.binary_join_element_wise(
        pc.utf8_lower(pre), rest, "")
    u = pc.if_else(pc.is_valid(pre), lowered, u)

    def _apply(u, steps):
        for pat, rw, _g in steps:
            u = pc.replace_substring_regex(u, pat, rw)
        return u

    u = _apply(u, _CANON_STEPS[:_CANON_PRE_AMP])
    # promote an orphaned leading '&' (left by tracking-param removal
    # of the original '?param') to '?' — first '&' only, query-less
    # urls that contain '&' in the path accept the heuristic
    has_q = pc.match_substring(u, "?")
    has_amp = pc.match_substring(u, "&")
    promoted = pc.replace_substring(u, "&", "?", max_replacements=1)
    u = pc.if_else(pc.and_(pc.invert(has_q), has_amp), promoted, u)
    return _apply(u, _CANON_STEPS[_CANON_PRE_AMP:])


def canonical_url_sql_expr(col: str) -> str:
    """The exact same rewrite chain as :func:`canonical_url`, emitted
    as a DuckDB SQL expression over ``col`` (for oracle twins). NULLs
    fold to '' up front, matching the Arrow chain's fill_null."""
    col = f"COALESCE({col}, '')"
    pre_pat = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(.*)$"
    expr = (f"CASE WHEN regexp_matches({col}, '{pre_pat}') THEN "
            f"lower(regexp_extract({col}, '{pre_pat}', 1)) || "
            f"regexp_extract({col}, '{pre_pat}', 2) ELSE {col} END")

    def _wrap(expr, steps):
        for pat, rw, g in steps:
            # DuckDB '...' literals are escape-free: backslashes pass
            # through verbatim (\. stays \., \1 stays the RE2 backref)
            sp = pat.replace("'", "''")
            sr = rw
            flag = ", 'g'" if g else ""
            expr = f"regexp_replace({expr}, '{sp}', '{sr}'{flag})"
        return expr

    expr = _wrap(expr, _CANON_STEPS[:_CANON_PRE_AMP])
    expr = (f"(SELECT CASE WHEN NOT contains(u, '?') AND "
            f"contains(u, '&') THEN regexp_replace(u, '&', '?') "
            f"ELSE u END FROM (SELECT ({expr}) AS u))")
    return _wrap(expr, _CANON_STEPS[_CANON_PRE_AMP:])


def extract_hrefs(arr) -> pa.ListArray:
    """All double-quoted ``href="..."`` link targets per document, as a
    list<string> column — the link-extraction kernel of web-graph
    construction. Contract: well-formed UTF-8 html with double-quoted
    attributes (the crawler-normalized form); single-quoted/unquoted
    hrefs are out of contract. Fully vectorized: one substring split
    on ``href="`` (every list element after the first starts with a
    target), then one bounded split on ``"`` takes the target — no
    regex backtracking, no per-row Python."""
    s = _utf8(arr)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    parts = pc.split_pattern(pc.fill_null(s, ""), 'href="')
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offsets = parts.offsets.to_numpy(zero_copy_only=False).astype("int64")
    flat = parts.values
    # keep only elements at within-list position > 0
    import numpy as np
    n_flat = len(flat)
    # split_pattern('') == [''], so every list has ≥1 element and the
    # per-list head positions are distinct
    starts = offsets[:-1]
    keep = np.ones(n_flat, dtype=bool)
    keep[starts] = False                    # drop each list's head
    urls_flat = pc.list_element(
        pc.split_pattern(flat, '"', max_splits=1), 0)
    counts = np.maximum(np.diff(offsets) - 1, 0)
    new_off = np.concatenate(([0], np.cumsum(counts)))
    return pa.ListArray.from_arrays(
        pa.array(new_off, pa.int32()), urls_flat.filter(pa.array(keep)))
