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
