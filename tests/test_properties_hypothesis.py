"""Hypothesis fuzzing of the scalar↔vectorized parity contracts.

Each vectorized kernel must be BYTE-identical to its scalar twin on
arbitrary unicode — these generators hit surrogate-adjacent codepoints,
exotic whitespace, combining marks and zero-width characters that the
hand-written fixtures can't enumerate."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

# text over the full unicode space minus surrogates (not encodable)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60)


@settings(max_examples=200, deadline=None)
@given(st.lists(_text, max_size=40))
def test_normalize_column_matches_scalar(texts):
    from merge_machine_ray.functions.normalize import (
        normalize_column,
        normalize_text,
    )

    got = normalize_column(pa.array(texts, pa.string())).to_pylist()
    assert got == [normalize_text(t) for t in texts]


@settings(max_examples=200, deadline=None)
@given(st.lists(_text, max_size=40))
def test_standard_tokens_flat_matches_scalar_fuzz(texts):
    from merge_machine_ray.functions.tokenize import (
        standard,
        standard_tokens_flat,
    )

    flat, off = standard_tokens_flat(pa.array(texts, pa.string()))
    fl = flat.to_pylist()
    for i, t in enumerate(texts):
        assert fl[off[i]:off[i + 1]] == standard(t), repr(t)


@settings(max_examples=200, deadline=None)
@given(st.lists(_text, max_size=40))
def test_integer_shingles_match_scalar_fuzz(texts):
    from collections import defaultdict

    from merge_machine_ray.functions.tokenize import (
        integer_shingle_tokens_flat,
        integers,
    )

    rows, toks = integer_shingle_tokens_flat(pa.array(texts, pa.string()))
    got = defaultdict(list)
    for r, t in zip(rows, toks.to_pylist()):
        got[int(r)].append(t)
    for i, s in enumerate(texts):
        assert sorted(got.get(i, [])) == sorted(integers(s)), repr(s)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(_text, _text), max_size=30))
def test_jaro_winkler_batch_matches_scalar_fuzz(pairs):
    from merge_machine_ray.functions.similarity import (
        jaro_winkler,
        jaro_winkler_batch,
    )

    got = jaro_winkler_batch([p[0] for p in pairs], [p[1] for p in pairs])
    want = np.array([jaro_winkler(x, y) for x, y in pairs])
    assert got.shape == want.shape and (got == want).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(_text, max_size=12), max_size=25))
def test_shingle_hashes_match_scalar_fuzz(rows):
    from merge_machine_ray.functions.hashing import crc_hash64
    from merge_machine_ray.functions.minhash import (
        string_shingle_hashes,
        token_shingles,
    )

    flat = [t for r in rows for t in r]
    off = np.concatenate(
        ([0], np.cumsum([len(r) for r in rows]))).astype(np.int64)
    sh, sh_off = string_shingle_hashes(
        pa.array(flat, pa.string()), off, 3)
    for i, toks in enumerate(rows):
        want = [crc_hash64(s) for s in token_shingles(toks, 3)]
        assert sh[sh_off[i]:sh_off[i + 1]].tolist() == want, toks


# realistic url shapes: scheme://[user@]host[:port]/path?q#f over
# bracket-free reg-name hosts (IPv6 literal brackets are out of the
# url_host contract — the kernel targets web-crawl reg-names)
_label = st.text(alphabet=st.sampled_from(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_"),
    min_size=1, max_size=8)
_urls = st.builds(
    lambda scheme, labels, user, port, path, q:
        scheme + "://" + (user + "@" if user else "")
        + ".".join(labels) + (f":{port}" if port else "")
        + path + ("?" + q if q else ""),
    st.sampled_from(["http", "https", "ftp", "ws"]),
    st.lists(_label, min_size=1, max_size=4),
    st.one_of(st.none(), _label),
    st.one_of(st.none(), st.integers(1, 65535)),
    st.one_of(st.just(""), st.just("/"),
              st.builds(lambda p: "/" + "/".join(p),
                        st.lists(_label, max_size=3))),
    st.one_of(st.none(), _label),
)


@settings(max_examples=200, deadline=None)
@given(st.lists(_urls, max_size=30))
def test_url_host_matches_urlsplit_fuzz(urls):
    from urllib.parse import urlsplit

    from merge_machine_ray.functions.urls import url_host

    got = url_host(pa.array(urls, pa.string())).to_pylist()
    want = [(urlsplit(u).hostname or "") for u in urls]
    assert got == want


# canonical_url contract: the Arrow kernel chain and the generated
# DuckDB expression (functions/urls.canonical_url_sql_expr) must agree
# byte-for-byte on every input — they share _CANON_STEPS, so a diff
# means the two emitters drifted
_canon_param = st.sampled_from([
    "utm_source=a", "utm_campaign=x%20y", "utm_medium=", "fbclid=zz",
    "gclid=9", "ref=home", "id=7", "page=2", "a_b=c.d"])
_canon_urls = st.one_of(
    st.builds(
        lambda scheme, www, labels, port, path, slash, params, frag:
            scheme + "://" + ("www." if www else "") + ".".join(labels)
            + (f":{port}" if port else "")
            + ("/" + "/".join(path) if path else "")
            + ("/" if slash else "")
            + ("?" + "&".join(params) if params else "")
            + ("#" + frag if frag is not None else ""),
        st.sampled_from(["http", "https", "HTTP", "HttpS", "ftp"]),
        st.booleans(),
        st.lists(_label, min_size=1, max_size=3),
        st.one_of(st.none(), st.sampled_from([80, 443, 8080])),
        st.lists(_label, max_size=2),
        st.booleans(),
        st.lists(_canon_param, max_size=3),
        st.one_of(st.none(), st.just(""), _label),
    ),
    st.text(max_size=25).filter(lambda s: "\x00" not in s),
    st.none(),        # null urls must fold to '' on BOTH engines
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_canon_urls, min_size=1, max_size=20))
def test_canonical_url_matches_duckdb_twin_fuzz(urls):
    import duckdb

    from merge_machine_ray.functions.urls import (canonical_url,
                                                  canonical_url_sql_expr)

    got = canonical_url(pa.array(urls, pa.string())).to_pylist()
    con = duckdb.connect()
    expr = canonical_url_sql_expr("url")
    rows = con.execute(
        f"SELECT i, {expr} FROM (SELECT unnest($1) AS url, "
        f"unnest(range(len($1))) AS i) ORDER BY i", [urls]).fetchall()
    want = [r[1] for r in rows]
    assert got == want


@given(st.lists(st.text(max_size=20), max_size=40))
@settings(max_examples=60, deadline=None)
def test_soundex_batch_matches_scalar_fuzz(names):
    from merge_machine_ray.functions.phonetic import soundex, soundex_batch

    got = soundex_batch(pa.array(names, pa.string())).to_pylist()
    assert got == [soundex(n) for n in names]


@given(st.lists(st.tuples(st.text(max_size=12), st.text(max_size=12)),
                max_size=30))
@settings(max_examples=60, deadline=None)
def test_levenshtein_batch_matches_scalar_fuzz(pairs):
    from merge_machine_ray.functions.similarity import (
        levenshtein,
        levenshtein_batch,
    )

    xs = [a for a, _ in pairs]
    ys = [b for _, b in pairs]
    got = levenshtein_batch(xs, ys)
    assert got.tolist() == [levenshtein(a, b) for a, b in pairs]


@given(st.lists(st.text(alphabet=st.sampled_from(
    list('abc<>="/ href')), max_size=60), max_size=25))
@settings(max_examples=120, deadline=None)
def test_extract_hrefs_matches_split_reference_fuzz(docs):
    from merge_machine_ray.functions.urls import extract_hrefs

    got = extract_hrefs(pa.array(docs, pa.string())).to_pylist()
    want = [[p.split('"', 1)[0] for p in d.split('href="')[1:]]
            for d in docs]
    assert got == want
