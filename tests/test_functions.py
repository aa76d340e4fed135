"""Unit tests for the pure function layer (SURVEY.md §5 plan item 1)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from merge_machine_ray.functions.hashing import crc_hash64, stable_hash64
from merge_machine_ray.functions.minhash import (
    band_keys,
    hamming64,
    minhash_signature,
    simhash64,
    token_shingles,
)
from merge_machine_ray.functions.normalize import (
    TRANSLIT,
    extract_text_from_html,
    normalize_column,
    normalize_text,
    url_host,
)
from merge_machine_ray.functions.similarity import (
    containment,
    jaccard,
    jaro,
    jaro_winkler,
    tfidf_cosine,
)
from merge_machine_ray.functions.tokenize import ANALYZERS


def test_normalize_golden():
    assert normalize_text("  Lycée   Général\tVictor-Hugo ") == "lycee general victor-hugo"
    assert normalize_text("ÉÀÜÇŒ") == "eaucoe"
    assert normalize_text(None) == ""
    assert normalize_text(123) == ""
    assert normalize_text("a b") == "a b"


# ASCII + ALL pinned transliteration keys (lower + upper, sourced
# from the table itself so the property stays in sync) + exotic
# unicode whitespace
# (U+2009 thin space, U+3000 ideographic space, U+2028 line sep, U+00A0
# nbsp, U+001C file sep) — the vectorized/scalar byte-identity contract
# must hold on the full Python \s set, not just ASCII whitespace
_ALPHABET = st.sampled_from(
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 .,;:-_'\"!?/()")
    + sorted(set(TRANSLIT) | {u for k in TRANSLIT for u in [k.upper()]
             if u != k and len(u) == 1})
    + ["\u2009", "\u3000", "\u2028", "\u00a0", "\u001c", "\t", "\u0085"]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(_ALPHABET, max_size=30), max_size=20))
def test_normalize_vectorized_matches_scalar(strings):
    """BASELINE.json per-row invariant: Arrow chain ≡ canonical python."""
    arr = pa.array(strings, pa.string())
    vec = normalize_column(arr).to_pylist()
    assert vec == [normalize_text(s) for s in strings]


def test_extract_html():
    html = (b"<html><head><script>var x='<b>no</b>';</script>"
            b"<style>p{}</style><!-- c --></head>"
            b"<body><h1>Lyc&eacute;e</h1> <p>de <b>Paris</b></p></body></html>")
    assert extract_text_from_html(html) == "Lyc\xe9e de Paris"
    assert extract_text_from_html(None) == ""


def test_url_host():
    assert url_host("https://User@Example.COM:8080/p?q=1") == "example.com"
    assert url_host("not a url") == ""


def test_stable_hashes_are_process_independent():
    # pinned golden values — catch accidental algorithm drift
    assert stable_hash64("hello") == 0xA7B6EDA801E5347D
    assert crc_hash64("hello") == 0x44CA1F643610A686
    assert crc_hash64("hello") != crc_hash64("hellp")


def test_analyzers_golden():
    s = "Lycée Général Victor-Hugo 00123 Paris"
    assert ANALYZERS["special_keyword"](s) == ["lycee general victor hugo 00123 paris"]
    assert ANALYZERS["standard"]("Héllo Wörld 42")[:3] == ["héllo", "wörld", "42"]
    assert ANALYZERS["integers"]("code 00123 cedex 07") == ["123", "7", "1237"]
    assert "lyc" in ANALYZERS["n_grams"]("lycée")
    out = ANALYZERS["french_estab"]("Lyc. St Victor SARL cedex")
    assert "lycee" in out and "saint" in out and "cedex" not in out
    assert ANALYZERS["whitespace"]("a  b") == ["a", "b"]


def test_city_country_resource_analyzers_with_shipped_tables():
    """A5/A6 golden tokens using the in-repo keep/synonym resources
    (no injection — the reference's generated resource files)."""
    # city: space shingles, len≥4, keep + canonicalize
    assert ANALYZERS["city"]("Université de Saint-Étienne") == ["saint etienne"]
    assert ANALYZERS["city"]("LYCEE ST ETIENNE cedex") == ["saint etienne"]
    assert ANALYZERS["city"]("10 rue de Rheims, London") == \
        ["reims", "londres"]
    assert ANALYZERS["city"]("nothing geographical here at all") == []
    # country: '_' shingles, no length filter, canonical ISO alpha-3
    # both 'etats_unis' and 'amerique' hit — token stream keeps both
    assert ANALYZERS["country"]("Fabriqué aux États-Unis d'Amérique") == \
        ["usa", "usa"]
    assert ANALYZERS["country"]("shipped from United Kingdom") == ["gbr"]
    assert ANALYZERS["country"]("France / Deutschland") == ["fra", "deu"]
    assert ANALYZERS["country"]("no geography") == []
    # addressing through the registry (A8)
    from merge_machine_ray.functions.tokenize import analyze

    assert analyze("country", "Suisse") == ["che"]


def test_integers_shingles():
    # 3 ints → unigrams + bigrams + trigram, zeros trimmed
    assert ANALYZERS["integers"]("1 02 3") == ["1", "2", "3", "12", "23", "123"]


def test_jaro_winkler_known_values():
    assert jaro("martha", "marhta") == pytest.approx(0.9444444444)
    assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111)
    assert jaro_winkler("", "x") == 0.0
    assert jaro_winkler("abc", "abc") == 1.0
    assert 0 < jaro_winkler("dixon", "dicksonx") < 1


def test_jaccard_containment():
    assert jaccard([1, 2], [2, 3]) == pytest.approx(1 / 3)
    assert jaccard([], []) == 1.0
    assert containment([1, 2], [1, 2, 3, 4]) == 1.0


def test_tfidf_cosine():
    idf = {"a": 1.0, "b": 2.0}
    assert tfidf_cosine(["a"], ["a"], idf) == pytest.approx(1.0)
    assert tfidf_cosine(["a"], ["b"], idf) == 0.0
    sim = tfidf_cosine(["a", "b"], ["b"], idf)
    assert 0 < sim < 1


def test_minhash_similarity_correlates_with_jaccard():
    base = [f"tok{i}" for i in range(100)]
    near = base[:90] + [f"x{i}" for i in range(10)]
    far = [f"y{i}" for i in range(100)]
    s0 = minhash_signature(base, 128)
    s1 = minhash_signature(near, 128)
    s2 = minhash_signature(far, 128)
    est_near = (s0 == s1).mean()
    est_far = (s0 == s2).mean()
    assert est_near > 0.7 > est_far
    # identical input → identical bands, deterministic across calls
    assert band_keys(s0) == band_keys(minhash_signature(list(base), 128))


def test_simhash():
    a = simhash64(["the", "quick", "brown", "fox"] * 5)
    b = simhash64(["the", "quick", "brown", "fx"] * 5)
    c = simhash64(["zzz", "qqq", "rrr", "sss"] * 5)
    assert hamming64(a, b) < hamming64(a, c)
    assert hamming64(a, a) == 0


def test_shingles():
    assert token_shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert token_shingles(["a"], 3) == ["a"]
    assert token_shingles([], 3) == []


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_tokenizers_never_crash(s):
    """Analyzers must be total functions over arbitrary unicode."""
    for name in ("special_keyword", "standard", "n_grams", "integers",
                 "french_estab", "french", "english", "whitespace"):
        out = ANALYZERS[name](s)
        assert isinstance(out, list)
        assert all(isinstance(t, str) for t in out)


def test_extract_html_malformed():
    # unclosed tags, stray brackets, invalid utf-8 bytes, nested script
    assert extract_text_from_html(b"<p>a <b>b") == "a b"
    assert extract_text_from_html(b"a < b > c") == "a c"  # '< b >' parsed as tag
    assert extract_text_from_html(b"\xff\xfe<p>ok</p>") == "�� ok"
    assert extract_text_from_html(
        b"<script>var a='<p>x</p>';</script>done") == "done"
    assert extract_text_from_html(b"") == ""


def test_extract_text_column_matches_scalar():
    """Vectorized RE2 extraction chain == scalar python extraction,
    byte-for-byte, over arbitrary html-ish unicode (including binary
    payloads with invalid utf-8)."""
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from merge_machine_ray.functions.normalize import (
        extract_text_column,
        extract_text_from_html,
    )

    frag = st.sampled_from(
        ["<script>x=1</script>", "<STYLE a>.c{}</style  >", "<!--c-->",
         "<p class='x'>", "</p>", "&amp;", "&nbsp;", "&euro;", "text",
         "é　ü", "<b", "> ", "\n\t", "&bogus;", " ", " "])

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.lists(frag, max_size=12).map("".join), max_size=6))
    def check(docs):
        col = pa.array(docs, pa.string())
        assert extract_text_column(col).to_pylist() == \
            [extract_text_from_html(d) for d in docs]

    check()

    bcol = pa.array([b"\xff\xfe<p>ok</p>", b"<i>a</i>", None], pa.binary())
    assert extract_text_column(bcol).to_pylist() == \
        [extract_text_from_html(b) for b in bcol.to_pylist()]


def test_band_keys_batched_matches_scalar():
    """Vectorized BandKeys (flat poly-window minhash core) produces the
    SAME band keys as the scalar ``band_hashes_for`` oracle — including
    empty docs, empty hosts, sub-shingle-width docs, and the carry-mode
    per-row band vectors."""
    import numpy as np
    import pyarrow as pa

    from merge_machine_ray.stages.blocking import BandKeys, band_hashes_for

    rng = np.random.RandomState(11)
    tok_lists, hosts = [], []
    for i in range(300):
        m = int(rng.choice([0, 1, 2, 3, 5, 40]))
        tok_lists.append(
            rng.randint(-2**31, 2**31 - 1, size=m).astype(np.int32).tolist())
        hosts.append("" if i % 5 == 0 else f"h{i % 13}.example.org")
    batch = pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "tok_hashes": pa.array(tok_lists, pa.list_(pa.int32())),
        "host": pa.array(hosts),
    })
    out = BandKeys(num_perm=64, num_bands=8, shingle_width=3,
                   carry_features=True)(batch)
    keys = out["band_key"].to_numpy(zero_copy_only=False).reshape(300, 8)
    for i in range(0, 300, 7):
        expect = band_hashes_for(tok_lists[i], hosts[i], 64, 8, 3)
        assert keys[i].tolist() == expect
        assert out["band_hashes"][i * 8].as_py() == expect
    # no-host variant and empty batch keep schema + parity
    out2 = BandKeys(64, 8, 3, include_host=False,
                    carry_features=False)(batch)
    k2 = out2["band_key"].to_numpy(zero_copy_only=False).reshape(300, 8)
    assert k2[3].tolist() == band_hashes_for(tok_lists[3], "", 64, 8, 3)
    empty = BandKeys(64, 8, 3)(batch.slice(0, 0))
    assert empty.num_rows == 0
    assert empty.schema.names == out.schema.names


def test_oph_minhash_long_doc_estimates_and_conventions():
    """Opt-in one-permutation-hashing path: identical inputs → identical
    signatures, empty segments stay all-MAX, and on LONG documents
    (windows >> buckets, its soundness precondition) the band keys
    separate a 90%-overlap pair from a disjoint one."""
    import numpy as np

    from merge_machine_ray.functions.minhash import (
        banded_minhash, mix64, minhash_from_flat_oph)

    rng = np.random.RandomState(3)
    base = mix64(rng.randint(0, 1 << 62, size=2000).astype(np.uint64))
    near = np.concatenate([base[:1800],
                           mix64(np.arange(10**6, 10**6 + 200)
                                 .astype(np.uint64))])
    far = mix64(rng.randint(1 << 62, 1 << 63, size=2000).astype(np.uint64))
    elems = np.concatenate([base, base, near, far, np.empty(0, np.uint64)])
    off = np.array([0, 2000, 4000, 6000, 8000, 8000], np.int64)
    keys = banded_minhash(elems, off, 128, 16, 3, scheme="oph")
    assert keys.shape == (5, 16)
    assert (keys[0] == keys[1]).all()          # identical docs
    shared_near = (keys[0] == keys[2]).sum()
    shared_far = (keys[0] == keys[3]).sum()
    assert shared_near > shared_far            # J≈0.82 ≻ J≈0
    sig = minhash_from_flat_oph(np.empty(0, np.uint64),
                                np.array([0, 0], np.int64))
    assert (sig == np.iinfo(np.uint64).max).all()   # empty → all MAX


def test_standard_tokens_flat_matches_scalar():
    """Vectorized standard tokenizer == _WORD_ACCENT_RE.findall(lower)
    byte-for-byte, incl. the U+0130 lowercase divergence, underscores,
    unicode digits, soft hyphens, and RE2-only Unicode-15 word chars."""
    import random

    import pyarrow as pa

    from merge_machine_ray.functions.tokenize import (
        standard,
        standard_tokens_flat,
    )

    rng = random.Random(7)
    alpha = "abc ÀÉİß_0-9.!?̇ 日本語 ١٢٣ x­y"
    texts = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 60)))
             for _ in range(1500)]
    texts += ["", None, "İstanbul İİ", "_foo_bar_", "a_b", "ııİİii",
              "\U0001E4D0\U0001E4F5 word"]
    flat, off = standard_tokens_flat(pa.array(texts, pa.string()))
    fl = flat.to_pylist()
    for i, t in enumerate(texts):
        want = standard(t) if isinstance(t, str) else []
        assert fl[off[i]:off[i + 1]] == want, repr(t)
