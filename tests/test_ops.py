"""Unit/integration tests for the training-data operator suite:
dedup family, ANN, text stats, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 3, "text": "the quick brown fox leaps over the lazy dog"},
        {"doc_id": 4, "text": "completely different content about spark engines"},
        {"doc_id": 5, "text": "another unrelated string with numbers 42 and 7"},
        {"doc_id": 6, "text": ""},
    ]
    return rd.from_items(rows)


def test_exact_dedup(ray_session, docs_ds):
    from merge_machine_ray.stages.dedup import dedup_representatives, exact_dedup

    kept = sorted(r["doc_id"] for r in exact_dedup(docs_ds).take_all())
    assert kept == [1, 3, 4, 5, 6]  # doc 2 collapses into doc 1
    reps = {r["doc_id"]: r["rep_id"]
            for r in dedup_representatives(docs_ds).take_all()}
    assert reps[2] == 1 and reps[1] == 1 and reps[3] == 3


def test_minhash_near_dup(ray_session, docs_ds):
    from merge_machine_ray.stages.dedup import (
        minhash_dedup_keep,
        minhash_near_dup_pairs,
    )

    pairs = {(r["id_a"], r["id_b"])
             for r in minhash_near_dup_pairs(
                 docs_ds, jaccard_threshold=0.5, shingle_width=2).take_all()}
    assert (1, 2) in pairs          # exact dup
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup
    assert not any(4 in p or 5 in p for p in pairs)

    kept = sorted(r["doc_id"] for r in minhash_dedup_keep(
        docs_ds, jaccard_threshold=0.5, shingle_width=2).take_all())
    assert 2 not in kept and 1 in kept and 4 in kept


def test_simhash_near_dup(ray_session, docs_ds):
    from merge_machine_ray.stages.dedup import simhash_near_dup_pairs

    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_dup_pairs(docs_ds, max_hamming=12).take_all()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 0


def test_embedding_near_dup_and_ann(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.ann import brute_force_topk, ivf_topk
    from merge_machine_ray.stages.dedup import embedding_near_dup_pairs

    rng = np.random.RandomState(0)
    base = rng.standard_normal((40, 16))
    vecs = np.vstack([base, base[:5] + 0.001 * rng.standard_normal((5, 16))])
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(len(vecs))]
    ds = rd.from_items(rows)

    dups = {(r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                ds, dim=16, cosine_threshold=0.99).take_all()}
    found = sum((i, 40 + i) in dups for i in range(5))
    assert found >= 4  # hyperplane LSH recall on near-identical vectors

    queries = {"ids": [0, 1], "matrix": [vecs[0].tolist(), vecs[1].tolist()]}
    top = brute_force_topk(ds, queries, k=3).take_all()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in (0, 1):
        best = min(by_q[q], key=lambda r: r["rank"])
        assert best["vec_id"] == q  # self is nearest
        assert len(by_q[q]) == 3

    # IVF with all cells probed == exact top-k
    ivf = ivf_topk(ds, queries, k=3, n_cells=4, nprobe=4)
    got = {(r["query_id"], r["rank"]): r["vec_id"] for r in ivf.take_all()}
    want = {(r["query_id"], r["rank"]): r["vec_id"] for r in top}
    assert got == want


def test_distributed_centroid_training(ray_session):
    """Distributed Lloyd (broadcast centroids + per-batch partial sums)
    must reduce k-means inertia over the corpus and keep ivf_topk exact
    when every cell is probed."""
    import ray.data as rd

    from merge_machine_ray.stages.ann import (
        brute_force_topk,
        ivf_topk,
        train_centroids_distributed,
    )

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((6, 12)) * 4
    X = np.vstack([c + rng.standard_normal((50, 12)) for c in centers])
    rows = [{"vec_id": i, "embedding": X[i].tolist()} for i in range(len(X))]
    ds = rd.from_items(rows).repartition(4)

    def inertia(C):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        return d.min(1).sum()

    c0 = train_centroids_distributed(ds, n_cells=6, iters=0)
    c3 = train_centroids_distributed(ds, n_cells=6, iters=3)
    assert c3.shape == (6, 12)
    assert inertia(c3) < inertia(c0) * 0.7, (inertia(c0), inertia(c3))

    queries = {"ids": [0, 77], "matrix": [X[0].tolist(), X[77].tolist()]}
    exact = {(r["query_id"], r["rank"]): r["vec_id"]
             for r in brute_force_topk(ds, queries, k=3).take_all()}
    got = {(r["query_id"], r["rank"]): r["vec_id"]
           for r in ivf_topk(ds, queries, k=3, n_cells=6, nprobe=6,
                             train="distributed").take_all()}
    assert got == exact


def test_embedding_lsh_recall_at_moderate_cosine(ray_session):
    """OR-of-bands recall gate: pairs at cosine ≈0.93-0.97 (NOT
    near-identical) must still be found. A single 12-plane band only
    catches ~20% of these — this is the regression test for the
    round-1 single-band recall bug."""
    import ray.data as rd

    from merge_machine_ray.stages.dedup import embedding_near_dup_pairs

    rng = np.random.RandomState(7)
    d, n_pairs = 32, 60
    base = rng.standard_normal((n_pairs, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noise = rng.standard_normal((n_pairs, d))
    noise -= (noise * base).sum(1, keepdims=True) * base  # orthogonalize
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    alpha = 0.30  # cos = 1/sqrt(1+α²) ≈ 0.958
    dup = base + alpha * noise
    vecs = np.vstack([base, dup])
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(len(vecs))]
    pairs = {(r["id_a"], r["id_b"])
             for r in embedding_near_dup_pairs(
                 rd.from_items(rows), dim=d,
                 cosine_threshold=0.9).take_all()}
    planted = {(i, n_pairs + i) for i in range(n_pairs)}
    recall = len(pairs & planted) / n_pairs
    assert recall >= 0.8, f"OR-of-bands recall {recall:.2f}"
    # verify step is exact → no pair below the threshold sneaks in
    import itertools

    for a, b in pairs:
        c = float(vecs[a] @ vecs[b]
                  / (np.linalg.norm(vecs[a]) * np.linalg.norm(vecs[b])))
        assert c >= 0.9


def test_ngram_jaccard_exact_pairs(ray_session, docs_ds):
    from merge_machine_ray.stages.dedup import ngram_jaccard_pairs

    got = {(r["id_a"], r["id_b"]): r["jaccard_micro"]
           for r in ngram_jaccard_pairs(
               docs_ds, shingle_width=2, threshold_micro=500_000).take_all()}
    assert got[(1, 2)] == 1_000_000  # identical docs
    assert (1, 3) in got and 500_000 <= got[(1, 3)] < 1_000_000
    assert not any(4 in p or 5 in p or 6 in p for p in got)


def test_textstats(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.textstats import (
        LangId,
        StopwordRatio,
        add_quality_scores,
        bpe_ish_token_count,
        fingerprint,
        token_count,
    )

    rows = [
        {"doc_id": 1, "text": "The quick brown fox is on the hill with the dog",
         "lang": "en"},
        {"doc_id": 2, "text": "le chat est dans la maison avec le chien et la "
                              "souris pour le fromage", "lang": "fr"},
        {"doc_id": 3, "text": "", "lang": "en"},
    ]
    ds = rd.from_items(rows)
    out = {r["doc_id"]: r for r in ds.map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 2)).take_all()}
    assert out[1]["lang_pred"] == "en"
    assert out[2]["lang_pred"] == "fr"
    assert out[3]["lang_pred"] == "und"

    t = pa.table({"text": pa.array(["Hello, world! 42", ""])})
    q = add_quality_scores(t)
    assert q["n_chars_q"][0].as_py() == 16
    assert q["punct_ratio"][0].as_py() > 0
    tc = token_count(t)
    assert tc["n_tokens"].to_pylist() == [3, 0]
    bc = bpe_ish_token_count(t)
    assert bc["n_bpe_tokens"][0].as_py() == 6  # Hello , world ! 4 2
    fp1 = fingerprint(pa.table({"text": pa.array(["a b  c   d e f g h"])}))
    fp2 = fingerprint(pa.table({"text": pa.array(["a b c d e f g h"])}))
    assert fp1["fingerprint"][0].as_py() == fp2["fingerprint"][0].as_py()

    sr = ds.map_batches(StopwordRatio, batch_format="pyarrow",
                        concurrency=(1, 2)).take_all()
    assert all(0 <= r["stopword_ratio"] <= 1 for r in sr)


def test_langid_vectorized_matches_scalar_reference():
    """The Arrow/reduceat LangId must reproduce the per-row scalar
    definition exactly (including ties, min_ratio gating, empties)."""
    import re

    from merge_machine_ray.stages.textstats import LANG_PROFILES, LangId

    word = re.compile(r"[^\W\d_]+", re.UNICODE)

    def scalar(s, min_ratio=0.05):
        toks = word.findall((s or "").lower())
        if not toks:
            return "und"
        best_lang, best_hits = "und", 0
        for lang in sorted(LANG_PROFILES):
            hits = sum(1 for x in toks if x in LANG_PROFILES[lang])
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang if best_hits / len(toks) >= min_ratio else "und"

    texts = [
        "the cat and the dog are in the house",
        "le chat et le chien sont dans la maison",
        "der Hund und die Katze sind in dem Haus",
        "el gato y el perro en la casa", "", "   ", "12345 !!!",
        "xyzzy plugh qwerty", None,
        "the le der el and et und y",  # cross-language tie bait
    ]
    t = pa.table({"text": pa.array(texts, pa.string())})
    got = LangId()(t)["lang_pred"].to_pylist()
    want = [scalar(s) for s in texts]
    assert got == want


def test_fingerprint_whitespace_invariant_and_discriminative():
    from merge_machine_ray.stages.textstats import fingerprint

    texts = ["The quick   brown fox", "the\tquick brown  fox ",
             "a completely different document body", "ab"]
    t = pa.table({"text": pa.array(texts)})
    fp = fingerprint(t)["fingerprint"].to_pylist()
    assert fp[0] == fp[1]          # whitespace/case-only edits
    assert fp[0] != fp[2]          # different content
    assert all(0 <= v < 2**63 for v in fp)


def test_bpe_and_stopword_vectorized_match_scalar_reference():
    """The Arrow RE2 / reduceat rewrites must reproduce the per-row
    python definitions exactly (empties, unicode, unknown langs)."""
    import re

    from merge_machine_ray.stages.textstats import (
        LANG_PROFILES,
        StopwordRatio,
        bpe_ish_token_count,
    )

    texts = ["Hello, world! 42", "", "   ", None, "a1b2c3!?", "é è ü ß 東京",
             "the-quick_brown.fox", "!!!", "le chat est la", "der die das"]
    t = pa.table({"text": pa.array(texts, pa.string())})

    bpe_pat = re.compile(r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]")
    got = bpe_ish_token_count(t)["n_bpe_tokens"].to_pylist()
    want = [len(bpe_pat.findall(s or "")) for s in texts]
    assert got == want

    langs = ["en", "fr", "xx", None, "en", "de", "en", "fr", "fr", "de"]
    word = re.compile(r"[^\W\d_]+", re.UNICODE)

    def scalar_ratio(s, lang):
        toks = word.findall((s or "").lower())
        stops = LANG_PROFILES.get(lang or "en", LANG_PROFILES["en"])
        return sum(1 for x in toks if x in stops) / max(1, len(toks))

    t2 = t.append_column("lang", pa.array(langs, pa.string()))
    got_r = StopwordRatio()(t2)["stopword_ratio"].to_pylist()
    want_r = [scalar_ratio(s, lang) for s, lang in zip(texts, langs)]
    assert got_r == want_r


def test_multimodal_plumbing(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.multimodal import (
        AudioFeatures,
        FrameSampler,
        ImageFeatures,
        synth_media_table,
    )

    imgs = rd.from_arrow(synth_media_table(20, "image"))
    feats = imgs.map_batches(ImageFeatures, batch_format="pyarrow",
                             batch_size=8, concurrency=(1, 2)).take_all()
    assert len(feats) == 20
    assert len(feats[0]["features"]) == 16
    # determinism across runs
    feats2 = imgs.map_batches(ImageFeatures, batch_format="pyarrow",
                              batch_size=8, concurrency=(1, 2)).take_all()
    f1 = {r["media_id"]: tuple(r["features"]) for r in feats}
    f2 = {r["media_id"]: tuple(r["features"]) for r in feats2}
    assert f1 == f2

    auds = rd.from_arrow(synth_media_table(5, "audio"))
    a = auds.map_batches(AudioFeatures, batch_format="pyarrow",
                         concurrency=(1, 2)).take_all()
    assert all(r["n_frames"] >= 1 for r in a)

    vids = rd.from_arrow(synth_media_table(3, "video"))
    frames = vids.map_batches(FrameSampler, batch_format="pyarrow",
                              concurrency=(1, 2)).take_all()
    assert len(frames) == 12  # 3 videos × 4 frames
    offs = [r["offset_ms"] for r in frames if r["media_id"] == 0]
    assert offs == sorted(offs)

    with pytest.raises(NotImplementedError):
        ImageFeatures(decoder="pillow")


def test_multimodal_real_decode(ray_session):
    """The uncompressed-format decode tier is REAL: PPM bytes round-trip
    through the codec, image features reflect pixel content, the WAV
    spectral centroid tracks the planted tone, and rawvideo frame
    sampling random-access-decodes actual pixels."""
    import ray.data as rd

    from merge_machine_ray.functions.codecs import (
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
        resize_nearest,
    )
    from merge_machine_ray.stages.multimodal import (
        AudioFeatures,
        FrameSampler,
        ImageFeatures,
        synth_media_table,
    )

    img = np.zeros((10, 20, 3), np.uint8)
    img[..., 0] = 200                      # red-dominant
    assert (decode_ppm(encode_ppm(img)) == img).all()
    assert resize_nearest(img, 5, 4).shape == (4, 5, 3)

    t = pa.Table.from_pylist([{
        "media_id": 0, "kind": "image", "payload": encode_ppm(img),
        "mime": "image/x-portable-pixmap", "width": 20, "height": 10,
        "duration_ms": -1}])
    r = ImageFeatures()(t)
    f = r["features"][0].as_py()
    assert abs(f[0] - 200 / 255) < 1e-6    # mean R
    assert f[1] == 0.0 and f[2] == 0.0     # mean G/B
    thumb = decode_ppm(r["thumbnail"][0].as_py())
    assert (thumb[..., 0] == 200).all()

    rate = 8000
    tt = np.arange(rate) / rate
    for f0 in (250.0, 1000.0):
        wav = encode_wav(0.5 * np.sin(2 * np.pi * f0 * tt), rate)
        samples, got_rate = decode_wav(wav)
        assert got_rate == rate and samples.size == rate
        tab = pa.Table.from_pylist([{
            "media_id": 0, "kind": "audio", "payload": wav,
            "mime": "audio/wav", "width": -1, "height": -1,
            "duration_ms": 1000}])
        feats = AudioFeatures()(tab)["mfcc_mean"][0].as_py()
        assert abs(feats[2] - f0) < f0 * 0.1   # spectral centroid ≈ f0

    vids = rd.from_arrow(synth_media_table(2, "video"))
    frames = vids.map_batches(FrameSampler, batch_format="pyarrow",
                              concurrency=(1, 2)).take_all()
    per_vid = [r["mean_rgb"][0] for r in frames if r["media_id"] == 0]
    assert per_vid == sorted(per_vid)      # planted brightness ramp


def test_pairs_machinery_properties():
    """Property tests for the shared light-pair helpers: the vectorized
    lexsort-adjacency intersection must equal python set intersection,
    and the popcount table must equal int.bit_count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from merge_machine_ray.stages.dedup import _popcount64
    from merge_machine_ray.stages.pairs import intersect_counts

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.tuples(
        st.sets(st.integers(0, 200), max_size=12),
        st.sets(st.integers(0, 200), max_size=12)), max_size=8))
    def check_intersect(rows):
        la = pa.array([sorted(a) for a, _ in rows], pa.list_(pa.int64()))
        lb = pa.array([sorted(b) for _, b in rows], pa.list_(pa.int64()))
        inter, na, nb = intersect_counts(la, lb)
        for i, (a, b) in enumerate(rows):
            assert inter[i] == len(a & b)
            assert na[i] == len(a) and nb[i] == len(b)

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.integers(0, 2**64 - 1), max_size=32))
    def check_popcount(vals):
        arr = np.array(vals, dtype=np.uint64)
        got = _popcount64(arr)
        assert list(got) == [v.bit_count() for v in vals]

    check_intersect()
    check_popcount()


def test_lsh_bucketed_ann(ray_session):
    """lsh_topk: the band-collision filter must keep every query's own
    vector (identical sign pattern → all bands agree) and the surviving
    candidates must rank identically to brute force on that subset."""
    import ray.data as rd

    from merge_machine_ray.stages.ann import lsh_topk

    rng = np.random.RandomState(11)
    X = rng.standard_normal((300, 24))
    rows = [{"vec_id": i, "embedding": X[i].tolist()} for i in range(len(X))]
    ds = rd.from_items(rows)
    qids = [5, 120, 250]
    queries = {"ids": qids, "matrix": [X[i].tolist() for i in qids]}
    got = lsh_topk(ds, queries, k=3)
    by_q = {}
    for r in got.take_all():
        by_q.setdefault(r["query_id"], []).append(r)
    for q in qids:
        best = min(by_q[q], key=lambda r: r["rank"])
        assert best["vec_id"] == q          # self always collides
        assert abs(best["cosine"] - 1.0) < 1e-9
        assert len(by_q[q]) <= 3


def test_redact_pii_scalar_cases():
    import pyarrow as pa

    from merge_machine_ray.stages.textstats import redact_pii

    t = pa.table({"text": pa.array([
        "no pii here",
        "two mails a@b.io c.d@e-f.org plus 192.168.0.1 and 555-0000",
        "",
        None,
        "overlap 555-12345 is not a phone (5 digits)",
    ])})
    out = redact_pii(t)
    got = out["clean_text"].to_pylist()
    assert got[0] == "no pii here"
    assert got[1] == "two mails [EMAIL] [EMAIL] plus [IP] and [PHONE]"
    assert got[2] == "" and got[3] == ""
    assert "555-12345" in got[4]  # \b guard: not a 3-4 phone
    assert out["n_emails"].to_pylist() == [0, 2, 0, 0, 0]
    assert out["n_ips"].to_pylist() == [0, 1, 0, 0, 0]
    assert out["n_phones"].to_pylist() == [0, 1, 0, 0, 0]


def test_repetition_stats_scalar_cases():
    import pyarrow as pa

    from merge_machine_ray.stages.textstats import repetition_stats

    t = pa.table({"text": pa.array([
        "w w w w",          # 4 tokens 1 distinct; 3 bigrams 1 distinct
        "a b c",            # all unique
        "x",                # single token: no bigrams
        "",
        None,
        "  pad  pad ",      # leading/trailing whitespace tokens dropped
    ])})
    out = repetition_stats(t)
    assert out["n_tokens_r"].to_pylist() == [4, 3, 1, 0, 0, 2]
    assert out["dup_token_frac_micro"].to_pylist() == [
        750000, 0, 0, 0, 0, 500000]
    assert out["dup_bigram_frac_micro"].to_pylist() == [
        666666, 0, 0, 0, 0, 0]


def test_minhash_features_match_scalar(ray_session):
    """The vectorized MinHashFeatures (string-shingle crc + flat
    minhash + band crc) must be byte-identical to the scalar
    token_shingles/minhash_signature walk it replaced (round 4)."""
    import random

    import pyarrow as pa

    from merge_machine_ray.functions.hashing import crc_hash64
    from merge_machine_ray.functions.minhash import (
        minhash_signature,
        token_shingles,
    )
    from merge_machine_ray.functions.tokenize import ANALYZERS
    from merge_machine_ray.stages.dedup import (
        MinHashFeatures,
        _MASK63,
        _to_i64,
    )

    rng = random.Random(9)
    vocab = [f"word{i}" for i in range(300)]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.choice([0, 1, 2, 4, 15, 60])))
             for _ in range(500)] + ["", "   ", "!!!"]
    ids = list(range(len(texts)))
    got = MinHashFeatures("text", "doc_id", 128, 16, 3)(pa.table({
        "doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}))
    tok = ANALYZERS["standard"]
    out_id, out_sh, out_bk = [], [], []
    r = 128 // 16
    for i, txt in zip(ids, texts):
        sh = token_shingles(tok(txt or ""), 3)
        if not sh:
            continue
        sig = minhash_signature(sh, 128)
        out_id.append(i)
        out_sh.append(sorted({crc_hash64(s) & _MASK63 for s in sh}))
        out_bk.append([_to_i64(crc_hash64(
            bytes([b]) + sig[b * r:(b + 1) * r].tobytes()) & _MASK63)
            for b in range(16)])
    assert got["id"].to_pylist() == out_id
    assert got["shingles"].to_pylist() == out_sh
    assert got["band_keys"].to_pylist() == out_bk


def test_link_band_keys_match_scalar(ray_session):
    """LinkBandKeys' vectorized band keys == the scalar per-row walk."""
    import random

    import pyarrow as pa

    from merge_machine_ray.functions.hashing import crc_hash64
    from merge_machine_ray.functions.minhash import (
        minhash_signature,
        token_shingles,
    )
    from merge_machine_ray.pipelines.linking import LinkBandKeys, LinkParams

    rng = random.Random(3)
    vocab = [f"tk{i}" for i in range(150)]
    bt = [sorted({rng.choice(vocab)
                  for _ in range(rng.choice([0, 1, 3, 8, 20]))})
          for _ in range(400)]
    ids = list(range(len(bt)))
    batch = pa.table({
        "key": pa.array(ids, pa.int64()),
        "side": pa.array([i % 2 for i in ids], pa.int32()),
        "block_toks": pa.array(bt, pa.list_(pa.string()))})
    p = LinkParams.default_for([{"source": "a", "ref": "b"}])
    got = LinkBandKeys(p, 64, light=True)(batch)
    keys_w, idx_w = [], []
    r = p.num_perm // p.num_bands
    for i, toks in enumerate(bt):
        sig = minhash_signature(token_shingles(toks, p.shingle_width),
                                p.num_perm)
        for b in range(p.num_bands):
            keys_w.append(crc_hash64(
                bytes([b]) + sig[b * r:(b + 1) * r].tobytes())
                & ((1 << 63) - 1))
            idx_w.append(i)
    assert got["band_key"].to_pylist() == keys_w
    assert got["key"].to_pylist() == [ids[i] for i in idx_w]


def test_bcubed_per_record_matches_reference(ray_session):
    """Randomized B-cubed: the two-exchange bucketed stage must equal a
    per-record python reference (collections.Counter over the full
    table) on skewed random clusterings, including the micro rounding."""
    import ray.data as rd

    from merge_machine_ray.stages.er_metrics import bcubed_per_record

    rng = np.random.default_rng(7)
    n = 3000
    # skewed cluster sizes on both sides; string truth keys to cover the
    # string _sort_key path
    pred = rng.zipf(1.6, n) % 97
    truth = np.array([f"t{int(v)}" for v in rng.zipf(1.4, n) % 61])
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": ids, "cluster_id": pred.astype(np.int64),
        "rep_id": truth}))
    got = bcubed_per_record(ds, num_buckets=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    from collections import Counter
    csize = Counter(pred.tolist())
    tsize = Counter(truth.tolist())
    cell = Counter(zip(pred.tolist(), truth.tolist()))

    def micro(a, b):
        return (a * 2_000_000 + b) // (2 * b)

    for i in range(n):
        c, t = int(pred[i]), truth[i]
        assert got["cell_n"][i] == cell[(c, t)]
        assert got["csize"][i] == csize[c]
        assert got["tsize"][i] == tsize[t]
        assert got["b3_prec_micro"][i] == micro(cell[(c, t)], csize[c])
        assert got["b3_rec_micro"][i] == micro(cell[(c, t)], tsize[t])


def test_phash_invariances_and_separation():
    import numpy as np

    from merge_machine_ray.functions.phash import phash64

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(48, 64, 3)).astype(np.uint8)
    # smooth it so it has low-frequency structure (pHash's domain)
    k = np.ones((5, 5)) / 25.0
    sm = np.stack([np.real(np.fft.ifft2(
        np.fft.fft2(img[..., c].astype(float)) *
        np.fft.fft2(k, s=img.shape[:2]))) for c in range(3)], axis=-1)
    sm = np.clip(sm, 0, 255)

    h = phash64(sm)
    assert 0 <= h < (1 << 64)
    # deterministic
    assert phash64(sm) == h

    def ham(a, b):
        return bin(a ^ b).count("1")

    # brightness shift and mild noise: few bits move
    assert ham(h, phash64(np.clip(sm * 1.15 + 10, 0, 255))) <= 6
    noisy = np.clip(sm + rng.normal(0, 4, sm.shape), 0, 255)
    assert ham(h, phash64(noisy)) <= 6
    # nearest-neighbor rescale of the same image: still close
    from merge_machine_ray.functions.codecs import resize_nearest

    assert ham(h, phash64(resize_nearest(sm.astype(np.uint8), 96, 72))) <= 10
    # an unrelated smoothed image: far
    img2 = rng.integers(0, 256, size=(48, 64, 3)).astype(float)
    sm2 = np.stack([np.real(np.fft.ifft2(
        np.fft.fft2(img2[..., c]) *
        np.fft.fft2(k, s=img2.shape[:2]))) for c in range(3)], axis=-1)
    assert ham(h, phash64(np.clip(sm2, 0, 255))) >= 16


def test_image_near_dup_pairs_plants(ray_session):
    import numpy as np
    import ray.data as rd

    from merge_machine_ray.functions.codecs import encode_ppm
    from merge_machine_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        image_near_dup_pairs,
    )

    # textured corpus (smoothed random) — pure gradients are pHash's
    # degenerate input (near-zero AC coefficients), real photos aren't
    rng = np.random.default_rng(11)
    k = np.ones((5, 5)) / 25.0

    def textured():
        raw = rng.integers(0, 256, size=(48, 64, 3)).astype(float)
        sm = np.stack([np.real(np.fft.ifft2(
            np.fft.fft2(raw[..., c]) *
            np.fft.fft2(k, s=raw.shape[:2]))) for c in range(3)], axis=-1)
        return np.clip(sm, 0, 255).astype(np.uint8)

    imgs = {i: textured() for i in range(12)}
    # plant visual twins of images 0 and 1: brightness-shifted
    # re-encodes under new ids 100/101
    for src, nid in ((0, 100), (1, 101)):
        imgs[nid] = np.clip(imgs[src].astype(float) * 1.1 + 6,
                            0, 245).astype(np.uint8)

    rows = {f.name: [] for f in MEDIA_SCHEMA}
    for mid, img in imgs.items():
        rows["media_id"].append(mid)
        rows["kind"].append("image")
        rows["payload"].append(encode_ppm(img))
        rows["mime"].append("image/x-portable-pixmap")
        rows["width"].append(img.shape[1])
        rows["height"].append(img.shape[0])
        rows["duration_ms"].append(-1)
    t = pa.table({f.name: pa.array(rows[f.name], f.type)
                  for f in MEDIA_SCHEMA})

    out = image_near_dup_pairs(rd.from_arrow(t), max_hamming=6) \
        .to_pandas()
    got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b))
           for r in out.itertuples()}
    # planted twins found; nothing else merged
    assert got == {(0, 100), (1, 101)}
    assert (out["hamming"] <= 6).all()


def _broadband_clip(seed: int, rate: int = 8000, secs: float = 0.5):
    import numpy as np

    r = np.random.default_rng(seed)
    w = r.standard_normal(int(rate * secs))
    spec = np.fft.rfft(w)
    f = np.fft.rfftfreq(w.size, 1.0 / rate)
    spec *= 1.0 / np.maximum(f, 30)         # pink-ish envelope
    return np.fft.irfft(spec, n=w.size)


def test_audio_fp_invariances_and_separation():
    import numpy as np

    from merge_machine_ray.functions.audiofp import audio_fp64

    rate = 8000
    rng = np.random.default_rng(9)
    a = _broadband_clip(1)
    h = audio_fp64(a, rate)
    assert 0 <= h < (1 << 64)
    assert audio_fp64(a, rate) == h          # deterministic

    def ham(x, y):
        return bin(x ^ y).count("1")

    # EXACT gain invariance (log + double-centering)
    assert ham(h, audio_fp64(a * 2.5, rate)) == 0
    assert ham(h, audio_fp64(a * 0.1, rate)) == 0
    # additive noise: few bits
    scale = float(np.sqrt((a ** 2).mean()))
    for pct in (0.02, 0.05, 0.1):
        noisy = a + pct * scale * rng.standard_normal(a.size)
        assert ham(h, audio_fp64(noisy, rate)) <= 6
    # unrelated clips: far
    for s in range(2, 10):
        assert ham(h, audio_fp64(_broadband_clip(s), rate)) >= 16
    # degenerate inputs
    assert audio_fp64(np.zeros(10), rate) == 0
    assert audio_fp64(np.array([]), rate) == 0


def test_audio_near_dup_pairs_plants(ray_session):
    import numpy as np
    import ray.data as rd

    from merge_machine_ray.functions.codecs import encode_wav
    from merge_machine_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        audio_near_dup_pairs,
    )

    rate = 8000
    rng = np.random.default_rng(4)
    clips = {i: _broadband_clip(i) for i in range(10)}
    # plant twins: re-gained + lightly noised copies of clips 0 and 1
    for src, nid in ((0, 100), (1, 101)):
        a = clips[src]
        scale = float(np.sqrt((a ** 2).mean()))
        clips[nid] = 1.7 * (a + 0.03 * scale
                            * rng.standard_normal(a.size))

    rows = {f.name: [] for f in MEDIA_SCHEMA}
    for mid, s in clips.items():
        peak = float(np.abs(s).max()) or 1.0
        rows["media_id"].append(mid)
        rows["kind"].append("audio")
        rows["payload"].append(encode_wav(0.8 * s / peak, rate))
        rows["mime"].append("audio/wav")
        rows["width"].append(-1)
        rows["height"].append(-1)
        rows["duration_ms"].append(500)
    t = pa.table({f.name: pa.array(rows[f.name], f.type)
                  for f in MEDIA_SCHEMA})

    out = audio_near_dup_pairs(rd.from_arrow(t), max_hamming=6) \
        .to_pandas()
    got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b))
           for r in out.itertuples()}
    assert got == {(0, 100), (1, 101)}
    assert (out["hamming"] <= 6).all()


def test_video_near_dup_pairs_plants(ray_session):
    import numpy as np
    import ray.data as rd

    from merge_machine_ray.functions.codecs import encode_rawvideo
    from merge_machine_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        video_near_dup_pairs,
    )

    rng = np.random.default_rng(21)
    k = np.ones((5, 5)) / 25.0

    def textured_frame(r):
        raw = r.integers(0, 256, size=(48, 64, 3)).astype(float)
        sm = np.stack([np.real(np.fft.ifft2(
            np.fft.fft2(raw[..., c]) *
            np.fft.fft2(k, s=raw.shape[:2]))) for c in range(3)], axis=-1)
        return np.clip(sm, 0, 255).astype(np.uint8)

    def clip(seed, n_frames=6):
        r = np.random.default_rng(seed)
        return np.stack([textured_frame(r) for _ in range(n_frames)])

    # function-level: ONE replaced frame moves the majority hash a
    # little (boundary votes flip) but far less than unrelated clips
    from merge_machine_ray.functions.codecs import (
        encode_rawvideo as _enc,
    )
    from merge_machine_ray.stages.multimodal import VideoPHash

    def vhash(frames):
        t = pa.table({
            "media_id": pa.array([0], pa.int64()),
            "payload": pa.array([_enc(frames)], pa.binary())})
        return VideoPHash(frames_per_video=6)(t)["vphash"][0].as_py()

    def ham(a, b):
        return bin((a & (1 << 64) - 1) ^ (b & (1 << 64) - 1)).count("1")

    probe = clip(50)
    swapped = probe.copy()
    swapped[2] = textured_frame(np.random.default_rng(999))
    d_swap = ham(vhash(probe), vhash(swapped))
    d_other = ham(vhash(probe), vhash(clip(51)))
    assert d_swap <= 12 < d_other

    clips = {i: clip(i) for i in range(8)}
    # twins: brightness-shifted re-encode of clip 0; byte-different
    # re-render of clip 1 (same pixels, fresh container)
    clips[100] = np.clip(clips[0].astype(float) * 1.1 + 5,
                         0, 245).astype(np.uint8)
    clips[101] = clips[1].copy()

    rows = {f.name: [] for f in MEDIA_SCHEMA}
    for mid, frames in clips.items():
        rows["media_id"].append(mid)
        rows["kind"].append("video")
        rows["payload"].append(encode_rawvideo(frames))
        rows["mime"].append("video/x-raw")
        rows["width"].append(frames.shape[2])
        rows["height"].append(frames.shape[1])
        rows["duration_ms"].append(40 * frames.shape[0])
    t = pa.table({f.name: pa.array(rows[f.name], f.type)
                  for f in MEDIA_SCHEMA})

    out = video_near_dup_pairs(rd.from_arrow(t), max_hamming=6) \
        .to_pandas()
    got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b))
           for r in out.itertuples()}
    assert got == {(0, 100), (1, 101)}
    assert (out["hamming"] <= 6).all()


def test_video_phash_degenerate_payloads():
    """Zero-frame / malformed / empty video payloads hash to 0 (the
    audio_fp64 empty-input convention) instead of raising inside the
    actor-pool stage and killing the whole job on one bad row
    (r4 ADVICE, stages/multimodal.py VideoPHash)."""
    from merge_machine_ray.functions.codecs import encode_rawvideo
    from merge_machine_ray.stages.multimodal import VideoPHash

    zero_frames = encode_rawvideo(np.zeros((0, 4, 4, 3), np.uint8))
    good = encode_rawvideo(
        np.random.default_rng(7).integers(
            0, 256, size=(2, 8, 8, 3)).astype(np.uint8))
    t = pa.table({
        "media_id": pa.array([1, 2, 3, 4], pa.int64()),
        "payload": pa.array(
            [zero_frames, b"not a video", b"", good], pa.binary())})
    out = VideoPHash()(t)
    hashes = out["vphash"].to_pylist()
    assert hashes[:3] == [0, 0, 0]
    assert hashes[3] != 0
    assert out["media_id"].to_pylist() == [1, 2, 3, 4]
