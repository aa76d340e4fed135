"""Unit coverage for the web-corpus organization kernels
(functions/urls.py + stages/webcorpus.py). The end-to-end DuckDB
conformance of the four queries built on them lives in
test_queries_oracle.py (pages_host_stats / doc_keywords /
source_overlap / filter_funnel)."""

import pyarrow as pa

from merge_machine_ray.functions.urls import (registered_domain, url_host,
                                              url_path)


def test_url_host_parses_authority_forms():
    a = pa.array([
        "https://ex5.Example.com/doc/123",
        "http://user:pw@news.ex3.example.com:8080/a/b?q=1#f",
        "ftp://HOST.ORG",
        "https://h/?q",
        "not a url",
        None,
    ])
    assert url_host(a).to_pylist() == [
        "ex5.example.com", "news.ex3.example.com", "host.org", "h",
        "", ""]


def test_url_path_defaults_to_root():
    a = pa.array(["https://a.com/x/y?z=1", "https://a.com", "junk"])
    assert url_path(a).to_pylist() == ["/x/y", "/", "/"]


def test_registered_domain_suffix_heuristic():
    hosts = pa.array(["news.ex3.example.com", "example.com", "org",
                      "a.b.c.d.co", ""])
    assert registered_domain(hosts).to_pylist() == [
        "example.com", "example.com", "org", "d.co", ""]


def test_host_stats_small(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import host_stats

    t = pa.table({
        "url": ["https://a.com/1", "https://a.com/2", "https://b.com/1"],
        "warc_ts": pa.array([1000, 2000, 3000], pa.int64())
            .cast(pa.timestamp("s")).cast(pa.timestamp("us")),
        "lang": ["en", "fr", "en"],
    })
    out = host_stats(rd.from_arrow(t)).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    assert out["host"].tolist() == ["a.com", "b.com"]
    assert out["n_pages"].tolist() == [2, 1]
    assert out["n_langs"].tolist() == [2, 1]
    assert out["first_ep"].tolist() == [1000, 3000]
    assert out["last_ep"].tolist() == [2000, 3000]


def test_source_overlap_counts_distinct_shared_texts(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import source_overlap

    t = pa.table({
        "doc_id": pa.array(range(7), pa.int64()),
        "text": ["x", "x", "y", "y", "y", "z", "x"],
        # x shared by (s1,s2) twice on s1 side (dup row must not
        # double-count), y by (s1,s2,s3), z only in s3
        "source": ["s1", "s2", "s1", "s2", "s3", "s3", "s1"],
    })
    out = source_overlap(rd.from_arrow(t)).to_pandas()
    got = {(r.src_a, r.src_b): r.n_shared for r in out.itertuples()}
    assert got == {("s1", "s2"): 2, ("s1", "s3"): 1, ("s2", "s3"): 1}


def test_remove_common_lines_semantics(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import remove_common_lines

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "banner\nalpha one\nbeta two",      # banner common
            "banner\nbanner\ngamma three",      # in-doc dup counts ONCE
            "banner",                           # everything removed
            "delta four\nepsilon five",         # untouched
        ]),
    })
    out = remove_common_lines(rd.from_arrow(docs), min_df=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["clean_text"].tolist() == [
        "alpha one\nbeta two", "gamma three", "", "delta four\nepsilon five"]
    assert out["n_lines"].tolist() == [3, 3, 1, 2]
    assert out["n_kept"].tolist() == [2, 1, 0, 2]


def test_remove_common_lines_all_unique_noop(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import remove_common_lines

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a\nb", "c\nd"]),
    })
    out = remove_common_lines(rd.from_arrow(docs), min_df=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["clean_text"].tolist() == ["a\nb", "c\nd"]
    assert out["n_kept"].tolist() == [2, 2]


def test_common_lines_df_is_distinct_docs(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import common_lines

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        # 'x' repeats 3 times but only inside doc 1 → df=1, NOT common
        "text": pa.array(["x\nx\nx\nshared", "shared\ny"]),
    })
    got = sorted(common_lines(rd.from_arrow(docs), min_df=2).to_pylist())
    assert got == ["shared"]


def test_latest_snapshot_argmax_and_tiebreak(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import latest_snapshot

    pages = pa.table({
        "url": pa.array(["u1", "u1", "u1", "u2", "u2", "u3"]),
        "warc_ep": pa.array([10, 30, 20, 5, 5, 1], pa.int64()),
        "doc_id": pa.array([1, 2, 3, 4, 9, 7], pa.int64()),
    })
    out = latest_snapshot(rd.from_arrow(pages)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert out["url"].tolist() == ["u1", "u2", "u3"]
    assert out["doc_id"].tolist() == [2, 9, 7]    # u2: ep tie → max id
    assert out["warc_ep"].tolist() == [30, 5, 1]
    assert out["n_snapshots"].tolist() == [3, 2, 1]


def test_canonical_groups_collapses_decorations(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import canonical_groups

    pages = pa.table({
        "url": pa.array([
            "https://ex.com/a",
            "https://www.ex.com/a",
            "https://ex.com:443/a?utm_source=x",
            "https://ex.com/a?page=2",
        ]),
        "doc_id": pa.array([4, 2, 3, 9], pa.int64()),
    })
    out = canonical_groups(rd.from_arrow(pages)).to_pandas() \
        .sort_values("canon_url").reset_index(drop=True)
    assert out["canon_url"].tolist() == [
        "https://ex.com/a", "https://ex.com/a?page=2"]
    assert out["n_pages"].tolist() == [3, 1]
    assert out["first_doc"].tolist() == [2, 9]


def test_remove_repeated_spans_exact_coverage(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import remove_repeated_spans

    spam = "s1 s2 s3 s4"                      # 4-token shared span
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"a b {spam} c d",                # span mid-doc
            f"{spam} x y z",                  # span at start
            "p q r s t u v w",                # untouched
        ]),
    })
    out = remove_repeated_spans(rd.from_arrow(docs), n=4, min_df=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # only the 4 spam tokens are covered: boundary grams mix doc-
    # specific tokens so they never repeat across docs
    assert out["clean_text"].tolist() == ["a b c d", "x y z",
                                          "p q r s t u v w"]
    assert out["n_covered"].tolist() == [4, 4, 0]
    assert out["n_tokens"].tolist() == [8, 7, 8]


def test_remove_repeated_spans_within_doc_repeat_not_removed(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import remove_repeated_spans

    # the 3-gram "r r r" repeats INSIDE doc 1 only → df counts
    # distinct docs → 1 < min_df → kept
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["r r r r r r", "a b c d e f"]),
    })
    out = remove_repeated_spans(rd.from_arrow(docs), n=3, min_df=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["n_covered"].tolist() == [0, 0]
    assert out["clean_text"].tolist() == ["r r r r r r", "a b c d e f"]


def test_unigram_lm_scores_semantics(ray_session):
    import numpy as np
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import unigram_lm_scores

    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a a b", "b c"]),
    })
    out = unigram_lm_scores(rd.from_arrow(docs)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # corpus: a×2 b×2 c×1, N=5 V=3 → lp(tok)=ln((c+1)/8)
    lp = {t: int(np.round(np.log((c + 1) / 8.0) * 1e6))
          for t, c in {"a": 2, "b": 2, "c": 1}.items()}
    s1 = 2 * lp["a"] + lp["b"]
    s2 = lp["b"] + lp["c"]
    assert out["lp_sum_micro"].tolist() == [s1, s2]
    assert out["n_tokens"].tolist() == [3, 2]
    assert out["avg_lp_micro"].tolist() == [s1 // 3, s2 // 2]
    # repeat docs score higher (less negative) than rare-token docs
    assert out["avg_lp_micro"][0] > out["avg_lp_micro"][1]


def test_mirror_hosts_counts_and_cap(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import mirror_hosts

    # text "m" mirrored on h1,h2,h3; "n" on h1,h2 (twice on h1 — the
    # duplicate page must not double-count); "u" unique to h9
    rows = [("m", "h1"), ("m", "h2"), ("m", "h3"),
            ("n", "h1"), ("n", "h1"), ("n", "h2"), ("u", "h9")]
    t = pa.table({
        "url": pa.array([f"https://{h}.ex.com/p{i}"
                         for i, (_, h) in enumerate(rows)]),
        "text": pa.array([txt for txt, _ in rows]),
    })
    out = mirror_hosts(rd.from_arrow(t)).to_pandas()
    got = {(r.host_a, r.host_b): r.n_shared for r in out.itertuples()}
    assert got == {("h1.ex.com", "h2.ex.com"): 2,
                   ("h1.ex.com", "h3.ex.com"): 1,
                   ("h2.ex.com", "h3.ex.com"): 1}

    # cap=2: "m" pairs only its first two hosts lexicographically
    out = mirror_hosts(rd.from_arrow(t), max_hosts_per_text=2).to_pandas()
    got = {(r.host_a, r.host_b): r.n_shared for r in out.itertuples()}
    assert got == {("h1.ex.com", "h2.ex.com"): 2}

    # min_shared filters pairs below the threshold
    out = mirror_hosts(rd.from_arrow(t), min_shared=2).to_pandas()
    got = {(r.host_a, r.host_b): r.n_shared for r in out.itertuples()}
    assert got == {("h1.ex.com", "h2.ex.com"): 2}


def test_gram_novelty_first_occurrence_attribution(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import gram_novelty

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b c d",        # grams: "a b","b c","c d" — all novel
            "a b c e a b c e a b",  # "a b","b c" seen in doc 1;
                                    # in-doc repeats count ONCE
            "x",              # < n tokens → no grams → row vanishes
            "c d z",          # "c d" seen in doc 1, "d z" novel
        ]),
    })
    out = gram_novelty(rd.from_arrow(docs), n=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 4]
    # doc2 distinct 2-grams: a b, b c, c e, e a — novel: c e, e a
    assert out["n_grams"].tolist() == [3, 4, 2]
    assert out["n_novel"].tolist() == [3, 2, 1]
    assert out["novelty_micro"].tolist() == [1_000_000, 500_000, 500_000]


def test_gram_novelty_bucket_invariance(ray_session):
    import numpy as np
    import ray.data as rd

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 20)))
             for _ in range(60)]
    docs = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                     "text": pa.array(texts)})

    from merge_machine_ray.stages.webcorpus import gram_novelty

    a = gram_novelty(rd.from_arrow(docs), n=3, num_buckets=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = gram_novelty(rd.from_arrow(docs).repartition(8), n=3,
                     num_buckets=17) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    # sequential reference: first-occurrence by ascending doc_id
    seen: set = set()
    for row in a.itertuples():
        toks = texts[row.doc_id].split(" ")
        grams = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        novel = {g for g in grams if g not in seen}
        seen |= grams
        assert row.n_grams == len(grams)
        assert row.n_novel == len(novel)
        assert row.novelty_micro == len(novel) * 1_000_000 // len(grams)


def test_gram_novelty_fingerprint_carrier_matches_string(ray_session):
    """The 100 TB exchange carrier (16-byte blake2b fingerprints, two
    int64 columns) produces IDENTICAL per-doc novelty to the string
    carrier, on both partition-invariance axes (input blocks × bucket
    count) — r4 VERDICT #3."""
    import numpy as np
    import ray.data as rd

    from merge_machine_ray.stages.webcorpus import gram_novelty

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(15)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 25)))
             for _ in range(80)]
    docs = pa.table({"doc_id": pa.array(range(80), pa.int64()),
                     "text": pa.array(texts)})

    base = gram_novelty(rd.from_arrow(docs), n=3, num_buckets=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    fp1 = gram_novelty(rd.from_arrow(docs), n=3, num_buckets=4,
                       carrier="fingerprint") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    fp2 = gram_novelty(rd.from_arrow(docs).repartition(7), n=3,
                       num_buckets=13, carrier="fingerprint") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert base.equals(fp1)
    assert base.equals(fp2)

    import pytest
    with pytest.raises(ValueError, match="carrier"):
        gram_novelty(rd.from_arrow(docs), carrier="zstd")
