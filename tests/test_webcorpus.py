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
