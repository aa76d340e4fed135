"""BM25 retrieval: sequential-reference parity on a tiny synthetic
corpus (both the single-query and the bulk msearch variants), plus
ranking-shape sanity."""

import math
import re

import numpy as np
import pyarrow as pa

from merge_machine_ray.stages.webcorpus import bm25_msearch, bm25_topk

K1, B = 1.2, 0.75


def _toks(s):
    return [w for w in re.split("[^a-z0-9]+", s.lower()) if w]


def _ref_scores(docs, query_terms):
    """{doc_idx: micro score} for docs with >0 score — exact micro
    arithmetic mirroring the engine/twin."""
    tl = [_toks(d) for d in docs]
    n = len(docs)
    t_total = sum(len(t) for t in tl)
    out = {}
    for i, toks in enumerate(tl):
        dl = len(toks)
        s = 0
        for q in sorted(set(query_terms)):
            tf = toks.count(q)
            if not tf:
                continue
            df = sum(1 for t2 in tl if q in t2)
            idf_micro = int(np.round(math.log(
                (n - df + 0.5) / (df + 0.5) + 1.0) * 1e6))
            term = (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * dl * n / t_total))
            s += idf_micro * int(np.round(term * 1e6)) // 1_000_000
        if s > 0:
            out[i] = s
    return out


def _mk_ds(docs):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs)})).repartition(3)


DOCS = [
    "merge join hash join sort",
    "scan scan scan filter",
    "join",
    "window order by sort key",
    "",
    "hash hash hash hash hash hash hash merge",
    "the quick brown fox",
    "merge merge join scan",
]


def test_bm25_topk_matches_reference(ray_session):
    got = bm25_topk(_mk_ds(DOCS), ["join", "merge"], k=5)
    rows = list(zip(got["doc_id"].to_pylist(),
                    got["bm25_micro"].to_pylist()))
    want = _ref_scores(DOCS, ["join", "merge"])
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert rows == ranked
    # doc stuffed with both query terms outranks single-term docs
    assert rows[0][0] in (0, 7)


def test_bm25_msearch_matches_reference(ray_session):
    queries = [(10, "join merge"), (20, "scan"), (30, "zzz absent")]
    got = bm25_msearch(_mk_ds(DOCS), queries, k=2)
    by_q = {}
    for q, d, s in zip(got["qid"].to_pylist(),
                       got["doc_id"].to_pylist(),
                       got["bm25_micro"].to_pylist()):
        by_q.setdefault(q, []).append((d, s))
    for qid, text in queries:
        want = _ref_scores(DOCS, _toks(text))
        ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        assert by_q.get(qid, []) == ranked, qid
    assert 30 not in by_q  # absent-term query returns nothing
