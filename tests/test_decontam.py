"""Decontamination / chunking / incremental-dedup primitives vs
sequential references on randomized inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from merge_machine_ray.stages.decontam import chunk_docs, ngram_table


def _rand_docs(rng, n_docs, vocab=8, max_len=40):
    words = [f"w{i}" for i in range(vocab)]
    texts = [" ".join(rng.choice(words, size=rng.integers(0, max_len)))
             for _ in range(n_docs)]
    return pa.table({"doc_id": pa.array(range(n_docs), pa.int64()),
                     "text": pa.array(texts)})


def _ref_ngrams(texts, n):
    out = []
    for i, t in enumerate(texts):
        toks = t.split(" ")
        for j in range(len(toks) - n + 1):
            out.append((i, " ".join(toks[j:j + n])))
    return out


@pytest.mark.parametrize("seed,n", [(0, 2), (1, 3), (2, 5)])
def test_ngram_table_matches_sequential(seed, n):
    rng = np.random.default_rng(seed)
    t = _rand_docs(rng, 50)
    got = ngram_table(t, n).to_pandas()
    want = pd.DataFrame(_ref_ngrams(t["text"].to_pylist(), n),
                        columns=["doc_id", "gram"])
    got = got.sort_values(["doc_id", "gram"]).reset_index(drop=True)
    want = want.sort_values(["doc_id", "gram"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("seed,size", [(3, 4), (4, 7), (5, 32)])
def test_chunk_docs_matches_sequential(seed, size):
    rng = np.random.default_rng(seed)
    t = _rand_docs(rng, 40)
    got = chunk_docs(t, size).to_pandas()
    rows = []
    for i, s in enumerate(t["text"].to_pylist()):
        toks = s.split(" ")
        for ci in range(-(-len(toks) // size)):
            ch = toks[ci * size:(ci + 1) * size]
            rows.append((i, ci, " ".join(ch), len(ch)))
    want = pd.DataFrame(rows, columns=["doc_id", "chunk_idx",
                                       "chunk_text", "n_tokens"])
    key = ["doc_id", "chunk_idx"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # chunks reassemble the exact original text
    re = got.groupby("doc_id")["chunk_text"].apply(" ".join)
    assert list(re) == t["text"].to_pylist()


def test_decontaminate_filter_and_report_agree(ray_session):
    import ray
    import ray.data as rd

    from merge_machine_ray.stages.decontam import (
        decontaminate, eval_gram_set)

    rng = np.random.default_rng(7)
    t = _rand_docs(rng, 120, vocab=5, max_len=15)
    ds = rd.from_arrow(t)
    ev = ds.map_batches(
        lambda b: b.filter(pa.array(
            b["doc_id"].to_numpy(zero_copy_only=False) % 10 == 0)),
        batch_format="pyarrow")
    tr = ds.map_batches(
        lambda b: b.filter(pa.array(
            b["doc_id"].to_numpy(zero_copy_only=False) % 10 != 0)),
        batch_format="pyarrow")
    ref = ray.put(eval_gram_set(ev, 3))
    rep = decontaminate(tr, ref, 3, mode="report").to_pandas()
    kept = decontaminate(tr, ref, 3, mode="filter").to_pandas()
    n_train = len([i for i in range(120) if i % 10 != 0])
    assert len(rep) + len(kept) == n_train
    assert set(rep.doc_id).isdisjoint(set(kept.doc_id))
    assert (rep.n_contaminated >= 1).all()
    # tiny-vocab corpus: contamination must actually fire
    assert len(rep) > 0


def test_incremental_dedup_randomized(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.dedup import incremental_dedup

    rng = np.random.default_rng(11)
    texts = [f"doc {rng.integers(0, 30)}" for _ in range(200)]
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts)})
    inc = rd.from_arrow(t.filter(pa.array(
        [i % 2 == 1 for i in range(200)])))
    ex = rd.from_arrow(t.filter(pa.array(
        [i % 2 == 0 for i in range(200)])))
    got = sorted(incremental_dedup(inc, ex).to_pandas().doc_id)
    existing = {texts[i] for i in range(200) if i % 2 == 0}
    want = sorted(i for i in range(200)
                  if i % 2 == 1 and texts[i] not in existing)
    assert got == want
