"""Naive Bayes classifier stage: sequential-reference parity, tie and
zero-token semantics, single-label emptiness, and self-consistency on
a separable corpus."""

import math
import random

import numpy as np
import pyarrow as pa

from merge_machine_ray.stages.classify import (
    NbScorer,
    nb_classify,
    nb_train,
    partial_label_token_counts,
)


def _ref_predict(docs, labels):
    """Sequential dict-based reference with the exact micro semantics:
    returns {doc_idx: (pred, score, margin)} for docs with ≥1 token."""
    def toks(s):
        import re
        return [w for w in re.split("[^a-z0-9]+", s.lower()) if w]

    cnt, nd = {}, {}
    vocab = set()
    for d, lb in zip(docs, labels):
        nd[lb] = nd.get(lb, 0) + 1
        for w in toks(d):
            cnt[(lb, w)] = cnt.get((lb, w), 0) + 1
            vocab.add(w)
    v = len(vocab)
    labs = sorted(nd)
    n_lab = {lb: sum(c for (l2, _), c in cnt.items() if l2 == lb)
             for lb in labs}
    td = sum(nd.values())
    out = {}
    if len(labs) < 2:
        return out
    for i, d in enumerate(docs):
        ws = toks(d)
        if not ws:
            continue
        scores = []
        for lb in labs:
            s = int(np.round(math.log(nd[lb] / td) * 1e6))
            for w in ws:
                c = cnt.get((lb, w), 0)
                s += int(np.round(
                    math.log((c + 1.0) / (n_lab[lb] + v)) * 1e6))
            scores.append((s, lb))
        ranked = sorted(scores, key=lambda t: (-t[0], t[1]))
        out[i] = (ranked[0][1], ranked[0][0],
                  ranked[0][0] - ranked[1][0])
    return out


def _mk_ds(docs, labels):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs),
        "lang": pa.array(labels)})).repartition(5)


def test_nb_matches_sequential_reference(ray_session):
    rng = random.Random(11)
    vocab_a = ["alpha", "beta", "gamma", "delta", "x1"]
    vocab_b = ["omega", "sigma", "tau", "beta", "x1"]
    docs, labels = [], []
    for i in range(120):
        lb = rng.choice(["aa", "bb"])
        vv = vocab_a if lb == "aa" else vocab_b
        docs.append(" ".join(rng.choice(vv)
                             for _ in range(rng.randint(0, 12))))
        labels.append(lb)
    docs[5] = ""          # zero-token rows drop
    docs[17] = "  ,,  "
    got = {r["doc_id"]: (r["pred_label"], r["score_micro"],
                         r["margin_micro"])
           for r in nb_classify(_mk_ds(docs, labels),
                                concurrency=2).take_all()}
    want = _ref_predict(docs, labels)
    assert got == want
    assert 5 not in got and 17 not in got
    # a separable corpus should mostly recover its own labels
    hits = sum(got[i][0] == labels[i] for i in got)
    assert hits / len(got) > 0.9


def test_nb_single_label_is_empty(ray_session):
    ds = _mk_ds(["some text", "more text"], ["en", "en"])
    assert nb_classify(ds, concurrency=1).count() == 0


def test_nb_tie_breaks_label_ascending(ray_session):
    # perfectly symmetric corpus: every doc scores equal under both
    # labels, so every prediction is the smaller label with margin 0
    docs = ["tok tok", "tok tok"]
    labels = ["zz", "aa"]
    rows = nb_classify(_mk_ds(docs, labels), concurrency=1).take_all()
    assert len(rows) == 2
    for r in rows:
        assert r["pred_label"] == "aa"
        assert r["margin_micro"] == 0


def test_partial_counts_shape():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b a", "b c"]),
                  "lang": pa.array(["x", "y"])})
    out = partial_label_token_counts(t, "text", "lang")
    d = {(l, w): c for l, w, c in zip(out["label"].to_pylist(),
                                      out["tok"].to_pylist(),
                                      out["pc_"].to_pylist())}
    assert d == {("x", "a"): 2, ("x", "b"): 1,
                 ("y", "b"): 1, ("y", "c"): 1}


def test_nb_train_driver_vocab_limit_raises(ray_session):
    """The (label × token) driver collect is gated (r4 VERDICT #2):
    an over-limit count table fails LOUDLY naming min_df instead of
    materializing an unbroadcastable model; min_df prunes the tail
    distributed so the same corpus fits again."""
    import ray.data as rd
    import pytest

    docs = [" ".join(f"w{i}x{j}" for j in range(40)) + " common"
            for i in range(20)]
    t = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                  "text": pa.array(docs),
                  "lang": pa.array(["en"] * 10 + ["fr"] * 10)})
    with pytest.raises(ValueError, match="min_df"):
        nb_train(rd.from_arrow(t), driver_vocab_limit=50)
    # distributed min_df pruning drops the singleton tail -> fits
    model = nb_train(rd.from_arrow(t), min_df=5,
                     driver_vocab_limit=50)
    assert "common" in set(
        model["vocab"].to_pylist()
        if hasattr(model["vocab"], "to_pylist") else model["vocab"])
