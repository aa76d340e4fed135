"""Model-based document classification: multinomial Naive Bayes
trained ON the corpus (distributed count folds) and applied BACK over
the corpus (broadcast model + streaming scorer).

The quality-classifier shape every large-scale training-data pipeline
runs (fastText-style "score each page with a trained linear model and
keep the confident ones"): training reduces to count statistics — so
it distributes as two vocabulary-bounded groupby folds — and inference
is one broadcast table + one vectorized lookup-and-segment-sum pass
per batch. Everything is exact integer micros so the DuckDB twin
matches bit for bit.

Scale notes (100 TB):
* Training pass: per-batch (label, token, partial_count) rows — one
  dictionary-encode + bincount over the COMBINED (label, token) key
  per batch — folded by one groupby; the exchange is bounded by
  labels × per-block vocabulary, never per token occurrence. The
  per-label doc counts (priors) are a second, label-sized fold.
* The fitted model (per-label token log-probs over the shared
  vocabulary) is vocabulary-bounded and broadcast ONCE via
  ``ray.put`` — the IDF-table contract. Inference does ONE
  ``index_in`` against the shared vocab per batch, then L gathers.
* Per-token log-probs are micro-quantized BEFORE the per-doc fold, so
  float summation order can never flip a prediction across engines or
  partitionings.

Semantics (mirrored exactly by the SQL twin): tokens are maximal
[a-z0-9]+ runs of the lowercased text; add-one smoothing over the
CORPUS vocabulary V (union across labels); per-doc label score =
ln-prior + Σ per-token ln P(tok|label), all in int64 micros; predicted
label = argmax, ties broken label-ascending; docs with zero tokens
drop out; margin = best − runner-up (needs ≥ 2 labels — with fewer
the result is empty, as the twin's rank-2 join makes it).

Reference parity: Merge-Machine has no trained-classifier surface
(its match decision is the learned-threshold gate, `es_match.py`);
this module belongs to the training-data extension of SURVEY.md §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SPLIT_PATTERN = "[^a-z0-9]+"   # shared with stages/idf.py, stages/bpe.py


def _np(arr):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False)


def _doc_tokens(t: pa.Table, text_col: str):
    """Flatten a batch into (flat_tokens:StringArray, row_ids:int64[])
    with '' artifacts removed."""
    txt = t[text_col].cast(pa.string())
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(txt, "")), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    row_ids = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                        np.diff(offsets))
    if len(flat):
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        row_ids = row_ids[keep]
    return flat, row_ids


def partial_label_token_counts(t: pa.Table, text_col: str,
                               label_col: str) -> pa.Table:
    """Per-batch (label, tok, pc_) partial counts: one combined-key
    dictionary encode + bincount — no python per token or label."""
    empty = pa.table({"label": pa.array([], pa.string()),
                      "tok": pa.array([], pa.string()),
                      "pc_": pa.array([], pa.int64())})
    flat, row_ids = _doc_tokens(t, text_col)
    if not len(flat):
        return empty
    lab = pc.dictionary_encode(
        pc.fill_null(t[label_col].cast(pa.string()), ""))
    if isinstance(lab, pa.ChunkedArray):
        lab = lab.combine_chunks()
    lab_codes = _np(lab.indices).astype(np.int64)[row_ids]
    te = pc.dictionary_encode(flat)
    tok_codes = _np(te.indices).astype(np.int64)
    n_tok = len(te.dictionary)
    key = lab_codes * n_tok + tok_codes
    o = np.argsort(key, kind="stable")
    ks = key[o]
    cuts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
    cnt = np.diff(np.concatenate((cuts, [ks.size]))).astype(np.int64)
    kc = ks[cuts]
    return pa.table({
        "label": lab.dictionary.take(pa.array(kc // n_tok)),
        "tok": te.dictionary.take(pa.array(kc % n_tok)),
        "pc_": pa.array(cnt),
    })


#: Hard cap on the (label × token) count rows `nb_train` collects to
#: the driver — the model matrix must be broadcastable, and a web-scale
#: token vocabulary is not. Same bounded-collect contract as
#: ``stages/idf.DRIVER_FOLD_LIMIT``; past the cap the collect fails
#: LOUDLY naming the pruning knob (``min_df``).
DRIVER_VOCAB_LIMIT = 20_000_000


def nb_train(ds, text_col: str = "text", label_col: str = "lang",
             min_df: int = 1,
             driver_vocab_limit: int = DRIVER_VOCAB_LIMIT):
    """Distributed NB fit → broadcastable model dict.

    Returns ``{"labels", "vocab", "lp_micro" (L×V int64),
    "default_micro" (L), "prior_micro" (L)}`` — all vocabulary- or
    label-bounded (the IDF broadcast contract). ``min_df`` prunes
    (label, token) cells whose count falls below it DISTRIBUTED,
    before the driver collect; the collect itself is gated at
    ``driver_vocab_limit`` rows and raises (naming ``min_df``) rather
    than materializing an unbroadcastable model."""
    from ray.data.aggregate import Count, Sum

    cnt_ds = ds.map_batches(
        lambda t: partial_label_token_counts(t, text_col, label_col),
        batch_format="pyarrow") \
        .groupby(["label", "tok"]).aggregate(Sum("pc_", alias_name="c"))
    if min_df > 1:
        cnt_ds = cnt_ds.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t["c"].cast(pa.int64()), min_df)),
            batch_format="pyarrow")
    parts = []
    collected = 0
    for b in cnt_ds.iter_batches(batch_size=1 << 16,
                                 batch_format="pyarrow"):
        parts.append(b)
        collected += b.num_rows
        if collected > driver_vocab_limit:
            raise ValueError(
                f"nb_train: (label × token) count rows exceed "
                f"driver_vocab_limit={driver_vocab_limit} at "
                f"min_df={min_df}; raise min_df (prunes the rare-token "
                "tail distributed, before the collect) or the limit — "
                "the model matrix must stay broadcastable")
    cnt = (pa.concat_tables(parts) if parts else
           pa.table({"label": pa.array([], pa.string()),
                     "tok": pa.array([], pa.string()),
                     "c": pa.array([], pa.int64())}))

    def lab_partial(t: pa.Table) -> pa.Table:
        return pa.table({"label": pc.fill_null(
            t[label_col].cast(pa.string()), "")})

    pri_rows = ds.map_batches(lab_partial, batch_format="pyarrow") \
        .groupby("label").aggregate(Count(alias_name="nd")).take_all()
    labels = sorted(r["label"] for r in pri_rows)
    nd = np.array([next(r["nd"] for r in pri_rows if r["label"] == lb)
                   for lb in labels], dtype=np.int64)

    tok_enc = pc.dictionary_encode(
        cnt["tok"].combine_chunks() if isinstance(cnt["tok"],
                                                  pa.ChunkedArray)
        else cnt["tok"])
    vocab = tok_enc.dictionary
    v = len(vocab)
    lab2row = {lb: i for i, lb in enumerate(labels)}
    rows = np.array([lab2row[x] for x in cnt["label"].to_pylist()],
                    dtype=np.int64)
    cols = _np(tok_enc.indices).astype(np.int64)
    c = _np(cnt["c"].cast(pa.int64()))
    L = len(labels)
    mat = np.zeros((L, max(v, 1)), dtype=np.int64)
    if c.size:
        mat[rows, cols] = c
    n_lab = mat.sum(axis=1)
    if v:
        lp_micro = np.round(np.log(
            (mat + 1.0) / (n_lab + v)[:, None]) * 1e6).astype(np.int64)
        default_micro = np.round(
            np.log(1.0 / (n_lab + v)) * 1e6).astype(np.int64)
    else:  # token-less corpus: no scorable docs, values never read
        lp_micro = np.zeros((L, 1), dtype=np.int64)
        default_micro = np.zeros(L, dtype=np.int64)
    prior_micro = np.round(
        np.log(nd / nd.sum()) * 1e6).astype(np.int64)
    return {"labels": labels, "vocab": vocab,
            "lp_micro": lp_micro if v else lp_micro[:, :0],
            "default_micro": default_micro, "prior_micro": prior_micro}


class NbScorer:
    """Actor-pool stage: broadcast NB model in, per-doc prediction out
    — ``(id, pred_label, score_micro, margin_micro)``. Zero-token docs
    drop; fewer than 2 labels → empty output (twin semantics)."""

    def __init__(self, model_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray
        self._m = ray.get(model_ref)
        self._text_col = text_col
        self._id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        m = self._m
        labels, vocab = m["labels"], m["vocab"]
        empty = pa.table({
            self._id_col: pa.array([], t[self._id_col].type),
            "pred_label": pa.array([], pa.string()),
            "score_micro": pa.array([], pa.int64()),
            "margin_micro": pa.array([], pa.int64())})
        if len(labels) < 2:
            return empty
        flat, row_ids = _doc_tokens(t, self._text_col)
        if not len(flat):
            return empty
        pos = pc.index_in(flat, value_set=vocab)
        valid = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        idxs = np.zeros(len(valid), dtype=np.int64)
        if len(vocab):
            pos_np = pos.to_numpy(zero_copy_only=False)
            idxs[valid] = pos_np[valid].astype(np.int64)
        L = len(labels)
        n = t.num_rows
        scores = np.empty((L, n), dtype=np.int64)
        for li in range(L):
            tok_lp = np.where(valid & (len(vocab) > 0),
                              m["lp_micro"][li][idxs],
                              m["default_micro"][li])
            s = np.zeros(n, dtype=np.int64)
            np.add.at(s, row_ids, tok_lp)
            scores[li] = s + m["prior_micro"][li]
        has_tok = np.zeros(n, dtype=bool)
        has_tok[row_ids] = True
        # argmax with label-ascending tie-break: labels are scanned in
        # sorted order, strict > keeps the earliest label on ties
        best = scores[0].copy()
        best_li = np.zeros(n, dtype=np.int64)
        second = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
        for li in range(1, L):
            s = scores[li]
            gt = s > best
            second = np.where(gt, best, np.maximum(second, s))
            best = np.where(gt, s, best)
            best_li = np.where(gt, li, best_li)
        keep = np.flatnonzero(has_tok)
        lab_arr = pa.array(np.asarray(labels, dtype=object)[best_li[keep]],
                           pa.string())
        ids = t[self._id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            self._id_col: ids.take(pa.array(keep)),
            "pred_label": lab_arr,
            "score_micro": pa.array(best[keep]),
            "margin_micro": pa.array(best[keep] - second[keep]),
        })


def nb_classify(ds, text_col: str = "text", label_col: str = "lang",
                id_col: str = "doc_id", concurrency=(1, 4)):
    """Train on the corpus, broadcast the model, score every doc."""
    import ray

    model = nb_train(ds, text_col, label_col)
    ref = ray.put(model)
    return ds.map_batches(NbScorer, fn_constructor_args=(ref,),
                          fn_constructor_kwargs={"text_col": text_col,
                                                 "id_col": id_col},
                          batch_format="pyarrow",
                          concurrency=concurrency)
