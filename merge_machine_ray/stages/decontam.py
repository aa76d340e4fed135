"""Eval-set decontamination and training-chunk preparation.

Two corpus-hygiene operators a training-data pipeline needs that lift
the reference's shingle idea (A2 ``n_grams`` analyzer,
``merge_machine/es_gen_resource.py``-style token machinery; SURVEY
§2.3) from per-field blocking to corpus level:

* :func:`decontaminate` — flag/drop training documents that share any
  whitespace n-gram with a (small) evaluation set: the standard
  "remove benchmark contamination" pass (GPT-3 §4 / Llama-style
  13-gram overlap; here the n is a parameter).
* :func:`chunk_docs` — split each document into fixed-size token
  windows (training sequence preparation), emitting
  ``(doc_id, chunk_idx, chunk_text, n_tokens)``.

Scale notes (100 TB design point):

* The eval-gram set is built from the EVAL side — benchmarks are tiny
  by construction (thousands of docs, not corpora) — collected once on
  the driver and broadcast once via ``ray.put``; every train task
  reads it zero-copy from the object store. If the eval side ever
  grows past object-store comfort, hash the grams to int64 first
  (membership semantics identical modulo 2^-64 collisions) — the
  string form is kept here because it is what the DuckDB oracle twin
  can replay exactly.
* The train side streams: one Arrow ``split_pattern`` + ``take`` +
  ``is_in`` per batch, no per-row python, nothing driver-resident.
* Chunking is a pure map: token windows never leave their batch, and
  chunk boundaries are block-local (offsets arithmetic + one
  ``binary_join``), so the stage pipelines with the read.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["ngram_table", "eval_gram_set", "decontaminate", "chunk_docs"]


def _split_tokens(txt) -> pa.ListArray:
    """Whitespace-token lists, DuckDB ``string_split(text, ' ')``
    semantics (single-space separator, '' tokens preserved)."""
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    toks = pc.split_pattern(pc.fill_null(txt.cast(pa.string()), ""), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    return toks


def _window_starts(offsets: np.ndarray, width: int):
    """Global flat-token start index of every n-gram window.

    Returns ``(starts, row_ids)`` — one entry per window, rows with
    fewer than ``width`` tokens contribute none."""
    counts = np.diff(offsets)
    wins = np.maximum(counts - width + 1, 0).astype(np.int64)
    total = int(wins.sum())
    if total == 0:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    row_ids = np.repeat(np.arange(len(counts), dtype=np.int64), wins)
    cum = np.concatenate([[0], np.cumsum(wins)[:-1]])
    starts = (np.arange(total, dtype=np.int64)
              - np.repeat(cum, wins)
              + np.repeat(offsets[:-1].astype(np.int64), wins))
    return starts, row_ids


def ngram_table(batch: pa.Table, n: int, col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """Per-batch ``(doc_id, gram)`` rows: every whitespace ``n``-gram of
    every document, as the exact space-joined string the SQL twin
    produces (``array_to_string(list_slice(ts, i, i+n-1), ' ')``).

    Fully vectorized: one Arrow split, ``n`` index ``take``s, one
    ``binary_join_element_wise``."""
    toks = _split_tokens(batch[col])
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    starts, row_ids = _window_starts(offsets, n)
    if not starts.size:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "gram": pa.array([], pa.string())})
    flat = toks.values
    cols = [flat.take(pa.array(starts + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*cols, " ")
    ids = batch[id_col].take(pa.array(row_ids))
    return pa.table({id_col: ids, "gram": grams})


def eval_gram_set(eval_ds, n: int, col: str = "text",
                  id_col: str = "doc_id") -> pa.Array:
    """Distinct n-gram strings of the eval corpus, as one driver-side
    Arrow array ready for ``ray.put``. Driver-resident BY DESIGN: eval
    sets are benchmarks, not corpora (see module docstring)."""
    parts = []
    grams_ds = eval_ds.map_batches(
        lambda t: pa.table(
            {"gram": pc.unique(ngram_table(t, n, col, id_col)["gram"])}),
        batch_format="pyarrow")
    for b in grams_ds.iter_batches(batch_size=262144,
                                   batch_format="pyarrow"):
        parts.append(b["gram"].to_numpy(zero_copy_only=False))
    allg = (np.unique(np.concatenate(parts)) if parts
            else np.empty(0, dtype=object))
    return pa.array(allg, pa.string())


def decontaminate(train_ds, eval_grams_ref, n: int, col: str = "text",
                  id_col: str = "doc_id", mode: str = "report"):
    """Flag (``mode='report'``) or drop (``mode='filter'``) training
    docs sharing ≥1 whitespace n-gram with the broadcast eval set.

    ``report`` emits ``(doc_id, n_contaminated)`` — the count of
    DISTINCT overlapping grams per contaminated doc. ``filter`` returns
    the clean train rows unchanged.
    """
    import ray

    def _hit_counts(batch: pa.Table):
        vs = ray.get(eval_grams_ref)  # zero-copy plasma read per task
        gt = ngram_table(batch, n, col, id_col)
        if not gt.num_rows or not len(vs):
            return None, batch
        mask = pc.is_in(gt["gram"], value_set=vs)
        hits = gt.filter(mask)
        if not hits.num_rows:
            return None, batch
        # distinct (doc, gram) pairs → per-doc contaminated-gram counts
        enc_doc = pc.dictionary_encode(hits[id_col].combine_chunks())
        enc_g = pc.dictionary_encode(hits["gram"].combine_chunks())
        di = enc_doc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gi = enc_g.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        key = np.unique(di * np.int64(len(enc_g.dictionary)) + gi)
        doc_part = key // np.int64(len(enc_g.dictionary))
        cnt = np.bincount(doc_part, minlength=len(enc_doc.dictionary))
        return (enc_doc.dictionary, cnt), batch

    if mode == "report":
        def report(batch: pa.Table) -> pa.Table:
            got, _ = _hit_counts(batch)
            if got is None:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "n_contaminated": pa.array([], pa.int64())})
            docs, cnt = got
            return pa.table({id_col: docs.cast(pa.int64()),
                             "n_contaminated": pa.array(cnt, pa.int64())})

        return train_ds.map_batches(report, batch_format="pyarrow")

    def keep(batch: pa.Table) -> pa.Table:
        got, batch = _hit_counts(batch)
        if got is None:
            return batch
        docs, _ = got
        return batch.filter(
            pc.invert(pc.is_in(batch[id_col], value_set=docs)))

    return train_ds.map_batches(keep, batch_format="pyarrow")


def chunk_docs(batch: pa.Table, size: int, col: str = "text",
               id_col: str = "doc_id") -> pa.Table:
    """Fixed-size non-overlapping token windows per document:
    ``(doc_id, chunk_idx, chunk_text, n_tokens)``, the training
    sequence-preparation map. The last chunk of a doc may be short.

    Offsets arithmetic + one ``ListArray``/``binary_join`` — chunk
    boundaries never leave the batch, so the stage streams."""
    toks = _split_tokens(batch[col])
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    nchunks = -(-counts // size)  # ceil; counts ≥ 1 always (''→[''])
    total = int(nchunks.sum())
    if total == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "chunk_idx": pa.array([], pa.int64()),
                         "chunk_text": pa.array([], pa.string()),
                         "n_tokens": pa.array([], pa.int64())})
    rows = np.repeat(np.arange(len(counts), dtype=np.int64), nchunks)
    cum = np.concatenate([[0], np.cumsum(nchunks)[:-1]])
    chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(cum, nchunks)
    starts = offsets[:-1][rows] + chunk_idx * size
    ends = np.minimum(starts + size, offsets[1:][rows])
    # consecutive chunks tile the flat token array exactly, so the
    # chunk list offsets are just [starts..., last end]
    la_offsets = np.concatenate([starts, offsets[-1:]])
    la = pa.ListArray.from_arrays(pa.array(la_offsets, pa.int32()),
                                  toks.values)
    return pa.table({
        id_col: batch[id_col].take(pa.array(rows)),
        "chunk_idx": pa.array(chunk_idx),
        "chunk_text": pc.binary_join(la, " "),
        "n_tokens": pa.array(ends - starts),
    })
