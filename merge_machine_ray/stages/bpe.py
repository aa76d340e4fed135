"""BPE tokenizer training + application over a document corpus.

The missing piece between corpus curation and model training: learn a
byte-pair-encoding merge table from the corpus (Sennrich, Haddow &
Birch 2016, "Neural Machine Translation of Rare Words with Subword
Units", ACL — greedy highest-count adjacent-pair merges over a word
frequency dictionary), then apply the learned merges back over the
corpus to measure post-BPE token counts.

Scale notes (100 TB):

* The word-frequency fold is the IDF shape (`stages/idf.py`): one
  dictionary-encode + bincount per batch emits (word, partial_count)
  rows — the exchange carries one row per distinct word per block,
  never a per-token shuffle — folded by one small groupby.
* Merge LEARNING runs on the word-frequency TABLE, exactly as the
  published algorithm specifies (Sennrich trains on the word dict, not
  the corpus). The dict is Zipf-bounded and ``min_count`` prunes the
  long tail DISTRIBUTED before collection, so the driver-resident
  working set is the repeated vocabulary — the same bounded-broadcast
  contract as the scorer's IDF table. Inside the loop everything is
  numpy over flat symbol arrays: one argsort + reduceat per round for
  pair stats, one boolean scatter per round for the merge — no python
  per word, symbol, or pair.
* APPLICATION broadcasts the merge list once (``ray.put``) and each
  batch replays it over its DISTINCT words only (dictionary-encode,
  merge the distinct-word symbol arrays, scatter per-word token counts
  back by code) — per-batch cost scales with distinct words, not rows.

Determinism: ties on pair count break by smallest (left, right) symbol
id, where symbol ids are creation-ordered (initial characters sorted by
codepoint, `</w>` last, then merged symbols by merge rank). Both the
distributed learner and the sequential test reference implement this
rule, so merge tables are bit-stable across partitionings.

Reference parity: Merge-Machine has no tokenizer-training surface (its
analyzers are fixed, `es_insert.py`); this module belongs to the
training-data extension surface of SURVEY.md §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: End-of-word marker appended to every word's symbol sequence (its own
#: symbol, never merged into by initial characters — matches the
#: separate-symbol variant of the published algorithm).
END_WORD = "</w>"

#: Token class shared with the corpus DF job (`stages/idf.py`): words
#: are maximal [a-z0-9]+ runs of the lowercased text, so every symbol
#: is single-byte ASCII and `</w>`.
_SPLIT_PATTERN = "[^a-z0-9]+"


# ------------------------------------------------------------------ kernels
def _flat_word_symbols(words):
    """Explode ASCII words into flat symbol arrays.

    Returns ``(codes:int64[P], wid:int64[P], syms:list[str])`` where
    ``codes`` index ``syms``, ``wid`` marks word membership, and every
    word contributes its characters followed by one ``END_WORD``
    symbol. Initial symbol ids: characters present, sorted by
    codepoint, then ``END_WORD``.
    """
    n = len(words)
    if n == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), [END_WORD])
    joined = "".join(words)
    b = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=n)
    present = np.unique(b)
    syms = [chr(c) for c in present] + [END_WORD]
    end_code = len(syms) - 1
    lut = np.full(256, -1, np.int64)
    lut[present] = np.arange(present.size, dtype=np.int64)
    out_lens = lens + 1
    total = int(out_lens.sum())
    off = np.concatenate(([0], np.cumsum(out_lens)[:-1]))
    end_pos = off + lens
    codes = np.empty(total, np.int64)
    mask = np.ones(total, bool)
    mask[end_pos] = False
    codes[mask] = lut[b]
    codes[end_pos] = end_code
    wid = np.repeat(np.arange(n, dtype=np.int64), out_lens)
    return codes, wid, syms


def _pair_stats(codes, wid, wcnt, n_syms):
    """Weighted adjacent-pair counts in one argsort + reduceat.

    Counts EVERY adjacent occurrence (the published stats rule — a run
    'aaaa' counts (a,a) three times), weighted by the word's corpus
    count. Returns (pair_keys:int64, totals:int64) with
    key = left * n_syms + right.
    """
    adj = wid[1:] == wid[:-1]
    left = codes[:-1][adj]
    right = codes[1:][adj]
    w = wcnt[wid[:-1][adj]]
    if not left.size:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    key = left * n_syms + right
    o = np.argsort(key, kind="stable")
    ks, ws = key[o], w[o]
    cuts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
    return ks[cuts], np.add.reduceat(ws, cuts)


def _merge_pair(codes, wid, left_code, right_code, new_code):
    """Replace occurrences of (left,right) with new_code, greedy
    left-to-right (the published replacement rule: 'aaaa' + (a,a)→z
    gives 'zz'). Runs of self-overlapping matches keep even offsets —
    exactly greedy — via run segmentation; a≠b pairs cannot overlap."""
    adj = (wid[1:] == wid[:-1]) & (codes[:-1] == left_code) \
        & (codes[1:] == right_code)
    pos = np.flatnonzero(adj)
    if not pos.size:
        return codes, wid
    run_start = np.concatenate(([True], pos[1:] != pos[:-1] + 1))
    run_id = np.cumsum(run_start) - 1
    firsts = pos[run_start]
    keep = ((pos - firsts[run_id]) % 2) == 0
    kp = pos[keep]
    codes[kp] = new_code
    alive = np.ones(codes.size, bool)
    alive[kp + 1] = False
    return codes[alive], wid[alive]


def learn_merges(words, counts, num_merges: int,
                 min_pair_count: int = 2):
    """Greedy BPE merge learning over a (word, count) dictionary.

    Returns ``[(rank, left, right, merged, pair_count), ...]`` with
    rank starting at 1. Stops early when no pair reaches
    ``min_pair_count``. Fully vectorized per round (see module
    docstring); rounds are inherently sequential — each merge changes
    the next round's pair statistics.
    """
    codes, wid, syms = _flat_word_symbols(list(words))
    # Symbols are STRINGS in the published algorithm: two merges can
    # produce the same merged text (a+bc and ab+c -> abc) and must
    # yield ONE symbol, so merged strings reuse an existing code.
    sym2code = {s: i for i, s in enumerate(syms)}
    wcnt = np.asarray(counts, dtype=np.int64)
    merges = []
    for rank in range(1, num_merges + 1):
        n_syms = len(syms)
        keys, tot = _pair_stats(codes, wid, wcnt, n_syms)
        if not keys.size:
            break
        best = int(tot.max())
        if best < min_pair_count:
            break
        key = int(keys[tot == best].min())
        lc, rc = divmod(key, n_syms)
        merged = syms[lc] + syms[rc]
        merges.append((rank, syms[lc], syms[rc], merged, best))
        new_code = sym2code.get(merged)
        if new_code is None:
            new_code = len(syms)
            syms.append(merged)
            sym2code[merged] = new_code
        codes, wid = _merge_pair(codes, wid, lc, rc, new_code)
    return merges


def apply_merges(words, merges):
    """Tokenize words by replaying a learned merge table in rank order
    (the published apply rule == the training-time state evolution, so
    applying to the training words reproduces the learner's final
    symbol sequences). Returns per-word BPE token counts (int64)."""
    codes, wid, syms = _flat_word_symbols(list(words))
    sym2code = {s: i for i, s in enumerate(syms)}
    for _rank, left, right, merged, _cnt in merges:
        lc = sym2code.get(left)
        rc = sym2code.get(right)
        nc = sym2code.get(merged)
        if nc is None:
            nc = len(syms)
            syms.append(merged)
            sym2code[merged] = nc
        if lc is None or rc is None:
            continue
        codes, wid = _merge_pair(codes, wid, lc, rc, nc)
    return np.bincount(wid, minlength=len(words)).astype(np.int64)


# -------------------------------------------------- distributed word counts
def partial_word_counts(batch: pa.Table,
                        text_col: str = "text") -> pa.Table:
    """Per-batch word counts: lower + regex-split with Arrow kernels,
    dictionary-encode, bincount — one (word, wn) row per distinct word
    per batch (the IDF partial shape)."""
    txt = batch[text_col].cast(pa.string())
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(txt, "")), _SPLIT_PATTERN)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    empty = pa.table({"word": pa.array([], pa.string()),
                      "wn": pa.array([], pa.int64())})
    if not len(flat):
        return empty
    flat = flat.filter(pc.not_equal(flat, ""))  # regex edge artifacts
    if not len(flat):
        return empty
    d = pc.dictionary_encode(flat)
    cnt = np.bincount(d.indices.to_numpy(zero_copy_only=False),
                      minlength=len(d.dictionary)).astype(np.int64)
    return pa.table({"word": d.dictionary, "wn": pa.array(cnt)})


def corpus_word_counts(ds, text_col: str = "text", min_count: int = 1):
    """Distributed (word, wn) dictionary: batch partials + one groupby
    fold, then the distributed ``min_count`` prune (so only the
    repeated vocabulary ever reaches the driver)."""
    from ray.data.aggregate import Sum

    wc = ds.map_batches(
        lambda t: partial_word_counts(t, text_col),
        batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("wn", alias_name="wn"))
    if min_count > 1:
        def prune(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t["wn"], min_count))
        wc = wc.map_batches(prune, batch_format="pyarrow")
    return wc


#: Hard cap on the distinct-word rows `learn_bpe` will collect to the
#: driver — the same bounded-collect contract as
#: ``stages/idf.DRIVER_FOLD_LIMIT``. A min_count-pruned web-scale
#: vocabulary (typos, URLs, hashes) can still run to billions of rows;
#: above the cap the collect fails LOUDLY with the escalation knob
#: named instead of silently OOMing the driver.
DRIVER_VOCAB_LIMIT = 20_000_000


def learn_bpe(ds, text_col: str = "text", num_merges: int = 40,
              min_count: int = 1, min_pair_count: int = 2,
              driver_vocab_limit: int = DRIVER_VOCAB_LIMIT) -> pa.Table:
    """Corpus → BPE merge table (rank, left, right, merged, pair_n).

    The word dictionary is folded distributed and collected once
    (vocabulary-bounded, ``min_count``-pruned — the IDF broadcast
    contract); learning is the vectorized driver loop. Word order is
    canonicalized by sorting before learning so the merge table is a
    pure function of the corpus, independent of partitioning.

    The collect is gated at ``driver_vocab_limit`` distinct words
    (default ``DRIVER_VOCAB_LIMIT``): a 100 TB corpus' distinct-word
    set does not fit a driver, so past the cap this raises with the
    fix (raise ``min_count``) rather than collecting on.
    """
    words: list = []
    counts: list = []
    wc_ds = corpus_word_counts(ds, text_col, min_count)
    for b in wc_ds.iter_batches(batch_size=1 << 18,
                                batch_format="pyarrow"):
        words.extend(b["word"].to_pylist())
        counts.extend(b["wn"].to_pylist())
        if len(words) > driver_vocab_limit:
            raise ValueError(
                f"learn_bpe: distinct-word count exceeds "
                f"driver_vocab_limit={driver_vocab_limit} at "
                f"min_count={min_count}; raise min_count (each step "
                "prunes the long typo/URL tail) or the limit — the "
                "word dictionary must stay driver-resident for the "
                "merge loop")
    if words:
        order = np.argsort(np.asarray(words, dtype=object), kind="stable")
        words = [words[i] for i in order]
        counts = [counts[i] for i in order]
    merges = learn_merges(words, counts, num_merges, min_pair_count)
    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left_sym": pa.array([m[1] for m in merges], pa.string()),
        "right_sym": pa.array([m[2] for m in merges], pa.string()),
        "merged": pa.array([m[3] for m in merges], pa.string()),
        "pair_n": pa.array([m[4] for m in merges], pa.int64()),
    })


class BpeCounter:
    """Actor-pool stage: holds the broadcast merge table, emits per-doc
    post-BPE token counts. Per batch: dictionary-encode the flattened
    words, apply the merges ONCE over the distinct-word set, scatter
    counts back by code, fold per doc."""

    def __init__(self, merges_ref):
        import ray
        merges_tbl = ray.get(merges_ref)
        self._merges = list(zip(
            merges_tbl["rank"].to_pylist(),
            merges_tbl["left_sym"].to_pylist(),
            merges_tbl["right_sym"].to_pylist(),
            merges_tbl["merged"].to_pylist(),
            merges_tbl["pair_n"].to_pylist()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch["text"].cast(pa.string())
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(txt, "")), _SPLIT_PATTERN)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        n = batch.num_rows
        out = np.zeros(n, np.int64)
        if len(flat):
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            row_ids = np.repeat(np.arange(n), np.diff(offsets))[keep]
            flat = flat.filter(pa.array(keep))
            if len(flat):
                d = pc.dictionary_encode(flat)
                per_word = apply_merges(d.dictionary.to_pylist(),
                                        self._merges)
                codes = d.indices.to_numpy(zero_copy_only=False)
                np.add.at(out, row_ids, per_word[codes])
        return pa.table({"doc_id": batch["doc_id"],
                         "n_tok_bpe": pa.array(out)})


def bpe_token_counts(ds, merges_tbl: pa.Table, concurrency=(1, 4)):
    """Apply a learned merge table corpus-wide → (doc_id, n_tok_bpe).

    ``concurrency`` defaults to AUTOSCALING (1, 4): a fixed actor pool
    sized at the session's CPU count starves the upstream read forever
    on small sessions (no error, just a hang — hit by the 4-CPU test
    session; the autoscaling pool releases slots instead)."""
    import ray

    ref = ray.put(merges_tbl)
    return ds.map_batches(BpeCounter, fn_constructor_args=(ref,),
                          batch_format="pyarrow",
                          concurrency=concurrency)


def pair_count_partial(batch: pa.Table,
                       text_col: str = "text") -> pa.Table:
    """Per-batch ROUND-0 pair counts (the statistics the first merge is
    chosen from): character bigrams within words plus (last-char,
    END_WORD), one row per distinct pair per batch. This slice of the
    learner is SQL-expressible, giving the driver a hash-checkable twin
    for the pair-statistics kernel."""
    wc = partial_word_counts(batch, text_col)
    words = wc["word"].to_pylist()
    codes, wid, syms = _flat_word_symbols(words)
    keys, tot = _pair_stats(
        codes, wid, wc["wn"].to_numpy(zero_copy_only=False),
        len(syms))
    if not keys.size:
        return pa.table({"left_sym": pa.array([], pa.string()),
                         "right_sym": pa.array([], pa.string()),
                         "pn": pa.array([], pa.int64())})
    lc, rc = np.divmod(keys, len(syms))
    sym_arr = np.asarray(syms, dtype=object)
    return pa.table({
        "left_sym": pa.array(sym_arr[lc], pa.string()),
        "right_sym": pa.array(sym_arr[rc], pa.string()),
        "pn": pa.array(tot),
    })
