"""Inverse-DF WEIGHTED set-similarity self-join (the weighted-Jaccard
family of Chaudhuri et al. SSJoin / Bayardo et al. WWW'07): each doc is
its distinct-token set, each token carries a global rarity weight
``w = (N·scale) // df`` (integer inverse document frequency — monotone
in rarity like log-IDF but exactly reproducible in integer SQL), and

    WJ(A, B) = Σ_{t∈A∩B} w_t / Σ_{t∈A∪B} w_t
             = smin / (S_A + S_B − smin)

so rare shared vocabulary dominates and boilerplate tokens barely
count — the standard fix for plain Jaccard's blindness to token
informativeness. Everything is int64, so the DuckDB twin is
bit-exact.

Candidate generation is the rare-token postings rule: a pair is a
candidate iff it shares ≥1 token with global ``df ≤ df_cap`` (the
cheap end of prefix filtering — at a 0.5 threshold a qualifying pair
without ANY rare shared token is overwhelmingly unlikely, and the rule
is exactly mirrored by the twin's ``WHERE df ≤ cap``, so both engines
compute the identical candidate set; the weighted Jaccard VALUE is
then exact over the candidates' FULL token sets, not just the rare
ones). Reference scope note: the reference scores pairs with
ES/Lucene BM25-style rarity weighting (es_match.py); this is that
idea as a closed-form exact join.

Scale shape: postings ride one token-bucketed exchange (all rows of a
token land in one bucket, so df is a run length — no separate DF
pass); per-doc weighted feature lists come from one id-bucketed
exchange; candidates reuse ``pairs.block_pairs`` (df ≤ cap blocks are
never truncated since block size = df); features re-attach to the
deduped pair list only (``blocking.attach_features`` size-aware
broadcast/hash-join); the verify pass is one lexsort-adjacency sweep
per batch with ``np.add.at`` int64 accumulation — exact, no float."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["weighted_jaccard_pairs", "intersect_weight_sums"]

_WJ_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                        ("wjac_micro", pa.int64())])


def intersect_weight_sums(toks_a, ws_a, toks_b, ws_b) -> np.ndarray:
    """Per-row Σ of weights over the intersection of two ``list<int64>``
    SET columns with parallel weight lists (a token's weight is global,
    so both sides agree on it). Same one-lexsort adjacency sweep as
    ``pairs.intersect_counts``; int64-exact accumulation."""
    def _prep(c):
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return c

    toks_a, ws_a = _prep(toks_a), _prep(ws_a)
    toks_b, ws_b = _prep(toks_b), _prep(ws_b)
    n = len(toks_a)
    len_a = np.diff(toks_a.offsets.to_numpy(zero_copy_only=False))
    len_b = np.diff(toks_b.offsets.to_numpy(zero_copy_only=False))
    rows = np.concatenate((np.repeat(np.arange(n), len_a),
                           np.repeat(np.arange(n), len_b)))
    vals = np.concatenate((toks_a.flatten().to_numpy(zero_copy_only=False),
                           toks_b.flatten().to_numpy(zero_copy_only=False)))
    wts = np.concatenate((ws_a.flatten().to_numpy(zero_copy_only=False),
                          ws_b.flatten().to_numpy(zero_copy_only=False)))
    o = np.lexsort((vals, rows))
    rows, vals, wts = rows[o], vals[o], wts[o]
    same = (rows[1:] == rows[:-1]) & (vals[1:] == vals[:-1])
    smin = np.zeros(n, np.int64)
    np.add.at(smin, rows[1:][same], wts[1:][same])
    return smin


def _doc_tokens(batch: pa.Table, col: str, id_col: str,
                shingle_width: int) -> pa.Table:
    """docs → distinct 63-bit SHINGLE-hash postings ``(tok, id)``
    (``token_shingles`` of the standard analyzer — the same feature
    space as the exact-Jaccard postings join; unigram tokens are
    df-degenerate on small-vocabulary corpora)."""
    from merge_machine_ray.functions.minhash import (
        _MASK63,
        string_shingle_hashes,
    )
    from merge_machine_ray.functions.tokenize import standard_tokens_flat

    batch = batch.combine_chunks()
    n = batch.num_rows
    flat_toks, off = standard_tokens_flat(batch[col])
    sh, sh_off = string_shingle_hashes(flat_toks, off, shingle_width)
    h63 = (sh & np.uint64(int(_MASK63))).astype(np.int64)
    rows = np.repeat(np.arange(n), np.diff(sh_off))
    o = np.lexsort((h63, rows))
    r_s, v_s = rows[o], h63[o]
    keep = np.ones(r_s.size, bool)
    keep[1:] = (r_s[1:] != r_s[:-1]) | (v_s[1:] != v_s[:-1])
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    return pa.table({"tok": pa.array(v_s[keep]),
                     "id": pa.array(ids[r_s[keep]])})


def weighted_jaccard_pairs(ds, col: str = "text", id_col: str = "doc_id",
                           shingle_width: int = 3,
                           weight_scale: int = 1000, df_cap: int = 16,
                           threshold_micro: int = 500_000,
                           num_buckets: int | None = None):
    """Dataset with (id, text) → ``(id_a, id_b, wjac_micro)`` pairs with
    inverse-DF weighted Jaccard ≥ threshold (``wjac_micro =
    ⌊10⁶·smin/smax⌋``, floor like the n-gram twin). See module doc."""
    import ray.data as rd

    from merge_machine_ray.stages.blocking import attach_features
    from merge_machine_ray.stages.pairs import auto_buckets, block_pairs

    n_docs = ds.count()
    if n_docs == 0:
        return rd.from_arrow(_WJ_SCHEMA.empty_table())
    if num_buckets is None:
        num_buckets = auto_buckets(n_docs * 32)

    postings = ds.map_batches(
        lambda t: _doc_tokens(t, col, id_col, shingle_width),
        batch_format="pyarrow")

    def tok_bucket(t: pa.Table) -> pa.Table:
        tok = t["tok"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(
            (tok % num_buckets).astype(np.int32)))

    def weigh(g: pa.Table) -> pa.Table:
        # every posting of a token lands in this bucket → df is a run
        # length after one lexsort; w computed in-bucket, no DF pass
        tok = g["tok"].to_numpy(zero_copy_only=False)
        ids = g["id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((ids, tok))
        tok, ids = tok[o], ids[o]
        cuts = np.flatnonzero(np.concatenate(([True], tok[1:] != tok[:-1])))
        sizes = np.diff(np.concatenate((cuts, [tok.size])))
        df = np.repeat(sizes, sizes).astype(np.int64)
        w = (n_docs * weight_scale) // df
        return pa.table({"tok": pa.array(tok), "id": pa.array(ids),
                         "w": pa.array(w), "df": pa.array(df)})

    weighted = (postings.map_batches(tok_bucket, batch_format="pyarrow")
                .groupby("bucket")
                .map_groups(weigh, batch_format="pyarrow")).materialize()

    # per-doc feature lists (sorted tok + parallel w) and total weight S
    def id_bucket(t: pa.Table) -> pa.Table:
        ids = t["id"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(
            (ids % num_buckets).astype(np.int32)))

    def doc_feats(g: pa.Table) -> pa.Table:
        ids = g["id"].to_numpy(zero_copy_only=False)
        tok = g["tok"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        o = np.lexsort((tok, ids))
        ids, tok, w = ids[o], tok[o], w[o]
        cuts = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
        off = np.concatenate((cuts, [ids.size])).astype(np.int64)
        s = np.add.reduceat(w, cuts) if cuts.size else np.empty(0, np.int64)
        off32 = pa.array(off.astype(np.int32))
        return pa.table({
            "doc_id": pa.array(ids[cuts]),
            "toks": pa.ListArray.from_arrays(off32, pa.array(tok)),
            "ws": pa.ListArray.from_arrays(off32, pa.array(w)),
            "s": pa.array(s.astype(np.int64)),
        })

    feats = (weighted.map_batches(id_bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(doc_feats, batch_format="pyarrow"))

    import pyarrow.compute as pc

    bands = weighted.map_batches(
        lambda t: t.filter(pc.less_equal(t["df"], df_cap))
        .select(["tok", "id"]).rename_columns(["band_key", "id"]),
        batch_format="pyarrow")
    # block size = df ≤ df_cap = block_cap → never truncated, so the
    # candidate set is exactly "shares a token with df ≤ cap"
    cand = block_pairs(bands, block_cap=df_cap, num_buckets=num_buckets)
    attached = attach_features(cand, feats, num_buckets=num_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _WJ_SCHEMA.empty_table()
        smin = intersect_weight_sums(batch["toks_a"], batch["ws_a"],
                                     batch["toks_b"], batch["ws_b"])
        s_a = batch["s_a"].to_numpy(zero_copy_only=False)
        s_b = batch["s_b"].to_numpy(zero_copy_only=False)
        smax = s_a + s_b - smin
        micro = (1_000_000 * smin) // np.maximum(smax, 1)
        m = micro >= threshold_micro
        return pa.table({
            "id_a": pa.array(batch["a"].to_numpy(zero_copy_only=False)[m]),
            "id_b": pa.array(batch["b"].to_numpy(zero_copy_only=False)[m]),
            "wjac_micro": pa.array(micro[m])})

    out = attached.map_batches(verify, batch_format="pyarrow")

    def stable(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _WJ_SCHEMA.empty_table()
        return pa.table({f.name: t[f.name].cast(f.type)
                         for f in _WJ_SCHEMA})

    return out.map_batches(stable, batch_format="pyarrow")
