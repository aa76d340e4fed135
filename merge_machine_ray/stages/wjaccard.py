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

Candidate generation is the CANONICAL-ORDER PREFIX FILTER (Bayardo et
al. WWW'07 / Chaudhuri et al. ICDE'06), which is COMPLETE for the
threshold: order every doc's tokens by the global rarest-first order
``(df, tok)`` and index only the PREFIX — the head kept while the
remaining suffix weight is still ≥ t·S (integer test
``(S − cumprev)·10⁶ ≥ t_micro·S``). For any pair with WJ ≥ t, the
FIRST shared token in the global order must sit inside BOTH prefixes:
if it didn't, every shared token would lie in one side's suffix
(suffixes are upward-closed in the order), making
``smin ≤ suffix_weight < t·S ≤ t·smax`` — contradiction. So joining
prefix postings on the token loses no qualifying pair; the weighted
Jaccard VALUE is then exact over the candidates' FULL token sets.
The one documented under-approximation: a token present in more than
``prefix_block_cap`` prefixes contributes no pairs (hot-block skip,
mirrored by the twin's HAVING). Reference scope note: the reference
scores pairs with ES/Lucene BM25-style rarity weighting
(es_match.py); this is that idea as a closed-form exact join.

Scale shape: postings ride one token-bucketed exchange (all rows of a
token land in one bucket, so df is a run length — no separate DF
pass); per-doc weighted feature lists come from one id-bucketed
exchange (prefix selection is one cumulative-sum pass inside the same
bucket shape); candidate pairs come from prefix-token blocks with a
skip cap; features re-attach to the
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
                           weight_scale: int = 1000,
                           threshold_micro: int = 500_000,
                           prefix_block_cap: int = 256,
                           num_buckets: int | None = None):
    """Dataset with (id, text) → ``(id_a, id_b, wjac_micro)`` pairs with
    inverse-DF weighted Jaccard ≥ threshold (``wjac_micro =
    ⌊10⁶·smin/smax⌋``, floor like the n-gram twin). See module doc."""
    import ray.data as rd

    from merge_machine_ray.stages.blocking import attach_features
    from merge_machine_ray.stages.pairs import auto_buckets

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
        # ONE pass builds both the full weighted feature lists and the
        # PREFIX-FILTER selection: within-doc canonical order is
        # (df asc, tok asc) — rarest/heaviest first — and the prefix
        # keeps the head while the suffix (incl. current) still
        # carries ≥ t·S weight
        ids = g["id"].to_numpy(zero_copy_only=False)
        tok = g["tok"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        df = g["df"].to_numpy(zero_copy_only=False)
        o = np.lexsort((tok, df, ids))
        ids, tok, w = ids[o], tok[o], w[o]
        cuts = np.flatnonzero(np.concatenate(([True], ids[1:] != ids[:-1])))
        off = np.concatenate((cuts, [ids.size])).astype(np.int64)
        if cuts.size:
            sizes = np.diff(off)
            s = np.add.reduceat(w, cuts)
            cum = np.cumsum(w)
            base = np.repeat(cum[cuts] - w[cuts], sizes)
            cumprev = cum - w - base
            s_rep = np.repeat(s, sizes)
            keep = (s_rep - cumprev) * 1_000_000 >= threshold_micro * s_rep
            pcnt = np.add.reduceat(keep.astype(np.int64), cuts)
        else:
            s = np.empty(0, np.int64)
            keep = np.zeros(0, bool)
            pcnt = np.empty(0, np.int64)
        off32 = pa.array(off.astype(np.int32))
        poff = pa.array(np.concatenate(
            ([0], np.cumsum(pcnt))).astype(np.int32))
        return pa.table({
            "doc_id": pa.array(ids[cuts]),
            "toks": pa.ListArray.from_arrays(off32, pa.array(tok)),
            "ws": pa.ListArray.from_arrays(off32, pa.array(w)),
            "s": pa.array(s.astype(np.int64)),
            "ptoks": pa.ListArray.from_arrays(poff, pa.array(tok[keep])),
        })

    feats_full = (weighted.map_batches(id_bucket, batch_format="pyarrow")
                  .groupby("bucket")
                  .map_groups(doc_feats,
                              batch_format="pyarrow")).materialize()
    feats = feats_full.map_batches(
        lambda t: t.drop_columns(["ptoks"]), batch_format="pyarrow")

    def explode_prefix(t: pa.Table) -> pa.Table:
        pt = t["ptoks"]
        if isinstance(pt, pa.ChunkedArray):
            pt = pt.combine_chunks()
        off = pt.offsets.to_numpy(zero_copy_only=False)
        rep = np.repeat(np.arange(t.num_rows), np.diff(off))
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"tok": pt.flatten(), "id": pa.array(ids[rep])})

    prefixes = feats_full.map_batches(explode_prefix,
                                      batch_format="pyarrow")

    def pre_bucket(t: pa.Table) -> pa.Table:
        tok = t["tok"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(
            (tok % num_buckets).astype(np.int32)))

    def pre_emit(group: pa.Table) -> pa.Table:
        # all-pairs per prefix-token block, oversized blocks SKIPPED
        # (not truncated) so the twin's HAVING mirrors it exactly
        k = group["tok"].to_numpy(zero_copy_only=False)
        i = group["id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((i, k))
        k, i = k[o], i[o]
        cuts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        sizes = np.diff(np.concatenate((cuts, [k.size])))
        ok = (sizes >= 2) & (sizes <= prefix_block_cap)
        if not ok.any():
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        keep = np.repeat(ok, sizes)
        i = i[keep]
        sizes = sizes[ok]
        cuts = np.concatenate(([0], np.cumsum(sizes)))[:-1]
        pos = np.arange(i.size)
        rep = np.repeat(cuts + sizes, sizes) - pos - 1
        npairs = int(rep.sum())
        A = np.repeat(pos, rep)
        within = (np.arange(npairs)
                  - np.repeat(np.concatenate(([0], np.cumsum(rep)))[:-1],
                              rep))
        return pa.table({"id_a": pa.array(i[A]),
                         "id_b": pa.array(i[A + 1 + within])})

    from merge_machine_ray.stages.pairs import dedupe_pairs

    cand = dedupe_pairs(
        prefixes.map_batches(pre_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(pre_emit, batch_format="pyarrow"),
        num_buckets)
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
