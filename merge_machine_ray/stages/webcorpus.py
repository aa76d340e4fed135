"""Corpus-organization operators over web-page / document tables:
host-level aggregation, per-document TF-IDF keywords, and cross-source
content overlap. These are the reporting / curation axes a web-scale
training-data pipeline runs before and after dedup (host quotas and
blocklists, per-doc salient terms, snapshot-overlap matrices).

Scale notes (100 TB):
* ``host_stats`` pre-combines per (host, lang) INSIDE each batch, so
  the first exchange carries at most one row per distinct (host, lang)
  per block, and the second one row per distinct (host, lang) overall
  — never a per-page shuffle.
* ``doc_keywords`` broadcasts the (vocabulary-bounded) IDF table once
  via ``ray.put`` and scores each batch locally; per-doc top-k is one
  lexsort per batch — a doc's tokens never leave its batch.
* ``source_overlap`` is the exact-dedup shuffle shape (content-hash
  buckets carry the text ONCE, collision-exact within buckets) plus
  the vectorized per-segment pair emission of ``stages/pairs.py``.

Reference parity: Merge-Machine has no corpus-analytics surface (its
labeller statistics are per-linkage-session, `es_labeller.py`); this
module belongs to the training-data extension surface of SURVEY.md §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from merge_machine_ray.functions.urls import url_host

_TOKEN_SEP = "[^a-z0-9]+"           # same token class as stages/idf.py


def _np(arr):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False)


def _sorted_rank_codes(arr):
    """Dictionary-encode a string array and remap codes so that code
    order == lexicographic order of the dictionary. Returns
    (rank_codes:int64, sorted_dictionary:pa.Array)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = pc.dictionary_encode(arr)
    dic = d.dictionary
    order = pc.sort_indices(dic)
    rank = np.empty(len(dic), dtype=np.int64)
    rank[_np(order)] = np.arange(len(dic), dtype=np.int64)
    codes = rank[_np(d.indices)]
    return codes, dic.take(order)


# ------------------------------------------------------------- host stats
def _host_partial(t: pa.Table, url_col: str, ts_col: str,
                  lang_col: str) -> pa.Table:
    """Batch-local combine: one output row per distinct (host, lang)
    with page count and min/max warc epoch-seconds."""
    host_codes, host_dic = _sorted_rank_codes(url_host(t[url_col]))
    lang_codes, lang_dic = _sorted_rank_codes(
        pc.fill_null(t[lang_col].cast(pa.string()), ""))
    ep = _np(t[ts_col].cast(pa.timestamp("us")).cast(pa.int64())) \
        // 1_000_000
    key = host_codes * max(len(lang_dic), 1) + lang_codes
    o = np.argsort(key, kind="stable")
    key, ep = key[o], ep[o]
    cuts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
    n = np.diff(np.concatenate((cuts, [key.size]))).astype(np.int64)
    mn = np.minimum.reduceat(ep, cuts)
    mx = np.maximum.reduceat(ep, cuts)
    kc = key[cuts]
    return pa.table({
        "host": pa.array(host_dic.take(
            pa.array(kc // max(len(lang_dic), 1)))),
        "lang": pa.array(lang_dic.take(
            pa.array(kc % max(len(lang_dic), 1)))),
        "pn": pa.array(n),
        "pmin": pa.array(mn.astype(np.int64)),
        "pmax": pa.array(mx.astype(np.int64)),
    })


def host_stats(pages_ds, url_col: str = "url", ts_col: str = "warc_ts",
               lang_col: str = "lang"):
    """Per-host crawl aggregates over the input-hint pages shape:
    ``(host, n_pages, n_langs, first_ep, last_ep)`` with epoch-second
    timestamps. Two small exchanges (see module docstring)."""
    from ray.data.aggregate import Count, Max, Min, Sum

    lvl1 = pages_ds.map_batches(
        lambda t: _host_partial(t, url_col, ts_col, lang_col),
        batch_format="pyarrow") \
        .groupby(["host", "lang"]) \
        .aggregate(Sum("pn", alias_name="pn"),
                   Min("pmin", alias_name="pmin"),
                   Max("pmax", alias_name="pmax"))
    lvl2 = lvl1.groupby("host").aggregate(
        Sum("pn", alias_name="n_pages"),
        Count(alias_name="n_langs"),
        Min("pmin", alias_name="first_ep"),
        Max("pmax", alias_name="last_ep"))

    def tidy(t: pa.Table) -> pa.Table:
        return pa.table({
            "host": t["host"],
            "n_pages": t["n_pages"].cast(pa.int64()),
            "n_langs": t["n_langs"].cast(pa.int64()),
            "first_ep": t["first_ep"].cast(pa.int64()),
            "last_ep": t["last_ep"].cast(pa.int64()),
        })

    return lvl2.map_batches(tidy, batch_format="pyarrow")


# ---------------------------------------------------------- tf-idf keywords
class KeywordScorer:
    """Actor-pool stage: holds the broadcast IDF lookup (token →
    idf float64, vocabulary-bounded) built once per actor from the
    ``ray.put`` handle; per batch, per-doc token counts and top-k by
    quantized score are one dictionary-encode + one lexsort."""

    def __init__(self, idf_ref, k: int, id_col: str, text_col: str):
        import ray
        toks, idfs = ray.get(idf_ref)
        self._lookup = pa.array(toks, pa.string())
        self._idf = np.asarray(idfs, dtype=np.float64)
        self._k = k
        self._id = id_col
        self._text = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = _np(t[self._id].cast(pa.int64()))
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(t[self._text].cast(pa.string()),
                                       "")), _TOKEN_SEP)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = _np(pc.list_value_length(toks)).astype(np.int64)
        flat = toks.flatten()
        keep = pc.not_equal(flat, "")
        row = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
        row = row[_np(keep)]
        flat = flat.filter(keep)
        if not len(flat):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64()),
                             "tok": pa.array([], pa.string()),
                             "score_micro": pa.array([], pa.int64())})
        codes, dic = _sorted_rank_codes(flat)
        # per-(row, tok) counts: one sort over the flat stream
        key = row * len(dic) + codes
        o = np.argsort(key, kind="stable")
        key = key[o]
        cuts = np.flatnonzero(np.concatenate(([True], key[1:] != key[:-1])))
        cnt = np.diff(np.concatenate((cuts, [key.size]))).astype(np.int64)
        krow = key[cuts] // len(dic)
        kcode = key[cuts] % len(dic)
        idf = self._idf[_np(pc.index_in(dic, value_set=self._lookup))[kcode]]
        micro = _np(pc.round(pa.array(idf * cnt * 1e6))).astype(np.int64)
        # top-k per row by (score desc, tok asc): one lexsort
        o2 = np.lexsort((kcode, -micro, krow))
        krow, kcode, micro = krow[o2], kcode[o2], micro[o2]
        starts = np.flatnonzero(
            np.concatenate(([True], krow[1:] != krow[:-1])))
        seg = np.repeat(starts, np.diff(
            np.concatenate((starts, [krow.size]))))
        within = np.arange(krow.size) - seg
        top = within < self._k
        return pa.table({
            "doc_id": pa.array(ids[krow[top]]),
            "rank": pa.array(within[top] + 1),
            "tok": dic.take(pa.array(kcode[top])),
            "score_micro": pa.array(micro[top]),
        })


def doc_keywords(ds, k: int = 3, id_col: str = "doc_id",
                 text_col: str = "text"):
    """Top-``k`` TF-IDF tokens per document, scored as
    ``round(1e6 * (ln((N+1)/(df+1)) + 1) * tf)`` (the idf_table
    convention) and ranked by (score_micro desc, tok asc) — the rank
    is computed on the QUANTIZED score so cross-engine 1-ulp float
    noise cannot reorder ties."""
    import ray
    from ray.data.aggregate import Sum

    from merge_machine_ray.stages.idf import partial_df_strings

    n_docs = ds.count()
    df = ds.map_batches(
        lambda t: partial_df_strings(t, text_col=text_col),
        batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("pdf", alias_name="df"))
    parts = [b for b in df.iter_batches(batch_size=1 << 16,
                                        batch_format="pyarrow")]
    dftbl = (pa.concat_tables(parts) if parts
             else pa.table({"tok": pa.array([], pa.string()),
                            "df": pa.array([], pa.int64())}))
    idf = np.log((n_docs + 1.0)
                 / (_np(dftbl["df"].cast(pa.int64())) + 1.0)) + 1.0
    ref = ray.put((dftbl["tok"].combine_chunks()
                   if isinstance(dftbl["tok"], pa.ChunkedArray)
                   else dftbl["tok"], idf))
    return ds.map_batches(
        KeywordScorer, fn_constructor_args=(ref, k, id_col, text_col),
        batch_format="pyarrow", concurrency=(1, 8))


# ------------------------------------------------------- bigram collocation
def _bigram_partial(t: pa.Table, text_col: str) -> pa.Table:
    """Per-batch bigram occurrence counts over the empty-filtered token
    sequence of each row (adjacency is taken AFTER dropping empty
    splits, matching the SQL twin's list_filter-then-zip)."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(t[text_col].cast(pa.string()), "")),
        _TOKEN_SEP)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = _np(pc.list_value_length(toks)).astype(np.int64)
    flat = toks.flatten()
    row = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    keep = _np(pc.not_equal(flat, ""))
    flat, row = flat.filter(pa.array(keep)), row[keep]
    empty = pa.table({"tok_a": pa.array([], pa.string()),
                      "tok_b": pa.array([], pa.string()),
                      "pn": pa.array([], pa.int64())})
    if len(flat) < 2:
        return empty
    codes, dic = _sorted_rank_codes(flat)
    adj = row[1:] == row[:-1]
    a, b = codes[:-1][adj], codes[1:][adj]
    if not a.size:
        return empty
    key = a * len(dic) + b
    u, n = np.unique(key, return_counts=True)
    return pa.table({"tok_a": dic.take(pa.array(u // len(dic))),
                     "tok_b": dic.take(pa.array(u % len(dic))),
                     "pn": pa.array(n.astype(np.int64))})


def bigram_pmi(ds, k: int = 25, text_col: str = "text",
               min_count: int = 2) -> pa.Table:
    """Top-``k`` bigram collocations by frequency with pointwise mutual
    information, ``pmi = ln(n_ab * N / (n_a * n_b))`` with all counts
    over the same token stream (N = total token occurrences). Returns
    the k-row driver-final table (count desc, tok_a, tok_b asc);
    ``pmi_micro`` is int64 fixed-point. Bigram counts combine inside
    each batch before one vocabulary-bounded groupby; the unigram
    lookup for the k winners folds on the driver (vocab-bounded,
    idf_table precedent)."""
    from ray.data.aggregate import Sum

    from merge_machine_ray.stages.sketch import _token_count_partial

    uni = ds.map_batches(
        lambda t: _token_count_partial(t, text_col, _TOKEN_SEP),
        batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("pn", alias_name="n"))
    parts = [b for b in uni.iter_batches(batch_size=1 << 16,
                                         batch_format="pyarrow")]
    utbl = pa.concat_tables(parts) if parts else pa.table(
        {"tok": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
    ucnt = _np(utbl["n"].cast(pa.int64()))
    total = float(ucnt.sum())
    utok = (utbl["tok"].combine_chunks()
            if isinstance(utbl["tok"], pa.ChunkedArray) else utbl["tok"])

    bi = ds.map_batches(lambda t: _bigram_partial(t, text_col),
                        batch_format="pyarrow") \
        .groupby(["tok_a", "tok_b"]).aggregate(Sum("pn", alias_name="nab"))

    def local_topk(t: pa.Table) -> pa.Table:
        t = t.set_column(t.column_names.index("nab"), "nab",
                         t["nab"].cast(pa.int64()))
        t = t.filter(pc.greater_equal(t["nab"], min_count))
        if t.num_rows <= k:
            return t
        idx = pc.select_k_unstable(
            t, k, [("nab", "descending"), ("tok_a", "ascending"),
                   ("tok_b", "ascending")])
        return t.take(idx)

    tops = [b for b in bi.map_batches(local_topk, batch_format="pyarrow")
            .iter_batches(batch_size=1 << 16, batch_format="pyarrow")]
    tbl = pa.concat_tables(tops) if tops else pa.table(
        {"tok_a": pa.array([], pa.string()),
         "tok_b": pa.array([], pa.string()),
         "nab": pa.array([], pa.int64())})
    tbl = tbl.sort_by([("nab", "descending"), ("tok_a", "ascending"),
                       ("tok_b", "ascending")]).slice(0, k)
    na = ucnt[_np(pc.index_in(tbl["tok_a"], value_set=utok))]
    nb = ucnt[_np(pc.index_in(tbl["tok_b"], value_set=utok))]
    nab = _np(tbl["nab"].cast(pa.int64()))
    pmi = np.log((nab.astype(np.float64) * total)
                 / (na.astype(np.float64) * nb)) if len(nab) else \
        np.array([], np.float64)
    micro = _np(pc.round(pc.multiply(pa.array(pmi),
                                     pa.scalar(1e6)))).astype(np.int64)
    return pa.table({"tok_a": tbl["tok_a"], "tok_b": tbl["tok_b"],
                     "n_pairs": pa.array(nab),
                     "pmi_micro": pa.array(micro)})


# ---------------------------------------------------------- source overlap
def source_overlap(ds, text_col: str = "text", src_col: str = "source",
                   id_col: str = "doc_id", num_buckets: int = 64,
                   max_group: int | None = None):
    """Distinct-content overlap between source shards: for every source
    pair (src_a < src_b), the number of DISTINCT texts present in both.
    Exact on text equality (the bucket key is a hash, membership is
    resolved on the real strings within each bucket).

    ``max_group`` caps how many sources a single text may pair across
    (skew guard — a text carried by H sources otherwise emits H²/2
    pair rows): the first ``max_group`` sources in LEXICOGRAPHIC order
    survive, a deterministic rule a SQL twin replays exactly with
    ``row_number() OVER (PARTITION BY text ORDER BY src) <= cap``."""
    from ray.data.aggregate import Sum

    from merge_machine_ray.stages.dedup import _hash_bucket_batch

    def distinct_local(t: pa.Table) -> pa.Table:
        tc, tdic = _sorted_rank_codes(
            pc.fill_null(t[text_col].cast(pa.string()), ""))
        sc, sdic = _sorted_rank_codes(
            pc.fill_null(t[src_col].cast(pa.string()), ""))
        key = tc * max(len(sdic), 1) + sc
        u = np.unique(key)
        out = pa.table({
            text_col: tdic.take(pa.array(u // max(len(sdic), 1))),
            src_col: sdic.take(pa.array(u % max(len(sdic), 1))),
        })
        return _hash_bucket_batch(out, text_col, num_buckets)

    def emit(group: pa.Table) -> pa.Table:
        tc, _ = _sorted_rank_codes(group[text_col])
        sc, sdic = _sorted_rank_codes(group[src_col])
        o = np.lexsort((sc, tc))
        tc, sc = tc[o], sc[o]
        dup = np.concatenate(
            ([False], (tc[1:] == tc[:-1]) & (sc[1:] == sc[:-1])))
        tc, sc = tc[~dup], sc[~dup]
        if max_group is not None and tc.size:
            # rank within each text run (rows are (text, src)-sorted and
            # distinct, so rank order == lexicographic source order)
            starts = np.flatnonzero(
                np.concatenate(([True], tc[1:] != tc[:-1])))
            run_sz = np.diff(np.concatenate((starts, [tc.size])))
            within = np.arange(tc.size) - np.repeat(starts, run_sz)
            keep = within < max_group
            tc, sc = tc[keep], sc[keep]
        cuts = np.flatnonzero(np.concatenate(([True], tc[1:] != tc[:-1])))
        sizes = np.diff(np.concatenate((cuts, [tc.size])))
        pos = np.arange(tc.size)
        rep = np.repeat(cuts + sizes, sizes) - pos - 1
        npairs = int(rep.sum())
        if not npairs:
            return pa.table({"src_a": pa.array([], pa.string()),
                             "src_b": pa.array([], pa.string()),
                             "pn": pa.array([], pa.int64())})
        A = np.repeat(pos, rep)
        within = (np.arange(npairs) - np.repeat(
            np.concatenate(([0], np.cumsum(rep)))[:-1], rep))
        a, b = sc[A], sc[A + 1 + within]
        return pa.table({"src_a": sdic.take(pa.array(a)),
                         "src_b": sdic.take(pa.array(b)),
                         "pn": pa.array(np.ones(npairs, np.int64))})

    pairs = ds.map_batches(distinct_local, batch_format="pyarrow") \
        .groupby("__bkt").map_groups(emit, batch_format="pyarrow")
    agg = pairs.groupby(["src_a", "src_b"]) \
        .aggregate(Sum("pn", alias_name="n_shared"))

    def tidy(t: pa.Table) -> pa.Table:
        return pa.table({"src_a": t["src_a"], "src_b": t["src_b"],
                         "n_shared": t["n_shared"].cast(pa.int64())})

    return agg.map_batches(tidy, batch_format="pyarrow")


# ------------------------------------------------------------ mirror hosts
def mirror_hosts(pages_ds, text_col: str = "text", url_col: str = "url",
                 min_shared: int = 1, max_hosts_per_text: int = 64,
                 num_buckets: int = 64):
    """Mirror-site detection over the input-hint pages shape: for every
    host pair (host_a < host_b), the number of DISTINCT page texts both
    hosts serve — the standard crawl-hygiene report behind mirror / CDN
    blocklists (a far cheaper cut than near-dup when whole sites are
    byte-identical copies).

    Shape: the host is parsed from the url by the vectorized
    ``url_host`` kernel, then the exact-dedup shuffle of
    :func:`source_overlap` does the rest — content-hash buckets carry
    each text ONCE per host (collision-exact in-bucket), the pair emit
    is the vectorized segment expansion, and the final groupby runs
    over host pairs (bounded by hosts², not pages). A text mirrored on
    H > ``max_hosts_per_text`` hosts pairs only its first cap hosts in
    lexicographic order (deterministic; at that point it is boilerplate
    for :func:`common_lines`, not a mirror signal).
    """

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            text_col: pc.fill_null(t[text_col].cast(pa.string()), ""),
            "host": url_host(t[url_col]),
        })

    pairs = source_overlap(pages_ds.map_batches(project,
                                                batch_format="pyarrow"),
                           text_col=text_col, src_col="host",
                           num_buckets=num_buckets,
                           max_group=max_hosts_per_text)

    def tidy(t: pa.Table) -> pa.Table:
        out = pa.table({"host_a": t["src_a"], "host_b": t["src_b"],
                        "n_shared": t["n_shared"]})
        if min_shared > 1:
            out = out.filter(pc.greater_equal(out["n_shared"],
                                              pa.scalar(min_shared)))
        return out

    return pairs.map_batches(tidy, batch_format="pyarrow")


# --------------------------------------------------------- n-gram novelty
def gram_novelty(ds, n: int = 5, col: str = "text",
                 id_col: str = "doc_id", num_buckets: int = 64,
                 carrier: str = "string"):
    """Per-document n-gram novelty: of each document's DISTINCT
    whitespace ``n``-grams, how many appear here FIRST (no document
    with a smaller id contains them) — the curriculum / marginal-value
    signal behind "what does this shard add that the corpus doesn't
    already have" ordering (the per-doc dual of Lee et al. substring
    dedup: instead of removing repeats, attribute each gram to its
    first occurrence).

    Output per doc (docs with < ``n`` tokens vanish, as in the SQL
    twin): ``n_grams`` (distinct grams), ``n_novel`` (first-occurrence
    grams), ``novelty_micro`` = n_novel·10⁶ // n_grams.

    Scale shape: stage 1 emits one (doc_id, gram) row per DISTINCT
    gram per doc (docs never span batches) bucketed by gram hash; a
    gram's rows all land in one bucket, where ONE lexsort finds the
    min-id owner of each gram run (collision-exact — ranking is on the
    real strings); each bucket then ships ≤ one partial row per doc,
    and a narrow groupby-sum folds buckets.

    ``carrier`` picks what rides that one exchange:
    ``"string"`` ships the gram STRINGS (what the DuckDB twin can
    replay exactly — collision-free by construction);
    ``"fingerprint"`` ships a 16-byte blake2b fingerprint per distinct
    gram instead (two int64 columns) — ~5× fewer exchange bytes on
    5-grams of web text, semantics identical modulo 2⁻¹²⁸ collisions.
    The 100 TB path is ``"fingerprint"``.
    """
    from ray.data.aggregate import Sum

    from merge_machine_ray.stages.decontam import ngram_table
    from merge_machine_ray.stages.dedup import _hash_bucket_batch

    if carrier not in ("string", "fingerprint"):
        raise ValueError(f"carrier must be 'string' or 'fingerprint',"
                         f" got {carrier!r}")

    def _distinct_doc_grams(t: pa.Table):
        g = ngram_table(t, n, col=col, id_col=id_col)
        gc, gdic = _sorted_rank_codes(g["gram"])
        ids = _np(g[id_col]).astype(np.int64)
        o = np.lexsort((ids, gc))
        gc, ids = gc[o], ids[o]
        dup = np.concatenate(
            ([False], (gc[1:] == gc[:-1]) & (ids[1:] == ids[:-1])))
        return gc[~dup], ids[~dup], gdic

    def stage1(t: pa.Table) -> pa.Table:
        gc, ids, gdic = _distinct_doc_grams(t)
        out = pa.table({id_col: pa.array(ids, pa.int64()),
                        "gram": gdic.take(pa.array(gc))})
        return _hash_bucket_batch(out, "gram", num_buckets)

    def stage1_fp(t: pa.Table) -> pa.Table:
        import hashlib

        gc, ids, gdic = _distinct_doc_grams(t)
        # one 16-byte digest per DISTINCT gram, scattered by code —
        # the strings never leave this batch
        digs = b"".join(
            hashlib.blake2b(s.encode("utf-8", "surrogatepass"),
                            digest_size=16).digest()
            for s in gdic.to_pylist())
        fp = (np.frombuffer(digs, np.uint64).reshape(-1, 2)
              if len(gdic) else np.empty((0, 2), np.uint64))
        hi, lo = fp[:, 0][gc], fp[:, 1][gc]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "fp_hi": pa.array(hi.view(np.int64)),
            "fp_lo": pa.array(lo.view(np.int64)),
            "__bkt": pa.array((lo % num_buckets).astype(np.int32)),
        })

    def _fold_runs(key_change: np.ndarray, ids: np.ndarray) -> pa.Table:
        # rows are distinct (gram, doc); run start == min doc id owner
        u, inv = np.unique(ids, return_inverse=True)
        return pa.table({
            id_col: pa.array(u, pa.int64()),
            "gp": pa.array(np.bincount(inv, minlength=len(u))
                           .astype(np.int64)),
            "nv": pa.array(np.bincount(inv[key_change],
                                       minlength=len(u))
                           .astype(np.int64)),
        })

    def emit(group: pa.Table) -> pa.Table:
        gc, _ = _sorted_rank_codes(group["gram"])
        ids = _np(group[id_col]).astype(np.int64)
        o = np.lexsort((ids, gc))
        gc, ids = gc[o], ids[o]
        novel = np.concatenate(([True], gc[1:] != gc[:-1])) \
            if gc.size else np.empty(0, bool)
        return _fold_runs(novel, ids)

    def emit_fp(group: pa.Table) -> pa.Table:
        hi = _np(group["fp_hi"]).astype(np.int64)
        lo = _np(group["fp_lo"]).astype(np.int64)
        ids = _np(group[id_col]).astype(np.int64)
        o = np.lexsort((ids, lo, hi))
        hi, lo, ids = hi[o], lo[o], ids[o]
        novel = np.concatenate(
            ([True], (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1]))) \
            if hi.size else np.empty(0, bool)
        return _fold_runs(novel, ids)

    s1, em = ((stage1_fp, emit_fp) if carrier == "fingerprint"
              else (stage1, emit))
    agg = (ds.map_batches(s1, batch_format="pyarrow")
             .groupby("__bkt").map_groups(em, batch_format="pyarrow")
             .groupby(id_col)
             .aggregate(Sum("gp", alias_name="n_grams"),
                        Sum("nv", alias_name="n_novel")))

    def finish(t: pa.Table) -> pa.Table:
        g = _np(t["n_grams"]).astype(np.int64)
        v = _np(t["n_novel"]).astype(np.int64)
        micro = np.zeros(len(g), np.int64)
        nz = g > 0
        micro[nz] = (v[nz] * 1_000_000) // g[nz]
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         "n_grams": pa.array(g),
                         "n_novel": pa.array(v),
                         "novelty_micro": pa.array(micro)})

    return agg.map_batches(finish, batch_format="pyarrow")


# -------------------------------------------- line-level boilerplate dedup
def _split_lines(col, sep: str) -> pa.ListArray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.split_pattern(pc.fill_null(col.cast(pa.string()), ""), sep)


def common_lines(ds, min_df: int = 2, text_col: str = "text",
                 sep: str = "\n", num_buckets: int = 64) -> pa.Array:
    """Corpus-frequent lines (CCNet-style boilerplate detection): every
    line occurring in ≥ ``min_df`` DISTINCT documents. Exact on line
    strings — the shuffle key is a content hash but membership and
    counting resolve on the real strings within each bucket, so a hash
    collision can never merge two different lines.

    Scale shape: each batch ships at most one (line, partial_df) row
    per DISTINCT line in the batch (docs never span batches, so
    per-batch distinct-doc counts sum to the exact corpus df); the
    groupby runs over ``num_buckets`` hash buckets, never per-line.
    The RESULT (lines above the df threshold) is driver-resident by
    design — boilerplate vocabulary, not corpus: its size is bounded
    by (corpus lines / min_df) and in practice by the few thousand
    nav/footer strings a crawl repeats; raise ``min_df`` or pre-filter
    by host before calling if a corpus breaks that assumption.
    """
    def pairs(t: pa.Table):
        lines = _split_lines(t[text_col], sep)
        offs = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        rows = np.repeat(np.arange(len(offs) - 1, dtype=np.int64),
                         np.diff(offs))
        return rows, lines.values

    return frequent_values(ds, pairs, min_df, num_buckets)


def frequent_values(ds, pairs_fn, min_df: int, num_buckets: int = 64
                    ) -> pa.Array:
    """Generic exact distinct-document-frequency filter: collect every
    string whose owning-id count across the corpus is ≥ ``min_df``.
    ``pairs_fn(batch) -> (ids: int64 ndarray, values: pa.Array)`` where
    ids only need to be unique WITHIN the batch (documents never span
    batches, so per-batch distinct-id counts sum to the exact corpus
    df). Shared by line-level boilerplate detection and repeated
    k-gram (substring-dedup) detection; same scale shape and
    driver-residency bound as :func:`common_lines`."""
    from merge_machine_ray.stages.dedup import _hash_bucket_batch

    def partial(t: pa.Table) -> pa.Table:
        rows, values = pairs_fn(t)
        if not len(values):        # e.g. every doc shorter than a window
            return _hash_bucket_batch(
                pa.table({"val": pa.array([], pa.string()),
                          "dn": pa.array([], pa.int64())}),
                "val", num_buckets)
        enc = pc.dictionary_encode(values)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((codes, rows))
        rs, cs = rows[o], codes[o]
        first = np.concatenate(
            ([True], (rs[1:] != rs[:-1]) | (cs[1:] != cs[:-1])))
        cnt = np.bincount(cs[first],
                          minlength=len(enc.dictionary)).astype(np.int64)
        out = pa.table({"val": enc.dictionary, "dn": pa.array(cnt)})
        return _hash_bucket_batch(out, "val", num_buckets)

    def frequent(g: pa.Table) -> pa.Table:
        lc, ldic = _sorted_rank_codes(g["val"])
        tot = np.zeros(len(ldic), dtype=np.int64)
        np.add.at(tot, lc, _np(g["dn"]))
        sel = np.flatnonzero(tot >= min_df)
        return pa.table({"val": ldic.take(pa.array(sel))})

    freq = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__bkt").map_groups(frequent, batch_format="pyarrow")
    parts = [b["val"].combine_chunks()
             for b in freq.iter_batches(batch_size=262144,
                                        batch_format="pyarrow")]
    if not parts:
        return pa.array([], pa.string())
    return pa.concat_arrays([p.cast(pa.string()) for p in parts])


def remove_common_lines(ds, min_df: int = 2, text_col: str = "text",
                        id_col: str = "doc_id", sep: str = "\n",
                        num_buckets: int = 64):
    """CCNet-style boilerplate line removal: drop every line that
    occurs in ≥ ``min_df`` distinct documents corpus-wide, preserving
    the order of the surviving lines. Emits ``(id, clean_text,
    n_lines, n_kept)`` — the kept/total ratio is the standard
    boilerplate-fraction quality signal.

    Two passes over the input: one bucketed exchange to find the
    frequent-line set (see :func:`common_lines`), then one streaming
    map with the set broadcast once via ``ray.put`` (zero-copy plasma
    read per task) — a doc's lines never leave its batch in pass 2.
    """
    import ray

    common_ref = ray.put(common_lines(ds, min_df, text_col, sep,
                                      num_buckets))

    def keep(t: pa.Table) -> pa.Table:
        vs = ray.get(common_ref)
        lines = _split_lines(t[text_col], sep)
        offs = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        rows = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        if len(vs):
            drop = pc.is_in(lines.values, value_set=vs) \
                .to_numpy(zero_copy_only=False)
        else:
            drop = np.zeros(int(offs[-1]), dtype=bool)
        keepm = ~drop
        kept_counts = np.bincount(rows[keepm], minlength=len(counts)) \
            .astype(np.int64)
        new_offs = np.concatenate(([0], np.cumsum(kept_counts)))
        la = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()),
            lines.values.filter(pa.array(keepm)))
        return pa.table({
            id_col: t[id_col],
            "clean_text": pc.binary_join(la, sep),
            "n_lines": pa.array(counts.astype(np.int64)),
            "n_kept": pa.array(kept_counts),
        })

    return ds.map_batches(keep, batch_format="pyarrow")


# ------------------------------------------------- crawl-revisit dedup
def latest_snapshot(pages_ds, url_col: str = "url",
                    ts_col: str = "warc_ep", id_col: str = "doc_id",
                    num_buckets: int = 64):
    """Crawl-revisit dedup: keep, per url, only the MOST RECENT
    snapshot row (ties broken by highest id), and report how many
    snapshots the crawl held. The cross-snapshot collapse every
    CC-derived corpus applies before any content work.

    Scale shape: a batch-local combine first reduces each batch to one
    row per DISTINCT url (argmax over (ts, id) in one lexsort), so the
    single exchange carries at most one narrow row per (url, batch);
    the groupby runs over ``num_buckets`` url-hash buckets and the
    final per-bucket resolve is the same vectorized argmax. Equal urls
    are resolved on the real strings within a bucket — a hash
    collision can never merge two different urls.
    """
    from merge_machine_ray.stages.dedup import _hash_bucket_batch

    def _argmax_rows(t: pa.Table, pn):
        uc, udic = _sorted_rank_codes(t[url_col])
        ep = _np(t[ts_col]).astype(np.int64)
        ids = _np(t[id_col]).astype(np.int64)
        o = np.lexsort((ids, ep, uc))
        uo = uc[o]
        last = np.concatenate((uo[1:] != uo[:-1], [True]))
        tot = np.zeros(len(udic), dtype=np.int64)
        np.add.at(tot, uc, pn)
        sel = o[last]
        return pa.table({
            url_col: udic.take(pa.array(uc[sel])),
            ts_col: pa.array(ep[sel]),
            id_col: pa.array(ids[sel]),
            "pn": pa.array(tot[uc[sel]]),
        })

    def combine(t: pa.Table) -> pa.Table:
        out = _argmax_rows(t, np.ones(t.num_rows, dtype=np.int64))
        return _hash_bucket_batch(out, url_col, num_buckets)

    def resolve(g: pa.Table) -> pa.Table:
        out = _argmax_rows(g, _np(g["pn"]).astype(np.int64))
        return out.rename_columns(
            [url_col, ts_col, id_col, "n_snapshots"])

    return pages_ds.map_batches(combine, batch_format="pyarrow") \
        .groupby("__bkt").map_groups(resolve, batch_format="pyarrow")


# -------------------------------------------- canonical-url grouping
def canonical_groups(pages_ds, url_col: str = "url",
                     id_col: str = "doc_id", num_buckets: int = 64):
    """Group crawl rows by CANONICAL url (functions/urls.canonical_url:
    tracking params, fragments, default ports, www, trailing slash all
    stripped) and report per-group page count + first id — the
    url-normalization dedup pass that precedes content dedup in
    CC-style pipelines.

    Scale shape: canonicalization is batch-local RE2; each batch ships
    one (canon_url, pn, dmin) row per distinct canonical url in the
    batch; the groupby runs over ``num_buckets`` hash buckets and
    resolves equality on real strings within each bucket."""
    from merge_machine_ray.functions.urls import canonical_url
    from merge_machine_ray.stages.dedup import _hash_bucket_batch

    def _fold(canon, pn, dmin):
        uc, udic = _sorted_rank_codes(canon)
        n = np.zeros(len(udic), dtype=np.int64)
        np.add.at(n, uc, pn)
        mn = np.full(len(udic), np.iinfo(np.int64).max)
        np.minimum.at(mn, uc, dmin)
        return pa.table({"canon_url": udic,
                         "pn": pa.array(n), "dmin": pa.array(mn)})

    def combine(t: pa.Table) -> pa.Table:
        ids = _np(t[id_col]).astype(np.int64)
        out = _fold(canonical_url(t[url_col]),
                    np.ones(t.num_rows, dtype=np.int64), ids)
        return _hash_bucket_batch(out, "canon_url", num_buckets)

    def resolve(g: pa.Table) -> pa.Table:
        out = _fold(g["canon_url"], _np(g["pn"]).astype(np.int64),
                    _np(g["dmin"]).astype(np.int64))
        return out.rename_columns(["canon_url", "n_pages", "first_doc"])

    return pages_ds.map_batches(combine, batch_format="pyarrow") \
        .groupby("__bkt").map_groups(resolve, batch_format="pyarrow")


# --------------------------------- repeated-span (substring) dedup
def repeated_grams(ds, n: int, min_df: int = 2, col: str = "text",
                   id_col: str = "doc_id",
                   num_buckets: int = 64) -> pa.Array:
    """Every whitespace ``n``-gram occurring in ≥ ``min_df`` DISTINCT
    documents (exact on gram strings, collision-exact within hash
    buckets) — the cross-document repeated-substring vocabulary of the
    corpus, in the sense of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better") at ``n``-token granularity."""
    from merge_machine_ray.stages.decontam import ngram_table

    def pairs(t: pa.Table):
        gt = ngram_table(t, n, col, id_col)
        ids = _np(gt[id_col]).astype(np.int64)
        gram = gt["gram"]
        if isinstance(gram, pa.ChunkedArray):
            gram = gram.combine_chunks()
        return ids, gram

    return frequent_values(ds, pairs, min_df, num_buckets)


def remove_repeated_spans(ds, n: int, min_df: int = 2,
                          col: str = "text", id_col: str = "doc_id",
                          num_buckets: int = 64):
    """Cross-document repeated-SPAN removal: drop every token covered
    by at least one whitespace ``n``-gram that occurs in ≥ ``min_df``
    distinct documents corpus-wide (spam paragraphs, licence blocks,
    templated passages), keep everything else in order, and report
    per-doc coverage. Token ``i`` is covered iff some flagged gram
    START lies in ``[i-n+1, i]`` — so a repeated span of any length
    ≥ n is removed in full while unique text within n-1 tokens of its
    borders survives.

    Scale shape: one bucketed exchange to find the repeated-gram set
    (:func:`repeated_grams`; at most one (gram, partial_df) row per
    distinct gram per batch), then one streaming pass with the set
    broadcast via ``ray.put`` — coverage is a cumulative-sum window
    over flat token positions, a doc's tokens never leave its batch.
    The broadcast set is bounded by the corpus's repeated-passage
    vocabulary; raise ``min_df``/``n`` if a corpus breaks that."""
    import ray

    from merge_machine_ray.stages.decontam import (_split_tokens,
                                                   _window_starts)

    rep_ref = ray.put(repeated_grams(ds, n, min_df, col, id_col,
                                     num_buckets))

    def strip(t: pa.Table) -> pa.Table:
        vs = ray.get(rep_ref)
        toks = _split_tokens(t[col])
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        total = int(offs[-1])
        flags = np.zeros(total + 1, dtype=np.int64)
        starts, _rows = _window_starts(offs, n)
        if starts.size and len(vs):
            flat = toks.values
            cols_ = [flat.take(pa.array(starts + j)) for j in range(n)]
            grams = pc.binary_join_element_wise(*cols_, " ")
            hit = pc.is_in(grams, value_set=vs) \
                .to_numpy(zero_copy_only=False)
            flags[starts[hit] + 1] = 1
        c = np.cumsum(flags)
        idx = np.arange(total, dtype=np.int64)
        tok_rows = np.repeat(np.arange(len(counts), dtype=np.int64),
                             counts)
        lo = np.maximum(idx - n + 1, offs[:-1][tok_rows])
        covered = (c[idx + 1] - c[lo]) > 0
        keepm = ~covered
        kept_counts = np.bincount(tok_rows[keepm],
                                  minlength=len(counts)).astype(np.int64)
        la = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(kept_counts))),
                     pa.int32()),
            toks.values.filter(pa.array(keepm)))
        return pa.table({
            id_col: t[id_col],
            "clean_text": pc.binary_join(la, " "),
            "n_tokens": pa.array(counts.astype(np.int64)),
            "n_covered": pa.array((counts - kept_counts).astype(np.int64)),
        })

    return ds.map_batches(strip, batch_format="pyarrow")


# ----------------------------------------------- LM quality scoring
def unigram_lm_scores(ds, col: str = "text", id_col: str = "doc_id"):
    """CCNet-style LM quality scoring with a corpus-fit unigram LM:
    fit add-one-smoothed token log-probabilities ``ln((c+1)/(N+V))``
    on the corpus itself, then score every doc by total and mean
    per-token log-prob (micro-quantized; the mean is the monotone
    equivalent of negative log-perplexity, so thresholding/bucketing
    it IS the CCNet perplexity filter). Emits ``(id, n_tokens,
    lp_sum_micro, avg_lp_micro)``.

    Scale shape: pass 1 pre-combines token counts inside each batch,
    so the exchange is vocabulary-bounded (one (tok, partial_count)
    row per distinct token per batch); the fitted table is
    vocabulary-bounded and broadcast once via ``ray.put``; pass 2 is
    one streaming lookup + segmented integer sum per batch. Per-token
    log-probs are quantized to int64 micro BEFORE the doc fold, so
    cross-engine float summation order cannot flip a result."""
    import ray
    from ray.data.aggregate import Sum

    from merge_machine_ray.stages.decontam import _split_tokens

    def tf_partial(t: pa.Table) -> pa.Table:
        toks = _split_tokens(t[col])
        enc = pc.dictionary_encode(toks.values)
        cnt = np.bincount(
            enc.indices.to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary)).astype(np.int64)
        return pa.table({"tok": enc.dictionary, "pc_": pa.array(cnt)})

    counts = ds.map_batches(tf_partial, batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("pc_", alias_name="c"))
    parts = [b for b in counts.iter_batches(batch_size=1 << 16,
                                            batch_format="pyarrow")]
    tbl = (pa.concat_tables(parts) if parts
           else pa.table({"tok": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())}))
    c = _np(tbl["c"].cast(pa.int64()))
    n_total, vocab = int(c.sum()), len(c)
    lp_micro = np.round(
        np.log((c + 1.0) / (n_total + vocab)) * 1e6).astype(np.int64)
    unseen_micro = np.int64(round(
        np.log(1.0 / (n_total + vocab)) * 1e6)) if vocab else np.int64(0)
    tok_arr = tbl["tok"]
    if isinstance(tok_arr, pa.ChunkedArray):
        tok_arr = tok_arr.combine_chunks()
    ref = ray.put((tok_arr, lp_micro, unseen_micro))

    def score(t: pa.Table) -> pa.Table:
        lookup, lp, unseen = ray.get(ref)
        toks = _split_tokens(t[col])
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = np.diff(offs)
        pos = pc.index_in(toks.values, value_set=lookup)
        valid = pc.is_valid(pos).to_numpy(zero_copy_only=False)
        if len(lp):
            pos_np = pos.to_numpy(zero_copy_only=False)
            idxs = np.zeros(len(valid), dtype=np.int64)
            idxs[valid] = pos_np[valid].astype(np.int64)
            tok_lp = np.where(valid, lp[idxs], unseen)
        else:
            tok_lp = np.full(len(valid), unseen, dtype=np.int64)
        rows = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
        s = np.zeros(len(ntok), dtype=np.int64)
        np.add.at(s, rows, tok_lp)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(ntok.astype(np.int64)),
            "lp_sum_micro": pa.array(s),
            "avg_lp_micro": pa.array(np.floor_divide(s, ntok)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# -------------------------------------------------------- BM25 retrieval
def bm25_topk(ds, query_tokens: list[str], id_col: str = "doc_id",
              col: str = "text", k: int = 20,
              k1: float = 1.2, b: float = 0.75):
    """BM25 ranked retrieval against a fixed query — the scoring the
    reference delegates to Elasticsearch (`es_match.py` msearch), here
    as two Ray folds: (1) one batch-partial pass for the global stats
    (N docs, T total tokens, per-query-term document frequency — each
    doc lives in exactly one batch, so partial sums are exact), then
    (2) one streaming scoring pass with the ≤|q|-row stats broadcast in
    the closure, local top-k per block + one tiny reduce.

    Exactness contract: idf and the per-(doc,term) saturation factor
    are micro-quantized SEPARATELY with float expressions written in
    the same evaluation order as the DuckDB twin, then combined in
    int64 (idf_micro · term_micro // 1e6) — the same two-factor
    quantization pattern as the NB classifier. Tokens: [a-z0-9]+ runs
    of the lowercased text. Docs containing no query term drop out.
    Tie-break (score desc, id asc) pins the k-boundary on both sides.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    q = sorted(set(query_tokens))
    q_arr = pa.array(q, pa.string())

    def _doc_tokens(t: pa.Table):
        txt = t[col].cast(pa.string())
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(txt, "")), _TOKEN_SEP)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        rows = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                         np.diff(offsets))
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False) \
            if len(flat) else np.empty(0, bool)
        return flat.filter(pa.array(keep)) if len(flat) else flat, \
            rows[keep] if len(flat) else rows[:0]

    def stats_partial(t: pa.Table) -> pa.Table:
        flat, rows = _doc_tokens(t)
        pos = pc.index_in(flat, value_set=q_arr)
        valid = pc.is_valid(pos).to_numpy(zero_copy_only=False) \
            if len(flat) else np.empty(0, bool)
        dfs = np.zeros(len(q), np.int64)
        if valid.any():
            pn = pos.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
            key = rows[valid] * len(q) + pn
            dfs = np.bincount(np.unique(key) % len(q),
                              minlength=len(q)).astype(np.int64)
        return pa.table({
            "key": pa.array(["__N__", "__T__"] + q),
            "v": pa.array(np.concatenate((
                [t.num_rows, rows.size], dfs)).astype(np.int64)),
        })

    stats = {r["key"]: int(r["v"]) for r in
             ds.map_batches(stats_partial, batch_format="pyarrow")
             .groupby("key").aggregate(Sum("v", alias_name="v"))
             .take_all()}
    n_docs, t_total = stats["__N__"], stats["__T__"]
    if n_docs == 0 or t_total == 0:
        import ray.data
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "bm25_micro": pa.array([], pa.int64())}))
    df = np.array([stats[tok] for tok in q], dtype=np.int64)
    # same float text as the twin: ln((N - df + 0.5)/(df + 0.5) + 1.0)
    idf_micro = np.round(np.log(
        (n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1e6).astype(np.int64)

    def score(t: pa.Table) -> pa.Table:
        flat, rows = _doc_tokens(t)
        n = t.num_rows
        dl = np.bincount(rows, minlength=n).astype(np.int64)
        pos = pc.index_in(flat, value_set=q_arr)
        valid = pc.is_valid(pos).to_numpy(zero_copy_only=False) \
            if len(flat) else np.empty(0, bool)
        out = np.zeros(n, np.int64)
        if valid.any():
            pn = pos.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
            key = rows[valid] * len(q) + pn
            tf_flat = np.bincount(key, minlength=n * len(q))
            hit = np.flatnonzero(tf_flat)
            tf = tf_flat[hit].astype(np.float64)
            rid = hit // len(q)
            qid = hit % len(q)
            dl_f = dl[rid].astype(np.float64)
            # same float text as the twin:
            # (tf*(k1+1)) / (tf + k1*(1 - b + b*dl*N/T))
            term = (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * dl_f * n_docs / t_total))
            term_micro = np.round(term * 1e6).astype(np.int64)
            contrib = idf_micro[qid] * term_micro // 1_000_000
            np.add.at(out, rid, contrib)
        hits = np.flatnonzero(out > 0)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({id_col: ids.take(pa.array(hits)),
                         "bm25_micro": pa.array(out[hits])})

    scored = ds.map_batches(score, batch_format="pyarrow")
    keys = [("bm25_micro", "descending"), (id_col, "ascending")]

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.take(pc.select_k_unstable(t, k, keys))

    parts = scored.map_batches(local_topk, batch_format="pyarrow")
    tbl = pa.concat_tables(
        parts.iter_batches(batch_size=1 << 16, batch_format="pyarrow"))
    tbl = tbl.take(pc.select_k_unstable(tbl, min(k, tbl.num_rows), keys))
    return tbl.sort_by([("bm25_micro", "descending"),
                        (id_col, "ascending")])


def bm25_msearch(ds, queries: list[tuple[int, str]],
                 id_col: str = "doc_id", col: str = "text", k: int = 3,
                 k1: float = 1.2, b: float = 0.75):
    """BULK BM25 retrieval — the reference's msearch shape
    (`helpers.py:_gen_bulk`, 1000 queries per request; labelling
    fetches top-3 per query, `es_labeller.py:NUM_SEARCH_RESULTS`).
    ``queries`` = [(qid, text), ...]; returns the top-``k`` docs per
    query as (qid, doc_id, bm25_micro), ties broken doc-id-ascending,
    zero-score docs dropped.

    One stats fold over the UNION of query terms (bounded by the
    request batch, broadcast in the closure), one streaming scoring
    pass computing every query's score per doc batch (per-batch cost:
    one index_in + |Q| sparse folds), local per-query top-k per block,
    one tiny per-query reduce. Same two-factor micro quantization as
    :func:`bm25_topk`, so the DuckDB twin matches bit for bit."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    # per-query DISTINCT term lists over the shared sorted vocab
    def _qtoks(s):
        import re
        return sorted({w for w in re.split("[^a-z0-9]+", s.lower()) if w})

    qids = [qid for qid, _ in queries]
    qterms = [_qtoks(text) for _, text in queries]
    vocab = sorted({t for ts in qterms for t in ts})
    v_arr = pa.array(vocab, pa.string())
    vpos = {t: i for i, t in enumerate(vocab)}
    term_ids = [np.array([vpos[t] for t in ts], np.int64)
                for ts in qterms]
    V, Q = len(vocab), len(queries)

    def _flat(t: pa.Table):
        txt = t[col].cast(pa.string())
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(txt, "")), _TOKEN_SEP)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        rows = np.repeat(np.arange(t.num_rows, dtype=np.int64),
                         np.diff(offsets))
        if not len(flat):
            return flat, rows[:0]
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return flat.filter(pa.array(keep)), rows[keep]

    def stats_partial(t: pa.Table) -> pa.Table:
        flat, rows = _flat(t)
        pos = pc.index_in(flat, value_set=v_arr)
        valid = pc.is_valid(pos).to_numpy(zero_copy_only=False) \
            if len(flat) else np.empty(0, bool)
        dfs = np.zeros(V, np.int64)
        if valid.any():
            pn = pos.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
            key = rows[valid] * V + pn
            dfs = np.bincount(np.unique(key) % V,
                              minlength=V).astype(np.int64)
        return pa.table({
            "key": pa.array(["__N__", "__T__"] + vocab),
            "v": pa.array(np.concatenate((
                [t.num_rows, rows.size], dfs)).astype(np.int64)),
        })

    stats = {r["key"]: int(r["v"]) for r in
             ds.map_batches(stats_partial, batch_format="pyarrow")
             .groupby("key").aggregate(Sum("v", alias_name="v"))
             .take_all()}
    n_docs, t_total = stats["__N__"], stats["__T__"]
    import ray.data
    empty = pa.table({"qid": pa.array([], pa.int64()),
                      id_col: pa.array([], pa.int64()),
                      "bm25_micro": pa.array([], pa.int64())})
    if n_docs == 0 or t_total == 0 or V == 0:
        return ray.data.from_arrow(empty)
    df = np.array([stats[t] for t in vocab], dtype=np.int64)
    idf_micro = np.round(np.log(
        (n_docs - df + 0.5) / (df + 0.5) + 1.0) * 1e6).astype(np.int64)

    def score(t: pa.Table) -> pa.Table:
        flat, rows = _flat(t)
        n = t.num_rows
        dl = np.bincount(rows, minlength=n).astype(np.int64)
        pos = pc.index_in(flat, value_set=v_arr)
        valid = pc.is_valid(pos).to_numpy(zero_copy_only=False) \
            if len(flat) else np.empty(0, bool)
        if not valid.any():
            return empty
        pn = pos.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
        key = rows[valid] * V + pn
        tf_flat = np.bincount(key, minlength=n * V)
        hit = np.flatnonzero(tf_flat)
        tf = tf_flat[hit].astype(np.float64)
        rid = hit // V
        tid = hit % V
        dl_f = dl[rid].astype(np.float64)
        term = (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dl_f * n_docs / t_total))
        contrib = idf_micro[tid] * np.round(term * 1e6).astype(np.int64) \
            // 1_000_000
        out_q, out_r, out_s = [], [], []
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        for qi in range(Q):                  # Q is request-bounded
            sel = np.isin(tid, term_ids[qi])
            if not sel.any():
                continue
            s = np.zeros(n, np.int64)
            np.add.at(s, rid[sel], contrib[sel])
            nz = np.flatnonzero(s > 0)
            if not nz.size:
                continue
            # local per-query top-k (score desc, doc_id asc)
            docs = ids.take(pa.array(nz)).to_numpy(zero_copy_only=False)
            sc = s[nz]
            o = np.lexsort((docs, -sc))[:k]
            out_q.append(np.full(o.size, qids[qi], np.int64))
            out_r.append(docs[o])
            out_s.append(sc[o])
        if not out_q:
            return empty
        return pa.table({"qid": pa.array(np.concatenate(out_q)),
                         id_col: pa.array(np.concatenate(out_r)),
                         "bm25_micro": pa.array(np.concatenate(out_s))})

    parts = ds.map_batches(score, batch_format="pyarrow")
    tbl = pa.concat_tables(
        parts.iter_batches(batch_size=1 << 16, batch_format="pyarrow"))
    if not tbl.num_rows:
        return empty
    # final per-query reduce over the (blocks × Q × k)-bounded parts
    q_np = tbl["qid"].to_numpy(zero_copy_only=False)
    d_np = tbl[id_col].to_numpy(zero_copy_only=False)
    s_np = tbl["bm25_micro"].to_numpy(zero_copy_only=False)
    o = np.lexsort((d_np, -s_np, q_np))
    q_np, d_np, s_np = q_np[o], d_np[o], s_np[o]
    starts = np.flatnonzero(np.concatenate(([True],
                                            q_np[1:] != q_np[:-1])))
    ends = np.concatenate((starts[1:], [q_np.size]))
    keep = np.concatenate([np.arange(s0, min(s0 + k, e0))
                           for s0, e0 in zip(starts, ends)])
    return pa.table({"qid": pa.array(q_np[keep]),
                     id_col: pa.array(d_np[keep]),
                     "bm25_micro": pa.array(s_np[keep])})
