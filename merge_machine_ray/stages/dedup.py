"""Deduplication operators over a documents-style table
(training-data-pipeline ops; SURVEY.md §2.8 D1/D2 + graft additions).

All variants follow the same Ray shape: vectorized key/feature
generation in ``map_batches`` → ONE ``groupby`` shuffle on the
blocking/content key → per-group vectorized resolution. Exact dedup
mirrors the reference's D1 ("group by match columns, keep first,
remember representative", ``merge_machine/es_match.py:110-164``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from merge_machine_ray.functions.hashing import crc_hash64
from merge_machine_ray.functions.minhash import simhash64
from merge_machine_ray.functions.tokenize import ANALYZERS

_MASK63 = (1 << 63) - 1


def _content_hash_batch(batch: pa.Table, col: str) -> pa.Table:
    """63-bit content hash per row, computed directly over the Arrow
    utf8 data buffer (zero python-str decode; crc_hash64-identical:
    lo = crc32(bytes), hi = crc32(salted tail) via streaming state)."""
    import zlib

    import pyarrow.compute as pc

    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")  # scalar twin hashed (v or "")
    n = len(arr)
    out = np.empty(n, np.int64)
    if n:
        odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        voff = np.frombuffer(arr.buffers()[1], dtype=odt)[
            arr.offset:arr.offset + n + 1].astype(np.int64)
        data = memoryview(arr.buffers()[2] or b"")
        crc32 = zlib.crc32
        salt = b"\x9e\x37"
        mask = _MASK63
        for i in range(n):
            lo = crc32(data[voff[i]:voff[i + 1]])
            hi = crc32(salt, lo)
            out[i] = ((hi << 32) | lo) & mask
    return batch.append_column("__h", pa.array(out, pa.int64()))


def _hash_bucket_batch(batch: pa.Table, col: str, num_buckets: int
                       ) -> pa.Table:
    """content hash + its shuffle BUCKET: the groupby runs on ~B
    buckets (one python group call each, pandas C-level groupby
    inside), never on millions of distinct content hashes (a Ray
    groupby pays per-GROUP python overhead; see stages/pairs.py)."""
    t = _content_hash_batch(batch, col)
    h = t["__h"].to_numpy(zero_copy_only=False)
    return t.append_column("__bkt", pa.array(
        (h % num_buckets).astype(np.int32)))


def _dedup_buckets(ds, col: str, num_buckets: int | None):
    from merge_machine_ray.stages.pairs import auto_buckets

    if num_buckets is None:
        num_buckets = auto_buckets(ds.count())
    return ds.map_batches(
        lambda b: _hash_bucket_batch(b, col, num_buckets),
        batch_format="pyarrow")


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id",
                num_buckets: int | None = None):
    """Keep the min-id row per distinct value of ``col``.

    Hash-partition on a BUCKET of the 63-bit content hash (the shuffle
    moves the hash, not the full text ordering); within each bucket one
    vectorized pandas groupby per distinct VALUE keeps the result exact
    under hash collisions."""

    def keep_first(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        group = group.combine_chunks()
        enc = pc.dictionary_encode(group[col])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        starts = np.concatenate(
            ([0], np.flatnonzero(codes[order][1:] != codes[order][:-1]) + 1)) \
            if order.size else np.empty(0, np.int64)
        kept = np.sort(order[starts])  # min-id row per distinct value,
        # emitted in original row order (the pandas idxmin contract)
        return group.drop_columns(["__h", "__bkt"]).take(pa.array(kept))

    return _dedup_buckets(ds, col, num_buckets).groupby("__bkt") \
        .map_groups(keep_first, batch_format="pyarrow")


def dedup_representatives(ds, col: str = "text", id_col: str = "doc_id",
                          num_buckets: int | None = None):
    """D1 with reinflation info: every row mapped to the min-id
    representative of its exact-duplicate group (``__SOURCE_GROUP``
    analog, reference ``es_match.py:151-164``)."""

    def assign_rep(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        group = group.combine_chunks()
        enc = pc.dictionary_encode(group[col])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, codes))
        cs = codes[order]
        starts = np.concatenate(
            ([0], np.flatnonzero(cs[1:] != cs[:-1]) + 1)) \
            if order.size else np.empty(0, np.int64)
        rep_per_code = np.empty(int(codes.max(initial=-1)) + 1, ids.dtype)
        rep_per_code[cs[starts]] = ids[order[starts]]
        return pa.table({id_col: group[id_col],
                         "rep_id": pa.array(rep_per_code[codes])})

    return _dedup_buckets(ds, col, num_buckets).groupby("__bkt") \
        .map_groups(assign_rep, batch_format="pyarrow")


def incremental_dedup(incoming_ds, existing_ds, col: str = "text",
                      id_col: str = "doc_id",
                      num_buckets: int | None = None):
    """Delta-ingest dedup: keep INCOMING rows whose exact ``col`` value
    does not appear anywhere in the EXISTING corpus (the new-snapshot
    vs already-ingested pass of a rolling crawl pipeline).

    Same one-shuffle shape as :func:`exact_dedup`: both sides bucket on
    the 63-bit content hash, one pandas C-level groupby per bucket
    tests exact-value membership — collision-exact, no broadcast of
    either side, streams at corpus scale."""
    from merge_machine_ray.stages.pairs import auto_buckets

    if num_buckets is None:
        num_buckets = auto_buckets(incoming_ds.count())

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            t = pa.table({id_col: t[id_col].cast(pa.int64()),
                          col: t[col].cast(pa.string())})
            t = _hash_bucket_batch(t, col, num_buckets)
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8)))

        return f

    tagged = incoming_ds.map_batches(tag(0), batch_format="pyarrow") \
        .union(existing_ds.map_batches(tag(1), batch_format="pyarrow"))

    def keep_new(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        group = group.combine_chunks()
        enc = pc.dictionary_encode(group[col])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        side = group["__side"].to_numpy(zero_copy_only=False)
        seen = np.zeros(int(codes.max(initial=-1)) + 1, bool)
        seen[codes[side == 1]] = True
        keep = (side == 0) & ~seen[codes]
        return group.select([id_col, col]).filter(pa.array(keep))

    return tagged.groupby("__bkt").map_groups(
        keep_new, batch_format="pyarrow")


# ------------------------------------------------------------- near-dup: LSH
class MinHashFeatures:
    """map_batches: ONE row per doc — (id, shingles, band_keys) — the
    featurize step of the light near-dup path. Shingle-less docs
    (empty/symbol-only) emit nothing: they all share the all-MAX
    signature and have no content to compare (banding them would
    declare every such doc a duplicate of every other)."""

    def __init__(self, col: str, id_col: str, num_perm: int, num_bands: int,
                 shingle_width: int, analyzer: str = "standard"):
        self.col = col
        self.id_col = id_col
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.shingle_width = shingle_width
        self.analyzer = analyzer
        self.tokenize = ANALYZERS[analyzer]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from merge_machine_ray.functions.minhash import (
            band_crc_keys,
            minhash_from_flat,
            string_shingle_hashes,
        )

        batch = batch.combine_chunks()
        n = batch.num_rows
        # the whole walk — tokenize, shingle strings, crc, signatures,
        # band keys — is the vectorized twin of the scalar form
        # (byte-identical, tests/test_ops.py::
        # test_minhash_features_match_scalar); non-standard analyzers
        # keep the per-string python tokenize
        if self.analyzer == "standard":
            from merge_machine_ray.functions.tokenize import (
                standard_tokens_flat,
            )

            flat_toks, off = standard_tokens_flat(batch[self.col])
        else:
            texts = batch[self.col].to_pylist()
            lens = np.empty(n, np.int64)
            toks_list: list[str] = []
            for i, txt in enumerate(texts):
                t = self.tokenize(txt or "")
                lens[i] = len(t)
                toks_list.extend(t)
            off = np.concatenate(([0], np.cumsum(lens)))
            flat_toks = pa.array(toks_list, pa.string())
        sh, sh_off = string_shingle_hashes(flat_toks, off,
                                           self.shingle_width)
        counts = np.diff(sh_off)
        keep = counts > 0  # shingle-less docs emit nothing (all-MAX sig)
        empty = pa.table({
            "id": pa.array([], pa.int64()),
            "shingles": pa.array([], pa.list_(pa.int64())),
            "band_keys": pa.array([], pa.list_(pa.int64())),
        })
        if not keep.any():
            return empty
        sigs = minhash_from_flat(sh, sh_off, self.num_perm)[keep]
        bk = band_crc_keys(sigs, self.num_bands)
        nk = int(keep.sum())
        # sorted-unique 63-bit shingle hashes per kept row (one lexsort)
        rows_flat = np.repeat(np.arange(n), counts)
        h63 = (sh & np.uint64(_MASK63)).astype(np.int64)
        o = np.lexsort((h63, rows_flat))
        r_s, v_s = rows_flat[o], h63[o]
        first = np.ones(r_s.size, bool)
        first[1:] = (r_s[1:] != r_s[:-1]) | (v_s[1:] != v_s[:-1])
        r_u, v_u = r_s[first], v_s[first]
        per_row = np.bincount(r_u, minlength=n)[keep]
        sh_out = np.concatenate(([0], np.cumsum(per_row)))
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            "id": ids.take(pa.array(np.flatnonzero(keep))).cast(pa.int64()),
            "shingles": pa.ListArray.from_arrays(
                pa.array(sh_out, pa.int32()), pa.array(v_u)),
            "band_keys": pa.ListArray.from_arrays(
                pa.array(np.arange(nk + 1, dtype=np.int64)
                         * self.num_bands, pa.int32()),
                pa.array(bk.ravel())),
        })


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _explode_band_keys(t: pa.Table) -> pa.Table:
    """(id, band_keys list) → light (band_key, id) band rows."""
    bk = t["band_keys"]
    if isinstance(bk, pa.ChunkedArray):
        bk = bk.combine_chunks()
    off = bk.offsets.to_numpy(zero_copy_only=False)
    rep = np.repeat(np.arange(t.num_rows), np.diff(off))
    return pa.table({"band_key": bk.flatten(),
                     "id": t["id"].take(pa.array(rep))})


_MINHASH_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                                  ("jaccard", pa.float64())])


def minhash_near_dup_pairs(ds, col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 128, num_bands: int = 32,
                           shingle_width: int = 3, jaccard_threshold: float = 0.8,
                           block_cap: int = 64, analyzer: str = "standard",
                           num_buckets: int | None = None):
    """MinHash-LSH near-duplicate pairs verified by exact shingle
    Jaccard ≥ threshold, light-shuffle shape (``stages/pairs.py``):
    featurize once per doc → 16-byte (band_key, id) rows through the
    band exchange (round 1 carried every doc's full shingle set ×32
    bands) → bucketed vectorized pair emission + dedup → shingle sets
    re-attach to the deduped pairs only → one fully-vectorized
    lexsort-adjacency Jaccard pass per batch (round 1 intersected
    python sets per pair). Returns (id_a, id_b, jaccard)."""
    import ray.data as rd

    from merge_machine_ray.stages.blocking import attach_features
    from merge_machine_ray.stages.pairs import (
        auto_buckets,
        block_pairs,
        intersect_counts,
    )

    feats = ds.map_batches(
        MinHashFeatures(col, id_col, num_perm, num_bands, shingle_width,
                        analyzer),
        batch_format="pyarrow").materialize()
    n_docs = feats.count()
    if n_docs == 0:
        return rd.from_arrow(_MINHASH_PAIR_SCHEMA.empty_table())
    if num_buckets is None:
        num_buckets = auto_buckets(n_docs * num_bands)

    bands = feats.map_batches(_explode_band_keys, batch_format="pyarrow")
    uniq = block_pairs(bands, block_cap, num_buckets)
    feats_kv = feats.map_batches(
        lambda t: pa.table({"doc_id": t["id"], "shingles": t["shingles"]}),
        batch_format="pyarrow")
    attached = attach_features(uniq, feats_kv, num_buckets=num_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _MINHASH_PAIR_SCHEMA.empty_table()
        inter, la, lb = intersect_counts(batch["shingles_a"],
                                         batch["shingles_b"])
        j = inter / np.maximum(la + lb - inter, 1)
        m = j >= jaccard_threshold
        return pa.table({
            "id_a": pa.array(batch["a"].to_numpy(zero_copy_only=False)[m]),
            "id_b": pa.array(batch["b"].to_numpy(zero_copy_only=False)[m]),
            "jaccard": pa.array(j[m], pa.float64())})

    out = attached.map_batches(verify, batch_format="pyarrow")

    def stable(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _MINHASH_PAIR_SCHEMA.empty_table()
        return pa.table({f.name: t[f.name].cast(f.type)
                         for f in _MINHASH_PAIR_SCHEMA})

    return out.map_batches(stable, batch_format="pyarrow")


def minhash_dedup_keep(ds, col: str = "text", id_col: str = "doc_id",
                       broadcast_drop_limit: int = 2_000_000, **kw):
    """Near-dup dedup decision: cluster near-dup pairs (connected
    components, ``mode='auto'`` — distributed above the driver edge
    limit) and keep the min-id doc per cluster. Returns the kept rows.

    The drop set (one id per NON-representative near-dup) is applied as
    a vectorized ``pc.is_in`` broadcast filter while it fits the object
    store, else as a bucketed hash anti-join — never a per-row python
    membership loop."""
    import pyarrow.compute as pc

    from merge_machine_ray.stages.clustering import connected_components

    pairs = minhash_near_dup_pairs(ds, col=col, id_col=id_col, **kw)
    edges = pairs.map_batches(
        lambda t: pa.table({"a": t["id_a"], "b": t["id_b"]}),
        batch_format="pyarrow")
    assign = connected_components(edges, mode="auto")
    # drop every doc whose cluster label differs from its own id
    drop_ds = assign.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["doc_id"], t["cluster_id"])))
        .select(["doc_id"]), batch_format="pyarrow").materialize()

    if drop_ds.count() <= broadcast_drop_limit:
        import ray

        parts = [b["doc_id"].to_numpy(zero_copy_only=False)
                 for b in drop_ds.iter_batches(batch_size=262144,
                                               batch_format="pyarrow")]
        drop_arr = pa.array(np.concatenate(parts) if parts
                            else np.empty(0, dtype=np.int64))
        drop_ref = ray.put(drop_arr)

        def keep_fn(batch: pa.Table) -> pa.Table:
            arr = ray.get(drop_ref)  # zero-copy shared-memory read
            return batch.filter(
                pc.invert(pc.is_in(batch[id_col], value_set=arr)))

        return ds.map_batches(keep_fn, batch_format="pyarrow")

    from merge_machine_ray.stages.joins import bucket_anti_join

    return bucket_anti_join(ds, drop_ds, id_col, "doc_id")


# ------------------------------------------------- exact n-gram Jaccard
def ngram_jaccard_pairs(ds, col: str = "text", id_col: str = "doc_id",
                        shingle_width: int = 3, threshold_micro: int = 500_000,
                        analyzer: str = "standard", df_cap: int | None = None):
    """EXACT token-shingle Jaccard near-duplicate pairs via a
    distributed postings-list join (no LSH approximation):

    doc → distinct shingle hashes → one (shingle, doc, set_size) posting
    per shingle → ``groupby(shingle)`` emits co-occurrence pairs →
    ``groupby(pair)`` sums intersections → |A∪B| = |A|+|B|−∩.

    Jaccard is reported as ``jaccard_micro = ⌊10⁶·∩/∪⌋`` (integer
    arithmetic — bit-identical across engines, so the DuckDB
    brute-force cross join is an exact oracle twin).

    Scale note: a shingle shared by d docs emits d·(d−1)/2 pair rows;
    ``df_cap`` drops hotter shingles (ultra-common boilerplate), making
    the result a documented under-approximation — leave None for exact
    semantics at oracle scale."""
    def postings(batch: pa.Table) -> pa.Table:
        from merge_machine_ray.functions.minhash import (
            string_shingle_hashes,
        )

        batch = batch.combine_chunks()
        n = batch.num_rows
        # flat vectorized twin of the scalar per-row walk (sorted
        # distinct 63-bit shingle hashes per doc, one lexsort)
        if analyzer == "standard":
            from merge_machine_ray.functions.tokenize import (
                standard_tokens_flat,
            )

            flat_toks, off = standard_tokens_flat(batch[col])
        else:
            tokenize = ANALYZERS[analyzer]
            texts = batch[col].to_pylist()
            lens = np.empty(n, np.int64)
            toks_list: list[str] = []
            for i, txt in enumerate(texts):
                t = tokenize(txt or "")
                lens[i] = len(t)
                toks_list.extend(t)
            off = np.concatenate(([0], np.cumsum(lens)))
            flat_toks = pa.array(toks_list, pa.string())
        sh, sh_off = string_shingle_hashes(flat_toks, off, shingle_width)
        rows = np.repeat(np.arange(n), np.diff(sh_off))
        h63 = (sh & np.uint64(_MASK63)).astype(np.int64)
        o = np.lexsort((h63, rows))
        r_s, v_s = rows[o], h63[o]
        keep = np.ones(r_s.size, bool)
        keep[1:] = (r_s[1:] != r_s[:-1]) | (v_s[1:] != v_s[:-1])
        r_u, v_u = r_s[keep], v_s[keep]
        sz = np.bincount(r_u, minlength=n)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({"sh": pa.array(v_u),
                         "id": pa.array(ids[r_u]),
                         "sz": pa.array(sz[r_u])})

    from merge_machine_ray.stages.pairs import auto_buckets

    num_buckets = auto_buckets(ds.count() * 32)

    def add_bucket(t: pa.Table) -> pa.Table:
        sh = t["sh"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(
            (sh % num_buckets).astype(np.int32)))

    def co_pairs(group: pa.Table) -> pa.Table:
        # one python call per BUCKET of the shingle key space; shingle
        # blocks are contiguous runs after a lexsort (a groupby on raw
        # shingle hashes pays per-GROUP python overhead on millions of
        # tiny postings lists)
        sh = group["sh"].to_numpy(zero_copy_only=False)
        ids = group["id"].to_numpy(zero_copy_only=False)
        szs = group["sz"].to_numpy(zero_copy_only=False)
        o = np.lexsort((ids, sh))
        sh, ids, szs = sh[o], ids[o], szs[o]
        cuts = np.flatnonzero(np.concatenate(([True], sh[1:] != sh[:-1])))
        ends = np.concatenate((cuts[1:], [sh.size]))
        a_o, b_o, sa_o, sb_o = [], [], [], []
        for s, e in zip(cuts, ends):
            n = e - s
            if n < 2 or (df_cap is not None and n > df_cap):
                continue
            iu, ju = np.triu_indices(n, k=1)
            a_o.append(ids[s:e][iu])
            b_o.append(ids[s:e][ju])
            sa_o.append(szs[s:e][iu])
            sb_o.append(szs[s:e][ju])
        if not a_o:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "sz_a": pa.array([], pa.int64()),
                             "sz_b": pa.array([], pa.int64())})
        return pa.table({"id_a": pa.array(np.concatenate(a_o)),
                         "id_b": pa.array(np.concatenate(b_o)),
                         "sz_a": pa.array(np.concatenate(sa_o)),
                         "sz_b": pa.array(np.concatenate(sb_o))})

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return t.append_column("pbkt", pa.array(
            ((a * 1000003 + b) % num_buckets).astype(np.int32)))

    def reduce_pairs(g: pa.Table) -> pa.Table:
        # one co-occurrence row per shared shingle → the intersection
        # size is the run length after a pair lexsort
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        sa = g["sz_a"].to_numpy(zero_copy_only=False)
        sb = g["sz_b"].to_numpy(zero_copy_only=False)
        o = np.lexsort((b, a))
        a, b, sa, sb = a[o], b[o], sa[o], sb[o]
        cuts = np.flatnonzero(np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))))
        ends = np.concatenate((cuts[1:], [a.size]))
        return pa.table({"id_a": pa.array(a[cuts]), "id_b": pa.array(b[cuts]),
                         "n_inter": pa.array((ends - cuts).astype(np.int64)),
                         "sz_a": pa.array(sa[cuts]),
                         "sz_b": pa.array(sb[cuts])})

    inter = (ds.map_batches(postings, batch_format="pyarrow")
             .map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(co_pairs, batch_format="pyarrow")
             .map_batches(pair_bucket, batch_format="pyarrow")
             .groupby("pbkt").map_groups(reduce_pairs,
                                         batch_format="pyarrow"))

    def finish(t: pa.Table) -> pa.Table:
        inter_ = t["n_inter"].to_numpy(zero_copy_only=False)
        sa = t["sz_a"].to_numpy(zero_copy_only=False)
        sb = t["sz_b"].to_numpy(zero_copy_only=False)
        union = sa + sb - inter_
        micro = (1_000_000 * inter_) // np.maximum(union, 1)
        keep = micro >= threshold_micro
        return pa.table({
            "id_a": t["id_a"].filter(pa.array(keep)),
            "id_b": t["id_b"].filter(pa.array(keep)),
            "jaccard_micro": pa.array(micro[keep], type=pa.int64())})

    return inter.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash
class SimHashFeatures:
    """map_batches: ONE row per doc — (id, simhash, band_keys) — the
    64-bit SimHash split into ``bands`` keyed segments: docs within
    hamming distance k collide on ≥1 segment when bands > k.
    ``emit_band_keys=False`` skips the band-key column for callers
    (``simhash_near_dup_pairs``) that hand the hash to
    :func:`hamming_near_dup_pairs`, which derives identical keys
    itself — avoids computing and shipping them twice."""

    def __init__(self, col: str, id_col: str, bands: int = 4,
                 analyzer: str = "standard",
                 emit_band_keys: bool = True):
        self.col = col
        self.id_col = id_col
        self.bands = bands
        self.analyzer = analyzer
        self.emit_band_keys = emit_band_keys
        self.tokenize = ANALYZERS[analyzer]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from merge_machine_ray.functions.minhash import simhash64_batch

        batch = batch.combine_chunks()
        n = batch.num_rows
        width = 64 // self.bands
        mask = np.uint64((1 << width) - 1)
        if self.analyzer == "standard":
            from merge_machine_ray.functions.tokenize import (
                standard_tokens_flat,
            )

            flat, off = standard_tokens_flat(batch[self.col])
            # RAW crc per distinct token (simhash64's hash — NO mix64)
            import pyarrow.compute as pc

            if len(flat):
                enc = pc.dictionary_encode(flat)
                if isinstance(enc, pa.ChunkedArray):
                    enc = enc.combine_chunks()
                vh = np.fromiter((crc_hash64(t)
                                  for t in enc.dictionary.to_pylist()),
                                 np.uint64, count=len(enc.dictionary))
                th = vh[enc.indices.to_numpy(
                    zero_copy_only=False).astype(np.int64)]
            else:
                th = np.empty(0, np.uint64)
            sh = simhash64_batch(th, off, n)
        else:
            texts = batch[self.col].to_pylist()
            sh = np.fromiter(
                (simhash64(self.tokenize(t or "")) for t in texts),
                np.uint64, count=n)
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        cols = {
            "id": ids.cast(pa.int64()),
            "simhash": pa.array(sh.astype(np.int64)),
        }
        if self.emit_band_keys:
            bands_mat = np.empty((n, self.bands), np.int64)
            for b in range(self.bands):
                bands_mat[:, b] = (
                    (np.uint64(b) << np.uint64(60))
                    | ((sh >> np.uint64(b * width)) & mask)
                ).astype(np.int64)
            cols["band_keys"] = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int64) * self.bands,
                         pa.int32()),
                pa.array(bands_mat.ravel()))
        return pa.table(cols)


#: 16-bit popcount table (64 KiB, built once) — vectorized hamming for
#: numpy versions without bitwise_count
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)],
                  dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    s = np.uint64(16)
    return (_POP16[(x & np.uint64(0xFFFF)).astype(np.int64)].astype(np.int64)
            + _POP16[((x >> s) & np.uint64(0xFFFF)).astype(np.int64)]
            + _POP16[((x >> (s * np.uint64(2))) & np.uint64(0xFFFF))
                     .astype(np.int64)]
            + _POP16[((x >> (s * np.uint64(3))) & np.uint64(0xFFFF))
                     .astype(np.int64)])


_SIMHASH_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                                  ("hamming", pa.int64())])


def hamming_near_dup_pairs(feats_ds, hash_col: str, id_col: str = "id",
                           bands: int = 4, max_hamming: int = 3,
                           block_cap: int = 256,
                           num_buckets: int | None = None):
    """Banded Hamming self-join over ANY 64-bit hash column (text
    SimHash, image pHash, any future fingerprint): rows within hamming
    distance ``max_hamming`` collide on ≥1 of ``bands`` equal-width
    segments whenever ``bands > max_hamming`` (pigeonhole), so the
    shuffle carries 16-byte (band_key, id) rows — the light-shuffle
    shape of ``stages/pairs.py`` — then hashes re-attach to the
    deduped candidate pairs only and one vectorized XOR+popcount pass
    verifies. Returns (id_a, id_b, hamming). ``bands`` ≤ 8 (the band
    index rides the key's top 4 bits; 8 × 8-bit segments already
    covers max_hamming 7). ``max_hamming`` ≥ ``bands`` is allowed as
    best-effort blocking (recall of far pairs approximate, candidates
    still verified exactly) — the simhash queries use it.

    Scale ceiling: each band segment is ``64 // bands`` bits, so a
    band has at most ``2**(64//bands)`` distinct keys; with random-ish
    hashes the average band block is ``n / 2**(64//bands)`` rows. The
    pigeonhole recall guarantee holds only while blocks fit under
    ``block_cap`` (oversize blocks are truncated keeping the smallest
    ids — see ``stages/pairs.block_pairs``), i.e. while
    ``n ≲ block_cap × 2**(64//bands)``. At bands=8 (8-bit segments)
    that is ~256 × block_cap rows — fine for the per-host / per-shard
    media partitions this is meant for, NOT for a whole 100 TB corpus
    in one join; above it, either partition the input first (the
    planted queries run per-corpus at test scale), use fewer/wider
    bands with best-effort recall, or move to a wider fingerprint
    (e.g. 256-bit pHash → 8 × 32-bit segments) before banding."""
    import ray.data as rd

    from merge_machine_ray.stages.blocking import attach_features
    from merge_machine_ray.stages.pairs import auto_buckets, block_pairs

    if not 1 <= bands <= 8:
        raise ValueError(f"bands must be in 1..8, got {bands}")
    # bands > max_hamming gives the pigeonhole recall GUARANTEE;
    # bands <= max_hamming is allowed as best-effort blocking (the
    # simhash queries use it deliberately — candidates are still
    # verified exactly, only recall of far-ish pairs is approximate)

    width = 64 // bands
    mask = np.uint64((1 << width) - 1)

    def featurize(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        n = t.num_rows
        sh = t[hash_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        bands_mat = np.empty((n, bands), np.int64)
        for b in range(bands):
            bands_mat[:, b] = (
                (np.uint64(b) << np.uint64(60))
                | ((sh >> np.uint64(b * width)) & mask)).astype(np.int64)
        return pa.table({
            "id": t[id_col].cast(pa.int64()),
            "hash64": pa.array(sh.astype(np.int64)),
            "band_keys": pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int64) * bands,
                         pa.int32()),
                pa.array(bands_mat.ravel())),
        })

    feats = feats_ds.map_batches(featurize,
                                 batch_format="pyarrow").materialize()
    n_docs = feats.count()
    if n_docs == 0:
        return rd.from_arrow(_SIMHASH_PAIR_SCHEMA.empty_table())
    if num_buckets is None:
        num_buckets = auto_buckets(n_docs * bands)
    # Coalesce block fragmentation from small-batch upstream stages:
    # the media decode pools run batch_size 16-64 (payload-sized), so
    # 5.7k signatures arrive as ~360 sixteen-row blocks and the two
    # sorts below pay per-block overhead, not per-row (measured
    # 6.6 s → 0.6 s at that size). The repartition moves only the
    # ~(16 + 8·bands) B/row signature rows, never payloads.
    target_blocks = int(max(8, min(256, n_docs // 16384 + 8)))
    if feats.num_blocks() > 4 * target_blocks:
        feats = feats.repartition(target_blocks).materialize()

    band_rows = feats.map_batches(_explode_band_keys,
                                  batch_format="pyarrow")
    uniq = block_pairs(band_rows, block_cap, num_buckets)
    feats_kv = feats.map_batches(
        lambda t: pa.table({"doc_id": t["id"], "hash64": t["hash64"]}),
        batch_format="pyarrow")
    attached = attach_features(uniq, feats_kv, num_buckets=num_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _SIMHASH_PAIR_SCHEMA.empty_table()
        ha = batch["hash64_a"].to_numpy(zero_copy_only=False)
        hb = batch["hash64_b"].to_numpy(zero_copy_only=False)
        d = _popcount64(ha.astype(np.uint64) ^ hb.astype(np.uint64))
        m = d <= max_hamming
        return pa.table({
            "id_a": pa.array(batch["a"].to_numpy(zero_copy_only=False)[m]),
            "id_b": pa.array(batch["b"].to_numpy(zero_copy_only=False)[m]),
            "hamming": pa.array(d[m], pa.int64())})

    out = attached.map_batches(verify, batch_format="pyarrow")

    def stable(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SIMHASH_PAIR_SCHEMA.empty_table()
        return pa.table({f.name: t[f.name].cast(f.type)
                         for f in _SIMHASH_PAIR_SCHEMA})

    return out.map_batches(stable, batch_format="pyarrow")


def simhash_near_dup_pairs(ds, col: str = "text", id_col: str = "doc_id",
                           bands: int = 4, max_hamming: int = 3,
                           block_cap: int = 256, analyzer: str = "standard",
                           num_buckets: int | None = None):
    """SimHash near-dup pairs: SimHash featurization + the generic
    banded-Hamming self-join (:func:`hamming_near_dup_pairs`, which
    derives the band keys from the hash itself — so the featurizer
    skips its own band_keys column). Returns (id_a, id_b, hamming)."""
    sig = ds.map_batches(
        SimHashFeatures(col, id_col, bands, analyzer,
                        emit_band_keys=False),
        batch_format="pyarrow")
    return hamming_near_dup_pairs(sig, hash_col="simhash", id_col="id",
                                  bands=bands, max_hamming=max_hamming,
                                  block_cap=block_cap,
                                  num_buckets=num_buckets)


# ------------------------------------------------- embedding near-dup (cosine)
def _hyperplanes(dim: int, n: int, seed: int) -> np.ndarray:
    """Seeded plane matrix, cached per (dim, n, seed) per process —
    cheap enough that the LSH stage can be a STATELESS task function
    (no actor-pool startup latency) while still building planes once
    per worker."""
    key = (dim, n, seed)
    got = _hyperplanes._cache.get(key)
    if got is None:
        got = np.random.RandomState(seed).standard_normal((dim, n))
        _hyperplanes._cache[key] = got
    return got


_hyperplanes._cache = {}


def hyperplane_band_keys(col: str, id_col: str, n_planes: int = 12,
                         n_bands: int = 8, seed: int = 42):
    """Random-hyperplane band keys over an embedding column — the
    embedding-space analog of minhash banding: ``n_bands`` independent
    seeded plane sets OR-ed together (one band row per vector per band).

    A single 12-plane band has recall ≈ (1−θ/π)¹² ≈ 0.16 at cosine 0.9
    — near-zero; OR-ing B independent bands lifts it to 1−(1−p)^B
    (≈ 0.93 for B=8 at cosine 0.95).

    Band rows are LIGHT — (band_key, id) ≈ 16 B. The vector itself
    never rides the band shuffle: carrying it would cost n_bands× the
    corpus bytes through the AllToAll; vectors re-attach to the much
    smaller deduplicated pair list instead. The plane matrix is derived
    from the batch's own vector width, so no driver-side ``take(1)``
    barrier is needed to discover the dimension."""

    def fn(batch: pa.Table) -> pa.Table:
        from merge_machine_ray.functions.vectors import list_to_matrix

        vecs = list_to_matrix(batch[col])
        n = len(vecs)
        if n == 0 or vecs.size == 0:
            return pa.table({"band_key": pa.array([], pa.int64()),
                             "id": pa.array([], pa.int64())})
        planes = _hyperplanes(vecs.shape[1], n_bands * n_planes, seed)
        bits = (vecs @ planes) > 0               # (n, bands*planes)
        powers = (np.int64(1) << np.arange(n_planes, dtype=np.int64))
        keys = np.empty((n, n_bands), dtype=np.int64)
        for b in range(n_bands):
            seg = bits[:, b * n_planes:(b + 1) * n_planes]
            # band index in the high bits keeps band keyspaces disjoint
            keys[:, b] = (seg @ powers) | (np.int64(b) << np.int64(56))
        rep = pa.array(np.repeat(np.arange(n), n_bands))
        return pa.table({
            "band_key": pa.array(keys.reshape(-1)),
            "id": batch[id_col].take(rep),
        })

    return fn


_EMB_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                              ("cosine", pa.float64())])


def embedding_near_dup_pairs(ds, col: str = "embedding", id_col: str = "vec_id",
                             dim: int | None = None, n_planes: int = 12,
                             n_bands: int = 8, cosine_threshold: float = 0.95,
                             block_cap: int = 512,
                             num_buckets: int | None = None):
    """Near-duplicate embedding pairs, light-shuffle shape (mirrors the
    minhash path): OR-of-bands hyperplane LSH emits 16-byte
    (band_key, id) rows → bucketed vectorized pair emission (capped per
    block) → pair dedup by hash bucket + lexsort/diff → vectors
    re-attach to the deduped pairs (broadcast probe / hash join chosen
    by size) → exact cosine verify, one numpy pass per batch.
    Returns (id_a, id_b, cosine), id_a < id_b.
    """
    from merge_machine_ray.functions.vectors import list_to_matrix
    from merge_machine_ray.stages.blocking import attach_features
    from merge_machine_ray.stages.pairs import auto_buckets, block_pairs

    if num_buckets is None:
        num_buckets = auto_buckets(ds.count() * n_bands)

    keys = ds.map_batches(
        hyperplane_band_keys(col, id_col, n_planes=n_planes,
                             n_bands=n_bands),
        batch_format="pyarrow")

    uniq = block_pairs(keys, block_cap, num_buckets)

    feats = ds.map_batches(
        lambda t: pa.table({"doc_id": t[id_col], "emb": t[col]}),
        batch_format="pyarrow")
    attached = attach_features(uniq, feats, num_buckets=num_buckets)

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMB_PAIR_SCHEMA.empty_table()
        A = list_to_matrix(batch["emb_a"])
        B = list_to_matrix(batch["emb_b"])
        na = np.maximum(np.linalg.norm(A, axis=1), 1e-300)
        nb = np.maximum(np.linalg.norm(B, axis=1), 1e-300)
        cos = (A * B).sum(axis=1) / (na * nb)
        m = cos >= cosine_threshold
        return pa.table({
            "id_a": pa.array(batch["a"].to_numpy(zero_copy_only=False)[m]),
            "id_b": pa.array(batch["b"].to_numpy(zero_copy_only=False)[m]),
            "cosine": pa.array(cos[m], pa.float64())})

    out = attached.map_batches(verify, batch_format="pyarrow")

    # an all-empty result yields zero blocks and loses the schema —
    # rebuild explicitly so empties stay typed
    def stable(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMB_PAIR_SCHEMA.empty_table()
        return pa.table({f.name: t[f.name].cast(f.type)
                         for f in _EMB_PAIR_SCHEMA})

    return out.map_batches(stable, batch_format="pyarrow")
