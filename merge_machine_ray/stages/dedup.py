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
from merge_machine_ray.functions.minhash import (
    minhash_signature,
    simhash64,
    token_shingles,
)
from merge_machine_ray.functions.tokenize import ANALYZERS

_MASK63 = (1 << 63) - 1


def _content_hash_batch(batch: pa.Table, col: str) -> pa.Table:
    h = pa.array([crc_hash64(v or "") & _MASK63
                  for v in batch[col].to_pylist()], pa.int64())
    return batch.append_column("__h", h)


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id"):
    """Keep the min-id row per distinct value of ``col``.

    Hash-partition on a 63-bit content hash (shuffle moves the hash, not
    the full text ordering); within each hash group resolve per DISTINCT
    value to stay exact under hash collisions."""

    def keep_first(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group.drop_columns(["__h"])
        import pandas as pd

        df = group.to_pandas()
        idx = df.groupby(col, sort=False)[id_col].idxmin()
        return pa.Table.from_pandas(
            df.loc[sorted(idx)].drop(columns="__h"), preserve_index=False)

    hashed = ds.map_batches(lambda b: _content_hash_batch(b, col),
                            batch_format="pyarrow")
    return hashed.groupby("__h").map_groups(keep_first, batch_format="pyarrow")


def dedup_representatives(ds, col: str = "text", id_col: str = "doc_id"):
    """D1 with reinflation info: every row mapped to the min-id
    representative of its exact-duplicate group (``__SOURCE_GROUP``
    analog, reference ``es_match.py:151-164``)."""

    def assign_rep(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas()
        df["rep_id"] = df.groupby(col, sort=False)[id_col].transform("min")
        return pa.Table.from_pandas(
            df[[id_col, "rep_id"]], preserve_index=False)

    hashed = ds.map_batches(lambda b: _content_hash_batch(b, col),
                            batch_format="pyarrow")
    return hashed.groupby("__h").map_groups(assign_rep, batch_format="pyarrow")


# ------------------------------------------------------------- near-dup: LSH
class MinHashKeys:
    """map_batches: emit (band_key, id, tok_hashes) rows for near-dup."""

    def __init__(self, col: str, id_col: str, num_perm: int, num_bands: int,
                 shingle_width: int, analyzer: str = "standard"):
        self.col = col
        self.id_col = id_col
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.shingle_width = shingle_width
        self.tokenize = ANALYZERS[analyzer]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.col].to_pylist()
        out_key, out_id, out_sh = [], [], []
        r = self.num_perm // self.num_bands
        for i, txt in zip(ids, texts):
            toks = self.tokenize(txt or "")
            sh = token_shingles(toks, self.shingle_width)
            if not sh:
                # shingle-less docs (empty/symbol-only) all share the
                # all-MAX signature; banding them would declare every
                # such doc an exact duplicate of every other. They have
                # no content to compare — emit no band rows.
                continue
            sig = minhash_signature(sh, self.num_perm)
            shingle_hashes = sorted(
                {crc_hash64(s) & _MASK63 for s in sh})
            for b in range(self.num_bands):
                band = sig[b * r : (b + 1) * r]
                out_key.append(
                    crc_hash64(bytes([b]) + band.tobytes()) & _MASK63)
                out_id.append(i)
                out_sh.append(shingle_hashes)
        return pa.table({
            "band_key": pa.array(out_key, pa.int64()),
            "id": pa.array(out_id, pa.int64()),
            "shingles": pa.array(out_sh, pa.list_(pa.int64())),
        })


def minhash_near_dup_pairs(ds, col: str = "text", id_col: str = "doc_id",
                           num_perm: int = 128, num_bands: int = 32,
                           shingle_width: int = 3, jaccard_threshold: float = 0.8,
                           block_cap: int = 64, analyzer: str = "standard"):
    """MinHash-LSH near-duplicate candidate pairs verified by exact
    shingle Jaccard ≥ threshold. Returns (id_a, id_b, jaccard)."""

    def emit(group: pa.Table) -> pa.Table:
        ids = group["id"].to_pylist()
        sh = group["shingles"].to_pylist()
        uniq: dict[int, int] = {}
        for k, i in enumerate(ids):
            uniq.setdefault(i, k)
        order = sorted(uniq)
        a_out, b_out, j_out = [], [], []
        n = len(order)
        limit = min(n, block_cap)
        for x in range(limit - 1):
            sx = set(sh[uniq[order[x]]])
            for y in range(x + 1, limit):
                sy = set(sh[uniq[order[y]]])
                inter = len(sx & sy)
                j = inter / max(1, len(sx) + len(sy) - inter)
                if j >= jaccard_threshold:
                    a_out.append(order[x])
                    b_out.append(order[y])
                    j_out.append(j)
        return pa.table({"id_a": pa.array(a_out, pa.int64()),
                         "id_b": pa.array(b_out, pa.int64()),
                         "jaccard": pa.array(j_out, pa.float64())})

    keys = ds.map_batches(
        MinHashKeys(col, id_col, num_perm, num_bands, shingle_width, analyzer),
        batch_format="pyarrow")
    pairs = keys.groupby("band_key").map_groups(emit, batch_format="pyarrow")
    # same pair can emerge from several bands → dedupe (ids only, cheap)
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("jaccard", alias_name="jaccard"))


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
    from ray.data.aggregate import Max, Sum

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[col].to_pylist()
        tokenize = ANALYZERS[analyzer]
        out_sh, out_id, out_sz = [], [], []
        for i, txt in zip(ids, texts):
            hs = sorted({crc_hash64(s) & _MASK63 for s in
                         token_shingles(tokenize(txt or ""), shingle_width)})
            out_sh.extend(hs)
            out_id.extend([i] * len(hs))
            out_sz.extend([len(hs)] * len(hs))
        return pa.table({"sh": pa.array(out_sh, pa.int64()),
                         "id": pa.array(out_id, pa.int64()),
                         "sz": pa.array(out_sz, pa.int64())})

    def co_pairs(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "sz_a": pa.array([], pa.int64()),
                          "sz_b": pa.array([], pa.int64()),
                          "one": pa.array([], pa.int64())})
        if n < 2 or (df_cap is not None and n > df_cap):
            return empty
        ids = group["id"].to_numpy(zero_copy_only=False)
        szs = group["sz"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, szs = ids[order], szs[order]
        iu, ju = np.triu_indices(n, k=1)
        return pa.table({"id_a": pa.array(ids[iu]), "id_b": pa.array(ids[ju]),
                         "sz_a": pa.array(szs[iu]), "sz_b": pa.array(szs[ju]),
                         "one": pa.array(np.ones(iu.size, dtype=np.int64))})

    inter = (ds.map_batches(postings, batch_format="pyarrow")
             .groupby("sh").map_groups(co_pairs, batch_format="pyarrow")
             .groupby(["id_a", "id_b"])
             .aggregate(Sum("one", alias_name="n_inter"),
                        Max("sz_a", alias_name="sz_a"),
                        Max("sz_b", alias_name="sz_b")))

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
class SimHashKeys:
    """64-bit SimHash split into ``bands`` keyed segments: docs within
    hamming distance k collide on ≥1 segment when bands > k."""

    def __init__(self, col: str, id_col: str, bands: int = 4,
                 analyzer: str = "standard"):
        self.col = col
        self.id_col = id_col
        self.bands = bands
        self.tokenize = ANALYZERS[analyzer]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.col].to_pylist()
        width = 64 // self.bands
        mask = (1 << width) - 1
        out_key, out_id, out_sim = [], [], []
        for i, txt in zip(ids, texts):
            sh = simhash64(self.tokenize(txt or ""))
            for b in range(self.bands):
                seg = (sh >> (b * width)) & mask
                out_key.append((b << 60) | seg)
                out_id.append(i)
                out_sim.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
        return pa.table({
            "band_key": pa.array(out_key, pa.int64()),
            "id": pa.array(out_id, pa.int64()),
            "simhash": pa.array(out_sim, pa.int64()),
        })


def simhash_near_dup_pairs(ds, col: str = "text", id_col: str = "doc_id",
                           bands: int = 4, max_hamming: int = 3,
                           block_cap: int = 256, analyzer: str = "standard"):
    """SimHash near-dup pairs: segment-collision blocking + exact
    hamming verification. Returns (id_a, id_b, hamming)."""

    def emit(group: pa.Table) -> pa.Table:
        ids = group["id"].to_pylist()
        sims = group["simhash"].to_pylist()
        uniq: dict[int, int] = {}
        for k, i in enumerate(ids):
            uniq.setdefault(i, k)
        order = sorted(uniq)[:block_cap]
        a_out, b_out, h_out = [], [], []
        for x in range(len(order) - 1):
            hx = sims[uniq[order[x]]] & ((1 << 64) - 1)
            for y in range(x + 1, len(order)):
                hy = sims[uniq[order[y]]] & ((1 << 64) - 1)
                d = bin(hx ^ hy).count("1")
                if d <= max_hamming:
                    a_out.append(order[x])
                    b_out.append(order[y])
                    h_out.append(d)
        return pa.table({"id_a": pa.array(a_out, pa.int64()),
                         "id_b": pa.array(b_out, pa.int64()),
                         "hamming": pa.array(h_out, pa.int64())})

    keys = ds.map_batches(SimHashKeys(col, id_col, bands, analyzer),
                          batch_format="pyarrow")
    pairs = keys.groupby("band_key").map_groups(emit, batch_format="pyarrow")
    from ray.data.aggregate import Min

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Min("hamming", alias_name="hamming"))


# ------------------------------------------------- embedding near-dup (cosine)
class HyperplaneLSH:
    """Random-hyperplane band keys over an embedding column — the
    embedding-space analog of minhash banding: ``n_bands`` independent
    seeded plane sets OR-ed together (one band row per vector per band).

    A single 12-plane band has recall ≈ (1−θ/π)¹² ≈ 0.16 at cosine 0.9
    — near-zero; OR-ing B independent bands lifts it to 1−(1−p)^B
    (≈ 0.93 for B=8 at cosine 0.95). Planes are seeded and generated in
    ``__init__`` (once per actor).

    Band rows are LIGHT — (band_key, id) ≈ 16 B. The vector itself
    never rides the band shuffle: carrying it would cost n_bands× the
    corpus bytes through the AllToAll (the scale-killer the minhash
    path eliminated in round 2); vectors re-attach to the much smaller
    deduplicated pair list instead."""

    def __init__(self, col: str, id_col: str, dim: int, n_planes: int = 12,
                 n_bands: int = 8, seed: int = 42):
        rng = np.random.RandomState(seed)
        # (dim, bands*planes): one contiguous matmul for all bands
        self.planes = rng.standard_normal((dim, n_bands * n_planes))
        self.col = col
        self.id_col = id_col
        self.n_planes = n_planes
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        from merge_machine_ray.functions.vectors import list_to_matrix

        vecs = list_to_matrix(batch[self.col])
        n = len(vecs)
        bits = (vecs @ self.planes) > 0          # (n, bands*planes)
        powers = (np.int64(1) << np.arange(self.n_planes, dtype=np.int64))
        keys = np.empty((n, self.n_bands), dtype=np.int64)
        for b in range(self.n_bands):
            seg = bits[:, b * self.n_planes:(b + 1) * self.n_planes]
            # band index in the high bits keeps band keyspaces disjoint
            keys[:, b] = (seg @ powers) | (np.int64(b) << np.int64(56))
        rep = pa.array(np.repeat(np.arange(n), self.n_bands))
        return pa.table({
            "band_key": pa.array(keys.reshape(-1)),
            "id": batch[self.id_col].take(rep),
        })


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
    import ray.data as rd

    from merge_machine_ray.functions.vectors import list_to_matrix
    from merge_machine_ray.stages.blocking import attach_features

    first = ds.take(1)
    if not first:
        return rd.from_arrow(_EMB_PAIR_SCHEMA.empty_table())
    if dim is None:
        dim = len(first[0][col])
    if num_buckets is None:
        num_buckets = int(min(4096, max(32, ds.count() * n_bands // 20_000)))

    keys = ds.map_batches(
        HyperplaneLSH, fn_constructor_kwargs={
            "col": col, "id_col": id_col, "dim": dim, "n_planes": n_planes,
            "n_bands": n_bands},
        batch_format="pyarrow", concurrency=(1, 4))

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["band_key"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((k % num_buckets).astype(np.int32)))

    def emit(group: pa.Table) -> pa.Table:
        # one python call per BUCKET; blocks are contiguous runs after a
        # lexsort; pairs come from numpy triu per block (ids unique
        # within a band, sorted → id_a < id_b)
        k = group["band_key"].to_numpy(zero_copy_only=False)
        i = group["id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((i, k))
        k, i = k[o], i[o]
        cuts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        ends = np.concatenate((cuts[1:], [k.size]))
        a_out, b_out = [], []
        for s, e in zip(cuts, ends):
            if e - s < 2:
                continue
            u = i[s:e][:block_cap]
            iu, ju = np.triu_indices(u.size, k=1)
            a_out.append(u[iu])
            b_out.append(u[ju])
        if not a_out:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        return pa.table({"id_a": pa.array(np.concatenate(a_out)),
                         "id_b": pa.array(np.concatenate(b_out))})

    pairs = (keys.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(emit, batch_format="pyarrow"))

    # OR-of-bands emits a pair once per agreeing band — dedupe by pair-
    # hash bucket + one vectorized lexsort/diff per bucket (a
    # groupby(id_a,id_b).aggregate pays per-GROUP python overhead on
    # millions of tiny groups; see stages/blocking.py measurement)
    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return t.append_column("pbkt", pa.array(
            ((a * 1000003 + b) % num_buckets).astype(np.int32)))

    def uniq_pairs(g: pa.Table) -> pa.Table:
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        keep = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    uniq = (pairs.map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("pbkt").map_groups(uniq_pairs, batch_format="pyarrow"))

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
