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
                if not sx and not sy:
                    j = 1.0
                else:
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


def minhash_dedup_keep(ds, col: str = "text", id_col: str = "doc_id", **kw):
    """Near-dup dedup decision: cluster near-dup pairs (connected
    components) and keep the min-id doc per cluster. Returns the kept ids."""
    from merge_machine_ray.stages.clustering import connected_components

    pairs = minhash_near_dup_pairs(ds, col=col, id_col=id_col, **kw)
    edges = pairs.map_batches(
        lambda t: pa.table({"a": t["id_a"], "b": t["id_b"]}),
        batch_format="pyarrow")
    assign = connected_components(edges, mode="driver")
    # drop every doc whose cluster label differs from its own id
    drop = {r["doc_id"] for r in assign.take_all()
            if r["doc_id"] != r["cluster_id"]}
    import ray

    drop_ref = ray.put(drop)

    class KeepFn:
        def __init__(self, ref):
            self.drop = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pa.array([i not in self.drop
                             for i in batch[id_col].to_pylist()])
            return batch.filter(mask)

    return ds.map_batches(KeepFn, fn_constructor_kwargs={"ref": drop_ref},
                          batch_format="pyarrow", concurrency=(1, 2))


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
    """Random-hyperplane signature over an embedding column — the
    embedding-space analog of minhash banding. Hyperplanes are seeded and
    generated in __init__ (once per actor)."""

    def __init__(self, col: str, id_col: str, dim: int, n_planes: int = 16,
                 seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.col = col
        self.id_col = id_col
        self.n_planes = n_planes

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch[self.col].to_pylist(), dtype=np.float64)
        bits = (vecs @ self.planes) > 0  # (n, planes)
        keys = np.zeros(len(vecs), dtype=np.int64)
        for j in range(self.n_planes):
            keys |= bits[:, j].astype(np.int64) << j
        norms = np.linalg.norm(vecs, axis=1)
        return pa.table({
            "band_key": pa.array(keys),
            "id": batch[self.id_col],
            "vec": batch[self.col],
            "norm": pa.array(norms),
        })


def embedding_near_dup_pairs(ds, col: str = "embedding", id_col: str = "vec_id",
                             dim: int | None = None, n_planes: int = 12,
                             cosine_threshold: float = 0.95,
                             block_cap: int = 512):
    """Near-duplicate embedding pairs: hyperplane-LSH bucket → exact
    cosine verify. Returns (id_a, id_b, cosine)."""
    if dim is None:
        first = ds.take(1)[0][col]
        dim = len(first)

    def emit(group: pa.Table) -> pa.Table:
        ids = group["id"].to_pylist()
        vecs = np.asarray(group["vec"].to_pylist(), dtype=np.float64)
        norms = np.asarray(group["norm"].to_pylist())
        order = np.argsort(ids)[:block_cap]
        a_out, b_out, c_out = [], [], []
        V = vecs[order]
        N = norms[order]
        S = V @ V.T
        for x in range(len(order) - 1):
            for y in range(x + 1, len(order)):
                denom = N[x] * N[y]
                c = S[x, y] / denom if denom > 0 else 0.0
                if c >= cosine_threshold:
                    a_out.append(ids[order[x]])
                    b_out.append(ids[order[y]])
                    c_out.append(c)
        return pa.table({"id_a": pa.array(a_out, pa.int64()),
                         "id_b": pa.array(b_out, pa.int64()),
                         "cosine": pa.array(c_out, pa.float64())})

    keys = ds.map_batches(
        HyperplaneLSH, fn_constructor_kwargs={
            "col": col, "id_col": id_col, "dim": dim, "n_planes": n_planes},
        batch_format="pyarrow", concurrency=(1, 4))
    pairs = keys.groupby("band_key").map_groups(emit, batch_format="pyarrow")
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("cosine", alias_name="cosine"))
