"""Approximate-nearest-neighbor search over an embedding column.

Three paths:

* :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast ONCE via ``ray.put``; every batch does one numpy matmul and
  emits its local top-k per query; a final small
  ``groupby(query_id).map_groups`` reduces to the global top-k. Shuffle
  volume = O(num_queries × k × num_batches), never the corpus.
* :func:`ivf_topk` — IVF scale path: k-means-lite centroids (sampled,
  driver-side, seeded) assign every vector to a cell in one
  ``map_batches`` pass; queries probe only ``nprobe`` cells, so the
  matmul touches a fraction of the corpus. Exactness degrades gracefully
  with nprobe — the standard IVF trade-off.
* :func:`lsh_topk` — hyperplane-LSH-bucketed scale path: a map-side
  band-collision filter (no shuffle) keeps only candidates sharing a
  band with some query, then the exact top-k runs on that subset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class _BatchTopK:
    def __init__(self, q_ref, col: str, id_col: str, k: int):
        import ray

        q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.qids = q["ids"]
        qm = np.asarray(q["matrix"], dtype=np.float64)
        qn = np.linalg.norm(qm, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        self.q = qm / qn
        self.col = col
        self.id_col = id_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from merge_machine_ray.functions.vectors import list_to_matrix

        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        V = list_to_matrix(batch[self.col])
        n = np.linalg.norm(V, axis=1, keepdims=True)
        n[n == 0] = 1.0
        V = V / n
        S = self.q @ V.T  # (nq, nb)
        k = min(self.k, S.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(S.shape[0]):
            top = np.argpartition(-S[qi], k - 1)[:k]
            for t in top:
                out_q.append(self.qids[qi])
                out_v.append(int(ids[t]))
                out_s.append(float(S[qi, t]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })


def _reduce_topk(k: int):
    def reduce(group: pa.Table) -> pa.Table:
        import pandas as pd

        df = group.to_pandas().sort_values(
            ["cosine", "vec_id"], ascending=[False, True]).head(k)
        df["rank"] = range(1, len(df) + 1)
        return pa.Table.from_pandas(df, preserve_index=False)

    return reduce


def brute_force_topk(ds, queries: dict, col: str = "embedding",
                     id_col: str = "vec_id", k: int = 5):
    """queries = {"ids": [int], "matrix": [[float]]} — exact cosine top-k.
    Returns (query_id, vec_id, cosine, rank), k rows per query."""
    import ray

    q_ref = ray.put(queries)
    partial = ds.map_batches(
        _BatchTopK, fn_constructor_kwargs={
            "q_ref": q_ref, "col": col, "id_col": id_col, "k": k},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4))
    return partial.groupby("query_id").map_groups(
        _reduce_topk(k), batch_format="pyarrow")


def train_centroids(ds, col: str = "embedding", n_cells: int = 16,
                    sample_rows: int = 4096, iters: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Driver-side k-means-lite on a bounded sample (seeded, numpy)."""
    from merge_machine_ray.functions.vectors import list_to_matrix

    parts = [list_to_matrix(b[col]) for b in
             ds.limit(sample_rows).iter_batches(batch_size=4096,
                                                batch_format="pyarrow")]
    X = np.vstack([p for p in parts if p.size]) if parts \
        else np.empty((0, 0))
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for c in range(C.shape[0]):
            m = a == c
            if m.any():
                C[c] = X[m].mean(0)
    return C


def train_centroids_distributed(ds, col: str = "embedding",
                                n_cells: int = 64, iters: int = 3,
                                init_sample: int = 4096, seed: int = 42
                                ) -> np.ndarray:
    """Distributed Lloyd iterations — the 100 TB path for IVF training
    (the driver-sample :func:`train_centroids` caps at a few thousand
    rows). Per iteration: centroids broadcast once via ``ray.put``;
    every batch assigns its vectors to the nearest centroid with one
    matmul and emits ``n_cells`` partial rows (per-cell vector sum +
    count); the driver reduces those tiny partials (n_cells × dim per
    input block — never the corpus) and updates the centroids. Empty
    cells keep their previous centroid. Init = seeded pick from a
    bounded sample."""
    import ray

    from merge_machine_ray.functions.vectors import list_to_matrix

    parts = [list_to_matrix(b[col]) for b in
             ds.limit(init_sample).iter_batches(batch_size=4096,
                                                batch_format="pyarrow")]
    X0 = np.vstack([p for p in parts if p.size])
    rng = np.random.RandomState(seed)
    k = min(n_cells, len(X0))
    C = X0[rng.choice(len(X0), size=k, replace=False)].copy()

    for _ in range(iters):
        ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            Ck = ray.get(ref)  # zero-copy shared-memory read
            V = list_to_matrix(batch[col])
            if not V.size:
                return pa.table({"cell": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64()),
                                 "vsum": pa.array([], pa.list_(pa.float64()))})
            # ||v−c||² argmin via the matmul form (no n×k×dim temp)
            d = (V * V).sum(1)[:, None] - 2.0 * (V @ Ck.T) \
                + (Ck * Ck).sum(1)[None, :]
            a = d.argmin(1)
            sums = np.zeros((Ck.shape[0], V.shape[1]))
            np.add.at(sums, a, V)
            cnt = np.bincount(a, minlength=Ck.shape[0])
            return pa.table({
                "cell": pa.array(np.arange(Ck.shape[0])),
                "cnt": pa.array(cnt.astype(np.int64)),
                "vsum": pa.array(list(sums), pa.list_(pa.float64()))})

        sums = np.zeros_like(C)
        cnt = np.zeros(C.shape[0], dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow") \
                .iter_batches(batch_size=4096, batch_format="pyarrow"):
            if not b.num_rows:
                continue
            cells = b["cell"].to_numpy(zero_copy_only=False)
            cnt_b = b["cnt"].to_numpy(zero_copy_only=False)
            vs = list_to_matrix(b["vsum"])
            np.add.at(sums, cells, vs)
            np.add.at(cnt, cells, cnt_b)
        nz = cnt > 0
        C[nz] = sums[nz] / cnt[nz, None]
    return C


def ivf_topk(ds, queries: dict, col: str = "embedding",
             id_col: str = "vec_id", k: int = 5, n_cells: int = 16,
             nprobe: int = 4, centroids: np.ndarray | None = None,
             train: str = "driver"):
    """IVF-style ANN: restrict the matmul to the ``nprobe`` cells nearest
    each query. One extra map_batches (cell assignment + filter).
    ``train="distributed"`` runs Lloyd over the WHOLE corpus via
    broadcast-centroid partial sums (the at-scale path); ``"driver"``
    trains on a bounded sample."""
    import ray

    if centroids is None:
        centroids = (train_centroids_distributed(ds, col=col,
                                                 n_cells=n_cells)
                     if train == "distributed"
                     else train_centroids(ds, col=col, n_cells=n_cells))
    qm = np.asarray(queries["matrix"], dtype=np.float64)
    qd = ((qm[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    probe_cells = set()
    for qi in range(qm.shape[0]):
        probe_cells.update(np.argsort(qd[qi])[:nprobe].tolist())
    c_ref = ray.put({"centroids": centroids, "cells": sorted(probe_cells)})

    class CellFilter:
        def __init__(self, ref):
            got = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.C = got["centroids"]
            self.cells = set(got["cells"])

        def __call__(self, batch: pa.Table) -> pa.Table:
            from merge_machine_ray.functions.vectors import list_to_matrix

            V = list_to_matrix(batch[col])
            if V.size == 0:
                return batch
            d = ((V[:, None, :] - self.C[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            cells = np.asarray(sorted(self.cells), dtype=np.int64)
            mask = pa.array(np.isin(a, cells))
            return batch.filter(mask)

    filtered = ds.map_batches(CellFilter, fn_constructor_kwargs={"ref": c_ref},
                              batch_format="pyarrow", concurrency=(1, 4))
    return brute_force_topk(filtered, queries, col=col, id_col=id_col, k=k)


def lsh_topk(ds, queries: dict, col: str = "embedding",
             id_col: str = "vec_id", k: int = 5, n_planes: int = 10,
             n_bands: int = 8, seed: int = 42):
    """LSH-bucketed ANN (the hyperplane counterpart of IVF): corpus
    vectors keep only the rows sharing ≥1 hyperplane band with ANY
    query, then the exact top-k matmul runs on that candidate subset.

    The query band keys are computed driver-side with the SAME cached
    seeded planes the corpus stage uses, broadcast as one sorted array;
    the filter is a vectorized ``np.isin`` per batch — no shuffle at
    all, just a map-side filter before the brute-force reduce. Recall
    follows the OR-of-bands curve (≈1−(1−p^r)^B); misses degrade to
    fewer-than-k rows per query, never wrong rows."""
    import ray

    from merge_machine_ray.functions.vectors import list_to_matrix
    from merge_machine_ray.stages.dedup import _hyperplanes

    qm = np.asarray(queries["matrix"], dtype=np.float64)
    dim = qm.shape[1]
    planes = _hyperplanes(dim, n_bands * n_planes, seed)
    powers = (np.int64(1) << np.arange(n_planes, dtype=np.int64))

    def band_keys(V: np.ndarray) -> np.ndarray:
        bits = (V @ planes) > 0
        keys = np.empty((len(V), n_bands), dtype=np.int64)
        for b in range(n_bands):
            seg = bits[:, b * n_planes:(b + 1) * n_planes]
            keys[:, b] = (seg @ powers) | (np.int64(b) << np.int64(56))
        return keys

    q_keys = ray.put(np.unique(band_keys(qm).reshape(-1)))

    def candidate_filter(batch: pa.Table) -> pa.Table:
        wanted = ray.get(q_keys)  # zero-copy shared-memory read
        V = list_to_matrix(batch[col])
        if not V.size:
            return batch
        hit = np.isin(band_keys(V), wanted).any(axis=1)
        return batch.filter(pa.array(hit))

    filtered = ds.map_batches(candidate_filter, batch_format="pyarrow")
    return brute_force_topk(filtered, queries, col=col, id_col=id_col, k=k)


def label_centroids(ds, vec_col: str = "embedding",
                    label_col: str = "label", scale: int = 1_000_000):
    """Per-label centroid of an embedding column — the vector AGGREGATE
    (class means: IVF seeding, per-language/topic corpus profiles).

    Exactness contract: components quantize to integer ``scale`` units
    BEFORE summing, so the distributed sum is order-independent and the
    DuckDB ``unnest → sum // count`` twin matches bit-for-bit (floor
    division on both engines). Shape: per-batch partial sums —
    ``np.add.at`` over the (n_labels × dim) matrix, emitted LONG as
    (label, dim, s, n) ≈ a few hundred rows per batch — then one tiny
    ``groupby(label, dim)`` fold. The corpus never reshuffles."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        d = int(lens[0])
        assert (lens == d).all(), "label_centroids requires fixed-dim vectors"
        flat = col.values.to_numpy(zero_copy_only=False)[off[0]:off[-1]]
        v = np.round(flat.astype(np.float64) * scale) \
            .astype(np.int64).reshape(t.num_rows, d)
        labels = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((uniq.size, d), np.int64)
        np.add.at(sums, inv, v)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    uniq.size)),
            "s": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(cnt, d)),
        })

    grouped = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["label", "dim"]) \
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        # DuckDB integer // TRUNCATES toward zero (-7//2 = -3) where
        # numpy floors (-4): divide magnitudes, restore the sign
        q = np.where(s < 0, -(-s // n), s // n)
        return pa.table({
            "label": t["label"].cast(pa.int64()),
            "dim": t["dim"].cast(pa.int64()),
            "centroid_micro": pa.array(q),
            "n": pa.array(n),
        })

    return grouped.map_batches(finish, batch_format="pyarrow")
