"""Stage [6]: transitive clustering — connected components over the
match-pair graph (SURVEY.md §2.8 D7; absent in the reference, which
links rows independently — the entity-cluster semantics come from the
north rule).

Two modes:

* ``driver`` — union-find with path compression over streamed edge
  batches; exact and fast when the edge set fits on the driver (edges
  are matches only, ≪ corpus size).
* ``distributed`` — alternating **large-star / small-star** rounds
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SOCC'14): each round is a ``groupby(node).map_groups`` over edge
  endpoints; converges in O(log²) rounds to a star forest pointing at
  each component's minimum id. No driver-resident state.

``mode='auto'`` picks driver below ``driver_edge_limit`` edges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------- driver mode
class UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        root = p.get(x, x)
        while root != p.get(root, root):
            root = p.get(root, root)
        # path compression
        while x != root:
            nxt = p.get(x, x)
            p[x] = root
            x = nxt
        return root

    def union(self, x: int, y: int) -> None:
        rx, ry = self.find(x), self.find(y)
        if rx == ry:
            return
        if rx > ry:
            rx, ry = ry, rx
        self.parent[ry] = rx  # min-id root → labels are component minima


def _driver_components(edges_ds) -> pa.Table:
    """Vectorized driver CC: min-label propagation over the edge list
    with pointer doubling between passes — O(E) numpy work per pass,
    O(log diameter) passes. Replaces a per-edge python UnionFind loop
    (~3 µs/edge: 4.2 s of SERIAL driver wall at 1.4M edges — the
    largest Amdahl term in the flagship's 32-slot profile). Labels are
    dense indices into the sorted node array, so the converged label is
    the component's minimum dense index = minimum doc id (np.unique
    sorts), matching the previous UnionFind-by-min contract."""
    chunks_a, chunks_b = [], []
    for batch in edges_ds.iter_batches(batch_size=262144,
                                       batch_format="pyarrow"):
        chunks_a.append(batch["a"].to_numpy(zero_copy_only=False))
        chunks_b.append(batch["b"].to_numpy(zero_copy_only=False))
    if not chunks_a:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "cluster_id": pa.array([], pa.int64())})
    a = np.concatenate(chunks_a)
    b = np.concatenate(chunks_b)
    ids, roots = _components_arrays(a, b)
    return pa.table({"doc_id": pa.array(ids),
                     "cluster_id": pa.array(roots)})


def _components_arrays(a: np.ndarray, b: np.ndarray):
    """Vectorized CC over in-memory edge arrays: returns
    ``(node_ids, root_ids)`` with root = component minimum id. The
    kernel behind both the driver fast path and the per-block local
    contraction of the distributed path."""
    if a.size == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    ids = np.unique(np.concatenate((a, b)))
    ai = np.searchsorted(ids, a)
    bi = np.searchsorted(ids, b)
    # static edge→node scatter order, sorted ONCE: per pass the min-
    # reduction is then a gather + np.minimum.reduceat (ufunc.at is an
    # order of magnitude slower per element)
    idx = np.concatenate((ai, bi))
    order = np.argsort(idx, kind="stable")
    sidx = idx[order]
    starts = np.flatnonzero(np.concatenate(([True], sidx[1:] != sidx[:-1])))
    touch = sidx[starts]
    label = np.arange(ids.size, dtype=np.int64)
    while True:
        old = label
        m = np.minimum(label[ai], label[bi])
        red = np.minimum.reduceat(np.concatenate((m, m))[order], starts)
        label = label.copy()
        label[touch] = np.minimum(label[touch], red)
        while True:  # pointer doubling to each pass's fixpoint
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(label, old):
            break
    return ids, ids[label]


# ----------------------------------------------------------- distributed mode
def _both_directions(batch: pa.Table) -> pa.Table:
    a = batch["a"].combine_chunks() if isinstance(batch["a"], pa.ChunkedArray) else batch["a"]
    b = batch["b"].combine_chunks() if isinstance(batch["b"], pa.ChunkedArray) else batch["b"]
    return pa.table({
        "src": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
        "dst": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
    })


def _runs(sorted_key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run starts/ids of a sorted key array: (starts, run_id_per_row)."""
    change = np.concatenate(([True], sorted_key[1:] != sorted_key[:-1]))
    return np.flatnonzero(change), np.cumsum(change) - 1


def _sorted_unique_pairs(x: np.ndarray, y: np.ndarray
                         ) -> tuple[np.ndarray, np.ndarray]:
    o = np.lexsort((y, x))
    x, y = x[o], y[o]
    keep = np.concatenate(([True], (x[1:] != x[:-1]) | (y[1:] != y[:-1])))
    return x[keep], y[keep]


def _large_star_bucket(group: pa.Table) -> pa.Table:
    """Vectorized large-star over one BUCKET of src nodes: for each
    node u, connect every strictly-larger neighbor v to m = min(u,
    min-neighbor). One numpy pass handles every node hashing into the
    bucket (a groupby on raw node ids pays per-GROUP python overhead
    on millions of nodes)."""
    s = group["src"].to_numpy(zero_copy_only=False)
    d = group["dst"].to_numpy(zero_copy_only=False)
    s, d = _sorted_unique_pairs(s, d)
    starts, run_id = _runs(s)
    m_row = np.minimum(d[starts], s[starts])[run_id]  # d sorted per run
    mask = d > s
    lo = np.minimum(m_row[mask], d[mask])
    hi = np.maximum(m_row[mask], d[mask])
    keep = lo != hi
    return pa.table({"a": pa.array(lo[keep]), "b": pa.array(hi[keep])})


def _orient_max_min(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    a, b = batch["a"], batch["b"]
    src = pc.max_element_wise(a, b)
    dst = pc.min_element_wise(a, b)
    return pa.table({"src": src, "dst": dst})


def _small_star_bucket(group: pa.Table) -> pa.Table:
    """Vectorized small-star over one bucket: per node u (src = max
    endpoint), connect u and every non-min neighbor to the minimum
    neighbor m."""
    s = group["src"].to_numpy(zero_copy_only=False)
    d = group["dst"].to_numpy(zero_copy_only=False)
    s, d = _sorted_unique_pairs(s, d)
    starts, run_id = _runs(s)
    m_row = d[starts][run_id]                         # min neighbor per run
    first = np.zeros(s.size, dtype=bool)
    first[starts] = True
    rest = ~first                                     # nbrs[1:]
    a = np.concatenate((m_row[rest], d[starts]))
    b = np.concatenate((d[rest], s[starts]))          # + (m, u) per run
    return pa.table({"a": pa.array(a), "b": pa.array(b)})


def _add_node_bucket(col: str, num_buckets: int):
    def fn(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(
            (v % num_buckets).astype(np.int32)))

    return fn


def _dedupe_edges(ds, num_buckets: int):
    """Distinct (a, b) rows via pair-hash bucket + one lexsort/diff per
    bucket (a groupby(a, b) pays per-GROUP python overhead per EDGE)."""

    def bucket(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(
            ((a * 1000003 + b) % num_buckets).astype(np.int32)))

    def uniq(g: pa.Table) -> pa.Table:
        a, b = _sorted_unique_pairs(
            g["a"].to_numpy(zero_copy_only=False),
            g["b"].to_numpy(zero_copy_only=False))
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    return ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(uniq, batch_format="pyarrow")


def _local_contract(t: pa.Table) -> pa.Table:
    """Per-block local contraction: replace a block's edges by the
    star forest of their LOCAL components (root=min → member).
    Connectivity-preserving, so the global result is unchanged (the
    final label is the component min, invariant under any
    connectivity-preserving rewrite); chains, triangles and duplicate
    edges inside one block collapse before the first global round —
    the standard pre-pass that cuts large/small-star input size."""
    a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    ids, roots = _components_arrays(a, b)
    member = ids[roots != ids]
    root = roots[roots != ids]
    return pa.table({"a": pa.array(root), "b": pa.array(member)})


def _distributed_components(edges_ds, max_rounds: int = 30) -> "ray.data.Dataset":
    from merge_machine_ray.stages.pairs import auto_buckets

    # contract + materialize FIRST, then size the bucket count from
    # the post-contraction edge count: the pre-pass can shrink the
    # edge set by orders of magnitude (intra-block dups/chains), and
    # buckets sized to the raw count would leave every star round
    # paying per-bucket overhead on mostly-empty groups
    contracted = edges_ds.map_batches(_local_contract,
                                      batch_size=1 << 20,
                                      batch_format="pyarrow") \
        .materialize()
    num_buckets = auto_buckets(contracted.count() * 2)
    edges = _dedupe_edges(contracted, num_buckets).materialize()
    if edges.count() == 0:
        return edges.map_batches(
            lambda t: pa.table({"doc_id": t["a"], "cluster_id": t["a"]}),
            batch_format="pyarrow")
    prev_sig = None
    for _round in range(max_rounds):
        # large-star
        edges = edges.map_batches(_both_directions, batch_format="pyarrow") \
            .map_batches(_add_node_bucket("src", num_buckets),
                         batch_format="pyarrow") \
            .groupby("bucket").map_groups(_large_star_bucket,
                                          batch_format="pyarrow")
        # small-star
        edges = edges.map_batches(_orient_max_min, batch_format="pyarrow") \
            .map_batches(_add_node_bucket("src", num_buckets),
                         batch_format="pyarrow") \
            .groupby("bucket").map_groups(_small_star_bucket,
                                          batch_format="pyarrow")
        edges = _dedupe_edges(edges, num_buckets).materialize()
        # convergence: EXACT content signature — (edge count, xor-fold,
        # wraparound sum) of per-edge mixed-endpoint hashes. Both folds
        # are order-independent and integer-exact, so two edge sets
        # compare equal iff their hash multisets collide (2^-128-ish),
        # unlike the earlier rounded float sum which could in principle
        # end a round early on a float collision.
        def _sig_partial(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
            b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
            mix = ((a * np.uint64(0x9E3779B97F4A7C15))
                   ^ (b * np.uint64(0xC2B2AE3D27D4EB4F)))
            mix ^= mix >> np.uint64(29)
            x = np.bitwise_xor.reduce(mix) if mix.size else np.uint64(0)
            s = mix.sum(dtype=np.uint64)  # natural 2^64 wraparound
            return pa.table({"x": pa.array([int(x)], pa.uint64()),
                             "s": pa.array([int(s)], pa.uint64()),
                             "n": pa.array([len(mix)], pa.int64())})

        parts = (edges.map_batches(_sig_partial, batch_format="pyarrow")
                 .take_all())  # one tiny row per block
        xf, sf, nf = 0, 0, 0
        for r in parts:
            xf ^= int(r["x"])
            sf = (sf + int(r["s"])) & 0xFFFFFFFFFFFFFFFF
            nf += int(r["n"])
        sig = (nf, xf, sf)
        if sig == prev_sig:
            break
        prev_sig = sig
    # final star forest: every edge is (root=min, member); assignment =
    # min over incident roots, plus roots mapping to themselves. The
    # per-node min is a bucketed lexsort run-min, not a per-node
    # aggregate.
    assign = edges.map_batches(
        lambda t: pa.table({"doc_id": t["b"], "cluster_id": t["a"]}),
        batch_format="pyarrow")
    roots = edges.map_batches(
        lambda t: pa.table({"doc_id": t["a"], "cluster_id": t["a"]}),
        batch_format="pyarrow")

    def node_min(g: pa.Table) -> pa.Table:
        n = g["doc_id"].to_numpy(zero_copy_only=False)
        c = g["cluster_id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((c, n))
        n, c = n[o], c[o]
        starts, _ = _runs(n)
        return pa.table({"doc_id": pa.array(n[starts]),
                         "cluster_id": pa.array(c[starts])})

    return assign.union(roots) \
        .map_batches(_add_node_bucket("doc_id", num_buckets),
                     batch_format="pyarrow") \
        .groupby("bucket").map_groups(node_min, batch_format="pyarrow")


def connected_components(edges_ds, mode: str = "auto",
                         driver_edge_limit: int = 20_000_000):
    """edges (a,b) → Dataset[(doc_id, cluster_id=component min id)].

    Nodes not present in any edge are absent (join with the corpus and
    fill cluster_id=doc_id for singletons — see
    pipelines.entity_resolution.resolve_clusters).

    ``driver_edge_limit``: the driver fast path collects the edge list
    (16 B/edge → 320 MB at the 20M default; peak RESIDENT working set
    is ~8–10× the edge bytes — concat+unique, the doubled scatter
    index with its argsort, and per-pass gather/label temporaries —
    so ~3 GB at the cap, sized for a driver with tens of GB of heap;
    the vectorized min-label kernel is ~0.1 µs/edge·pass). Raised
    from 2M after the flagship measured a 21 s cliff at 2.9M edges
    where the distributed star rounds' per-exchange overhead dominated
    mid-size graphs. At corpus scale (10^12 edges) the distributed
    path runs regardless, now behind a per-block local-contraction
    pre-pass."""
    import ray.data as rd

    if mode == "auto":
        n = edges_ds.count()
        mode = "driver" if n <= driver_edge_limit else "distributed"
    if mode == "driver":
        return rd.from_arrow(_driver_components(edges_ds))
    return _distributed_components(edges_ds)


def attach_assignments(docs, assign, id_col: str = "doc_id",
                       broadcast_limit: int = 50_000_000):
    """docs + (doc_id, cluster_id) assignment → docs with ``cluster_id``
    (own id for rows absent from the match graph — singletons).

    The assignment covers only matched docs (≪ corpus). Below
    ``broadcast_limit`` rows it is broadcast ONCE as sorted numpy arrays
    (zero-copy ``ray.put``) and filled with a vectorized searchsorted
    probe in stateless tasks — the J6 "re-duplication join" pattern
    without a corpus-wide shuffle. Above the limit, a bucketed left hash
    join takes over (no driver- or worker-resident full map)."""
    import ray

    n_assign = assign.count()
    if n_assign > broadcast_limit:
        import pyarrow.compute as pc

        from merge_machine_ray.stages.joins import bucket_hash_join

        joined = bucket_hash_join(docs, assign, id_col, "doc_id",
                                  num_buckets=256, how="left")

        def fill_nulls(batch: pa.Table) -> pa.Table:
            cl = pc.coalesce(batch["cluster_id"], batch[id_col])
            return batch.set_column(
                batch.column_names.index("cluster_id"), "cluster_id", cl)

        return joined.map_batches(fill_nulls, batch_format="pyarrow")

    parts = [(b["doc_id"].to_numpy(zero_copy_only=False),
              b["cluster_id"].to_numpy(zero_copy_only=False))
             for b in assign.iter_batches(batch_size=262144,
                                          batch_format="pyarrow")]
    if parts:
        keys = np.concatenate([p[0] for p in parts])
        vals = np.concatenate([p[1] for p in parts])
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]
    else:
        keys = vals = np.empty(0, dtype=np.int64)
    assign_ref = ray.put((keys, vals))

    def fill_cluster(batch: pa.Table) -> pa.Table:
        k, v = ray.get(assign_ref)  # zero-copy shared-memory read
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cl = ids.copy()
        if k.size:
            pos = np.searchsorted(k, ids).clip(max=k.size - 1)
            hit = k[pos] == ids
            cl[hit] = v[pos[hit]]
        return batch.append_column("cluster_id", pa.array(cl, pa.int64()))

    return docs.map_batches(fill_cluster, batch_format="pyarrow")
