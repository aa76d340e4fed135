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
    uf = UnionFind()
    for batch in edges_ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(batch["a"].to_numpy(zero_copy_only=False),
                        batch["b"].to_numpy(zero_copy_only=False)):
            uf.union(int(a), int(b))
    nodes = list(uf.parent.keys())
    # include roots themselves
    roots = {uf.find(n) for n in nodes}
    nodes.extend(r for r in roots if r not in uf.parent)
    labels = [uf.find(n) for n in nodes]
    return pa.table({"doc_id": pa.array(nodes, pa.int64()),
                     "cluster_id": pa.array(labels, pa.int64())})


# ----------------------------------------------------------- distributed mode
def _both_directions(batch: pa.Table) -> pa.Table:
    a = batch["a"].combine_chunks() if isinstance(batch["a"], pa.ChunkedArray) else batch["a"]
    b = batch["b"].combine_chunks() if isinstance(batch["b"], pa.ChunkedArray) else batch["b"]
    return pa.table({
        "src": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
        "dst": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
    })


def _large_star_group(group: pa.Table) -> pa.Table:
    u = group["src"][0].as_py()
    nbrs = sorted(set(group["dst"].to_pylist()))
    m = min(nbrs[0], u) if nbrs else u
    a, b = [], []
    for v in nbrs:
        if v > u:  # connect strictly-larger neighbors to the minimum
            lo, hi = (m, v) if m < v else (v, m)
            if lo != hi:
                a.append(lo); b.append(hi)
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def _orient_max_min(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    a, b = batch["a"], batch["b"]
    src = pc.max_element_wise(a, b)
    dst = pc.min_element_wise(a, b)
    return pa.table({"src": src, "dst": dst})


def _small_star_group(group: pa.Table) -> pa.Table:
    u = group["src"][0].as_py()
    nbrs = sorted(set(group["dst"].to_pylist()))  # all < u
    m = nbrs[0]
    a, b = [], []
    for v in nbrs[1:]:
        a.append(m); b.append(v)
    a.append(m); b.append(u)
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def _dedupe_edges(ds):
    return ds.groupby(["a", "b"]).map_groups(
        lambda t: t.slice(0, 1), batch_format="pyarrow")


def _distributed_components(edges_ds, max_rounds: int = 30) -> "ray.data.Dataset":
    import ray
    from ray.data.aggregate import Min, Sum

    edges = _dedupe_edges(edges_ds).materialize()
    if edges.count() == 0:
        return edges.map_batches(
            lambda t: pa.table({"doc_id": t["a"], "cluster_id": t["a"]}),
            batch_format="pyarrow")
    prev_sig = None
    for _round in range(max_rounds):
        # large-star
        edges = edges.map_batches(_both_directions, batch_format="pyarrow") \
            .groupby("src").map_groups(_large_star_group, batch_format="pyarrow")
        # small-star
        edges = edges.map_batches(_orient_max_min, batch_format="pyarrow") \
            .groupby("src").map_groups(_small_star_group, batch_format="pyarrow")
        edges = _dedupe_edges(edges).materialize()
        # convergence: content signature (count + sums of mixed endpoints)
        import pyarrow.compute as pc

        def _mix(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
            b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
            mix = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (b * np.uint64(0xC2B2AE3D27D4EB4F))
            return pa.table({"m": pa.array((mix >> np.uint64(11)).astype(np.float64))})

        sig = (edges.map_batches(_mix, batch_format="pyarrow")
               .aggregate(Sum("m", alias_name="s")), edges.count())
        sig = (round(float(sig[0]["s"] or 0.0), 3), sig[1])
        if sig == prev_sig:
            break
        prev_sig = sig
    # final star forest: every edge is (root=min, member); assignment =
    # min over incident roots, plus roots mapping to themselves.
    assign = edges.map_batches(
        lambda t: pa.table({"doc_id": t["b"], "cluster_id": t["a"]}),
        batch_format="pyarrow")
    roots = edges.map_batches(
        lambda t: pa.table({"doc_id": t["a"], "cluster_id": t["a"]}),
        batch_format="pyarrow")
    return assign.union(roots).groupby("doc_id").aggregate(
        Min("cluster_id", alias_name="cluster_id"))


def connected_components(edges_ds, mode: str = "auto",
                         driver_edge_limit: int = 2_000_000):
    """edges (a,b) → Dataset[(doc_id, cluster_id=component min id)].

    Nodes not present in any edge are absent (join with the corpus and
    fill cluster_id=doc_id for singletons — see
    pipelines.entity_resolution.resolve_clusters).
    """
    import ray.data as rd

    if mode == "auto":
        n = edges_ds.count()
        mode = "driver" if n <= driver_edge_limit else "distributed"
    if mode == "driver":
        return rd.from_arrow(_driver_components(edges_ds))
    return _distributed_components(edges_ds)
