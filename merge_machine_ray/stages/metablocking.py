"""Meta-blocking (Papadakis et al., "Meta-Blocking: Taking Entity
Resolution to the Next Level", TKDE 2014): restructure a redundant
blocking collection — every record carries keys from SEVERAL blocking
schemes — into a pruned candidate graph. Edge weight = the number of
blocks two records co-occur in (the CBS / Common Blocks Scheme weight:
agreement across more independent schemes ⇒ stronger match evidence);
Weighted Edge Pruning (WEP) then discards every edge below the GLOBAL
mean weight. The point at 100 TB: redundant blocking is what makes
cheap schemes recall-safe, and meta-blocking is what makes the
resulting pair explosion tractable — the weight computation IS the
pruning signal, no feature payloads needed.

Reference scope note: the reference engine reaches the same
redundancy-then-prune effect through per-template ES queries ranked by
learned confidence (es_labeller.py's template lattice); CBS/WEP is the
published, engine-agnostic form of that idea and composes with the
repo's blocking/SNM/LSH stages, which all emit the same
``(key, id)`` row shape.

Scale shape: keys ride ONE narrow bucketed exchange (16-byte rows);
pair emission per bucket is one lexsort + repeat/offset expansion with
oversized blocks SKIPPED (bounded O(cap²) per block, semantics
mirrored by the SQL twin's HAVING clause, unlike ``pairs.block_pairs``
whose truncation keeps a prefix); weights come from a run-length count
after a second pair-hash-bucketed exchange; the WEP threshold is a
two-scalar map-side fold (Σw, |E|) — the mean test ``w·|E| ≥ Σw`` is
integer-exact, so the DuckDB twin matches bit-for-bit."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["cbs_pair_weights", "wep_prune"]

_EDGE_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                          ("w", pa.int64())])


def cbs_pair_weights(keys_ds, block_cap: int = 64,
                     num_buckets: int = 64):
    """``(key, id)`` int64 rows (one per record per blocking scheme) →
    ``(id_a, id_b, w)`` with ``w`` = number of distinct blocks the pair
    shares (CBS weight). Blocks with fewer than 2 or more than
    ``block_cap`` distinct ids contribute NO pairs (hot-block skip —
    an exact, twin-expressible rule; a prefix-truncation would depend
    on id order). Duplicate ``(key, id)`` rows collapse first, so a
    record listed twice in one block still counts the block once."""

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(
            (k % num_buckets).astype(np.int32)))

    def emit(group: pa.Table) -> pa.Table:
        # one python call per BUCKET: blocks are contiguous runs after
        # a lexsort; per-block all-pairs expansion is repeat/offset
        # arithmetic (the pairs.block_pairs light path), but oversized
        # blocks are dropped whole rather than truncated
        k = group["key"].to_numpy(zero_copy_only=False)
        i = group["id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((i, k))
        k, i = k[o], i[o]
        dup = np.concatenate(([False], (k[1:] == k[:-1]) & (i[1:] == i[:-1])))
        if dup.any():
            k, i = k[~dup], i[~dup]
        cuts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        sizes = np.diff(np.concatenate((cuts, [k.size])))
        ok = (sizes >= 2) & (sizes <= block_cap)
        if not ok.any():
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        keep = np.repeat(ok, sizes)
        i = i[keep]
        sizes = sizes[ok]
        cuts = np.concatenate(([0], np.cumsum(sizes)))[:-1]
        pos = np.arange(i.size)
        rep = np.repeat(cuts + sizes, sizes) - pos - 1  # later partners
        npairs = int(rep.sum())
        A = np.repeat(pos, rep)
        within = (np.arange(npairs)
                  - np.repeat(np.concatenate(([0], np.cumsum(rep)))[:-1],
                              rep))
        return pa.table({"id_a": pa.array(i[A]),
                         "id_b": pa.array(i[A + 1 + within])})

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return t.append_column("pbkt", pa.array(
            ((a * 1000003 + b) % num_buckets).astype(np.int32)))

    def count_weights(g: pa.Table) -> pa.Table:
        # one co-occurrence row per shared block → CBS weight is the
        # run length after a pair lexsort
        a = g["id_a"].to_numpy(zero_copy_only=False)
        b = g["id_b"].to_numpy(zero_copy_only=False)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        cuts = np.flatnonzero(np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1]))))
        ends = np.concatenate((cuts[1:], [a.size]))
        return pa.table({"id_a": pa.array(a[cuts]),
                         "id_b": pa.array(b[cuts]),
                         "w": pa.array((ends - cuts).astype(np.int64))})

    return (keys_ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(emit, batch_format="pyarrow")
            .map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("pbkt").map_groups(count_weights,
                                        batch_format="pyarrow"))


def wep_prune(edges_ds):
    """Weighted Edge Pruning: keep every edge whose CBS weight is ≥ the
    GLOBAL mean weight, tested in exact integer form
    ``w · n_edges ≥ Σw`` (no float mean; ties keep the edge, matching
    ``w >= avg(w)``). The threshold is a two-scalar map-side fold; the
    filter is one vectorized pass over the (already weight-reduced)
    edge list. Returns the surviving ``(id_a, id_b, w)`` rows."""
    import ray.data as rd

    edges = edges_ds.materialize()

    def partial(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([int(w.size)], pa.int64()),
                         "tw": pa.array([int(w.sum())], pa.int64())})

    parts = edges.map_batches(partial, batch_format="pyarrow")
    n_edges = int(parts.sum("n") or 0)
    total_w = int(parts.sum("tw") or 0)
    if n_edges == 0:
        return rd.from_arrow(_EDGE_SCHEMA.empty_table())

    def keep(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy(zero_copy_only=False)
        m = w * n_edges >= total_w
        return pa.table({"id_a": pa.array(
            t["id_a"].to_numpy(zero_copy_only=False)[m]),
            "id_b": pa.array(t["id_b"].to_numpy(zero_copy_only=False)[m]),
            "w": pa.array(w[m])})

    return edges.map_batches(keep, batch_format="pyarrow")
