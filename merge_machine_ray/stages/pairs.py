"""Light-shuffle candidate-pair machinery shared by the near-dup family
(minhash / simhash / embedding LSH) and mirrored from the ER blocking
stage (``stages/blocking.py``):

* band rows crossing the AllToAll are 16-byte ``(band_key, id)`` pairs —
  feature payloads (shingle sets, vectors, signatures) never ride the
  band shuffle ×num_bands; they re-attach to the much smaller deduped
  pair list afterwards (``blocking.attach_features``);
* the band groupby runs on a BUCKET of the key space (``band_key mod
  B``), never on raw band keys — a groupby over millions of mostly-
  singleton blocks pays per-GROUP python overhead (measured 46 s vs
  2.8 s at 3.1M pairs in blocking.py);
* pair emission and pair dedup are one vectorized lexsort/diff pass per
  bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_ID_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


def block_pairs(keys_ds, block_cap: int, num_buckets: int):
    """``(band_key, id)`` rows → distinct candidate ``(id_a, id_b)``
    pairs (``id_a < id_b``), one row per pair. Blocks larger than
    ``block_cap`` distinct ids are truncated (bounded O(cap²) pairs per
    block). Two bucketed exchanges: band buckets for emission, pair-hash
    buckets for the cross-band dedup."""

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["band_key"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((k % num_buckets).astype(np.int32)))

    def emit(group: pa.Table) -> pa.Table:
        # one python call per BUCKET, zero python per block: blocks are
        # contiguous runs after a lexsort; duplicate (band, id) rows
        # (hash-collision guard against self-pairs) drop as adjacent
        # equals; the per-block all-pairs expansion is repeat/offset
        # arithmetic over the whole bucket (the per-segment loop this
        # replaces cost ~3 µs per mostly-singleton block — the same
        # fix as blocking._emit_pairs_bucket_fn's light path). Ids sort
        # ascending within a block, so truncation keeps the SMALLEST
        # block_cap ids (as before) and id_a < id_b holds by position.
        k = group["band_key"].to_numpy(zero_copy_only=False)
        i = group["id"].to_numpy(zero_copy_only=False)
        o = np.lexsort((i, k))
        k, i = k[o], i[o]
        dup = np.concatenate(([False], (k[1:] == k[:-1]) & (i[1:] == i[:-1])))
        if dup.any():
            k, i = k[~dup], i[~dup]
        cuts = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        sizes = np.diff(np.concatenate((cuts, [k.size])))
        if (sizes > block_cap).any():
            rank = np.arange(i.size) - np.repeat(cuts, sizes)
            i = i[rank < block_cap]
            sizes = np.minimum(sizes, block_cap)
            cuts = np.concatenate(([0], np.cumsum(sizes)))[:-1]
        pos = np.arange(i.size)
        rep = np.repeat(cuts + sizes, sizes) - pos - 1  # later partners
        npairs = int(rep.sum())
        if not npairs:
            return _ID_PAIR_SCHEMA.empty_table()
        A = np.repeat(pos, rep)
        within = (np.arange(npairs)
                  - np.repeat(np.concatenate(([0], np.cumsum(rep)))[:-1], rep))
        return pa.table({"id_a": pa.array(i[A]),
                         "id_b": pa.array(i[A + 1 + within])})

    pairs = (keys_ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(emit, batch_format="pyarrow"))
    return dedupe_pairs(pairs, num_buckets)


def dedupe_pairs(pairs_ds, num_buckets: int):
    """Distinct ``(id_a, id_b)`` rows via pair-hash bucket + one
    lexsort/diff per bucket; output columns renamed ``(a, b)`` — the
    key names ``blocking.attach_features`` probes on."""

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

    return (pairs_ds.map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("pbkt").map_groups(uniq_pairs, batch_format="pyarrow"))


def auto_buckets(n_rows: int, rows_per_bucket: int = 20_000) -> int:
    """Bucket count that keeps one bucket's rows in a worker heap while
    bounding per-group python calls (mirrors blocking.py sizing)."""
    return int(min(4096, max(32, n_rows // rows_per_bucket)))


def intersect_counts(list_a: pa.ChunkedArray | pa.Array,
                     list_b: pa.ChunkedArray | pa.Array
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-row intersection size of two ``list<int64>`` SET columns
    (values unique within a row), fully vectorized: tag every flat
    value with its row, lexsort the combined (row, value) array once —
    a value present on both sides becomes an equal-adjacent run — and
    bincount the matches per row. Returns ``(inter, len_a, len_b)``.
    O(total·log total), no per-row python."""
    if isinstance(list_a, pa.ChunkedArray):
        list_a = list_a.combine_chunks()
    if isinstance(list_b, pa.ChunkedArray):
        list_b = list_b.combine_chunks()
    n = len(list_a)
    off_a = list_a.offsets.to_numpy(zero_copy_only=False)
    off_b = list_b.offsets.to_numpy(zero_copy_only=False)
    len_a = np.diff(off_a)
    len_b = np.diff(off_b)
    flat_a = list_a.flatten().to_numpy(zero_copy_only=False)
    flat_b = list_b.flatten().to_numpy(zero_copy_only=False)
    rows = np.concatenate((np.repeat(np.arange(n), len_a),
                           np.repeat(np.arange(n), len_b)))
    vals = np.concatenate((flat_a, flat_b))
    o = np.lexsort((vals, rows))
    rows, vals = rows[o], vals[o]
    # each side's values are unique → an equal-adjacent run inside one
    # row is exactly one value present on both sides
    same = (rows[1:] == rows[:-1]) & (vals[1:] == vals[:-1])
    inter = np.bincount(rows[1:][same], minlength=n)
    return inter, len_a, len_b
