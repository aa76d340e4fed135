"""Partitioned window functions: row_number / rank / dense_rank / lag.

Ray-native shape (the same one the engine uses for sessionization and
the as-of join): bucket the PARTITION key space by hash — one shuffle
over ``num_buckets`` groups instead of one python call per partition —
then one fully-vectorized numpy pass per bucket (single lexsort →
segment boundaries → cumulative-index arithmetic). A raw
``groupby(partition_col)`` pays per-GROUP python overhead on millions
of partitions at scale; a bucket holds many partitions and amortizes
it. No window state crosses bucket boundaries because a partition
hashes to exactly one bucket.

SQL parity: ``row_number()``, ``rank()``, ``dense_rank()`` and
``lag(col, n)`` OVER (PARTITION BY p ORDER BY o1, o2, ...). For
deterministic (driver-hashable) ``row_number``/``lag`` output, the
caller must supply a TOTAL order — include a unique key as the last
order column, exactly as the SQL twin must.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from merge_machine_ray.stages.pairs import auto_buckets

__all__ = ["window", "WindowSpec"]


class WindowSpec:
    """What to compute. ``order_by`` is ``[(col, descending), ...]``;
    ties in ``rank``/``dense_rank`` are judged on the full order list
    (mirror SQL: put only the ranking expression there and keep
    ``row_number`` for total orders). ``rank_on`` restricts tie
    judgment to the first N order columns (SQL: rank() whose ORDER BY
    omits the trailing tiebreak columns). ``lag``/``lead`` map output
    column → ``(source_col, offset)``; rows without a
    predecessor/successor get null. ``cum_sum`` maps output column →
    source column: running total within the partition in order (SQL
    ``sum(col) OVER (... ROWS UNBOUNDED PRECEDING)``); integer and
    float sources keep their dtype's summation semantics."""

    def __init__(self, partition_by: str,
                 order_by: list[tuple[str, bool]],
                 row_number: str | None = None,
                 rank: str | None = None,
                 dense_rank: str | None = None,
                 rank_on: int | None = None,
                 lag: dict[str, tuple[str, int]] | None = None,
                 lead: dict[str, tuple[str, int]] | None = None,
                 cum_sum: dict[str, str] | None = None):
        self.partition_by = partition_by
        self.order_by = list(order_by)
        self.row_number = row_number
        self.rank = rank
        self.dense_rank = dense_rank
        self.rank_on = rank_on
        self.lag = dict(lag or {})
        self.lead = dict(lead or {})
        self.cum_sum = dict(cum_sum or {})


def _sort_key(col: pa.ChunkedArray | pa.Array, descending: bool) -> np.ndarray:
    """numpy lexsort key for one order column; strings go through a
    SORTED dictionary so codes order like values (descending strings
    negate the codes). Nulls sort LAST in either direction (DuckDB's
    default NULLS LAST), via an explicit max sentinel — never through
    NaN float indices."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    null_mask = (pc.is_null(col).to_numpy(zero_copy_only=False)
                 if col.null_count else None)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        enc = pc.dictionary_encode(pc.fill_null(col, ""))
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        order = np.argsort(vocab, kind="stable")
        rankmap = np.empty(order.size, np.int64)
        rankmap[order] = np.arange(order.size)
        key = rankmap[enc.indices.to_numpy(zero_copy_only=False)
                      .astype(np.int64)]
    else:
        if null_mask is not None:
            col = pc.fill_null(col, pa.scalar(0).cast(col.type))
        key = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(key.dtype, np.datetime64):
            key = key.astype("datetime64[us]").astype(np.int64)
    if descending:
        key = -key.astype(np.int64) if np.issubdtype(
            np.asarray(key).dtype, np.integer) else -key
    if null_mask is not None:
        key = key.astype(key.dtype, copy=True)
        key[null_mask] = (np.inf if np.issubdtype(key.dtype, np.floating)
                          else np.iinfo(np.int64).max)
    return key


# Fixed odd constant: the bucket-hash of every NULL partition key, so a
# nullable partition column routes all null rows to ONE partition (the
# SQL "NULL IS NOT DISTINCT FROM NULL" grouping) instead of casting
# NaN→int64 per row (undefined) and silently splitting them.
_NULL_PARTITION_HASH = np.uint64(0x9E3779B97F4A7C15)


def _partition_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 bucket-hash of the partition column (splitmix for ints,
    crc per distinct string via dictionary encoding); nulls map to one
    fixed constant."""
    import pyarrow.compute as pc

    from merge_machine_ray.functions.minhash import mix64, str_elem_hashes

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    null_mask = (pc.is_null(col).to_numpy(zero_copy_only=False)
                 if col.null_count else None)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        h = str_elem_hashes(pc.fill_null(col, ""))
    else:
        if null_mask is not None:
            col = pc.fill_null(col, pa.scalar(0).cast(col.type))
        vals = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(vals.dtype, np.datetime64):
            vals = vals.astype("datetime64[us]").astype(np.int64)
        h = mix64(vals.astype(np.int64).astype(np.uint64))
    if null_mask is not None:
        h = h.copy()
        h[null_mask] = _NULL_PARTITION_HASH
    return h


def window(ds, spec: WindowSpec, keep_cols: list[str] | None = None,
           num_buckets: int | None = None):
    """Dataset → Dataset with the window columns appended.

    Output columns: ``keep_cols`` (default: partition + order + lag
    sources) plus the requested window columns, one row per input row.
    """
    if num_buckets is None:
        num_buckets = auto_buckets(ds.count())
    part = spec.partition_by
    order_cols = [c for c, _ in spec.order_by]
    lag_srcs = [src for src, _ in spec.lag.values()] + \
        [src for src, _ in spec.lead.values()] + \
        list(spec.cum_sum.values())
    if keep_cols is None:
        keep_cols = list(dict.fromkeys([part] + order_cols + lag_srcs))
    need = list(dict.fromkeys(keep_cols + [part] + order_cols + lag_srcs))

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.select(need)
        h = _partition_hash(t[part]) % np.uint64(num_buckets)
        return t.append_column("__bucket", pa.array(h.astype(np.int32)))

    def run_windows(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        n = g.num_rows
        pkey = _partition_hash(g[part])
        # refine hash partitions by value to guard against collisions:
        # order by (hash, value-as-sort-key) and break segments on the
        # VALUE key, which is exact within a bucket
        pval = _sort_key(g[part], False)
        okeys = [_sort_key(g[c], desc) for c, desc in spec.order_by]
        # np.lexsort: LAST key is primary
        o = np.lexsort(tuple(reversed(okeys)) + (pval, pkey))
        pv = pval[o]
        seg_start = np.empty(n, bool)
        seg_start[:1] = True
        seg_start[1:] = pv[1:] != pv[:-1]
        idx = np.arange(n, dtype=np.int64)
        start_idx = np.maximum.accumulate(np.where(seg_start, idx, -1))
        out = {c: g[c].take(pa.array(o)) for c in keep_cols}
        if spec.row_number:
            out[spec.row_number] = pa.array(idx - start_idx + 1)
        if spec.rank or spec.dense_rank:
            tie_keys = okeys if spec.rank_on is None else okeys[:spec.rank_on]
            change = seg_start.copy()
            for k in tie_keys:
                kv = k[o]
                change[1:] |= kv[1:] != kv[:-1]
            if spec.rank:
                chg_idx = np.maximum.accumulate(np.where(change, idx, -1))
                out[spec.rank] = pa.array(chg_idx - start_idx + 1)
            if spec.dense_rank:
                dr = np.cumsum(change)
                out[spec.dense_rank] = pa.array(
                    (dr - dr[start_idx] + 1).astype(np.int64))
        def shift(src: str, off: int, forward: bool) -> pa.Array:
            import pyarrow.compute as pc

            src_sorted = g[src].take(pa.array(o))
            if forward:
                # a row's successor is valid while it stays inside the
                # row's own segment: next segment start bounds it
                starts = np.flatnonzero(seg_start)
                ends = np.concatenate((starts[1:], [n]))
                seg_end = ends[np.cumsum(seg_start) - 1]
                valid = idx + off < seg_end
                pos = np.where(valid, idx + off, idx)
            else:
                valid = (idx - start_idx) >= off
                pos = np.where(valid, idx - off, idx)
            shifted = src_sorted.take(pa.array(pos))
            if not valid.all():
                shifted = pc.if_else(pa.array(~valid),
                                     pa.nulls(n, shifted.type), shifted)
            return shifted

        for out_col, (src, off) in spec.lag.items():
            out[out_col] = shift(src, off, forward=False)
        for out_col, (src, off) in spec.lead.items():
            out[out_col] = shift(src, off, forward=True)
        for out_col, src in spec.cum_sum.items():
            vals = g[src].take(pa.array(o)).to_numpy(zero_copy_only=False)
            run = np.cumsum(vals)
            # subtract the running total just before each segment start,
            # propagated: cumsum restarts per partition
            base = np.where(start_idx > 0, run[start_idx - 1], 0)
            out[out_col] = pa.array(run - base)
        return pa.table(out)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(run_windows, batch_format="pyarrow"))
