"""As-of (time-travel) join — a custom operator Ray Data lacks
natively: for each left row, the latest right row with
``right.ts <= left.ts`` for the same key.

Ray shape (per the guide's recipe): both sides tagged and unioned, ONE
``groupby`` shuffle on a BUCKET of the key space, then one vectorized
pass per bucket: rights lexsorted by (key, ts, tiebreak), every left
row resolved by a single structured-array ``np.searchsorted`` over the
composite (key, ts) ordering — no per-key python call (a raw
groupby(key) pays per-GROUP overhead on millions of keys). The
partitioning assumption: one bucket's rows fit one group; salt the key
by time-range for pathological single-key streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def asof_join(left_ds, right_ds, key: str, ts: str,
              left_cols: list[str], right_cols: list[str],
              right_suffix: str = "_r", right_tiebreak: str | None = None):
    """→ Dataset with left rows + the as-of matched right row's columns
    (null when no earlier right row exists). Ties on ``right.ts`` are
    broken by the greatest ``right_tiebreak`` (deterministic output —
    required for oracle comparison)."""
    if right_tiebreak and right_tiebreak not in right_cols:
        right_cols = right_cols + [right_tiebreak]
    l_keep = [key, ts] + [c for c in left_cols if c not in (key, ts)]
    r_keep = [key, ts] + [c for c in right_cols if c not in (key, ts)]
    out_r = [f"{c}{right_suffix}" for c in r_keep if c != key]

    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))

    def tag(side: int, keep, other_names, other_types):
        def fn(t: pa.Table) -> pa.Table:
            cols = {c: t[c] for c in keep}
            cols["__side"] = pa.array(
                np.full(t.num_rows, side, dtype=np.int8))
            for name, typ in zip(other_names, other_types):
                cols[name] = pa.nulls(t.num_rows, typ)
            return pa.table(cols)

        return fn

    # aligned schema: l_keep + (right value cols renamed)
    r_val_cols = [c for c in r_keep if c != key]
    left_tagged = left_ds.map_batches(
        tag(0, l_keep, out_r, [r_types[c] for c in r_val_cols]),
        batch_format="pyarrow")

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {key: t[key]}
        cols[ts] = t[ts]  # right ts doubles as the sort key
        for c in l_keep:
            if c not in (key, ts):
                cols[c] = pa.nulls(t.num_rows, l_types[c])
        cols["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        for c, oc in zip(r_val_cols, out_r):
            cols[oc] = t[c]
        return pa.table(cols)

    right_tagged = right_ds.map_batches(tag_right, batch_format="pyarrow")
    unioned = left_tagged.union(right_tagged)

    def _key_codes(arr: np.ndarray) -> np.ndarray:
        """int keys pass through; other dtypes map to dense int codes
        (consistent within the bucket — that is all ordering needs)."""
        if arr.dtype.kind in "iu":
            return arr.astype(np.int64)
        _, inv = np.unique(arr, return_inverse=True)
        return inv.astype(np.int64)

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        if k.dtype.kind in "iu":
            bkt = (k.astype(np.int64) % num_buckets).astype(np.int32)
        else:
            from merge_machine_ray.functions.hashing import crc_hash64

            uniq, inv = np.unique(k.astype(str), return_inverse=True)
            h = np.array([crc_hash64(u) & ((1 << 63) - 1) for u in uniq],
                         dtype=np.int64)
            bkt = (h[inv] % num_buckets).astype(np.int32)
        return t.append_column("__kb", pa.array(bkt))

    def resolve(group: pa.Table) -> pa.Table:
        group = group.combine_chunks().drop_columns(["__kb"])
        side = group["__side"].to_numpy(zero_copy_only=False)
        tsv = group[ts].to_numpy(zero_copy_only=False).view(np.int64)
        keys = _key_codes(group[key].to_numpy(zero_copy_only=False))
        l_idx = np.flatnonzero(side == 0)
        out_cols = [c for c in group.column_names if c != "__side"]
        if l_idx.size == 0:
            return pa.table({c: group[c].take(pa.array([], pa.int64()))
                             for c in out_cols})
        r_idx = np.flatnonzero(side == 1)
        li = pa.array(l_idx)
        out = {c: group[c].take(li) for c in l_keep}
        if r_idx.size == 0:
            for oc in out_r:
                out[oc] = pa.nulls(l_idx.size, group[oc].type)
            return pa.table(out)
        # rights lexsorted by (key, ts, tiebreak): among equal (key, ts)
        # the LAST row wins = greatest tiebreak, the documented tie rule
        if right_tiebreak:
            tb = group[f"{right_tiebreak}{right_suffix}"] \
                .to_numpy(zero_copy_only=False)[r_idx]
            order = np.lexsort((tb, tsv[r_idx], keys[r_idx]))
        else:
            order = np.lexsort((tsv[r_idx], keys[r_idx]))
        r_sorted = r_idx[order]
        comp = np.dtype([("k", np.int64), ("t", np.int64)])
        r_comp = np.empty(r_sorted.size, dtype=comp)
        r_comp["k"], r_comp["t"] = keys[r_sorted], tsv[r_sorted]
        l_comp = np.empty(l_idx.size, dtype=comp)
        l_comp["k"], l_comp["t"] = keys[l_idx], tsv[l_idx]
        # ONE composite searchsorted resolves every left row: pos-1 is
        # the last right row with (key, ts) <= (key_l, ts_l); it is the
        # as-of match iff it belongs to the same key
        pos = np.searchsorted(r_comp, l_comp, side="right") - 1
        has = (pos >= 0) & (keys[r_sorted[pos.clip(min=0)]] == keys[l_idx])
        valid = pa.array(has)
        safe = pa.array(r_sorted[pos.clip(min=0)])
        for oc in out_r:
            vals = group[oc].take(safe)
            out[oc] = pa.compute.if_else(valid, vals,
                                         pa.nulls(l_idx.size, vals.type))
        return pa.table(out)

    from merge_machine_ray.stages.pairs import auto_buckets

    num_buckets = auto_buckets(left_ds.count() + right_ds.count())
    return unioned.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__kb").map_groups(resolve, batch_format="pyarrow")


def range_join(left_ds, right_ds, key: str, ts: str,
               lo_offset: int, hi_offset: int,
               left_cols: list[str], right_cols: list[str],
               right_suffix: str = "_r"):
    """Banded range join — the as-of join's pair-emitting sibling Ray
    Data also lacks natively: EVERY (left, right) pair with the same
    ``key`` and ``right.ts`` within ``[left.ts + lo_offset, left.ts +
    hi_offset]`` (inclusive, offsets in the timestamp's native unit).
    Unmatched left rows emit nothing (inner semantics).

    Same shuffle shape as :func:`asof_join` (both sides tagged +
    unioned, ONE groupby on a key-space bucket); per bucket the rights
    are lexsorted by (key, ts) once and every left row's match window
    is TWO composite searchsorteds — pair emission is pure offset
    arithmetic (repeat + arange), no per-row Python. Output size is
    bounded by the band width: rows_out ≤ Σ_left |window|. The
    partitioning assumption is the as-of join's (one bucket's rows fit
    one group; salt pathological single-key streams by time range)."""
    l_keep = [key, ts] + [c for c in left_cols if c not in (key, ts)]
    r_val = [c for c in right_cols if c != key]
    out_r = [f"{c}{right_suffix}" for c in r_val]

    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in l_keep}
        cols["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        for c, oc in zip(r_val, out_r):
            cols[oc] = pa.nulls(t.num_rows, r_types[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {key: t[key], ts: t[ts]}
        for c in l_keep:
            if c not in (key, ts):
                cols[c] = pa.nulls(t.num_rows, l_types[c])
        cols["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        for c, oc in zip(r_val, out_r):
            cols[oc] = t[c]
        return pa.table(cols)

    unioned = left_ds.map_batches(tag_left, batch_format="pyarrow") \
        .union(right_ds.map_batches(tag_right, batch_format="pyarrow"))

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        bkt = (k.astype(np.int64) % num_buckets).astype(np.int32)
        return t.append_column("__kb", pa.array(bkt))

    def resolve(group: pa.Table) -> pa.Table:
        group = group.combine_chunks().drop_columns(["__kb"])
        side = group["__side"].to_numpy(zero_copy_only=False)
        tsv = group[ts].to_numpy(zero_copy_only=False).view(np.int64) \
            .astype(np.int64)
        keys = group[key].to_numpy(zero_copy_only=False).astype(np.int64)
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side == 1)
        out_names = l_keep + out_r
        if l_idx.size == 0 or r_idx.size == 0:
            empty = pa.array([], pa.int64())
            return pa.table({c: group[c].take(empty) for c in out_names})
        order = np.lexsort((tsv[r_idx], keys[r_idx]))
        r_sorted = r_idx[order]
        comp = np.dtype([("k", np.int64), ("t", np.int64)])
        r_comp = np.empty(r_sorted.size, dtype=comp)
        r_comp["k"], r_comp["t"] = keys[r_sorted], tsv[r_sorted]
        lo = np.empty(l_idx.size, dtype=comp)
        hi = np.empty(l_idx.size, dtype=comp)
        lo["k"] = hi["k"] = keys[l_idx]
        lo["t"] = tsv[l_idx] + lo_offset
        hi["t"] = tsv[l_idx] + hi_offset
        a = np.searchsorted(r_comp, lo, side="left")
        b = np.searchsorted(r_comp, hi, side="right")
        counts = b - a
        total = int(counts.sum())
        if total == 0:
            empty = pa.array([], pa.int64())
            return pa.table({c: group[c].take(empty) for c in out_names})
        lrep = np.repeat(np.arange(l_idx.size, dtype=np.int64), counts)
        cum = np.concatenate(([0], np.cumsum(counts)[:-1]))
        within = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
        r_take = pa.array(r_sorted[np.repeat(a, counts) + within])
        l_take = pa.array(l_idx[lrep])
        out = {c: group[c].take(l_take) for c in l_keep}
        for oc in out_r:
            out[oc] = group[oc].take(r_take)
        return pa.table(out)

    from merge_machine_ray.stages.pairs import auto_buckets

    num_buckets = auto_buckets(left_ds.count() + right_ds.count())
    return unioned.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__kb").map_groups(resolve, batch_format="pyarrow")
