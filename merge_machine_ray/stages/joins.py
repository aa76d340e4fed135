"""Explicit partitioned hash join (the portable Ray Data join pattern:
bucket both sides by key-hash, join matching buckets inside one
``groupby(bucket).map_groups``). Used to re-attach compact per-doc
features to the candidate-pair list so the heavy columns never ride the
band-multiplied blocking shuffle.

``Dataset.join`` exists in this Ray version but its hash-shuffle
aggregator actors performed poorly in constrained-CPU runs; this
groupby-based join keeps everything in the task-pool execution model.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def bucket_hash_join(left_ds, right_ds, left_on: str, right_on: str,
                     num_buckets: int = 64, right_suffix: str = "",
                     right_unique: bool = True, how: str = "inner"):
    """Hash join: every left row picks up the matching right row's
    columns (suffixed). The right side's join keys must be unique when
    ``right_unique`` (features keyed by doc id). ONE shuffle of
    left ∪ right; within a bucket the probe is a vectorized
    searchsorted + Arrow take. ``how``: "inner" drops unmatched left
    rows; "left" keeps them with null right columns (Arrow ``take``
    with a null index yields nulls — no per-row work); "full" also
    emits right rows no left row matched, with null left columns and
    the join key surfaced in the LEFT key column (SQL
    ``coalesce(l.key, r.key)`` semantics, so one key column covers
    both sides)."""
    left_outer = how in ("left", "full")
    full_outer = how == "full"
    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    # ray.data.Schema → name→arrow-type maps (names/types parallel lists)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_types = dict(zip(right_schema.names, right_schema.types))
    right_out = [c for c in right_cols if c != right_on]
    out_right_names = [f"{c}{right_suffix}" for c in right_out]

    # aligned union schema: left cols + right cols + side marker
    def tag_left(t: pa.Table) -> pa.Table:
        keys = t[left_on].to_numpy(zero_copy_only=False)
        cols = {c: t[c] for c in left_cols}
        for c, rc in zip(right_out, out_right_names):
            cols[rc] = pa.nulls(t.num_rows, right_types[c])
        cols["__jb"] = pa.array((keys % num_buckets).astype(np.int32))
        cols["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        cols["__key"] = pa.array(keys)
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        keys = t[right_on].to_numpy(zero_copy_only=False)
        cols = {}
        for c in left_cols:
            cols[c] = pa.nulls(t.num_rows, left_types[c])
        for c, rc in zip(right_out, out_right_names):
            cols[rc] = t[c]
        cols["__jb"] = pa.array((keys % num_buckets).astype(np.int32))
        cols["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        cols["__key"] = pa.array(keys)
        return pa.table(cols)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow"))

    def join_bucket(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        side = group["__side"].to_numpy(zero_copy_only=False)
        keys = group["__key"].to_numpy(zero_copy_only=False)
        l_idx = np.flatnonzero(side == 0)
        r_idx = np.flatnonzero(side == 1)
        empty_cols = left_cols + out_right_names

        def right_only(rr: np.ndarray) -> pa.Table:
            """Unmatched right rows (full outer): null left columns,
            the join key coalesced into the left key column."""
            ri = pa.array(rr)
            nulls = pa.array([None] * rr.size, pa.int64())
            cols = {}
            for c in left_cols:
                cols[c] = group["__key"].take(ri).cast(
                    left_types[left_on]) if c == left_on \
                    else group[c].take(nulls)
            for c in out_right_names:
                cols[c] = group[c].take(ri)
            return pa.table(cols)

        if l_idx.size == 0 or (r_idx.size == 0 and not left_outer):
            if full_outer and l_idx.size == 0 and r_idx.size:
                return right_only(r_idx)
            return pa.table({c: group[c].take(pa.array([], pa.int64()))
                             for c in empty_cols})
        if r_idx.size == 0:  # left outer, no right rows in this bucket
            li = pa.array(l_idx)
            nulls = pa.array([None] * l_idx.size, pa.int64())
            return pa.table(
                {**{c: group[c].take(li) for c in left_cols},
                 **{c: group[c].take(nulls) for c in out_right_names}})
        r_keys = keys[r_idx]
        order = np.argsort(r_keys, kind="stable")
        r_sorted = r_keys[order]
        if right_unique and r_sorted.size > 1 and \
                not np.all(r_sorted[1:] != r_sorted[:-1]):
            dup = r_sorted[:-1][r_sorted[1:] == r_sorted[:-1]][0]
            raise ValueError(
                f"bucket_hash_join(right_unique=True): duplicate right "
                f"join key {dup!r} in column {right_on!r}; pass "
                f"right_unique=False for first-match semantics")
        pos = np.searchsorted(r_sorted, keys[l_idx])
        pos_c = pos.clip(max=r_sorted.size - 1)
        hit = r_sorted[pos_c] == keys[l_idx]
        out = {}
        if left_outer:
            li = pa.array(l_idx)
            # null index → null output row: unmatched lefts keep their
            # columns and get nulls for the right side's
            ri_full = np.zeros(l_idx.size, dtype=np.int64)
            ri_full[hit] = r_idx[order[pos_c[hit]]]
            ri = pa.array(ri_full, mask=~hit)
        else:
            li = pa.array(l_idx[hit])
            ri = pa.array(r_idx[order[pos_c[hit]]])
        for c in left_cols:
            out[c] = group[c].take(li)
        for c in out_right_names:
            out[c] = group[c].take(ri)
        result = pa.table(out)
        if full_outer:
            # mark the WHOLE equal-key run matched (searchsorted probes
            # only the run's first element; with right_unique=False a
            # duplicate right key must not resurface as a null-left row)
            matched = np.isin(r_sorted, keys[l_idx][hit])
            unmatched_r = r_idx[order[~matched]]
            if unmatched_r.size:
                result = pa.concat_tables(
                    [result, right_only(unmatched_r)]).combine_chunks()
        return result

    return tagged.groupby("__jb").map_groups(join_bucket,
                                             batch_format="pyarrow")


def bucket_semi_join(left_ds, right_ds, left_on: str, right_on: str,
                     num_buckets: int = 64):
    """SEMI join: keep left rows whose key DOES appear in the right
    side (SQL ``EXISTS`` / ``IN``), each at most once regardless of
    right-side multiplicity. Same one-shuffle bucket pattern as
    :func:`bucket_anti_join` with the keep condition inverted."""
    return _existence_join(left_ds, right_ds, left_on, right_on,
                           num_buckets, keep_hits=True)


def bucket_anti_join(left_ds, right_ds, left_on: str, right_on: str,
                     num_buckets: int = 64):
    """ANTI join: keep left rows whose key does NOT appear in the right
    side. Same one-shuffle bucket pattern as :func:`bucket_hash_join`;
    the right side contributes only its key column."""
    return _existence_join(left_ds, right_ds, left_on, right_on,
                           num_buckets, keep_hits=False)


def _existence_join(left_ds, right_ds, left_on: str, right_on: str,
                    num_buckets: int, keep_hits: bool):
    left_cols = list(left_ds.schema().names)

    def tag_left(t: pa.Table) -> pa.Table:
        keys = t[left_on].to_numpy(zero_copy_only=False)
        cols = {c: t[c] for c in left_cols}
        cols["__jb"] = pa.array((keys % num_buckets).astype(np.int32))
        cols["__side"] = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        cols["__key"] = pa.array(keys)
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        keys = np.unique(t[right_on].to_numpy(zero_copy_only=False))
        cols = {c: pa.nulls(len(keys), left_ds.schema().types[
            left_cols.index(c)]) for c in left_cols}
        cols["__jb"] = pa.array((keys % num_buckets).astype(np.int32))
        cols["__side"] = pa.array(np.ones(len(keys), dtype=np.int8))
        cols["__key"] = pa.array(keys)
        return pa.table(cols)

    tagged = left_ds.map_batches(tag_left, batch_format="pyarrow").union(
        right_ds.map_batches(tag_right, batch_format="pyarrow"))

    def existence_bucket(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        side = group["__side"].to_numpy(zero_copy_only=False)
        keys = group["__key"].to_numpy(zero_copy_only=False)
        l_idx = np.flatnonzero(side == 0)
        if l_idx.size == 0:
            return pa.table({c: group[c].take(pa.array([], pa.int64()))
                             for c in left_cols})
        r_keys = np.unique(keys[side == 1])
        if r_keys.size:
            pos = np.searchsorted(r_keys, keys[l_idx]).clip(
                max=r_keys.size - 1)
            hit = r_keys[pos] == keys[l_idx]
            l_idx = l_idx[hit if keep_hits else ~hit]
        elif keep_hits:
            l_idx = l_idx[:0]
        li = pa.array(l_idx)
        return pa.table({c: group[c].take(li) for c in left_cols})

    return tagged.groupby("__jb").map_groups(existence_bucket,
                                             batch_format="pyarrow")
