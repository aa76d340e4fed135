"""As-of (time-travel) join — a custom operator Ray Data lacks
natively: for each left row, the latest right row with
``right.ts <= left.ts`` for the same key.

Ray shape (per the guide's recipe): both sides tagged and unioned, ONE
``groupby(key)`` shuffle, per-key vectorized resolution with
``np.searchsorted`` over the right side's sorted timestamps. The
partitioning assumption: one key's rows fit one group — true for
per-user event streams; salt the key by time-range for pathological
single-key streams.
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

    def resolve(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        side = group["__side"].to_numpy(zero_copy_only=False)
        tsv = group[ts].to_numpy(zero_copy_only=False)
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
        r_ts = tsv[r_idx]
        if right_tiebreak:
            tb = group[f"{right_tiebreak}{right_suffix}"] \
                .to_numpy(zero_copy_only=False)[r_idx]
            order = np.lexsort((tb, r_ts))
        else:
            order = np.argsort(r_ts, kind="stable")
        r_sorted_ts = r_ts[order]
        pos = np.searchsorted(r_sorted_ts, tsv[l_idx], side="right") - 1
        has = pos >= 0
        take_idx = np.where(has, r_idx[order[pos.clip(min=0)]], -1)
        ri = pa.array(take_idx, pa.int64())  # -1 → null via take? no:
        # Arrow take with -1 is invalid; build with mask
        valid = pa.array(has)
        safe = pa.array(np.where(has, take_idx, r_idx[0]))
        for oc in out_r:
            vals = group[oc].take(safe)
            out[oc] = pa.compute.if_else(valid, vals,
                                         pa.nulls(l_idx.size, vals.type))
        return pa.table(out)

    return unioned.groupby(key).map_groups(resolve, batch_format="pyarrow")
