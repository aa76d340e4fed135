"""Data-quality operators: column profiling and referential-integrity
audit — the validation pass a production pipeline runs on every new
corpus drop before anything downstream trusts it (the Deequ/
great-expectations surface, re-expressed as Ray Data folds).

Scale notes (100 TB):
* Scalar stats (rows / nulls / min / max) fold per batch into ONE row
  per block with native-typed min/max columns — the driver fold is
  blocks-sized, never data-sized, and no numeric column is ever
  compared lexicographically.
* Exact distinct counts are ONE bucketed exchange shared by all
  profiled columns: each batch ships its batch-DISTINCT (column,
  value) pairs, buckets by value hash, counts distinct runs per
  bucket with one lexsort, and a column-sized groupby folds the
  per-bucket partials. On a unique column this is a full shuffle of
  distinct values — the price of EXACT semantics; the documented
  approximate path at 100 TB is the KMV sketch
  (`stages/sketch.kmv_distinct`).
* The FK audit is the bucketed existence-join machinery
  (`stages/joins.bucket_semi_join`) — child keys pre-deduped per
  batch, never a broadcast of the parent key set.

Profiled column types: integers and strings (min/max stringified via
Arrow cast, which matches DuckDB ``CAST(x AS VARCHAR)`` for both);
other types profile rows/nulls/distinct but report null min/max — the
SQL twin mirrors with ``CAST(NULL AS VARCHAR)``.

Reference parity: Merge-Machine validates inputs only implicitly (CSV
load-time dtype coercion, `es_insert.py`); this module belongs to the
training-data extension surface of SURVEY.md §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _np(arr):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.to_numpy(zero_copy_only=False)


def _stringify_minmax(ty: pa.DataType) -> bool:
    return pa.types.is_integer(ty) or pa.types.is_string(ty) \
        or pa.types.is_large_string(ty)


def column_profile(ds, cols: list[str], num_buckets: int = 64):
    """Exact per-column profile → pa.Table
    ``(col_name, n_rows, n_null, n_distinct, min_v, max_v)``,
    one row per profiled column, ordered by ``cols``.

    ``n_distinct`` excludes nulls (SQL ``count(DISTINCT col)``);
    min/max are null on all-null columns and on non-int/string types.
    """
    import ray.data  # noqa: F401  (ds is a Dataset)
    from ray.data.aggregate import Sum

    # ---- pass 1: scalar partials, one row per block, native types
    def scalar_partial(t: pa.Table) -> pa.Table:
        out = {"pn": pa.array([t.num_rows], pa.int64())}
        for i, c in enumerate(cols):
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out[f"nu{i}"] = pa.array([col.null_count], pa.int64())
            if _stringify_minmax(col.type) and len(col) > col.null_count:
                mm = pc.min_max(col)
                out[f"mn{i}"] = pa.array([mm["min"].as_py()], col.type)
                out[f"mx{i}"] = pa.array([mm["max"].as_py()], col.type)
            else:
                out[f"mn{i}"] = pa.array([None], col.type)
                out[f"mx{i}"] = pa.array([None], col.type)
        return pa.table(out)

    parts = pa.concat_tables(
        ds.map_batches(scalar_partial, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 16, batch_format="pyarrow"))
    n_rows = int(_np(parts["pn"]).sum()) if parts.num_rows else 0
    n_null, min_v, max_v = [], [], []
    for i, _c in enumerate(cols):
        n_null.append(int(_np(parts[f"nu{i}"]).sum())
                      if parts.num_rows else 0)
        mn = parts[f"mn{i}"]
        mx = parts[f"mx{i}"]
        if parts.num_rows and mn.null_count < len(mn):
            min_v.append(pc.cast(pc.min(mn), pa.string()).as_py())
            max_v.append(pc.cast(pc.max(mx), pa.string()).as_py())
        else:
            min_v.append(None)
            max_v.append(None)

    # ---- pass 2: one shared bucketed exchange for exact distincts
    def distinct_partial(t: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            u = pc.unique(col.drop_null().cast(pa.string()))
            names.append(pa.nulls(len(u), pa.string()).fill_null(c))
            vals.append(u)
        name_arr = pa.concat_arrays(names) if names \
            else pa.array([], pa.string())
        val_arr = pa.concat_arrays(
            [v.cast(pa.string()) for v in vals]) if vals \
            else pa.array([], pa.string())
        from merge_machine_ray.functions.minhash import str_elem_hashes
        h = str_elem_hashes(val_arr) if len(val_arr) \
            else np.empty(0, np.uint64)
        return pa.table({
            "col_name": name_arr,
            "v": val_arr,
            "__bkt": pa.array((h % num_buckets).astype(np.int32)),
        })

    def count_bucket(g: pa.Table) -> pa.Table:
        name_codes, name_dic = _sorted_codes(g["col_name"])
        val_codes, _ = _sorted_codes(g["v"])
        o = np.lexsort((val_codes, name_codes))
        nc, vc = name_codes[o], val_codes[o]
        keep = np.concatenate(
            ([True], (nc[1:] != nc[:-1]) | (vc[1:] != vc[:-1])))
        nc = nc[keep]
        starts = np.flatnonzero(
            np.concatenate(([True], nc[1:] != nc[:-1])))
        counts = np.diff(np.concatenate((starts, [nc.size]))) \
            .astype(np.int64)
        return pa.table({
            "col_name": name_dic.take(pa.array(nc[starts])),
            "pd": pa.array(counts),
        })

    dist = ds.map_batches(distinct_partial, batch_format="pyarrow") \
        .groupby("__bkt").map_groups(count_bucket,
                                     batch_format="pyarrow") \
        .groupby("col_name").aggregate(Sum("pd", alias_name="nd")) \
        .take_all()
    nd = {r["col_name"]: int(r["nd"]) for r in dist}

    return pa.table({
        "col_name": pa.array(cols, pa.string()),
        "n_rows": pa.array([n_rows] * len(cols), pa.int64()),
        "n_null": pa.array(n_null, pa.int64()),
        "n_distinct": pa.array([nd.get(c, 0) for c in cols], pa.int64()),
        "min_v": pa.array(min_v, pa.string()),
        "max_v": pa.array(max_v, pa.string()),
    })


def _sorted_codes(arr):
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    d = pc.dictionary_encode(arr)
    dic = d.dictionary
    order = pc.sort_indices(dic)
    rank = np.empty(len(dic), dtype=np.int64)
    rank[_np(order)] = np.arange(len(dic), dtype=np.int64)
    return rank[_np(d.indices)], dic.take(order)


def fk_audit(edges, num_buckets: int = 64) -> pa.Table:
    """Referential-integrity audit over ``edges = [(edge_name,
    child_ds, child_key, parent_ds, parent_key), ...]`` → one row per
    edge: ``(edge, n_child, n_matched, n_orphans)`` counting CHILD ROWS
    whose key has no parent. Each edge is one bucketed semi-join
    (child keys pre-deduped per batch before the exchange, then child
    rows counted per distinct key)."""
    from ray.data.aggregate import Sum

    from merge_machine_ray.stages.joins import bucket_semi_join

    names, n_child, n_matched = [], [], []
    for name, child, ckey, parent, pkey in edges:
        def key_counts(t: pa.Table, k=ckey) -> pa.Table:
            col = t[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            col = col.drop_null()
            enc = pc.dictionary_encode(col)
            cnt = np.bincount(
                _np(enc.indices), minlength=len(enc.dictionary)
            ).astype(np.int64)
            return pa.table({"__k": enc.dictionary,
                             "__n": pa.array(cnt)})

        ck = child.map_batches(key_counts, batch_format="pyarrow") \
            .groupby("__k").aggregate(Sum("__n", alias_name="__n"))
        total = sum(
            int(_np(b["__n"]).sum()) for b in ck.iter_batches(
                batch_size=1 << 16, batch_format="pyarrow"))

        def parent_keys(t: pa.Table, k=pkey) -> pa.Table:
            col = t[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pa.table({"__k": pc.unique(col.drop_null())})

        pk = parent.map_batches(parent_keys, batch_format="pyarrow")
        matched_ds = bucket_semi_join(ck, pk, "__k", "__k",
                                      num_buckets=num_buckets)
        matched = sum(
            int(_np(b["__n"]).sum()) for b in matched_ds.iter_batches(
                batch_size=1 << 16, batch_format="pyarrow"))
        names.append(name)
        n_child.append(total)
        n_matched.append(matched)

    nc = np.asarray(n_child, dtype=np.int64)
    nm = np.asarray(n_matched, dtype=np.int64)
    return pa.table({
        "edge": pa.array(names, pa.string()),
        "n_child": pa.array(nc),
        "n_matched": pa.array(nm),
        "n_orphans": pa.array(nc - nm),
    })


def snapshot_diff(old_ds, new_ds, id_col: str = "doc_id",
                  content_col: str = "text", num_buckets: int = 64):
    """Key-level diff between two corpus drops → one row per status:
    ``(status ∈ added/removed/changed/unchanged, n_docs)``. The ingest
    regression gate a production pipeline runs on every new snapshot
    (complements content-level incremental dedup: this is keyed by id,
    not by content hash).

    ONE bucketed exchange: both sides tagged and bucketed by id hash;
    within a bucket ids are unique per side, so a lexsort by (id,
    side) yields runs of length 1 (one-sided → added/removed) or 2
    (both → exact content compare → changed/unchanged), and each
    bucket emits ≤4 partial count rows. Contents ride the exchange so
    the compare is COLLISION-EXACT (the exact-dedup contract); at
    100 TB ship a content hash + a verify pass instead."""
    from ray.data.aggregate import Sum

    from merge_machine_ray.functions.minhash import str_elem_hashes

    def tag(side):
        def f(t: pa.Table) -> pa.Table:
            ids = t[id_col]
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            h = str_elem_hashes(pc.cast(ids, pa.string()))
            return pa.table({
                "__id": ids,
                "__c": pc.fill_null(t[content_col].cast(pa.string()), ""),
                "__side": pa.array(
                    np.full(t.num_rows, side, dtype=np.int8)),
                "__bkt": pa.array((h % num_buckets).astype(np.int32)),
            })
        return f

    both = old_ds.map_batches(tag(0), batch_format="pyarrow") \
        .union(new_ds.map_batches(tag(1), batch_format="pyarrow"))

    def classify(g: pa.Table) -> pa.Table:
        ids = _np(g["__id"])
        side = _np(g["__side"])
        c = _np(g["__c"]).astype(object)
        o = np.lexsort((side, ids))
        ids, side, c = ids[o], side[o], c[o]
        starts = np.flatnonzero(
            np.concatenate(([True], ids[1:] != ids[:-1])))
        lens = np.diff(np.concatenate((starts, [ids.size])))
        one = starts[lens == 1]
        n_add = int((side[one] == 1).sum())
        n_rem = int((side[one] == 0).sum())
        two = starts[lens == 2]
        same = c[two] == c[two + 1]
        return pa.table({
            "status": pa.array(["added", "removed", "changed",
                                "unchanged"]),
            "pn": pa.array(np.array(
                [n_add, n_rem, int((~same).sum()), int(same.sum())],
                dtype=np.int64)),
        })

    agg = both.groupby("__bkt").map_groups(classify,
                                           batch_format="pyarrow") \
        .groupby("status").aggregate(Sum("pn", alias_name="n_docs"))

    def tidy(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["n_docs"].cast(pa.int64()), 0)
        return pa.table({
            "status": t["status"],
            "n_docs": t["n_docs"].cast(pa.int64())}).filter(keep)

    return agg.map_batches(tidy, batch_format="pyarrow")
