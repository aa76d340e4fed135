"""Corpus DF/IDF statistics job (SURVEY.md §2.6 G7).

The explicit replacement for the BM25 document-frequency statistics the
reference gets for free inside Elasticsearch (ST1). Pattern:
**partial aggregation inside map_batches** (one (token, partial_df) row
per distinct token per batch) → small ``groupby(token).sum()`` — so the
all-to-all shuffle moves per-batch partials, not one row per token
occurrence.

Only tokens with df ≥ 2 enter the table: a df=1 token's idf equals the
``default`` bucket, so dropping singletons is exact and bounds the
broadcast table by the repeated vocabulary.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

def _count_distinct_rows_per_token(flat: np.ndarray,
                                   row_ids: np.ndarray):
    """Core of the DF partial: given the flattened token codes and their
    row ids, return (unique token codes, #distinct rows containing each)
    via one lexsort + run segmentation — no python per token or row."""
    o = np.lexsort((row_ids, flat))
    t, r = flat[o], row_ids[o]
    keep = np.concatenate(([True], (t[1:] != t[:-1]) | (r[1:] != r[:-1])))
    t = t[keep]
    starts = np.flatnonzero(np.concatenate(([True], t[1:] != t[:-1])))
    ends = np.concatenate((starts[1:], [t.size]))
    return t[starts], (ends - starts).astype(np.int64)


def _partial_df(batch: pa.Table) -> pa.Table:
    """Per-batch document frequencies, fully vectorized: flatten the
    token-list column, lexsort (token, row), drop duplicate
    (token, row) pairs, and count per-token runs (round 1 looped python
    sets per row)."""
    toks = batch["tok_hashes"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    if not flat.size:
        return pa.table({"tok": pa.array([], pa.int64()),
                         "pdf": pa.array([], pa.int64())})
    row_ids = np.repeat(np.arange(batch.num_rows), np.diff(offsets))
    tok, pdf = _count_distinct_rows_per_token(flat, row_ids)
    return pa.table({"tok": pa.array(tok), "pdf": pa.array(pdf)})


def partial_df_strings(batch: pa.Table, text_col: str = "text",
                       pattern: str = "[^a-z0-9]+") -> pa.Table:
    """String-token DF partial sharing the vectorized core above:
    lower + regex-split with Arrow kernels, dictionary-encode the
    flattened tokens to int32 codes, count distinct rows per code, and
    decode back to strings. One python call per batch; no per-row loop."""
    import pyarrow.compute as pc

    txt = batch[text_col].cast(pa.string())
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(txt, "")), pattern)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    flat = toks.flatten()
    empty = pa.table({"tok": pa.array([], pa.string()),
                      "pdf": pa.array([], pa.int64())})
    if not len(flat):
        return empty
    d = pc.dictionary_encode(flat)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    row_ids = np.repeat(np.arange(batch.num_rows), np.diff(offsets))
    # regex-split emits '' at string edges — mask those occurrences out
    ok = np.flatnonzero(
        pc.not_equal(flat, "").to_numpy(zero_copy_only=False))
    if not ok.size:
        return empty
    tok_codes, pdf = _count_distinct_rows_per_token(codes[ok], row_ids[ok])
    return pa.table({
        "tok": d.dictionary.take(pa.array(tok_codes)),
        "pdf": pa.array(pdf),
    })


def document_frequencies(features_ds, num_buckets: int = 256):
    """features → Dataset[(tok:int64, df:int64)] via partial-agg + one
    bucketed groupby: partials sum per token with a lexsort/bincount
    pass per BUCKET of the token space (a groupby on raw tokens pays
    per-GROUP python overhead across the whole vocabulary)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["tok"].to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(
            (k % num_buckets).astype(np.int32)))

    def sum_bucket(g: pa.Table) -> pa.Table:
        t = g["tok"].to_numpy(zero_copy_only=False)
        p = g["pdf"].to_numpy(zero_copy_only=False)
        o = np.argsort(t, kind="stable")
        t, p = t[o], p[o]
        change = np.concatenate(([True], t[1:] != t[:-1]))
        run_id = np.cumsum(change) - 1
        sums = np.bincount(run_id, weights=p).astype(np.int64)
        return pa.table({"tok": pa.array(t[change]), "df": pa.array(sums)})

    partials = features_ds.select_columns(["tok_hashes"]).map_batches(
        _partial_df, batch_format="pyarrow")
    return partials.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(sum_bucket, batch_format="pyarrow")


#: Above this many streamed partial-DF rows the IDF fold falls back to
#: the bucketed groupby (`document_frequencies`). Partial rows are
#: bounded by blocks × per-block vocab — ~686k at 1.05M docs — so the
#: driver fold (one lexsort) covers every realistic single-job corpus;
#: the cap keeps a 100 TB job's fold off the driver.
DRIVER_FOLD_LIMIT = 50_000_000


def build_idf_table(features_ds, n_docs: int | None = None,
                    min_df: int = 2) -> dict:
    """Materialize the (small) IDF lookup as sorted numpy arrays.

    idf(t) = ln((N+1)/(df+1)) + 1; ``default`` = idf at df=1 (exact for
    every token not in the table). Returned dict is the object to
    ``ray.put`` once and hand to scorer actors.

    The partial-DF rows stream to the driver and fold with ONE lexsort
    when they fit under ``DRIVER_FOLD_LIMIT`` — the bucketed groupby
    exchange cost ~5-9 s of pure shuffle overhead on a 686k-row/11 MB
    aggregate at 1.05M docs; above the cap the distributed
    ``document_frequencies`` path takes over.
    """
    if n_docs is None:
        n_docs = features_ds.count()
    if n_docs == 0:
        return {"keys": np.empty(0, dtype=np.int64),
                "vals": np.empty(0, dtype=np.float64),
                "default": 1.0, "n_docs": 0}
    parts: list[tuple[np.ndarray, np.ndarray]] = []
    total = 0
    fits = True
    partials = features_ds.select_columns(["tok_hashes"]).map_batches(
        _partial_df, batch_format="pyarrow")
    for b in partials.iter_batches(batch_size=262144,
                                   batch_format="pyarrow"):
        parts.append((b["tok"].to_numpy(zero_copy_only=False),
                      b["pdf"].to_numpy(zero_copy_only=False)))
        total += b.num_rows
        if total > DRIVER_FOLD_LIMIT:
            fits = False
            break
    if fits:
        if parts:
            toks = np.concatenate([p[0] for p in parts])
            pdfs = np.concatenate([p[1] for p in parts])
            o = np.argsort(toks, kind="stable")
            t_, p_ = toks[o], pdfs[o]
            change = np.concatenate(([True], t_[1:] != t_[:-1]))
            sums = np.bincount(np.cumsum(change) - 1,
                               weights=p_).astype(np.int64)
            keys = t_[change]
            dfs = sums
        else:
            keys = np.empty(0, dtype=np.int64)
            dfs = np.empty(0, dtype=np.int64)
        m = dfs >= min_df
        keys = keys[m]
        dfs = dfs[m].astype(np.float64)
    else:
        df_ds = document_frequencies(features_ds)
        tbl = df_ds.filter(expr=f"df >= {min_df}").to_pandas()
        if "tok" not in tbl.columns:  # empty aggregate loses the schema
            tbl = tbl.reindex(columns=["tok", "df"])
        keys = tbl["tok"].to_numpy(dtype=np.int64)
        dfs = tbl["df"].to_numpy(dtype=np.float64)
        order = np.argsort(keys)
        keys = keys[order]
        dfs = dfs[order]
    idf = np.log((n_docs + 1.0) / (dfs + 1.0)) + 1.0
    return {
        "keys": keys,
        "vals": idf,
        "default": math.log((n_docs + 1.0) / 2.0) + 1.0,
        "n_docs": int(n_docs),
    }
