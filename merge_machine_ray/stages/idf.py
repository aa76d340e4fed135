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

from ray.data.aggregate import Sum


def _partial_df(batch: pa.Table) -> pa.Table:
    counts: dict[int, int] = {}
    for lst in batch["tok_hashes"].to_pylist():
        for h in set(lst):
            counts[h] = counts.get(h, 0) + 1
    return pa.table({
        "tok": pa.array(list(counts.keys()), pa.int64()),
        "pdf": pa.array(list(counts.values()), pa.int64()),
    })


def document_frequencies(features_ds):
    """features → Dataset[(tok:int64, df:int64)] via partial-agg + groupby."""
    partials = features_ds.select_columns(["tok_hashes"]).map_batches(
        _partial_df, batch_format="pyarrow")
    return partials.groupby("tok").aggregate(Sum("pdf", alias_name="df"))


def build_idf_table(features_ds, n_docs: int | None = None,
                    min_df: int = 2) -> dict:
    """Materialize the (small) IDF lookup as sorted numpy arrays.

    idf(t) = ln((N+1)/(df+1)) + 1; ``default`` = idf at df=1 (exact for
    every token not in the table). Returned dict is the object to
    ``ray.put`` once and hand to scorer actors.
    """
    if n_docs is None:
        n_docs = features_ds.count()
    if n_docs == 0:
        return {"keys": np.empty(0, dtype=np.int64),
                "vals": np.empty(0, dtype=np.float64),
                "default": 1.0, "n_docs": 0}
    df_ds = document_frequencies(features_ds)
    tbl = df_ds.filter(expr=f"df >= {min_df}").to_pandas()
    if "tok" not in tbl.columns:  # empty aggregate loses the schema
        tbl = tbl.reindex(columns=["tok", "df"])
    keys = tbl["tok"].to_numpy(dtype=np.int64)
    dfs = tbl["df"].to_numpy(dtype=np.float64)
    order = np.argsort(keys)
    keys = keys[order]
    idf = np.log((n_docs + 1.0) / (dfs[order] + 1.0)) + 1.0
    return {
        "keys": keys,
        "vals": idf,
        "default": math.log((n_docs + 1.0) / 2.0) + 1.0,
        "n_docs": int(n_docs),
    }
