"""Reference-index artifact — the Ray-native replacement of the ES
index lifecycle (SURVEY.md §2.1 S3/S4: ``create_index`` + bulk insert,
reference ``merge_machine/es_insert.py:30-173``).

"Indexing" a clean referential here means materializing, once:

* the normalized referential as partitioned parquet (the document
  store role),
* per (column, analyzer) document-frequency/IDF statistics (the BM25
  corpus-statistics role, ST1/G7), stored as parquet sidecars,
* an ``_index.json`` manifest (columns_to_index, analyzer names, row
  count, fingerprints — the index-settings role).

Linking jobs then load IDF tables from the artifact instead of
recomputing them per run, and :func:`search` provides the J8
keyword-lookup used by labelling tooling.
"""

from __future__ import annotations

import json
import math
import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from merge_machine_ray.functions.hashing import crc_hash64
from merge_machine_ray.functions.tokenize import ANALYZERS
from merge_machine_ray.io.checkpoint import fingerprint_of


def create_ref_index(ref_ds, out_dir: str,
                     columns_to_index: dict[str, list[str]],
                     id_col: str | None = None) -> dict:
    """Build the index artifact. ``columns_to_index``: {ref_col:
    [analyzer, ...]} — the reference's ``columns_to_index`` contract
    (``examples/example.py:104-117``)."""
    from ray.data.aggregate import Sum

    os.makedirs(out_dir, exist_ok=True)
    docs_dir = os.path.join(out_dir, "docs")
    ref_ds = ref_ds.materialize()
    n_docs = ref_ds.count()
    ref_ds.write_parquet(docs_dir)

    stats_meta = {}
    for col, analyzers in columns_to_index.items():
        for analyzer in analyzers:
            tokenize = ANALYZERS[analyzer]

            def partial(batch: pa.Table, col=col, tokenize=tokenize) -> pa.Table:
                counts: Counter = Counter()
                for s in batch[col].to_pylist():
                    counts.update({crc_hash64(t) & ((1 << 63) - 1)
                                   for t in tokenize(s or "")})
                return pa.table({
                    "tok": pa.array(list(counts.keys()), pa.int64()),
                    "pdf": pa.array(list(counts.values()), pa.int64())})

            df = ref_ds.map_batches(partial, batch_format="pyarrow") \
                .groupby("tok").aggregate(Sum("pdf", alias_name="df"))
            name = f"idf-{col}-{analyzer}.parquet"
            tbl = pa.concat_tables(
                list(df.iter_batches(batch_size=65536,
                                     batch_format="pyarrow"))
                or [pa.table({"tok": pa.array([], pa.int64()),
                              "df": pa.array([], pa.int64())})])
            pq.write_table(tbl, os.path.join(out_dir, name))
            stats_meta[f"{col}.{analyzer}"] = name

    manifest = {
        "n_docs": n_docs,
        "id_col": id_col,
        "columns_to_index": columns_to_index,
        "stats": stats_meta,
        "fingerprint": fingerprint_of([sorted(columns_to_index.items()),
                                       n_docs]),
    }
    with open(os.path.join(out_dir, "_index.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def load_idf(index_dir: str, col: str, analyzer: str,
             min_df: int = 2) -> dict:
    """IDF lookup table for one (col, analyzer) — same shape the scorer
    actors broadcast ({'keys','vals','default'})."""
    with open(os.path.join(index_dir, "_index.json")) as f:
        manifest = json.load(f)
    name = manifest["stats"][f"{col}.{analyzer}"]
    t = pq.read_table(os.path.join(index_dir, name))
    n = manifest["n_docs"]
    keys = np.asarray(t["tok"].to_pylist(), dtype=np.int64)
    dfs = np.asarray(t["df"].to_pylist(), dtype=np.float64)
    keep = dfs >= min_df
    keys, dfs = keys[keep], dfs[keep]
    order = np.argsort(keys)
    return {"keys": keys[order],
            "vals": np.log((n + 1.0) / (dfs[order] + 1.0)) + 1.0,
            "default": math.log((n + 1.0) / 2.0) + 1.0,
            "n_docs": n}


def search(index_dir: str, query: str, col: str, analyzer: str = "standard",
           k: int = 10):
    """J8 keyword lookup (reference custom-search,
    ``es_labeller.py:2428-2506``): tf·idf cosine of the query against
    the indexed column, top-k rows. Runs as a Ray pipeline over the doc
    store (broadcast query, per-batch top-k, small final reduce)."""
    import ray
    import ray.data as rd

    idf = load_idf(index_dir, col, analyzer)
    tokenize = ANALYZERS[analyzer]
    q_hashes = [crc_hash64(t) & ((1 << 63) - 1) for t in tokenize(query)]
    if not q_hashes:
        return rd.from_items([])
    q_ref = ray.put({"idf": idf, "q": q_hashes})

    class Score:
        def __init__(self, ref):
            got = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            self.idf = got["idf"]
            uniq, counts = np.unique(np.asarray(got["q"], dtype=np.int64),
                                     return_counts=True)
            pos = np.searchsorted(self.idf["keys"], uniq).clip(
                max=max(0, self.idf["keys"].size - 1))
            if self.idf["keys"].size:
                hit = self.idf["keys"][pos] == uniq
                w = counts * np.where(hit, self.idf["vals"][pos],
                                      self.idf["default"])
            else:
                w = counts * self.idf["default"]
            self.qk = uniq
            self.qw = w
            self.qn = float(np.sqrt((w * w).sum()))

        def __call__(self, batch: pa.Table) -> pa.Table:
            scores = []
            for s in batch[col].to_pylist():
                toks = tokenize(s or "")
                if not toks:
                    scores.append(0.0)
                    continue
                uniq, counts = np.unique(np.asarray(
                    [crc_hash64(t) & ((1 << 63) - 1) for t in toks],
                    dtype=np.int64), return_counts=True)
                pos = np.searchsorted(self.idf["keys"], uniq).clip(
                    max=max(0, self.idf["keys"].size - 1))
                if self.idf["keys"].size:
                    hit = self.idf["keys"][pos] == uniq
                    w = counts * np.where(hit, self.idf["vals"][pos],
                                          self.idf["default"])
                else:
                    w = counts * self.idf["default"]
                _, qi, di = np.intersect1d(self.qk, uniq,
                                           assume_unique=True,
                                           return_indices=True)
                norm = self.qn * float(np.sqrt((w * w).sum()))
                scores.append(float(self.qw[qi] @ w[di]) / norm
                              if qi.size and norm > 0 else 0.0)
            out = batch.append_column("__search_score",
                                      pa.array(scores, pa.float64()))
            import pyarrow.compute as pc

            return out.filter(pc.greater(out["__search_score"], 0.0))

        # noqa: actor-pool stage; broadcast read once in __init__

    docs = rd.read_parquet(os.path.join(index_dir, "docs"))
    scored = docs.map_batches(Score, fn_constructor_kwargs={"ref": q_ref},
                              batch_format="pyarrow", concurrency=(1, 4))
    return scored.sort("__search_score", descending=True).limit(k)
