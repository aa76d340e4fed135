"""Stages [2]-[4]: LSH blocking keys → skew-controlled candidate pairs.

Ray-native replacement of the reference's ES candidate retrieval (the
fuzzy top-k lookup join, SURVEY.md §2.5 J1 / ``merge_machine/helpers.py:205-276``):
documents that share a MinHash-LSH band key become candidates via ONE
explicit ``groupby(band_key)`` shuffle.

Design choices (scale rationale):

* **Features travel with the band rows** (doc_id, url, host, lang,
  hashed tokens, per-band hashes ≈ a few hundred bytes) — the heavy
  columns (html, raw text) were dropped at featurize time, so the
  band-multiplied shuffle moves ~``num_bands × compact`` bytes instead
  of requiring two extra hash-join shuffles of the corpus afterwards.
* **Exact cross-band pair dedup without a shuffle**: every row carries
  all of its band hashes, so a pair found in band *b* is emitted only if
  *b* is the FIRST band where the two signatures agree. No global
  ``groupby(a, b)`` pass is needed and no pair is scored twice (except
  from capped blocks, see below).
* **Skew control** (explicit per the north rule): a band key shared by
  more than ``block_cap`` docs would cost O(n²) pairs; oversized blocks
  emit a **star + chain** pattern — O(n) pairs preserving transitive
  connectivity for clustering while bounding work. Star/chain pairs skip
  the first-band check (selection differs per band), so they may repeat
  across bands; downstream consumers treat pair rows as a multiset and
  clustering is idempotent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from merge_machine_ray.functions.hashing import crc_hash64
from merge_machine_ray.functions.minhash import minhash_signature, token_shingles

_MASK63 = (1 << 63) - 1

_FEATURE_COLS = ("url", "host", "lang", "tok_hashes", "int_hashes")


def band_hashes_for(tok_hashes: list[int], host: str, num_perm: int,
                    num_bands: int, shingle_width: int) -> list[int]:
    """All band hashes of one document (shared with the oracle)."""
    strs = [str(t) for t in tok_hashes]
    if host:
        strs = [host] + strs
    sh = token_shingles(strs, shingle_width)
    sig = minhash_signature(sh, num_perm)
    r = num_perm // num_bands
    return [crc_hash64(bytes([b]) + sig[b * r : (b + 1) * r].tobytes()) & _MASK63
            for b in range(num_bands)]


class BandKeys:
    """map_batches callable: features → one row per (band, doc) with the
    compact feature payload and the doc's full band-hash vector."""

    def __init__(self, num_perm: int = 128, num_bands: int = 16,
                 shingle_width: int = 3, include_host: bool = True):
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.shingle_width = shingle_width
        self.include_host = include_host

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc_ids = batch["doc_id"].to_pylist()
        toks_col = batch["tok_hashes"].to_pylist()
        hosts = batch["host"].to_pylist() if self.include_host else [""] * n

        per_doc_bands = [
            band_hashes_for(toks, host, self.num_perm, self.num_bands,
                            self.shingle_width)
            for toks, host in zip(toks_col, hosts)
        ]
        nb = self.num_bands
        idx = np.repeat(np.arange(n), nb)
        band_idx = np.tile(np.arange(nb, dtype=np.int32), n)
        keys = np.fromiter(
            (bh for bands in per_doc_bands for bh in bands),
            dtype=np.int64, count=n * nb)
        cols = {
            "band_key": pa.array(keys),
            "band_idx": pa.array(band_idx),
            "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)[idx]),
            "band_hashes": pa.array(
                [per_doc_bands[i] for i in idx], pa.list_(pa.int64())),
        }
        for c in _FEATURE_COLS:
            if c in batch.column_names:
                cols[c] = batch[c].take(pa.array(idx))
        return pa.table(cols)


def _emit_pairs_bucket_fn(block_cap: int, feature_cols: tuple[str, ...]):
    """Per-BUCKET pair emitter: one python call handles every band block
    whose key hashes into the bucket (vectorized block segmentation via
    argsort + diff), so per-group python overhead is paid per bucket,
    not per block. Blocks are delimited within the sorted key array."""

    def emit_pairs(group: pa.Table) -> pa.Table:
        out_cols: dict[str, list] = {"a": [], "b": []}
        for c in feature_cols:
            out_cols[f"{c}_a"] = []
            out_cols[f"{c}_b"] = []
        n_rows = group.num_rows
        if n_rows >= 2:
            keys = np.asarray(group["band_key"].to_pylist(), dtype=np.int64)
            docs = np.asarray(group["doc_id"].to_pylist(), dtype=np.int64)
            # sort by (band_key, doc_id): blocks become contiguous runs,
            # docs sorted & dedupable within each run
            order = np.lexsort((docs, keys))
            sk = keys[order]
            sd = docs[order]
            bounds = np.flatnonzero(sk[1:] != sk[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [sk.size]))
            band_idx = group["band_idx"].to_pylist()
            bands_col = group["band_hashes"].to_pylist()
            feats = {c: group[c].to_pylist() for c in feature_cols}

            def emit(gi: int, gj: int) -> None:
                out_cols["a"].append(docs[gi])
                out_cols["b"].append(docs[gj])
                for c in feature_cols:
                    out_cols[f"{c}_a"].append(feats[c][gi])
                    out_cols[f"{c}_b"].append(feats[c][gj])

            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                # dedupe doc ids within the block (sorted run)
                seg = order[s:e]
                seg_docs = sd[s:e]
                keep = np.concatenate(([True], seg_docs[1:] != seg_docs[:-1]))
                uniq = seg[keep]
                n = uniq.size
                if n < 2:
                    continue
                band = band_idx[uniq[0]]
                if n <= block_cap:
                    for x in range(n - 1):
                        bi = bands_col[uniq[x]]
                        for y in range(x + 1, n):
                            bj = bands_col[uniq[y]]
                            # first band where the signatures agree
                            first = next(
                                (t for t, (p, q) in enumerate(zip(bi, bj))
                                 if p == q), band)
                            if first == band:
                                emit(uniq[x], uniq[y])
                else:
                    # skewed block: star to the minimum + chain — O(n)
                    # edges, same connected components.
                    for y in range(1, n):
                        emit(uniq[0], uniq[y])
                        if y + 1 < n:
                            emit(uniq[y], uniq[y + 1])
        arrays: dict[str, pa.Array] = {
            "a": pa.array(out_cols["a"], pa.int64()),
            "b": pa.array(out_cols["b"], pa.int64()),
        }
        for c in feature_cols:
            for suf in ("_a", "_b"):
                typ = (pa.list_(pa.int64()) if c in ("tok_hashes", "int_hashes")
                       else pa.string())
                arrays[f"{c}{suf}"] = pa.array(out_cols[f"{c}{suf}"], typ)
        return pa.table(arrays)

    return emit_pairs


def candidate_pairs(features_ds, num_perm: int = 128, num_bands: int = 16,
                    shingle_width: int = 3, block_cap: int = 64,
                    include_host: bool = True, num_buckets: int | None = None):
    """features → candidate pair dataset with both sides' features
    attached (columns a, b, url_a/b, host_a/b, lang_a/b, tok_hashes_a/b).

    ONE shuffle (groupby band_key). Pairs are exact-deduplicated across
    bands via the first-matching-band rule, except pairs from capped
    skewed blocks which may repeat (bounded by num_bands × O(n))."""
    schema = features_ds.schema()
    if schema is None:  # empty input → no candidates
        import ray.data as rd

        return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64())}))
    present = [c for c in _FEATURE_COLS if c in schema.names]
    bands = features_ds.map_batches(
        BandKeys(num_perm=num_perm, num_bands=num_bands,
                 shingle_width=shingle_width, include_host=include_host),
        batch_format="pyarrow",
    )

    # Shuffle by BUCKET (band_key mod B), not by band_key: a groupby on
    # raw band keys pays per-GROUP python overhead for millions of tiny
    # (mostly singleton) blocks. Bucketing bounds the number of python
    # group calls at B while the vectorized per-bucket fn segments blocks
    # with argsort+diff. B scales with corpus size so one bucket's rows
    # (~rows/B × few-hundred bytes) always fit a worker's heap.
    if num_buckets is None:
        n_rows = features_ds.count() * num_bands
        num_buckets = int(min(4096, max(16, n_rows // 50_000)))

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = np.asarray(t["band_key"].to_pylist(), dtype=np.int64)
        return t.append_column(
            "bucket", pa.array((keys % num_buckets).astype(np.int32)))

    bucketed = bands.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(
        _emit_pairs_bucket_fn(block_cap, tuple(present)),
        batch_format="pyarrow")
