"""Stages [2]-[4]: LSH blocking keys → skew-controlled candidate pairs.

Ray-native replacement of the reference's ES candidate retrieval (the
fuzzy top-k lookup join, SURVEY.md §2.5 J1 / ``merge_machine/helpers.py:205-276``):
documents that share a MinHash-LSH band key become candidates via ONE
explicit ``groupby(band_key)`` shuffle.

Design choices (scale rationale):

* **Light band shuffle** (``attach="join"``): the band-multiplied
  shuffle moves only (band_key, doc_id) ≈ 16 bytes/row; pairs are
  emitted per shared band, deduplicated by one vectorized aggregate over
  the (tiny) id-only pair list, then both sides' compact features
  re-attach via two bucketed hash joins. Total shuffle bytes ≈
  num_bands×16 B + dup_pairs×16 B + 2×features — an order of magnitude
  below carrying features through the sort. Wins when per-doc features
  are wide (long documents); at the bench corpus's feature width the
  three extra barriers cost more than the lighter sort saves, so carry
  is the default.
* **Carry mode** (``attach="carry"``, default): features + band-hash vectors ride
  the band rows; a pair is emitted only from the FIRST band where the
  two signatures agree (shuffle-free exact dedup). Used by the
  checkpointed pipeline, whose bucket-range partitions must be
  independently computable.
* **Skew control** (explicit per the north rule): a band key shared by
  more than ``block_cap`` docs would cost O(n²) pairs; oversized blocks
  emit a **star + chain** pattern — O(n) pairs preserving transitive
  connectivity for clustering while bounding work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from merge_machine_ray.functions.hashing import crc_hash64
from merge_machine_ray.functions.minhash import minhash_signature, token_shingles

_MASK63 = (1 << 63) - 1

_FEATURE_COLS = ("path", "host", "lang", "tok_hashes", "int_hashes")


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
    doc's full band-hash vector; optionally carrying the compact feature
    payload (``carry_features``) for the carry-mode pipeline."""

    def __init__(self, num_perm: int = 128, num_bands: int = 16,
                 shingle_width: int = 3, include_host: bool = True,
                 carry_features: bool = True):
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.shingle_width = shingle_width
        self.include_host = include_host
        self.carry_features = carry_features

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
            "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)[idx]),
        }
        if self.carry_features:
            # carry mode keeps per-row band vectors for the shuffle-free
            # first-agreeing-band dedup
            cols["band_idx"] = pa.array(band_idx)
            cols["band_hashes"] = pa.array(
                [per_doc_bands[i] for i in idx], pa.list_(pa.int64()))
            for c in _FEATURE_COLS:
                if c in batch.column_names:
                    cols[c] = batch[c].take(pa.array(idx))
        return pa.table(cols)


def _emit_pairs_bucket_fn(block_cap: int, feature_cols: tuple[str, ...]):
    """Per-BUCKET pair emitter, fully vectorized: one python call
    handles every band block hashing into the bucket. Blocks are
    contiguous runs after a lexsort; within a block the first-agreeing-
    band check runs as one (n×n×num_bands) numpy comparison; output
    columns are built with Arrow ``take`` over row-index arrays — no
    per-pair python work at all."""

    def emit_pairs(group: pa.Table) -> pa.Table:
        group = group.combine_chunks()
        n_rows = group.num_rows
        idx_a: list[np.ndarray] = []
        idx_b: list[np.ndarray] = []
        if n_rows >= 2:
            keys = group["band_key"].to_numpy(zero_copy_only=False)
            docs = group["doc_id"].to_numpy(zero_copy_only=False)
            first_band_dedup = "band_hashes" in group.column_names
            if first_band_dedup:
                band_idx = group["band_idx"].to_numpy(zero_copy_only=False)
                # list<int64> of length num_bands → (n_rows, nb) matrix
                bh = group["band_hashes"].combine_chunks()
                if isinstance(bh, pa.ChunkedArray):
                    bh = bh.chunk(0)
                nb = len(bh[0])
                band_mat = bh.flatten().to_numpy(zero_copy_only=False) \
                    .reshape(n_rows, nb)

            order = np.lexsort((docs, keys))
            sk = keys[order]
            sd = docs[order]
            bounds = np.flatnonzero(sk[1:] != sk[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [sk.size]))

            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                seg = order[s:e]
                seg_docs = sd[s:e]
                keep = np.concatenate(([True], seg_docs[1:] != seg_docs[:-1]))
                uniq = seg[keep]
                n = uniq.size
                if n < 2:
                    continue
                if n <= block_cap:
                    if first_band_dedup:
                        band = int(band_idx[uniq[0]])
                        B = band_mat[uniq]  # (n, nb)
                        eq = B[:, None, :] == B[None, :, :]
                        first = eq.argmax(axis=2)  # all pairs share THIS
                        # band, so argmax = first agreeing band
                        ii, jj = np.nonzero(np.triu(first == band, k=1))
                    else:
                        # light mode: emit every pair; duplicates across
                        # bands are removed by the downstream dedup
                        ii, jj = np.triu_indices(n, k=1)
                    if ii.size:
                        idx_a.append(uniq[ii])
                        idx_b.append(uniq[jj])
                else:
                    # skewed block: star to the minimum + chain — O(n)
                    # edges, same connected components.
                    idx_a.append(np.full(n - 1, uniq[0]))
                    idx_b.append(uniq[1:])
                    if n > 2:
                        idx_a.append(uniq[1:-1])
                        idx_b.append(uniq[2:])

        if idx_a:
            I = pa.array(np.concatenate(idx_a))
            J = pa.array(np.concatenate(idx_b))
        else:
            I = J = pa.array(np.empty(0, dtype=np.int64))
        arrays: dict[str, pa.Array] = {
            "a": group["doc_id"].take(I) if len(I) else
            pa.array([], pa.int64()),
            "b": group["doc_id"].take(J) if len(J) else
            pa.array([], pa.int64()),
        }
        for c in feature_cols:
            typ = (pa.list_(pa.int32()) if c in ("tok_hashes", "int_hashes")
                   else pa.string())
            if len(I):
                arrays[f"{c}_a"] = group[c].take(I)
                arrays[f"{c}_b"] = group[c].take(J)
            else:
                arrays[f"{c}_a"] = pa.array([], typ)
                arrays[f"{c}_b"] = pa.array([], typ)
        return pa.table(arrays)

    return emit_pairs


#: Above this corpus size, ``attach="auto"`` switches from carry to
#: join: the band shuffle moves num_bands rows per doc, so carrying the
#: feature payload costs num_bands× the bytes of shuffling features once
#: through a hash join — the DRAM/object-store traffic that capped the
#: 8→32 scaling efficiency at 0.45-0.66 in round 1. Below the cutoff the
#: join's three extra groupby barriers dominate and carry wins.
AUTO_JOIN_CUTOFF = 120_000


def candidate_pairs(features_ds, num_perm: int = 128, num_bands: int = 16,
                    shingle_width: int = 3, block_cap: int = 64,
                    include_host: bool = True, num_buckets: int | None = None,
                    attach: str = "auto"):
    """features → candidate pair dataset with both sides' features
    attached (columns a, b, url_a/b, host_a/b, lang_a/b, tok_hashes_a/b).

    Pairs are exact-deduplicated across bands via the first-matching-band
    rule, except pairs from capped skewed blocks which may repeat
    (bounded by num_bands × O(n)).

    ``attach``:
      * ``"join"`` — the band shuffle moves only LIGHT rows
        (band_key, doc_id ≈ 16 B); pairs are deduped by one id-only
        aggregate, then features re-attach to the (much smaller) pair
        set by two bucketed hash joins. Total shuffle bytes ≈
        num_bands×16 B + dup_pairs×16 B + 2×features — an order of
        magnitude below carrying features through the sort.
      * ``"carry"`` — features ride the band rows; no joins. Wins below
        ~100k docs where the join's extra barriers dominate.
      * ``"auto"`` (default) — join above ``AUTO_JOIN_CUTOFF`` rows,
        carry below.
    """
    schema = features_ds.schema()
    if schema is None:  # empty input → no candidates
        import ray.data as rd

        return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64())}))
    present = [c for c in _FEATURE_COLS if c in schema.names]
    n_feat_rows = None
    if attach == "auto" or num_buckets is None:
        n_feat_rows = features_ds.count()
    if attach == "auto":
        attach = "join" if n_feat_rows >= AUTO_JOIN_CUTOFF else "carry"
    carry = attach == "carry"
    bands = features_ds.map_batches(
        BandKeys(num_perm=num_perm, num_bands=num_bands,
                 shingle_width=shingle_width, include_host=include_host,
                 carry_features=carry),
        batch_format="pyarrow",
    )

    # Shuffle by BUCKET (band_key mod B), not by band_key: a groupby on
    # raw band keys pays per-GROUP python overhead for millions of tiny
    # (mostly singleton) blocks. Bucketing bounds the number of python
    # group calls at B while the vectorized per-bucket fn segments blocks
    # with argsort+diff. B scales with corpus size so one bucket's rows
    # (~rows/B × few-hundred bytes) always fit a worker's heap.
    if num_buckets is None:
        n_rows = n_feat_rows * num_bands
        num_buckets = int(min(4096, max(32, n_rows // 20_000)))

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t["band_key"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((keys % num_buckets).astype(np.int32)))

    bucketed = bands.map_batches(add_bucket, batch_format="pyarrow")
    pairs = bucketed.groupby("bucket").map_groups(
        _emit_pairs_bucket_fn(block_cap, tuple(present) if carry else ()),
        batch_format="pyarrow")
    if carry:
        return pairs

    from ray.data.aggregate import Count

    from merge_machine_ray.stages.joins import bucket_hash_join

    # light mode emits a pair once per agreeing band; dedupe the (tiny)
    # id-only pair list with one vectorized aggregate
    pairs = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="__n")) \
        .drop_columns(["__n"])

    # only the scoring features ride the joins — url/norm_text/n_tokens
    # re-attach later from the features dataset if a caller needs them
    feats = features_ds.select_columns(["doc_id"] + list(present))
    join_buckets = num_buckets
    pairs = bucket_hash_join(pairs, feats, "a", "doc_id",
                             num_buckets=join_buckets, right_suffix="_a")
    return bucket_hash_join(pairs, feats, "b", "doc_id",
                            num_buckets=join_buckets, right_suffix="_b")
