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
from merge_machine_ray.functions.minhash import (
    banded_minhash,
    int_elem_hashes,
    mix64,
    str_elem_hashes,
)

_MASK63 = (1 << 63) - 1

_FEATURE_COLS = ("path", "host", "lang", "tok_hashes", "int_hashes")

# Version of the band-key HASH FAMILY. Bumped round 3: the per-row
# string-shingle + crc scheme became the numeric poly-window minhash of
# functions/minhash.py (same (host, token...) element sequence, ~25x
# less map-side python). Resumable checkpoints fold this into the
# bands/edges fingerprints so partitions hashed under the old family
# recompute instead of silently mixing band keys from two families.
# (Pair-SET semantics changes belong in EMITTER_SEMVER below, NOT here —
# bumping this invalidates band-stage checkpoints whose keys are fine.)
BANDKEY_SEMVER = "bandkeys-v2"


def band_hashes_for(tok_hashes: list[int], host: str, num_perm: int,
                    num_bands: int, shingle_width: int) -> list[int]:
    """All band hashes of one document (the scalar oracle form — calls
    the SAME flat-core helpers as the batched :class:`BandKeys`, so
    pipeline and sequential oracle agree bit-for-bit)."""
    elems = int_elem_hashes(np.asarray(tok_hashes, dtype=np.int64))
    if host:
        elems = np.concatenate(
            [mix64(np.array([crc_hash64(host)], dtype=np.uint64)), elems])
    keys = banded_minhash(elems, np.array([0, elems.size], np.int64),
                          num_perm, num_bands, shingle_width)
    return keys[0].tolist()


class BandKeys:
    """map_batches callable: features → one row per (band, doc) with the
    doc's full band-hash vector; optionally carrying the compact feature
    payload (``carry_features``) for the carry-mode pipeline.

    Fully vectorized: the batch's token hashes flatten zero-copy from
    the Arrow list column, hosts hash once per distinct value, and the
    whole batch minhashes in a handful of numpy passes
    (functions/minhash.py flat core)."""

    def __init__(self, num_perm: int = 128, num_bands: int = 16,
                 shingle_width: int = 3, include_host: bool = True,
                 carry_features: bool = True):
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.shingle_width = shingle_width
        self.include_host = include_host
        self.carry_features = carry_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        tc = batch["tok_hashes"]
        if isinstance(tc, pa.ChunkedArray):
            tc = tc.combine_chunks()
        off = tc.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat_tok = int_elem_hashes(
            tc.values.to_numpy(zero_copy_only=False)[off[0]:off[-1]]
            if n else np.empty(0, np.int64))
        m = np.diff(off) if n else np.empty(0, np.int64)

        if self.include_host and n:
            hc = batch["host"]
            if isinstance(hc, pa.ChunkedArray):
                hc = hc.combine_chunks()
            hc = pc.fill_null(hc, "")
            host_e = str_elem_hashes(hc)
            has_host = pc.not_equal(hc, "").to_numpy(zero_copy_only=False)
        else:
            host_e = np.empty(n, np.uint64)
            has_host = np.zeros(n, bool)

        # interleave: per doc [host_hash?, token_hashes...] — flat order
        # is preserved, so tokens land in the non-host slots directly
        lengths = m + has_host
        noff = np.concatenate(([0], np.cumsum(lengths, dtype=np.int64)))
        elems = np.empty(int(noff[-1]), np.uint64)
        host_slots = np.zeros(elems.size, bool)
        if has_host.any():
            hp = noff[:-1][has_host]
            host_slots[hp] = True
            elems[hp] = host_e[has_host]
        elems[~host_slots] = flat_tok

        keys2d = banded_minhash(elems, noff, self.num_perm, self.num_bands,
                                self.shingle_width)
        nb = self.num_bands
        idx = np.repeat(np.arange(n), nb)
        band_idx = np.tile(np.arange(nb, dtype=np.int32), n)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False) if n \
            else np.empty(0, np.int64)
        cols = {
            "band_key": pa.array(keys2d.ravel()),
            "doc_id": pa.array(doc_ids[idx].astype(np.int64)),
        }
        if self.carry_features:
            # carry mode keeps per-row band vectors for the shuffle-free
            # first-agreeing-band dedup
            cols["band_idx"] = pa.array(band_idx)
            cols["band_hashes"] = pa.ListArray.from_arrays(
                pa.array(np.arange(n * nb + 1, dtype=np.int64) * nb,
                         pa.int32()),
                pa.array(np.repeat(keys2d, nb, axis=0).ravel()))
            for c in _FEATURE_COLS:
                if c in batch.column_names:
                    cols[c] = batch[c].take(pa.array(idx))
        return pa.table(cols)


# Semantics version of the pair emitter below. BUMP whenever the set of
# pairs it emits changes (not mere speedups): resumable checkpoints fold
# this into the edges-stage fingerprint so partitions computed under old
# rules recompute instead of silently mixing with new ones.
# v2 = global over-cap set + capped-block star/chain first-band dedup.
# v3 = capped-block star/chain edges emit in EVERY agreeing capped band
#      (bounded duplicates, deduped downstream) instead of only the
#      first agreeing band — the vectorized emitter's pair set.
EMITTER_SEMVER = "edges-v3"


def _emit_pairs_bucket_fn(block_cap: int, feature_cols: tuple[str, ...],
                          overcap_ref=None):
    """Per-BUCKET pair emitter, fully vectorized: one python call
    handles every band block hashing into the bucket. Blocks are
    contiguous runs after a lexsort; within a block the first-agreeing-
    band check runs as one (n×n×num_bands) numpy comparison; output
    columns are built with Arrow ``take`` over row-index arrays — no
    per-pair python work at all.

    ``overcap_ref`` (carry mode): sorted int64 array (or ObjectRef) of
    the band keys whose GLOBAL block size exceeds ``block_cap``. Bands
    in this set are treated as non-agreeing when computing a pair's
    first agreeing band — without it, a pair whose earlier shared band
    was capped (star/chain only) is silently suppressed in every later
    small block, dropping candidate edges under skew."""

    def emit_pairs(group: pa.Table) -> pa.Table:
        import ray

        overcap = (ray.get(overcap_ref)
                   if isinstance(overcap_ref, ray.ObjectRef) else overcap_ref)
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
                if overcap is not None and overcap.size:
                    pos = np.searchsorted(overcap, band_mat).clip(
                        max=overcap.size - 1)
                    oc_mat = overcap[pos] == band_mat  # (n_rows, nb)
                else:
                    oc_mat = None

            order = np.lexsort((docs, keys))
            sk = keys[order]
            sd = docs[order]
            bounds = np.flatnonzero(sk[1:] != sk[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [sk.size]))

            if not first_band_dedup:
                # LIGHT (join-mode) path, zero python per segment: a
                # bucket sees ~1M mostly-singleton band segments at
                # 139k docs and the generic loop below costs ~3 µs per
                # segment just to skip them (measured 11.6 s CPU total).
                # Adjacent-dup removal, per-segment all-pairs expansion
                # (repeat/offset arithmetic) and the capped star/chain
                # all run as whole-bucket numpy passes.
                dup = np.concatenate(
                    ([False], (sk[1:] == sk[:-1]) & (sd[1:] == sd[:-1])))
                o2 = order[~dup]
                sk2 = sk[~dup]
                b2 = np.flatnonzero(sk2[1:] != sk2[:-1]) + 1
                st = np.concatenate(([0], b2))
                en = np.concatenate((b2, [sk2.size]))
                sizes = en - st
                small = (sizes >= 2) & (sizes <= block_cap)
                if small.any():
                    ss, ee = st[small], en[small]
                    seg_len = ee - ss
                    tot = int(seg_len.sum())
                    # absolute row position of every segment member
                    pos = (np.arange(tot)
                           - np.repeat(np.concatenate(
                               ([0], np.cumsum(seg_len)))[:-1], seg_len)
                           + np.repeat(ss, seg_len))
                    rep = np.repeat(ee, seg_len) - pos - 1  # later partners
                    A = np.repeat(pos, rep)
                    npairs = int(rep.sum())
                    if npairs:
                        within = (np.arange(npairs)
                                  - np.repeat(np.concatenate(
                                      ([0], np.cumsum(rep)))[:-1], rep))
                        idx_a.append(o2[A])
                        idx_b.append(o2[A + 1 + within])
                for s, e in zip(st[sizes > block_cap], en[sizes > block_cap]):
                    # skewed block: star to the minimum + chain — O(n)
                    # edges, same connected components
                    uniq = o2[s:e]
                    n = uniq.size
                    x = [np.full(n - 1, uniq[0])]
                    y = [uniq[1:]]
                    if n > 2:
                        x.append(uniq[1:-1])
                        y.append(uniq[2:])
                    idx_a.append(np.concatenate(x))
                    idx_b.append(np.concatenate(y))
                starts = ends = np.empty(0, np.int64)  # loop below skipped

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
                capped = n > block_cap
                if first_band_dedup and oc_mat is not None and not capped:
                    # global count is authoritative: this bucket may see
                    # only part of a block that is capped elsewhere
                    capped = bool(oc_mat[uniq[0], int(band_idx[uniq[0]])])
                if not capped:
                    if first_band_dedup:
                        band = int(band_idx[uniq[0]])
                        B = band_mat[uniq]  # (n, nb)
                        eq = B[:, None, :] == B[None, :, :]
                        if oc_mat is not None:
                            # over-cap bands don't count as agreements
                            eq &= ~oc_mat[uniq][:, None, :]
                        first = eq.argmax(axis=2)  # this band always
                        # agrees (and is not capped), so argmax = first
                        # agreeing non-capped band
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
                    x = [np.full(n - 1, uniq[0])]
                    y = [uniq[1:]]
                    if n > 2:
                        x.append(uniq[1:-1])
                        y.append(uniq[2:])
                    ex, ey = np.concatenate(x), np.concatenate(y)
                    if first_band_dedup and oc_mat is not None:
                        # A star/chain pair that also agrees in a
                        # non-capped band is emitted THERE (over-cap
                        # bands don't count as agreements in the
                        # first-band rule). Among capped bands the edge
                        # emits in EVERY agreeing block: "first agreeing
                        # capped band" would drop the pair entirely when
                        # that block's star/chain pattern doesn't
                        # include it (different membership ⇒ different
                        # adjacency). Carry mode may therefore emit a
                        # pair once per capped block it is a star/chain
                        # edge of (≤ num_bands, typically 1) — consumers
                        # needing one-row-per-pair dedupe downstream;
                        # CC and argmax selection are insensitive.
                        agree = band_mat[ex] == band_mat[ey]
                        keep_e = ~(agree & ~oc_mat[ex]).any(axis=1)
                        ex, ey = ex[keep_e], ey[keep_e]
                    if ex.size:
                        idx_a.append(ex)
                        idx_b.append(ey)

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
#: 8→32 scaling efficiency at 0.45-0.66 in round 1. Once the pair dedup
#: became a bucketed vectorized lexsort and the feature attach a
#: zero-copy broadcast probe, the light path won at EVERY measured size
#: (32 CPUs: 5.3 vs 11.9 s at 3.5k docs, 5.4 vs 10.2 s at 17k, 11.1 vs
#: 17.8 s at 139k), so auto now always picks join; ``attach="carry"``
#: stays selectable for parity testing.
AUTO_JOIN_CUTOFF = 0


def overcap_band_keys(bands_ds, block_cap: int) -> np.ndarray:
    """Sorted array of band keys whose GLOBAL block exceeds
    ``block_cap`` distinct docs — the authority for the emitter's
    capped-vs-small decision (partial per-batch distinct counts → one
    small groupby; over-cap keys number ≤ total_rows/block_cap)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        k = t["band_key"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        kd = np.unique(np.stack([k, d], axis=1), axis=0)
        uk, cnt = np.unique(kd[:, 0], return_counts=True)
        return pa.table({"band_key": pa.array(uk),
                         "pc": pa.array(cnt.astype(np.int64))})

    counts = (bands_ds.select_columns(["band_key", "doc_id"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("band_key").aggregate(Sum("pc", alias_name="n")))
    out = []
    for b in counts.iter_batches(batch_size=65536, batch_format="pyarrow"):
        keys = b["band_key"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False)
        out.append(keys[n > block_cap])
    return np.sort(np.concatenate(out)) if out else np.empty(0, np.int64)


def candidate_pairs(features_ds, num_perm: int = 128, num_bands: int = 16,
                    shingle_width: int = 3, block_cap: int = 64,
                    include_host: bool = True, num_buckets: int | None = None,
                    attach: str = "auto", pair_id_filter=None):
    """features → candidate pair dataset with both sides' features
    attached (columns a, b, url_a/b, host_a/b, lang_a/b, tok_hashes_a/b).

    Pairs are exact-deduplicated across bands by the first-matching-band
    rule for normal blocks. For capped skewed blocks the star/chain
    edges emit in EVERY agreeing capped block (skipped when a non-capped
    band already covers the pair), so carry mode may emit a pair more
    than once under skew — join mode dedups by aggregate anyway, and CC
    / argmax consumers are insensitive to duplicates.

    ``attach``:
      * ``"join"`` — the band shuffle moves only LIGHT rows
        (band_key, doc_id ≈ 16 B); pairs are deduped by one id-only
        aggregate, then features re-attach to the (much smaller) pair
        set by two bucketed hash joins. Total shuffle bytes ≈
        num_bands×16 B + dup_pairs×16 B + 2×features — an order of
        magnitude below carrying features through the sort.
      * ``"carry"`` — features ride the band rows; no joins. Kept as a
        parity/reference path; measured slower than join at every size
        once pair dedup went vectorized (see ``AUTO_JOIN_CUTOFF`` note).
      * ``"auto"`` (default) — join above ``AUTO_JOIN_CUTOFF`` rows
        (currently 0: always join), carry below.
    """
    schema = features_ds.schema()
    if schema is None:  # empty input → no candidates
        import ray.data as rd

        return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64())}))
    present = [c for c in _FEATURE_COLS if c in schema.names]
    n_feat_rows = None
    if num_buckets is None or (attach == "auto" and AUTO_JOIN_CUTOFF > 0):
        n_feat_rows = features_ds.count()
    if attach == "auto":
        attach = ("join" if AUTO_JOIN_CUTOFF == 0
                  or n_feat_rows >= AUTO_JOIN_CUTOFF else "carry")
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
    if carry:
        import ray

        # First-agreeing-band dedup needs the GLOBAL set of capped band
        # keys, or a pair whose earlier shared band is capped would be
        # dropped from every later small block (star/chain covers the
        # capped block itself). Carry mode runs below AUTO_JOIN_CUTOFF,
        # so materializing the band rows once is bounded.
        bucketed = bucketed.materialize()
        oc = overcap_band_keys(bucketed, block_cap)
        oc_ref = ray.put(oc) if oc.size else None
        out = bucketed.groupby("bucket").map_groups(
            _emit_pairs_bucket_fn(block_cap, tuple(present),
                                  overcap_ref=oc_ref),
            batch_format="pyarrow")
        if pair_id_filter is not None:
            out = out.map_batches(pair_id_filter, batch_format="pyarrow")
        return out
    pairs = bucketed.groupby("bucket").map_groups(
        _emit_pairs_bucket_fn(block_cap, ()), batch_format="pyarrow")

    # light mode emits a pair once per agreeing band; dedupe by pair-
    # hash BUCKET + one vectorized lexsort/diff per bucket. (A
    # groupby(a,b).aggregate pays per-GROUP overhead on millions of
    # 1-16-row groups: measured 46 s vs 2.8 s at 3.1M pairs.)
    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return t.append_column("pbkt", pa.array(
            ((a * 1000003 + b) % num_buckets).astype(np.int32)))

    def uniq_pairs(g: pa.Table) -> pa.Table:
        a = g["a"].to_numpy(zero_copy_only=False)
        b = g["b"].to_numpy(zero_copy_only=False)
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        keep = np.concatenate(
            ([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep])})

    pairs = pairs.map_batches(pair_bucket, batch_format="pyarrow") \
        .groupby("pbkt").map_groups(uniq_pairs, batch_format="pyarrow")
    if pair_id_filter is not None:
        # prune on the ID-ONLY pair set, BEFORE features re-attach —
        # the attach joins then size to the surviving pairs (the
        # incremental-ER path drops every old-old pair here)
        pairs = pairs.map_batches(pair_id_filter, batch_format="pyarrow")

    # only the scoring features re-attach — url/norm_text/n_tokens come
    # back from the features dataset if a caller needs them
    feats = features_ds.select_columns(["doc_id"] + list(present))
    return attach_features(pairs, feats, num_buckets=num_buckets)


#: feature tables smaller than this broadcast once via ray.put and
#: attach map-side (zero-copy shared-memory probe per worker); larger
#: tables re-attach through two bucketed hash joins. 100 TB inputs take
#: the join path; the broadcast path keeps small/medium corpora off the
#: two extra all-to-alls (measured: joins 55 s vs probe ~4 s at 1M docs
#: / 260 MB of features).
BROADCAST_FEATURES_LIMIT = int(4e9)


def attach_features(pairs_ds, feats_ds, num_buckets: int = 256,
                    limit: int | None = None):
    """Attach per-doc feature columns to an (a, b) pair list as
    ``<col>_a`` / ``<col>_b`` — broadcast-probe or hash-join, chosen by
    the feature table's actual byte size."""
    import ray

    limit = BROADCAST_FEATURES_LIMIT if limit is None else limit
    feats_mat = feats_ds.materialize()
    size = feats_mat.size_bytes() or 0
    if size > limit:
        from merge_machine_ray.stages.joins import bucket_hash_join

        pairs_ds = bucket_hash_join(pairs_ds, feats_mat, "a", "doc_id",
                                    num_buckets=num_buckets,
                                    right_suffix="_a")
        return bucket_hash_join(pairs_ds, feats_mat, "b", "doc_id",
                                num_buckets=num_buckets, right_suffix="_b")

    tbl = pa.concat_tables(
        feats_mat.iter_batches(batch_size=262144, batch_format="pyarrow"))
    tbl = tbl.sort_by("doc_id").combine_chunks()
    ref = ray.put(tbl)

    def probe(batch: pa.Table) -> pa.Table:
        feats = ray.get(ref)  # zero-copy shared-memory read per worker
        ids = feats["doc_id"].to_numpy(zero_copy_only=False)
        out = {"a": batch["a"], "b": batch["b"]}
        for side in ("a", "b"):
            keys = batch[side].to_numpy(zero_copy_only=False)
            # Every probed id must exist in the (unique-keyed) feature
            # table — a silent nearest-neighbor take would attach the
            # WRONG row's features. Verify the hit, don't assume it.
            pos = np.searchsorted(ids, keys)
            if ids.size:
                pos = pos.clip(max=ids.size - 1)
            if not ids.size or not (ids[pos] == keys).all():
                n_miss = (int((ids[pos] != keys).sum()) if ids.size
                          else keys.size)
                raise KeyError(
                    f"attach_features: {n_miss} pair ids absent from the "
                    "feature table (callers must pass a unique-doc_id "
                    "table covering every pair endpoint)")
            take = pa.array(pos)
            for c in feats.column_names:
                if c != "doc_id":
                    out[f"{c}_{side}"] = feats[c].take(take)
        return pa.table(out)

    return pairs_ds.map_batches(probe, batch_format="pyarrow")
