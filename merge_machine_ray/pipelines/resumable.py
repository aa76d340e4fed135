"""Resumable flagship ER: every stage checkpoints partitioned Parquet
with lineage metadata (north-rule requirement). A killed run re-executes
ONLY missing partitions.

Stage layout under ``out_root``::

    features/   one partition per input shard  (shard-parallel Ray tasks)
    bands/      one partition per input shard  (band keys + features)
    edges/      one partition per bucket-range (filter → pairgen → score)
    clusters/   single partition (connected components over all edges)
    output/     one partition per input shard  (cluster id fill)

Lineage: each stage manifest records the input fingerprint (upstream
manifest fingerprint + file list) and the config fingerprint (params).
Changing either invalidates that stage and everything downstream, so a
resume can never mix stale partitions (SURVEY.md §7.4).

Design note: this pipeline deliberately keeps the CARRY-style band
checkpoint (band rows store the scoring features) even though the
streaming pipeline defaults to the lighter attach="join" — here the
bands parquet is the recovery unit, and carrying features makes each
edge bucket-range re-scoreable in isolation without a features
re-attach join per resumed partition. The trade-off buys partition-
local recovery at the cost of a fatter bands checkpoint on disk (not a
shuffle: bands are written shard-parallel, never sorted globally).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from merge_machine_ray.io.checkpoint import StageCheckpoint, fingerprint_of
from merge_machine_ray.state.params import MatchParams


def _shard_id(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def resolve_entities_resumable(input_paths: list[str], out_root: str,
                               params: MatchParams | None = None,
                               edge_ranges: int = 8,
                               num_buckets: int = 256):
    """→ ray.data.Dataset[(url, doc_id, cluster_id)], checkpointed.

    ``input_paths``: parquet shards of the pages table. Deterministic
    given inputs + params; safe to re-invoke after a kill.
    """
    import ray
    import ray.data as rd

    p = MatchParams.from_any(params)
    cfg_fp = fingerprint_of(
        {k: getattr(p, k) for k in ("analyzer", "num_perm", "num_bands",
                                    "shingle_width", "block_cap", "threshold",
                                    "w_text", "w_ints", "w_host", "w_url",
                                    "w_lang")})
    input_paths = sorted(input_paths)
    # fingerprint (path, size, mtime_ns) per shard — a shard whose
    # CONTENTS change under the same path must invalidate the stage, or
    # a resume would silently reuse stale features/bands/edges
    in_fp = fingerprint_of([
        (p_, os.path.getsize(p_), os.stat(p_).st_mtime_ns)
        for p_ in input_paths])

    # ---- stage 1+2: features + band keys per input shard --------------
    # BANDKEY_SEMVER salts the bands config fingerprint with the band-
    # key hash-family version: partitions hashed under an older family
    # must recompute, never mix (the edges fingerprint chains from it).
    from merge_machine_ray.stages.blocking import BANDKEY_SEMVER

    band_cfg_fp = fingerprint_of([cfg_fp, BANDKEY_SEMVER])
    feat_ck = StageCheckpoint(out_root, "features", in_fp, cfg_fp)
    band_ck = StageCheckpoint(out_root, "bands", in_fp, band_cfg_fp)
    shard_ids = [_shard_id(f) for f in input_paths]
    path_of = dict(zip(shard_ids, input_paths))

    pending = sorted(set(feat_ck.pending(shard_ids))
                     | set(band_ck.pending(shard_ids)))
    if pending:
        from merge_machine_ray.stages.blocking import BandKeys
        from merge_machine_ray.stages.normalize_stage import Featurize

        @ray.remote(num_cpus=1)
        def compute(pid: str):
            t0 = time.monotonic()
            table = pq.read_table(path_of[pid])
            feats = Featurize(analyzer=p.analyzer)(table)
            bands = BandKeys(p.num_perm, p.num_bands, p.shingle_width,
                             True)(feats)
            keys = bands["band_key"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            bands = bands.append_column(
                "bucket", pa.array((keys % num_buckets).astype(np.int32)))
            return pid, feats, bands, time.monotonic() - t0

        for pid, feats, bands, secs in ray.get(
                [compute.remote(x) for x in pending]):
            met = {"elapsed_ms": int(secs * 1000)}
            if not feat_ck.is_done(pid):
                feat_ck.write_partition(pid, feats, metrics=met)
            if not band_ck.is_done(pid):
                band_ck.write_partition(pid, bands, metrics=met)

    features = feat_ck.read_all()

    # ---- IDF (cheap, derived from features checkpoint) ----------------
    from merge_machine_ray.stages.idf import build_idf_table

    idf_ref = ray.put(build_idf_table(features))

    # ---- stage 3: edges per bucket-range ------------------------------
    bands_fp = fingerprint_of([in_fp, band_cfg_fp, "bands", num_buckets])
    # EMITTER_SEMVER salts the fingerprint with the pair-EMITTER
    # semantics version (bumped with _emit_pairs_bucket_fn's rules), so
    # a resume never mixes edge partitions computed under old and new
    # emission rules — stale ones recompute instead.
    from merge_machine_ray.stages.blocking import EMITTER_SEMVER

    edge_fp = fingerprint_of([bands_fp, EMITTER_SEMVER])
    edge_ck = StageCheckpoint(out_root, "edges", edge_fp, cfg_fp)
    range_ids = [f"r{k:04d}" for k in range(edge_ranges)]
    from merge_machine_ray.stages.blocking import (
        _FEATURE_COLS,
        _emit_pairs_bucket_fn,
    )
    from merge_machine_ray.stages.scoring import score_pairs

    present = tuple(c for c in _FEATURE_COLS
                    if c in features.schema().names)
    # global over-cap band keys (cheap: band_key+doc_id column read from
    # the bands checkpoint) — deterministic given inputs+params, so
    # every resumed partition sees the same capped/small decisions
    from merge_machine_ray.stages.blocking import overcap_band_keys

    oc_ref = None
    if not all(edge_ck.is_done(r) for r in range_ids):
        oc = overcap_band_keys(band_ck.read_all(), p.block_cap)
        oc_ref = ray.put(oc) if oc.size else None
    def run_range(bands, k: int, rid: str) -> None:
        t0 = time.monotonic()
        lo = k * num_buckets // edge_ranges
        hi = (k + 1) * num_buckets // edge_ranges
        sub = bands.filter(expr=f"bucket >= {lo} and bucket < {hi}")
        pairs = sub.groupby("bucket").map_groups(
            _emit_pairs_bucket_fn(p.block_cap, present, overcap_ref=oc_ref),
            batch_format="pyarrow")
        scored = score_pairs(pairs, idf_ref=idf_ref, params=p)
        edges = scored.filter(expr="is_match").select_columns(["a", "b"])
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_size=65536,
                                    batch_format="pyarrow"))
            or [pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})])
        edge_ck.write_partition(rid, tbl, metrics={
            "elapsed_ms": int((time.monotonic() - t0) * 1000),
            "bucket_lo": lo, "bucket_hi": hi})

    todo = [(k, rid) for k, rid in enumerate(range_ids)
            if not edge_ck.is_done(rid)]
    if todo:
        # SEQUENTIAL by measurement: running ranges as concurrent
        # Dataset executions was tried and reverted — 4 streaming
        # executors contend for operator slots and the driver GIL
        # (A/B at 139k docs: concurrent 79.1 s vs sequential 65.4 s).
        # Each range checkpoints atomically on completion, so
        # kill/resume granularity per bucket-range is preserved.
        bands_all = band_ck.read_all()
        for k, rid in todo:
            run_range(bands_all, k, rid)

    # ---- stage 4: clustering ------------------------------------------
    clus_ck = StageCheckpoint(out_root, "clusters",
                              fingerprint_of([edge_fp, "edges"]), cfg_fp)
    if not clus_ck.is_done("all"):
        from merge_machine_ray.stages.clustering import connected_components

        t0 = time.monotonic()
        assign = connected_components(edge_ck.read_all(), mode="auto")
        tbl = pa.concat_tables(
            list(assign.iter_batches(batch_size=65536,
                                     batch_format="pyarrow"))
            or [pa.table({"doc_id": pa.array([], pa.int64()),
                          "cluster_id": pa.array([], pa.int64())})])
        clus_ck.write_partition("all", tbl, metrics={
            "elapsed_ms": int((time.monotonic() - t0) * 1000)})

    t = pq.read_table(clus_ck.partition_path("all"))
    a_keys = t["doc_id"].to_numpy(zero_copy_only=False)
    a_vals = t["cluster_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(a_keys)
    assign_ref = ray.put((a_keys[order], a_vals[order]))

    # ---- stage 5: output per input shard ------------------------------
    out_ck = StageCheckpoint(out_root, "output",
                             fingerprint_of([in_fp, cfg_fp, "clusters"]),
                             cfg_fp)
    pending_out = out_ck.pending(shard_ids)
    if pending_out:
        @ray.remote(num_cpus=1)
        def fill(pid: str, ref):
            t0 = time.monotonic()  # per-partition compute time, measured
            k, v = ref  # sorted assignment arrays (zero-copy broadcast)
            feats = pq.read_table(feat_ck.partition_path(pid))
            keep = [c for c in ("url", "doc_id") if c in feats.column_names]
            out = feats.select(keep)
            ids = out["doc_id"].to_numpy(zero_copy_only=False)
            cl = ids.copy()
            if k.size:
                pos = np.searchsorted(k, ids).clip(max=k.size - 1)
                hit = k[pos] == ids
                cl[hit] = v[pos[hit]]
            out = out.append_column("cluster_id", pa.array(cl, pa.int64()))
            return pid, out, int((time.monotonic() - t0) * 1000)

        for pid, tbl, ms in ray.get([fill.remote(x, assign_ref)
                                     for x in pending_out]):
            out_ck.write_partition(pid, tbl, metrics={"elapsed_ms": ms})

    return out_ck.read_all()
