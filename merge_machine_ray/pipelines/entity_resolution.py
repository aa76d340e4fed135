"""Flagship pipeline: pages → extract/normalize → LSH blocking →
pairwise scoring → transitive clustering (SURVEY.md §7.1).

The end-to-end Ray-Data-native re-expression of the reference's
index + learn + link lifecycle (SURVEY.md §3) with entity-cluster output
per the north rule. Every stage is a Dataset transform; shuffles are the
explicit groupbys in blocking, pair dedup, the feature joins and
clustering; nothing materializes the full corpus on the driver.
"""

from __future__ import annotations

import os

import pyarrow as pa

from merge_machine_ray.stages.blocking import candidate_pairs
from merge_machine_ray.stages.clustering import (attach_assignments,
                                                 connected_components)
from merge_machine_ray.stages.idf import build_idf_table
from merge_machine_ray.stages.normalize_stage import featurize
from merge_machine_ray.stages.scoring import score_pairs
from merge_machine_ray.state.params import MatchParams


# Object-store-comfort ceiling for keeping the reusable features
# dataset materialized in Ray's object store. Above it (INPUT-size
# estimate — features are strictly smaller: html is dropped, text
# becomes int hashes), the pipeline checkpoints features to partitioned
# Parquet and streams them back per consumer instead — the same spill
# contract as pipelines/resumable.py, without pinning a corpus-sized
# dataset across three downstream stages (r3 VERDICT #9).
FEATURES_MATERIALIZE_LIMIT = int(os.environ.get(
    "MM_RAY_FEATURES_MATERIALIZE_LIMIT", 64 << 30))


def _reusable_features(ds_in, features, spill_dir: str | None = None):
    """features consumed by IDF + blocking + output: materialize when
    comfortably in-store, else spill to Parquet and read back."""
    try:
        in_bytes = ds_in.size_bytes() or 0
    except Exception:
        in_bytes = 0
    if in_bytes <= FEATURES_MATERIALIZE_LIMIT:
        return features.materialize()
    import tempfile

    import ray.data as rd

    out = spill_dir or tempfile.mkdtemp(prefix="mm_ray_features_")
    features.write_parquet(out)
    return rd.read_parquet(out)


def score_candidate_pairs(ds, params: MatchParams | dict | str | None = None,
                          id_col: str = "url", text_col: str = "text",
                          concurrency=None, num_partitions: int = 32,
                          pair_filter=None):
    """pages/documents Dataset → scored candidate-pair Dataset.

    Returns (scored_pairs_ds, features_ds). ``scored`` has per-field
    similarities + weighted score + is_match. The candidate pairs carry
    both sides' compact features out of the band shuffle, so no join is
    needed before scoring.
    """
    import ray

    p = MatchParams.from_any(params)
    # Size the block count to the session: too few blocks caps every
    # downstream stage's parallelism at the input file count; too many
    # drowns small sessions in per-task overhead.
    cpus = int(ray.cluster_resources().get("CPU", 4))
    n_rows = ds.count()
    target_blocks = int(min(max(8, cpus * 4), max(8, n_rows // 2000)))
    # File-backed reads auto-split into enough blocks (ReadParquet →
    # SplitBlocks targets ~max_block_size), so the explicit repartition
    # would be a pure extra AllToAll over the html payload (measured
    # 2.9 s of a 10 s run at 139k docs). Only in-memory datasets
    # (from_arrow/from_items — single block, no auto-split) need it.
    try:
        file_backed = bool(ds.input_files())
    except Exception:
        file_backed = False
    if not file_backed:
        ds = ds.repartition(target_blocks)
    features = featurize(ds, analyzer=p.analyzer, id_col=id_col,
                         text_col=text_col)
    features = _reusable_features(ds, features)  # IDF + blocking + output
    idf = build_idf_table(features)
    idf_ref = ray.put(idf)
    # pair_filter prunes the ID-ONLY pair set inside candidate_pairs,
    # before the feature-attach joins AND the scoring actor pool (used
    # by resolve_entities_incremental to drop old-old pairs)
    pairs = candidate_pairs(
        features, num_perm=p.num_perm, num_bands=p.num_bands,
        shingle_width=p.shingle_width, block_cap=p.block_cap,
        include_host=(id_col == "url"), pair_id_filter=pair_filter)
    scored = score_pairs(pairs, idf_ref=idf_ref, params=p,
                         concurrency=concurrency)
    return scored, features


def _empty_assignment():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "url": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.int64()),
        "cluster_id": pa.array([], pa.int64())}))


def _finish_clustering(scored, features, cc_mode: str,
                       extra_edges=None):
    """Shared ER tail: match edges (+ optional extra edges) →
    connected components → singleton fill over the feature rows.
    Returns None when the input was empty (caller emits the empty
    assignment).

    The edge list is materialized once: clustering consumes it
    repeatedly and must not re-run the scoring actor pool per pass —
    with few CPUs, piled-up actor pools from repeated executions can
    starve each other."""
    schema = features.schema()
    if schema is None or features.count() == 0:  # empty input
        return None
    edges = scored.filter(expr="is_match").select_columns(["a", "b"])
    if extra_edges is not None:
        edges = edges.union(extra_edges)
    edges = edges.materialize()
    assign = connected_components(edges, mode=cc_mode)
    keep = ["url", "doc_id"] if "url" in schema.names else ["doc_id"]
    docs = features.select_columns(keep)
    # Singleton fill / re-duplication join: stages.clustering.attach_assignments
    # (size-aware broadcast searchsorted probe vs bucketed left hash join).
    return attach_assignments(docs, assign)


def resolve_entities(ds, params=None, id_col: str = "url",
                     text_col: str = "text", concurrency=None,
                     num_partitions: int = 32, cc_mode: str = "auto"):
    """Full ER: returns Dataset[(url?, doc_id, cluster_id)] covering every
    input row (singletons get cluster_id = own doc_id)."""
    scored, features = score_candidate_pairs(
        ds, params, id_col=id_col, text_col=text_col,
        concurrency=concurrency, num_partitions=num_partitions)
    out = _finish_clustering(scored, features, cc_mode)
    return _empty_assignment() if out is None else out


def resolve_entities_incremental(old_ds, new_ds, prev_assign,
                                 params=None, id_col: str = "url",
                                 text_col: str = "text",
                                 concurrency=None, cc_mode: str = "auto"):
    """Incremental ER for a crawl increment: cluster ``new_ds`` into an
    ALREADY-CLUSTERED corpus without rescoring a single old-old pair.

    How: the union corpus goes through the normal featurize → banding,
    but candidate pairs where BOTH sides are old are pruned before the
    scoring actor pool (the increment's id set broadcasts once via
    ``ray.put``; membership is one searchsorted probe per batch). The
    previous assignment enters connected components as STAR edges
    (doc → its cluster label), which preserve old connectivity exactly
    — so the output equals a full recompute whenever the old-old match
    decisions are stable under the increment (they were decided under
    the old corpus's IDF table; a full recompute re-decides them under
    the union's — the standard freeze semantics of incremental dedup).
    Labels stay min-member-id in both, so stable decisions give
    byte-identical clusters (tested).

    Scale shape: scoring work is O(pairs touching the increment), not
    O(corpus pairs); the increment id set is increment-sized by
    definition; everything else streams exactly like resolve_entities.
    """
    import numpy as np
    import ray

    def to_ids(b: pa.Table) -> pa.Table:
        from merge_machine_ray.functions.hashing import stable_hash64
        from merge_machine_ray.stages.normalize_stage import _to_i64

        col = b[id_col]
        if id_col == "url":
            ids = np.array(
                [_to_i64(stable_hash64(u)) for u in col.to_pylist()],
                dtype=np.int64)
        else:
            ids = col.cast(pa.int64()) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"nid": pa.array(ids)})

    # id hashing runs distributed (one map per increment batch); only
    # the increment-sized id column folds on the driver
    parts = [b["nid"].to_numpy(zero_copy_only=False)
             for b in new_ds.select_columns([id_col])
             .map_batches(to_ids, batch_format="pyarrow")
             .iter_batches(batch_size=65536, batch_format="pyarrow")]
    new_ids = (np.unique(np.concatenate(parts)) if parts
               else np.empty(0, dtype=np.int64))
    new_ref = ray.put(new_ids)

    def touches_new(t: pa.Table) -> pa.Table:
        ids = ray.get(new_ref)
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)

        def member(x):
            pos = np.searchsorted(ids, x)
            pos = np.minimum(pos, max(len(ids) - 1, 0))
            return (ids[pos] == x) if len(ids) else \
                np.zeros(len(x), dtype=bool)

        return t.filter(pa.array(member(a) | member(b)))

    union = old_ds.union(new_ds)
    scored, features = score_candidate_pairs(
        union, params, id_col=id_col, text_col=text_col,
        concurrency=concurrency, pair_filter=touches_new)
    stars = prev_assign.select_columns(["doc_id", "cluster_id"]) \
        .map_batches(
            lambda t: pa.table({
                "a": t["doc_id"].cast(pa.int64()),
                "b": t["cluster_id"].cast(pa.int64())}),
            batch_format="pyarrow") \
        .filter(expr="a != b")
    out = _finish_clustering(scored, features, cc_mode,
                             extra_edges=stars)
    return _empty_assignment() if out is None else out
