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
                          concurrency=None, num_partitions: int = 32):
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
    pairs = candidate_pairs(
        features, num_perm=p.num_perm, num_bands=p.num_bands,
        shingle_width=p.shingle_width, block_cap=p.block_cap,
        include_host=(id_col == "url"))
    scored = score_pairs(pairs, idf_ref=idf_ref, params=p,
                         concurrency=concurrency)
    return scored, features


def resolve_entities(ds, params=None, id_col: str = "url",
                     text_col: str = "text", concurrency=None,
                     num_partitions: int = 32, cc_mode: str = "auto"):
    """Full ER: returns Dataset[(url?, doc_id, cluster_id)] covering every
    input row (singletons get cluster_id = own doc_id)."""
    import ray

    scored, features = score_candidate_pairs(
        ds, params, id_col=id_col, text_col=text_col,
        concurrency=concurrency, num_partitions=num_partitions)
    # Materialize the (small) edge list once: clustering consumes it
    # repeatedly and must not re-run the scoring actor pool per pass —
    # with few CPUs, piled-up actor pools from repeated executions can
    # starve each other.
    schema = features.schema()
    if schema is None or features.count() == 0:  # empty input
        import ray.data as rd

        return rd.from_arrow(pa.table({
            "url": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "cluster_id": pa.array([], pa.int64())}))
    edges = scored.filter(expr="is_match").select_columns(["a", "b"]).materialize()
    assign = connected_components(edges, mode=cc_mode)
    keep = ["url", "doc_id"] if "url" in schema.names else ["doc_id"]
    docs = features.select_columns(keep)
    # Singleton fill / re-duplication join: stages.clustering.attach_assignments
    # (size-aware broadcast searchsorted probe vs bucketed left hash join).
    return attach_assignments(docs, assign)
