"""Kill-and-resume test for the checkpointed flagship pipeline
(BASELINE.md resumability criterion)."""

import glob
import json
import os

import pytest

from merge_machine_ray.fixtures.pages import write_fixture
from merge_machine_ray.state.params import MatchParams


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages"))
    write_fixture(d, n_entities=150, shard_size=50)
    return d


def _partition_sig(rows):
    from collections import defaultdict

    g = defaultdict(set)
    for r in rows:
        g[r["cluster_id"]].add(r["doc_id"])
    return {frozenset(v) for v in g.values()}


def test_resume_skips_completed_and_matches_full_run(
        ray_session, corpus_dir, tmp_path_factory):
    from merge_machine_ray.pipelines.resumable import resolve_entities_resumable

    paths = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    out_root = str(tmp_path_factory.mktemp("ckpt"))
    params = MatchParams()

    out1 = resolve_entities_resumable(paths, out_root, params).take_all()
    sig1 = _partition_sig(out1)

    # per-partition lineage METRICS (north rule): every completed
    # partition entry records rows + wall time
    for stage in ("features", "edges", "output"):
        man = json.load(open(os.path.join(out_root, stage,
                                          "_manifest.json")))
        assert man["completed"], stage
        for pid, entry in man["completed"].items():
            assert entry["rows"] >= 0, (stage, pid)
            assert "elapsed_ms" in entry, (stage, pid)

    # the queryable lineage view must cover every stage's completed
    # partitions with metrics and carry the invalidation fingerprints
    from merge_machine_ray.io.checkpoint import lineage_report

    rep = lineage_report(out_root).to_pandas()
    assert set(rep["stage"]) == {"features", "bands", "edges",
                                 "clusters", "output"}
    assert (rep["rows"] >= 0).all() and (rep["elapsed_ms"] >= 0).all()
    assert (rep["input_fingerprint"].str.len() > 0).all()
    feats = rep[rep.stage == "features"]
    assert len(feats) == len(paths)       # one partition per shard

    # simulate a mid-pipeline kill: wipe the edges stage of one range and
    # the whole output stage; features/bands/clusters stay on disk
    edges_dir = os.path.join(out_root, "edges")
    manifest = json.load(open(os.path.join(edges_dir, "_manifest.json")))
    victim = sorted(manifest["completed"])[0]
    os.unlink(os.path.join(edges_dir, f"part-{victim}.parquet"))
    del manifest["completed"][victim]
    json.dump(manifest, open(os.path.join(edges_dir, "_manifest.json"), "w"))
    import shutil

    shutil.rmtree(os.path.join(out_root, "output"))
    shutil.rmtree(os.path.join(out_root, "clusters"))

    # record feature-stage mtimes — resume must NOT recompute them
    feat_files = glob.glob(os.path.join(out_root, "features", "*.parquet"))
    mtimes = {f: os.path.getmtime(f) for f in feat_files}

    out2 = resolve_entities_resumable(paths, out_root, params).take_all()
    assert _partition_sig(out2) == sig1
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m, f"feature shard recomputed: {f}"


def test_changed_shard_content_invalidates(ray_session, tmp_path_factory):
    """Same path, different bytes → the input fingerprint must change
    and the features stage must recompute (no stale-shard reuse)."""
    import pyarrow.parquet as pq

    from merge_machine_ray.pipelines.resumable import resolve_entities_resumable

    d = str(tmp_path_factory.mktemp("pages_mut"))
    write_fixture(d, n_entities=60, shard_size=30)
    paths = sorted(glob.glob(os.path.join(d, "*.parquet")))
    out_root = str(tmp_path_factory.mktemp("ckpt3"))
    params = MatchParams()
    resolve_entities_resumable(paths, out_root, params).take_all()
    fp1 = json.load(open(os.path.join(out_root, "features",
                                      "_manifest.json")))["input_fingerprint"]

    # rewrite shard 0 in place: drop its last row
    t = pq.read_table(paths[0])
    pq.write_table(t.slice(0, t.num_rows - 1), paths[0])
    os.utime(paths[0])  # ensure mtime moves even on coarse filesystems

    out = resolve_entities_resumable(paths, out_root, params).take_all()
    fp2 = json.load(open(os.path.join(out_root, "features",
                                      "_manifest.json")))["input_fingerprint"]
    assert fp1 != fp2
    want = sum(pq.read_table(p_).num_rows for p_ in paths)
    assert len(out) == want


def test_changed_config_invalidates(ray_session, corpus_dir,
                                    tmp_path_factory):
    from merge_machine_ray.pipelines.resumable import resolve_entities_resumable

    paths = sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))
    out_root = str(tmp_path_factory.mktemp("ckpt2"))
    resolve_entities_resumable(paths, out_root, MatchParams()).take_all()
    # different threshold → config fingerprint changes → stages recompute
    p2 = MatchParams(threshold=0.7)
    out = resolve_entities_resumable(paths, out_root, p2).take_all()
    man = json.load(open(os.path.join(out_root, "edges", "_manifest.json")))
    assert man["config_fingerprint"] != ""
    assert len(out) > 0
