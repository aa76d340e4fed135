"""End-to-end ER pipeline vs sequential oracle on the tiny fixture
(SURVEY.md §5 plan items 2-3; the F1 ≥ 0.99 gate lives in
test_f1_gate.py on the small corpus)."""

import pyarrow as pa
import pytest

from merge_machine_ray.oracle import sequential as oracle
from merge_machine_ray.state.params import MatchParams


@pytest.fixture(scope="module")
def params():
    return MatchParams()


@pytest.fixture(scope="module")
def pages_ds(ray_session, tiny_pages):
    import ray.data as rd

    return rd.from_arrow(tiny_pages)


def _partition_signature(mapping: dict) -> set[frozenset]:
    from collections import defaultdict

    groups = defaultdict(set)
    for k, v in mapping.items():
        groups[v].add(k)
    return {frozenset(g) for g in groups.values()}


def test_featurize_byte_identity(ray_session, pages_ds, tiny_pages, params):
    """Per-row invariant: normalized extracted text identical to oracle."""
    from merge_machine_ray.stages.normalize_stage import featurize

    feats = featurize(pages_ds, analyzer=params.analyzer, keep_norm_text=True)
    got = {r["url"]: r["norm_text"] for r in feats.take_all()}
    docs = oracle.featurize_rows(tiny_pages, params)
    assert len(got) == len(docs)
    for d in docs:
        assert got[d.url] == d.norm_text


def test_candidate_pairs_match_oracle(ray_session, pages_ds, tiny_pages, params):
    from merge_machine_ray.stages.blocking import candidate_pairs
    from merge_machine_ray.stages.normalize_stage import featurize

    feats = featurize(pages_ds, analyzer=params.analyzer)
    pairs = candidate_pairs(feats, num_perm=params.num_perm,
                            num_bands=params.num_bands,
                            shingle_width=params.shingle_width,
                            block_cap=params.block_cap)
    got = {(r["a"], r["b"]) for r in pairs.take_all()}
    docs = oracle.featurize_rows(tiny_pages, params)
    want = oracle.candidate_pairs_oracle(docs, params)
    assert got == want
    assert len(got) > 0


def test_candidate_pairs_join_mode_parity(ray_session, pages_ds, tiny_pages,
                                          params):
    """attach='join' (the at-scale light-shuffle path) must yield the
    same deduplicated pair id-set as the oracle, with both sides'
    scoring features attached."""
    from merge_machine_ray.stages.blocking import candidate_pairs
    from merge_machine_ray.stages.normalize_stage import featurize

    feats = featurize(pages_ds, analyzer=params.analyzer)
    pairs = candidate_pairs(feats, num_perm=params.num_perm,
                            num_bands=params.num_bands,
                            shingle_width=params.shingle_width,
                            block_cap=params.block_cap, attach="join")
    rows = pairs.take_all()
    got = {(r["a"], r["b"]) for r in rows}
    docs = oracle.featurize_rows(tiny_pages, params)
    want = oracle.candidate_pairs_oracle(docs, params)
    assert got == want
    assert len(got) == len(rows)  # exact dedup — one row per pair
    for c in ("tok_hashes_a", "tok_hashes_b", "host_a", "host_b"):
        assert c in rows[0]


def test_idf_matches_oracle(ray_session, pages_ds, tiny_pages, params):
    import numpy as np

    from merge_machine_ray.stages.idf import build_idf_table
    from merge_machine_ray.stages.normalize_stage import featurize

    feats = featurize(pages_ds, analyzer=params.analyzer)
    got = build_idf_table(feats)
    docs = oracle.featurize_rows(tiny_pages, params)
    want = oracle.build_idf(docs)
    assert got["n_docs"] == want["n_docs"]
    np.testing.assert_array_equal(got["keys"], want["keys"])
    np.testing.assert_allclose(got["vals"], want["vals"], rtol=1e-12)
    assert got["default"] == pytest.approx(want["default"])


def test_end_to_end_clusters_match_oracle(ray_session, pages_ds, tiny_pages,
                                          tiny_entities, params):
    from merge_machine_ray.pipelines.entity_resolution import resolve_entities

    out = resolve_entities(pages_ds, params).take_all()
    got = {r["doc_id"]: r["cluster_id"] for r in out}
    want = oracle.resolve_oracle(tiny_pages, params)
    assert len(got) == len(want)
    assert _partition_signature(got) == _partition_signature(want)

    # quality vs planted entities: clusters should largely agree
    url_to_cluster = {r["url"]: r["cluster_id"] for r in out}
    truth = {r["url"]: r["entity_id"] for r in tiny_entities.to_pylist()}
    # pairwise precision/recall over all fixture pairs
    from itertools import combinations

    urls = sorted(truth)
    tp = fp = fn = 0
    for u, v in combinations(urls, 2):
        same_true = truth[u] == truth[v]
        same_pred = url_to_cluster[u] == url_to_cluster[v]
        if same_pred and same_true:
            tp += 1
        elif same_pred:
            fp += 1
        elif same_true:
            fn += 1
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    assert precision > 0.9, (tp, fp, fn)
    assert recall > 0.8, (tp, fp, fn)


def test_distributed_cc_matches_driver(ray_session):
    import random

    import ray.data as rd

    from merge_machine_ray.stages.clustering import connected_components

    rng = random.Random(7)
    edges = []
    # several ring/star components
    for comp in range(10):
        base = comp * 100
        nodes = [base + i for i in range(rng.randint(2, 12))]
        for i in range(len(nodes) - 1):
            a, b = nodes[i], nodes[i + 1]
            if rng.random() < 0.5:
                a, b = b, a
            edges.append({"a": a, "b": b})
    ds = rd.from_items(edges)
    drv = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(ds, mode="driver").take_all()}
    dist = {r["doc_id"]: r["cluster_id"]
            for r in connected_components(ds, mode="distributed").take_all()}
    assert drv == dist
    assert _partition_signature(drv) == _partition_signature(dist)


def test_features_spill_branch_matches_materialized(ray_session, tmp_path,
                                                    monkeypatch):
    """Above FEATURES_MATERIALIZE_LIMIT the flagship checkpoints its
    reusable features to Parquet instead of pinning them in the object
    store; clustering output must be identical either way (r3 #9)."""
    import ray.data as rd

    from merge_machine_ray.fixtures.pages import pages_table
    from merge_machine_ray.pipelines import entity_resolution as ER

    tbl = pages_table(0, 40)
    base = ER.resolve_entities(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    monkeypatch.setattr(ER, "FEATURES_MATERIALIZE_LIMIT", 0)
    spilled = ER.resolve_entities(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert base.equals(spilled)


def test_cli_er_and_link(ray_session, tmp_path):
    """python -m merge_machine_ray: both subcommands run end-to-end on
    fixture parquet (the `ray job submit` entry of the north rule)."""
    import json

    import pyarrow.parquet as pq

    from merge_machine_ray.__main__ import main
    from merge_machine_ray.fixtures.dirty_clean import (
        MATCH_COLS,
        ref_table,
        source_table,
    )
    from merge_machine_ray.fixtures.pages import pages_table

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    pq.write_table(pages_table(0, 30), str(pages_dir / "p0.parquet"))
    out = tmp_path / "clusters"
    rc = main(["er", "--input", str(pages_dir), "--out", str(out)])
    assert rc == 0
    got = pq.read_table(str(out))
    assert got.num_rows > 0 and "cluster_id" in got.column_names

    src_dir = tmp_path / "src"
    ref_dir = tmp_path / "ref"
    src_dir.mkdir()
    ref_dir.mkdir()
    pq.write_table(source_table(200, 100).drop_columns(["_ref_idx"]),
                   str(src_dir / "s.parquet"))
    pq.write_table(ref_table(200), str(ref_dir / "r.parquet"))
    lout = tmp_path / "linked"
    rc = main(["link", "--source", str(src_dir), "--ref", str(ref_dir),
               "--match-cols", json.dumps(MATCH_COLS),
               "--out", str(lout), "--source-id", "id_row",
               "--ref-keep", "numero_uai"])
    assert rc == 0
    lt = pq.read_table(str(lout))
    assert lt.num_rows == 100 and "__IS_MATCH" in lt.column_names


def test_featurize_vectorized_matches_scalar(ray_session):
    """Featurize's standard-analyzer fast path (flat RE2 tokenization +
    distinct-level hashing) == the scalar per-row loop, byte-for-byte."""
    from merge_machine_ray.fixtures.pages import pages_table
    from merge_machine_ray.stages.normalize_stage import Featurize

    b = pages_table(0, 80)
    fv = Featurize()
    fs = Featurize()
    fs.analyzer = "___force_scalar_path"
    out_v = fv(b)
    out_s = fs(b)
    for c in ("tok_hashes", "int_hashes", "n_tokens",
              "doc_id", "host", "path"):
        assert out_v[c].to_pylist() == out_s[c].to_pylist(), c


def test_incremental_er_matches_full_recompute(ray_session,
                                               tmp_path_factory):
    """Incremental ER (old clustered corpus + crawl increment, old-old
    pairs pruned, prev assignment as star edges) must reproduce the
    full recompute byte-for-byte on the fixture: same labels for every
    doc, old AND new."""
    import glob
    import os

    import ray.data as rd

    from merge_machine_ray.fixtures.pages import write_fixture
    from merge_machine_ray.pipelines.entity_resolution import (
        resolve_entities, resolve_entities_incremental)

    d = str(tmp_path_factory.mktemp("pages_inc"))
    write_fixture(d, n_entities=150, shard_size=50)
    paths = sorted(glob.glob(os.path.join(d, "*.parquet")))
    assert len(paths) >= 3
    old_paths, new_paths = paths[:-1], paths[-1:]

    full = {r["doc_id"]: r["cluster_id"]
            for r in resolve_entities(rd.read_parquet(paths)).take_all()}
    prev = resolve_entities(rd.read_parquet(old_paths))
    inc = resolve_entities_incremental(
        rd.read_parquet(old_paths), rd.read_parquet(new_paths), prev)
    got = {r["doc_id"]: r["cluster_id"] for r in inc.take_all()}
    assert got == full
