"""Skew control: a pathological block (hundreds of near-identical docs
sharing every band) must yield O(n) candidate pairs — not O(n²) — while
clustering still unifies the whole component (north-rule requirement)."""

import pyarrow as pa
import pytest

from merge_machine_ray.state.params import MatchParams


N_CLONES = 400


@pytest.fixture(scope="module")
def skewed_ds(ray_session):
    import ray.data as rd

    rows = []
    base = ("entirely identical boilerplate page text repeated across "
            "hundreds of mirror hosts for the skew stress test "
            "identifiant 4242424 code postal 75001")
    for i in range(N_CLONES):
        rows.append({
            "url": f"https://mirror-{i:04d}.example.org/page/4242424-0",
            "warc_ts": 1_577_836_800_000_000 + i,
            "html": f"<html><body><p>{base}</p></body></html>".encode(),
            "text": base,
            "lang": "fr",
        })
    # plus a handful of unrelated docs
    for i in range(20):
        rows.append({
            "url": f"https://other-{i}.example.net/u{i}",
            "warc_ts": 1_577_836_800_000_000 + 10_000 + i,
            "html": f"<html><body><p>unique document number {i} about "
                    f"topic-{i} with nothing shared</p></body></html>".encode(),
            "text": f"unique document number {i} about topic-{i} with "
                    f"nothing shared",
            "lang": "en",
        })
    t = pa.Table.from_pylist(rows)
    return rd.from_arrow(t)


def test_skewed_block_pair_budget(ray_session, skewed_ds):
    from merge_machine_ray.pipelines.entity_resolution import (
        resolve_entities,
        score_candidate_pairs,
    )

    params = MatchParams(block_cap=64)
    scored, _ = score_candidate_pairs(skewed_ds, params)
    n_pairs = scored.count()
    quadratic = N_CLONES * (N_CLONES - 1) // 2  # 79,800
    # star+chain per band: ≤ num_bands × (2n-3) ≈ 12,752 ≪ 79,800
    assert n_pairs < params.num_bands * (2 * N_CLONES), n_pairs
    assert n_pairs < quadratic / 4

    # the capped pairs must still unify the whole clone set
    out = resolve_entities(skewed_ds, params).take_all()
    clusters = {}
    for r in out:
        clusters.setdefault(r["cluster_id"], []).append(r["url"])
    clone_clusters = {cid for cid, urls in clusters.items()
                      if any("mirror-" in u for u in urls)}
    assert len(clone_clusters) == 1, f"clones split: {len(clone_clusters)}"
    assert len(clusters[clone_clusters.pop()]) == N_CLONES


def test_carry_emitter_does_not_drop_pairs_behind_capped_bands():
    """ADVICE r1: a pair whose FIRST shared band is globally capped must
    still be emitted from a later small shared band (the oracle emits
    it; without the overcap set, carry mode silently dropped it)."""
    import numpy as np

    from merge_machine_ray.stages.blocking import _emit_pairs_bucket_fn

    K0, K1 = 111, 222  # band 0 capped globally, band 1 small
    rows = []
    for doc, band_key, band_idx in [(1, K1, 1), (2, K1, 1)]:
        rows.append({"band_key": band_key, "doc_id": doc,
                     "band_idx": band_idx, "band_hashes": [K0, K1]})
    group = pa.Table.from_pylist(rows)

    # without the overcap set: first agreeing band = 0 ≠ 1 → dropped
    out = _emit_pairs_bucket_fn(64, ())(group)
    assert out.num_rows == 0

    # with K0 marked capped: band 0 doesn't count → emitted from band 1
    oc = np.array([K0], dtype=np.int64)
    out = _emit_pairs_bucket_fn(64, (), overcap_ref=oc)(group)
    assert [(r["a"], r["b"]) for r in out.to_pylist()] == [(1, 2)]


def test_carry_emitter_caps_by_global_count():
    """A block that looks small in one bucket but whose key is globally
    over cap must emit star/chain, not all-pairs."""
    import numpy as np

    from merge_machine_ray.stages.blocking import _emit_pairs_bucket_fn

    K = 333
    rows = [{"band_key": K, "doc_id": d, "band_idx": 0,
             "band_hashes": [K, 999 + d]} for d in range(1, 6)]
    group = pa.Table.from_pylist(rows)
    oc = np.array([K], dtype=np.int64)
    out = _emit_pairs_bucket_fn(64, (), overcap_ref=oc)(group)
    got = {(r["a"], r["b"]) for r in out.to_pylist()}
    # star (1-2,1-3,1-4,1-5) + chain (2-3,3-4,4-5): 7 edges, not C(5,2)=10
    assert got == {(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (3, 4), (4, 5)}


def test_candidate_pairs_carry_with_skew_matches_oracle(ray_session):
    """End-to-end carry mode on a corpus engineered so near-dup pairs
    share BOTH a capped band and small bands — pair set must equal the
    oracle's exactly."""
    import ray.data as rd

    from merge_machine_ray.oracle import sequential as oracle
    from merge_machine_ray.stages.blocking import candidate_pairs
    from merge_machine_ray.stages.normalize_stage import featurize

    params = MatchParams(block_cap=8)
    rows = []
    shared = "common boilerplate shared by every page in this corpus"
    for i in range(40):
        # high overlap with the shared block + per-pair unique tail
        text = f"{shared} variant {i // 2} extra tail token{i // 2}"
        rows.append({
            "url": f"https://h{i}.example.org/p",
            "warc_ts": 1_577_836_800_000_000 + i,
            "html": f"<html><body>{text}</body></html>".encode(),
            "text": text, "lang": "fr",
        })
    t = pa.Table.from_pylist(rows)
    feats = featurize(rd.from_arrow(t), analyzer=params.analyzer)
    pairs = candidate_pairs(feats, num_perm=params.num_perm,
                            num_bands=params.num_bands,
                            shingle_width=params.shingle_width,
                            block_cap=params.block_cap, attach="carry")
    got = {(r["a"], r["b"]) for r in pairs.take_all()}
    docs = oracle.featurize_rows(t, params)
    want = oracle.candidate_pairs_oracle(docs, params)
    assert got == want
