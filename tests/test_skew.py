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
