"""Sorted-neighborhood blocking (stages/snm.py): exact pair-set parity
with a brute-force rank reference, boundary-carry correctness at tiny
chunk sizes, and degenerate inputs."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_pairs(keys: list[str], ids: list[int], window: int):
    order = sorted(range(len(ids)), key=lambda i: (keys[i], ids[i]))
    out = set()
    for p in range(len(order)):
        for d in range(1, window):
            if p + d < len(order):
                out.add((ids[order[p]], ids[order[p + d]], d))
    return out


def _make_ds(keys, ids):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "k": pa.array(keys, pa.string())}))


@pytest.mark.parametrize("chunk", [3, 7, 64])
def test_snm_matches_brute_force(ray_session, chunk):
    from merge_machine_ray.stages.snm import sorted_neighborhood_pairs

    rng = np.random.RandomState(7)
    n = 200
    ids = list(range(100, 100 + n))
    # heavy key ties + empty keys: the adversarial sort
    keys = [["alpha", "alpha", "beta", "", "gamma-%d" % (i % 17)][i % 5]
            for i in range(n)]
    rng.shuffle(ids)
    ds = _make_ds(keys, ids)
    got = sorted_neighborhood_pairs(ds, "k", window=4, chunk=chunk,
                                    num_buckets=5).to_pandas()
    got_set = set(map(tuple, got[["id_a", "id_b", "dist"]].to_numpy()))
    assert got_set == _brute_pairs(keys, ids, 4)


def test_snm_window_larger_than_corpus(ray_session):
    from merge_machine_ray.stages.snm import sorted_neighborhood_pairs

    ds = _make_ds(["b", "a", "c"], [1, 2, 3])
    got = sorted_neighborhood_pairs(ds, "k", window=10, chunk=4) \
        .to_pandas()
    # sorted order: a(2), b(1), c(3) → all 3 pairs at their distances
    assert set(map(tuple, got.to_numpy())) == {
        (2, 1, 1), (2, 3, 2), (1, 3, 1)}


def test_snm_empty_and_single(ray_session):
    from merge_machine_ray.stages.snm import sorted_neighborhood_pairs

    assert sorted_neighborhood_pairs(
        _make_ds([], []), "k").to_pandas().empty
    assert sorted_neighborhood_pairs(
        _make_ds(["x"], [9]), "k").to_pandas().empty


def test_snm_multi_pass_counts(ray_session):
    from merge_machine_ray.stages.snm import snm_multi_pass_pairs

    import ray.data as rd

    # k1 sorts 1,2,3,4 ; k2 sorts 1,2,4,3 — window 2 (adjacent only)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "k1": pa.array(["a", "b", "c", "d"]),
        "k2": pa.array(["a", "b", "d", "c"]),
    }))
    got = snm_multi_pass_pairs(ds, ["k1", "k2"], window=2).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    rows = {(r.id_a, r.id_b): (r.n_passes, r.min_dist)
            for r in got.itertuples()}
    # (1,2) in both passes; (2,3) k1 only; (3,4) both (k1 adj, k2 adj
    # reversed → canonicalized); (2,4) k2 only
    assert rows == {(1, 2): (2, 1), (2, 3): (1, 1),
                    (3, 4): (2, 1), (2, 4): (1, 1)}
