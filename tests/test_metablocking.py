"""Meta-blocking (stages/metablocking.py): CBS weights and WEP pruning
against a brute-force reference, including the hot-block skip rule."""

import itertools

import numpy as np
import pyarrow as pa


def _brute(keys, block_cap=64):
    """keys: list of (key, id). Returns (weights dict, kept set)."""
    blocks: dict[int, set[int]] = {}
    for k, i in keys:
        blocks.setdefault(k, set()).add(i)
    w: dict[tuple[int, int], int] = {}
    for members in blocks.values():
        if not (2 <= len(members) <= block_cap):
            continue
        for a, b in itertools.combinations(sorted(members), 2):
            w[(a, b)] = w.get((a, b), 0) + 1
    if not w:
        return w, set()
    total, n = sum(w.values()), len(w)
    kept = {p for p, wt in w.items() if wt * n >= total}
    return w, kept


def _run(ray_session, keys, block_cap=64):
    import ray.data as rd

    from merge_machine_ray.stages.metablocking import (
        cbs_pair_weights,
        wep_prune,
    )

    t = pa.table({"key": pa.array([k for k, _ in keys], pa.int64()),
                  "id": pa.array([i for _, i in keys], pa.int64())})
    edges = cbs_pair_weights(rd.from_arrow(t), block_cap=block_cap,
                             num_buckets=4)
    got_w = {(r["id_a"], r["id_b"]): r["w"] for r in edges.take_all()}
    kept = {(r["id_a"], r["id_b"])
            for r in wep_prune(edges).take_all()}
    return got_w, kept


def test_cbs_weights_and_wep_match_brute(ray_session):
    rng = np.random.RandomState(7)
    keys = [(int(rng.randint(0, 12)), int(rng.randint(0, 30)))
            for _ in range(200)]
    want_w, want_kept = _brute(keys)
    got_w, got_kept = _run(None, keys)
    assert got_w == want_w
    assert got_kept == want_kept


def test_hot_block_skip_and_duplicate_rows(ray_session):
    # block 1: 3 members (one listed twice — counts once); block 2:
    # oversized (> cap) — contributes nothing; block 3: singleton
    keys = ([(1, 10), (1, 11), (1, 12), (1, 10)]
            + [(2, i) for i in range(6)] + [(3, 99)])
    want_w, want_kept = _brute(keys, block_cap=4)
    got_w, got_kept = _run(None, keys, block_cap=4)
    assert got_w == want_w == {(10, 11): 1, (10, 12): 1, (11, 12): 1}
    assert got_kept == want_kept


def test_wep_empty_edges(ray_session):
    got_w, got_kept = _run(None, [(1, 5), (2, 6)])
    assert got_w == {} and got_kept == set()
