"""Fellegi-Sunter stage (stages/fellegi.py): comparison-vector
emission vs brute force, supervised fs_weights arithmetic, and the
unsupervised EM against an independent per-pair NumPy reference."""

import numpy as np
import pyarrow as pa
import pytest


def _gamma_ds(ray_session_unused, pats, counts):
    """Expand (pattern, count) into a γ-table Dataset."""
    import ray.data as rd

    k = 3
    rows = {f"agree_f{i}": [] for i in range(k)}
    for p, c in zip(pats, counts):
        for i in range(k):
            rows[f"agree_f{i}"].extend([(p >> i) & 1] * c)
    n = len(rows["agree_f0"])
    tbl = pa.table({"id_a": pa.array(np.arange(n, dtype=np.int64)),
                    "id_b": pa.array(np.arange(n, dtype=np.int64) + 10**6),
                    **{c: pa.array(np.array(v, np.int8))
                       for c, v in rows.items()}})
    return rd.from_arrow(tbl)


def _em_reference(gammas, counts, n_iter, init_m, init_u, init_p):
    """Independent per-PAIR EM (expands the histogram), float64."""
    g = np.repeat(gammas, counts, axis=0).astype(float)
    k = g.shape[1]
    m = np.full(k, init_m)
    u = np.full(k, init_u)
    p = init_p
    for _ in range(n_iter):
        lm = (g * np.log(m) + (1 - g) * np.log1p(-m)).sum(1)
        lu = (g * np.log(u) + (1 - g) * np.log1p(-u)).sum(1)
        pm, pu = p * np.exp(lm), (1 - p) * np.exp(lu)
        w = pm / (pm + pu)
        m = np.clip((w[:, None] * g).sum(0) / w.sum(), 1e-9, 1 - 1e-9)
        u = np.clip(((1 - w)[:, None] * g).sum(0) / (1 - w).sum(),
                    1e-9, 1 - 1e-9)
        p = w.mean()
    return m, u, p


def test_fs_em_matches_per_pair_reference(ray_session):
    from merge_machine_ray.stages.fellegi import fs_em

    rng = np.random.RandomState(11)
    pats = np.arange(8)
    counts = rng.randint(1, 50, size=8)
    ds = _gamma_ds(None, pats, counts)
    got = fs_em(ds, ["f0", "f1", "f2"], n_iter=15)
    gammas = ((pats[:, None] >> np.arange(3)[None, :]) & 1)
    m, u, p = _em_reference(gammas, counts, 15, 0.9, 0.1, 0.5)
    np.testing.assert_allclose(got["m"], m, rtol=0, atol=1e-10)
    np.testing.assert_allclose(got["u"], u, rtol=0, atol=1e-10)
    assert abs(got["p"] - p) < 1e-10
    assert got["counts"].sum() == counts.sum()


def test_fs_em_recovers_planted_mixture(ray_session):
    from merge_machine_ray.stages.fellegi import fs_em

    rng = np.random.RandomState(5)
    true_m = np.array([0.95, 0.85, 0.9])
    true_u = np.array([0.05, 0.2, 0.1])
    n_match, n_non = 400, 3600
    g = np.vstack([rng.random((n_match, 3)) < true_m,
                   rng.random((n_non, 3)) < true_u]).astype(np.int64)
    pats = (g * (1 << np.arange(3))).sum(1)
    bc = np.bincount(pats, minlength=8)
    ds = _gamma_ds(None, np.arange(8), bc)
    got = fs_em(ds, ["f0", "f1", "f2"], n_iter=60)
    assert abs(got["p"] - 0.1) < 0.03
    np.testing.assert_allclose(got["m"], true_m, atol=0.06)
    np.testing.assert_allclose(got["u"], true_u, atol=0.06)
    assert (got["weights"] > 0).all()


def test_comparison_vectors_brute_force(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.fellegi import comparison_vectors
    from merge_machine_ray.stages.sketch import _KNUTH, _MOD

    rng = np.random.RandomState(3)
    n = 120
    ids = np.arange(1000, 1000 + n, dtype=np.int64)
    blk = rng.choice(["a", "b", "c", "dd"], n)
    f1 = rng.randint(0, 3, n).astype(np.int64)
    f2 = rng.choice(["x", "y"], n)
    truth = rng.randint(0, 5, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids), "blk": pa.array(blk),
        "f1": pa.array(f1), "f2": pa.array(f2),
        "truth": pa.array(truth)}))
    cap = 16
    got = comparison_vectors(ds, "blk", ["f1", "f2"], truth_col="truth",
                             cap=cap).to_pandas()
    got_set = {(r.id_a, r.id_b, r.agree_f1, r.agree_f2, r.is_match)
               for r in got.itertuples()}

    # brute force: per block, keep first `cap` under (knuth-hash, id)
    want = set()
    for b in np.unique(blk):
        members = ids[blk == b]
        hk = (members.astype(np.uint64) * np.uint64(_KNUTH)
              % np.uint64(_MOD)).astype(np.int64)
        kept = members[np.lexsort((members, hk))][:cap]
        kept.sort()
        pos = {i: int(np.where(ids == i)[0][0]) for i in kept}
        for ii in range(len(kept)):
            for jj in range(ii + 1, len(kept)):
                a, b2 = kept[ii], kept[jj]
                want.add((a, b2,
                          int(f1[pos[a]] == f1[pos[b2]]),
                          int(f2[pos[a]] == f2[pos[b2]]),
                          int(truth[pos[a]] == truth[pos[b2]])))
    assert got_set == want


def test_fs_weights_tiny(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.fellegi import fs_weights

    tbl = pa.table({
        "id_a": pa.array([1, 2, 3, 4], pa.int64()),
        "id_b": pa.array([5, 6, 7, 8], pa.int64()),
        "agree_f": pa.array([1, 0, 1, 1], pa.int8()),
        "is_match": pa.array([1, 1, 0, 0], pa.int8())})
    out = fs_weights(rd.from_arrow(tbl), ["f"]).to_pylist()[0]
    assert out == {"field": "f", "n_match_pairs": 2, "n_unmatch_pairs": 2,
                   "agree_match": 1, "agree_unmatch": 2,
                   "m_micro": 500000, "u_micro": 1000000,
                   "mu_ratio_micro": 500000}
