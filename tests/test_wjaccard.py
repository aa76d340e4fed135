"""Weighted Jaccard join (stages/wjaccard.py): kernel parity with a
per-row python reference and end-to-end parity with a brute-force
NumPy/dict implementation of the full operator semantics."""

import numpy as np
import pyarrow as pa


def _brute_wj(texts, ids, n_docs, scale=1000, threshold_micro=500_000):
    """ALL-pairs weighted Jaccard with NO candidate rule — the prefix
    filter is COMPLETE for the threshold, so the operator must equal
    this brute force exactly (the fixture stays far below the
    prefix-block skip cap)."""
    import re

    from merge_machine_ray.functions.minhash import token_shingles

    toksets = {i: set(token_shingles(
        re.findall(r"[^\W_]+", (t or "").lower(), re.UNICODE), 3))
        for i, t in zip(ids, texts)}
    df: dict[str, int] = {}
    for s in toksets.values():
        for t in s:
            df[t] = df.get(t, 0) + 1
    w = {t: (n_docs * scale) // d for t, d in df.items()}
    out = {}
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            a, b = min(a, b), max(a, b)
            shared = toksets[a] & toksets[b]
            if not shared:
                continue
            smin = sum(w[t] for t in shared)
            smax = (sum(w[t] for t in toksets[a])
                    + sum(w[t] for t in toksets[b]) - smin)
            micro = (1_000_000 * smin) // smax
            if micro >= threshold_micro:
                out[(a, b)] = micro
    return out


def test_intersect_weight_sums_matches_python():
    from merge_machine_ray.stages.wjaccard import intersect_weight_sums

    rng = np.random.RandomState(3)
    toks_a, ws_a, toks_b, ws_b, want = [], [], [], [], []
    for _ in range(50):
        na, nb = rng.randint(0, 8), rng.randint(0, 8)
        ta = sorted(rng.choice(20, size=na, replace=False).tolist())
        tb = sorted(rng.choice(20, size=nb, replace=False).tolist())
        wmap = {t: int(t) * 7 + 1 for t in set(ta) | set(tb)}
        toks_a.append(ta)
        ws_a.append([wmap[t] for t in ta])
        toks_b.append(tb)
        ws_b.append([wmap[t] for t in tb])
        want.append(sum(wmap[t] for t in set(ta) & set(tb)))
    got = intersect_weight_sums(
        pa.array(toks_a, pa.list_(pa.int64())),
        pa.array(ws_a, pa.list_(pa.int64())),
        pa.array(toks_b, pa.list_(pa.int64())),
        pa.array(ws_b, pa.list_(pa.int64())))
    assert got.tolist() == want


def test_weighted_jaccard_matches_brute(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.wjaccard import weighted_jaccard_pairs

    rng = np.random.RandomState(5)
    vocab = [f"tok{i}" for i in range(40)]
    texts, ids = [], []
    base = " ".join(rng.choice(vocab[:10], size=30))  # common boilerplate
    for i in range(60):
        rare = " ".join(rng.choice(vocab[10:], size=rng.randint(2, 6)))
        texts.append(base + " " + rare)
        ids.append(i)
    # plant near-dup twins differing by one rare token
    for i in range(0, 60, 7):
        texts.append(texts[i] + " " + vocab[10 + (i % 30)])
        ids.append(1000 + i)
    n = len(ids)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                 "text": pa.array(texts)}))
    got = {(r["id_a"], r["id_b"]): r["wjac_micro"]
           for r in weighted_jaccard_pairs(
               ds, threshold_micro=300_000).take_all()}
    want = _brute_wj(texts, ids, n, threshold_micro=300_000)
    assert got == want
    assert want, "fixture must produce at least one qualifying pair"


def test_weighted_jaccard_empty(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.wjaccard import weighted_jaccard_pairs

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())}))
    assert weighted_jaccard_pairs(ds).take_all() == []
