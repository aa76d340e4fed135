"""Byte-identity property test for the vectorized PairScorer.

The vectorized form (one lexsort-merge over the flat batch,
``stages/scoring.py``) must produce BIT-IDENTICAL sim_*/score columns
to a scalar per-pair reference that accumulates element-sequentially
in ascending-hash order — the same semantics ``np.add.at`` guarantees.
Mirrors the reference's boosted-template scoring contract
(``merge_machine/helpers.py:65-152``).
"""

import math
import random

import numpy as np
import pyarrow as pa

from merge_machine_ray.functions.similarity import jaro_winkler
from merge_machine_ray.stages.scoring import PairScorer
from merge_machine_ray.state.params import MatchParams


def _scalar_reference(batch: pa.Table, idf: dict, p: MatchParams):
    """Per-pair scalar scorer with sequential accumulation."""
    keys, vals, default = idf["keys"], idf["vals"], idf["default"]

    def idf_of(h):
        i = np.searchsorted(keys, h)
        if i < keys.size and keys[i] == h:
            return float(vals[i])
        return default

    def weights(toks):
        out = {}
        for h in sorted(set(toks)):
            out[h] = toks.count(h) * idf_of(h)
        n2 = 0.0
        for h in sorted(out):
            n2 += out[h] * out[h]
        return out, math.sqrt(n2)

    rows = batch.to_pylist()
    n = len(rows)
    sims = {k: np.zeros(n) for k in
            ("sim_text", "sim_ints", "sim_host", "sim_url", "sim_lang")}
    for i, r in enumerate(rows):
        wa, na = weights(r["tok_hashes_a"] or [])
        wb, nb = weights(r["tok_hashes_b"] or [])
        if na > 0 and nb > 0:
            num = 0.0
            for h in sorted(set(wa) & set(wb)):
                num += wa[h] * wb[h]
            if num:
                sims["sim_text"][i] = num / (na * nb)
        sa, sb = set(r["int_hashes_a"] or []), set(r["int_hashes_b"] or [])
        inter = len(sa & sb)
        if inter:
            sims["sim_ints"][i] = inter / (len(sa) + len(sb) - inter)
        if r.get("host_a") and r.get("host_b"):
            sims["sim_host"][i] = jaro_winkler(r["host_a"], r["host_b"])
        if r.get("path_a") and r.get("path_b"):
            sims["sim_url"][i] = jaro_winkler(r["path_a"], r["path_b"])
        if r.get("lang_a") and r["lang_a"] == r["lang_b"]:
            sims["sim_lang"][i] = 1.0
    score = (p.w_text * sims["sim_text"] + p.w_ints * sims["sim_ints"]
             + p.w_host * sims["sim_host"] + p.w_url * sims["sim_url"]
             + p.w_lang * sims["sim_lang"])
    return sims, score


def _random_batch(rng: random.Random, n: int) -> pa.Table:
    hosts = ["example.com", "foo.org", "bar-baz.net", "", None]
    paths = ["/a/b/c", "/index.html", "/x" * 8, "", None]
    langs = ["en", "fr", "de", "", None]

    def toks():
        m = rng.randrange(0, 12)
        # small hash domain → guaranteed overlaps and in-row duplicates
        return [rng.randrange(0, 40) for _ in range(m)]

    def ints():
        m = rng.randrange(0, 5)
        return sorted({rng.randrange(0, 25) for _ in range(m)})

    return pa.table({
        "a": pa.array([rng.randrange(10**6) for _ in range(n)], pa.int64()),
        "b": pa.array([rng.randrange(10**6) for _ in range(n)], pa.int64()),
        "tok_hashes_a": pa.array([toks() for _ in range(n)],
                                 pa.list_(pa.int64())),
        "tok_hashes_b": pa.array([toks() for _ in range(n)],
                                 pa.list_(pa.int64())),
        "int_hashes_a": pa.array([ints() for _ in range(n)],
                                 pa.list_(pa.int64())),
        "int_hashes_b": pa.array([ints() for _ in range(n)],
                                 pa.list_(pa.int64())),
        "host_a": pa.array([rng.choice(hosts) for _ in range(n)]),
        "host_b": pa.array([rng.choice(hosts) for _ in range(n)]),
        "path_a": pa.array([rng.choice(paths) for _ in range(n)]),
        "path_b": pa.array([rng.choice(paths) for _ in range(n)]),
        "lang_a": pa.array([rng.choice(langs) for _ in range(n)]),
        "lang_b": pa.array([rng.choice(langs) for _ in range(n)]),
    })


def test_pair_scorer_matches_scalar_reference_bitwise():
    rng = random.Random(0xC0FFEE)
    p = MatchParams()
    # idf table over part of the hash domain → both hit and default paths
    idf_keys = np.array(sorted(rng.sample(range(40), 25)), dtype=np.int64)
    idf = {"keys": idf_keys,
           "vals": (1.0 + np.arange(idf_keys.size) * 0.37),
           "default": 1.0}
    scorer = PairScorer(idf_ref=idf, params=p)
    for trial in range(5):
        batch = _random_batch(rng, 200)
        out = scorer(batch)
        ref_sims, ref_score = _scalar_reference(batch, idf, p)
        for k, expect in ref_sims.items():
            got = out[k].to_numpy(zero_copy_only=False)
            assert np.array_equal(got, expect), (trial, k)
        got_score = out["score"].to_numpy(zero_copy_only=False)
        assert np.array_equal(got_score, ref_score), trial
        assert np.array_equal(
            out["is_match"].to_numpy(zero_copy_only=False),
            ref_score >= p.threshold)


def test_pair_scorer_empty_and_degenerate():
    scorer = PairScorer(idf_ref=None, params=MatchParams())
    empty = _random_batch(random.Random(1), 0)
    out = scorer(empty)
    assert out.num_rows == 0
    # single row, all-empty features → all sims 0, no match
    one = pa.table({
        "a": pa.array([1], pa.int64()), "b": pa.array([2], pa.int64()),
        "tok_hashes_a": pa.array([[]], pa.list_(pa.int64())),
        "tok_hashes_b": pa.array([[]], pa.list_(pa.int64())),
        "int_hashes_a": pa.array([[]], pa.list_(pa.int64())),
        "int_hashes_b": pa.array([[]], pa.list_(pa.int64())),
        "host_a": pa.array([None], pa.string()),
        "host_b": pa.array([None], pa.string()),
        "path_a": pa.array([""], pa.string()),
        "path_b": pa.array(["/x"], pa.string()),
        "lang_a": pa.array([None], pa.string()),
        "lang_b": pa.array([None], pa.string()),
    })
    got = scorer(one)
    assert got["score"][0].as_py() == 0.0
    assert got["is_match"][0].as_py() is False


def test_jaro_winkler_batch_matches_scalar_property():
    """Bit-identical batch JW vs the scalar greedy matcher on random +
    adversarial pairs (r3 VERDICT #5: numpy-batch the distinct-pair JW)."""
    import random
    import string

    import numpy as np

    from merge_machine_ray.functions.similarity import (
        jaro_winkler,
        jaro_winkler_batch,
    )

    rng = random.Random(7)
    pairs = [("", ""), ("a", ""), ("", "b"), ("a", "a"), ("ab", "ba"),
             ("abc", "acb"), ("martha", "marhta"), ("dwayne", "duane"),
             ("dixon", "dicksonx"), ("é", "e"), ("xyz", "xyz"),
             ("aaaab", "baaaa"), ("ab" * 12, "ba" * 12),
             ("ab" * 32, "ba" * 32), ("a\x00b", "ab"),
             ("q" * 64, "q" * 63 + "z"), ("q" * 33, "z" + "q" * 32),
             ("q" * 80, "q" * 79 + "z")]  # >64 chars → scalar fallback
    alpha = string.ascii_lowercase + "éàç "
    for _ in range(2000):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 30)))
        if rng.random() < 0.3:
            b = a[:rng.randint(0, len(a))] + b
        pairs.append((a, b))
    got = jaro_winkler_batch([p[0] for p in pairs], [p[1] for p in pairs])
    want = np.array([jaro_winkler(x, y) for x, y in pairs])
    assert (got == want).all()
