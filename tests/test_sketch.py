"""stages/sketch operators: deterministic hash sampling, exact token
heavy-hitters, exact histogram quantiles — each checked against a
sequential python reference on randomized inputs."""

import collections
import re

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)


def test_hash_sample_deterministic_and_unbiased(ray_session):
    from merge_machine_ray.stages.sketch import hash_sample

    rows = [{"doc_id": i} for i in range(20_000)]
    ds = _docs_ds(rows)
    kept1 = sorted(r["doc_id"] for r in hash_sample(ds, "doc_id", 10).take_all())
    kept2 = sorted(r["doc_id"] for r in hash_sample(ds, "doc_id", 10).take_all())
    assert kept1 == kept2                      # pure function of the id
    assert 0.08 < len(kept1) / 20_000 < 0.12   # ≈10%
    # python reference
    want = [i for i in range(20_000)
            if (i * 2654435761) % (1 << 32) < int(0.10 * (1 << 32))]
    assert kept1 == want


def test_token_heavy_hitters_exact(ray_session):
    from merge_machine_ray.stages.sketch import token_heavy_hitters

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(50)]
    rows = [{"text": " ".join(rng.choice(vocab, size=rng.randint(3, 30)))}
            for _ in range(400)]
    out = token_heavy_hitters(_docs_ds(rows), "text", k=10).to_pylist()

    counts = collections.Counter()
    for r in rows:
        counts.update(t for t in re.split(r"[^a-z0-9]+", r["text"].lower())
                      if t)
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["tok"], r["n"]) for r in out] == want


def test_column_quantiles_matches_sorted_rank(ray_session):
    from merge_machine_ray.stages.sketch import column_quantiles

    rng = np.random.RandomState(3)
    vals = rng.zipf(1.7, size=5000).clip(max=10_000).astype(int)
    rows = [{"v": int(v)} for v in vals]
    qs = [k / 10 for k in range(1, 10)] + [0.25, 0.75]
    out = column_quantiles(_docs_ds(rows), "v", qs).to_pylist()
    s = np.sort(vals)
    n = s.size
    for r, q in zip(out, qs):
        rank = max(1, (int(round(q * 1e6)) * n + 999_999) // 1_000_000)
        assert r["value"] == int(s[rank - 1]), q
        assert r["q_micro"] == int(round(q * 1e6))


def test_column_quantiles_rejects_unbounded(ray_session):
    from merge_machine_ray.stages.sketch import column_quantiles

    rows = [{"v": 1 << 40}]
    with pytest.raises(Exception):
        column_quantiles(_docs_ds(rows), "v", [0.5])


def test_stratified_sample_rates_and_determinism(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from merge_machine_ray.stages.sketch import stratified_sample

    n = 20_000
    ids = np.arange(n, dtype=np.int64)
    langs = np.where(ids % 3 == 0, "en", np.where(ids % 3 == 1, "fr", "de"))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "lang": pa.array(langs, pa.string())}))
    out1 = sorted(r["doc_id"] for r in stratified_sample(
        ds, "doc_id", "lang", {"en": 10.0, "fr": 50.0}).take_all())
    out2 = sorted(r["doc_id"] for r in stratified_sample(
        ds, "doc_id", "lang", {"en": 10.0, "fr": 50.0}).take_all())
    assert out1 == out2  # pure function of the id
    kept = np.asarray(out1)
    n_en, n_fr, n_de = ((ids % 3 == 0).sum(), (ids % 3 == 1).sum(),
                        (ids % 3 == 2).sum())
    k_en = (kept % 3 == 0).sum() / n_en
    k_fr = (kept % 3 == 1).sum() / n_fr
    assert abs(k_en - 0.10) < 0.02
    assert abs(k_fr - 0.50) < 0.03
    assert (kept % 3 == 2).sum() == n_de  # default keeps everything


def test_column_quantiles_refine_matches_sequential(ray_session):
    """2-pass refinement ≡ sequential rank selection on a wide domain,
    including quantiles landing in sparse bins and negative values."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from merge_machine_ray.stages.sketch import column_quantiles_refine

    rng = np.random.RandomState(17)
    v = np.concatenate([
        rng.randint(-5_000_000, 5_000_000, 30_000),
        rng.randint(999_999_000, 1_000_001_000, 500),  # far outlier blob
    ]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(v)}))
    qs = [0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    got = column_quantiles_refine(ds, "v", qs, coarse_bins=1 << 10) \
        .to_pydict()
    sv = np.sort(v)
    n = v.size
    for q_micro, val in zip(got["q_micro"], got["value"]):
        rank = max(1, (q_micro * n + 999_999) // 1_000_000)
        assert val == int(sv[rank - 1]), (q_micro, val, int(sv[rank - 1]))


def test_hash_split_partitions_and_matches_reference(ray_session):
    from merge_machine_ray.stages.sketch import hash_split

    splits = [("train", 90.0), ("val", 5.0), ("test", 5.0)]
    rows = [{"doc_id": i} for i in range(20_000)]
    got = {r["doc_id"]: r["split"]
           for r in hash_split(_docs_ds(rows), "doc_id", splits).take_all()}
    assert len(got) == 20_000                      # total partition
    mod = 1 << 32
    cuts = [int(0.90 * mod), int(0.95 * mod)]
    for i in range(20_000):                        # python reference
        h = (i * 2654435761) % mod
        want = "train" if h < cuts[0] else ("val" if h < cuts[1] else "test")
        assert got[i] == want
    frac = collections.Counter(got.values())
    assert 0.88 < frac["train"] / 20_000 < 0.92
    assert 0.03 < frac["val"] / 20_000 < 0.07


def test_shuffle_by_hash_deterministic_order(ray_session):
    from merge_machine_ray.stages.sketch import shuffle_by_hash

    rows = [{"doc_id": i, "v": i * 3} for i in range(5_000)]
    a = [r["doc_id"] for r in shuffle_by_hash(_docs_ds(rows), "doc_id").take_all()]
    b = [r["doc_id"] for r in shuffle_by_hash(_docs_ds(rows), "doc_id").take_all()]
    assert a == b and sorted(a) == list(range(5_000))
    mod = 1 << 32
    want = sorted(range(5_000), key=lambda i: ((i * 2654435761) % mod, i))
    assert a == want
    # a different salt gives a different (but still deterministic) order
    c = [r["doc_id"] for r in
         shuffle_by_hash(_docs_ds(rows), "doc_id", salt=7).take_all()]
    assert c != a


def test_packed_sequences_matches_sequential_reference(ray_session):
    """Global token offsets over hash order equal a single-threaded
    concatenate-and-cut reference, regardless of partitioning and
    bucket count (including docs with empty text → 1 '' token)."""
    from merge_machine_ray.stages.packing import packed_sequences

    rng = np.random.default_rng(42)
    rows = [{"doc_id": i,
             "text": " ".join("tok%d" % t for t in
                              range(int(rng.integers(0, 30))))}
            for i in range(3_000)]        # ~half short, some empty
    seq_len = 16
    got = {r["doc_id"]: r for r in
           packed_sequences(_docs_ds(rows), seq_len,
                            n_buckets=32).take_all()}
    assert len(got) == 3_000

    mod, knuth = 1 << 32, 2654435761
    order = sorted(range(3_000), key=lambda i: ((i * knuth) % mod, i))
    off = 0
    for i in order:
        n = len(rows[i]["text"].split(" "))   # ''.split(' ') == ['']
        r = got[i]
        assert r["n_tokens"] == n
        assert r["tok_start"] == off
        assert r["seq_first"] == off // seq_len
        assert r["seq_last"] == (off + n - 1) // seq_len
        assert r["n_seqs"] == r["seq_last"] - r["seq_first"] + 1
        off += n


def test_packed_sequences_bucket_count_invariant(ray_session):
    """Offsets are a pure function of the corpus — bucket granularity
    must not change a single value."""
    from merge_machine_ray.stages.packing import packed_sequences

    rows = [{"doc_id": i * 7 + 3, "text": "a b c d"[: 1 + (i % 7)]}
            for i in range(500)]
    a = sorted(packed_sequences(_docs_ds(rows), 8,
                                n_buckets=4).take_all(),
               key=lambda r: r["doc_id"])
    b = sorted(packed_sequences(_docs_ds(rows), 8,
                                n_buckets=256).take_all(),
               key=lambda r: r["doc_id"])
    assert a == b


def test_kmv_distinct_matches_reference_and_is_exact_when_small(ray_session):
    """KMV sketch: exact count below k, deterministic (k-1)*M//h_k
    estimate above it, within the sketch's expected error band; bit-
    equal to a sequential reference regardless of partitioning."""
    from merge_machine_ray.stages.sketch import kmv_distinct

    rng = np.random.default_rng(7)
    rows = []
    for i in range(40_000):                 # 'big' ~8k distinct users
        rows.append({"event_type": "big",
                     "user_id": int(rng.integers(0, 8_000))})
    for u in range(17):                     # 'small' exactly 17 < k
        rows.append({"event_type": "small", "user_id": 100_000 + u})
    k, mod, knuth = 64, 1 << 32, 2654435761
    got = {r["event_type"]: r for r in
           kmv_distinct(_docs_ds(rows), "event_type", "user_id",
                        k=k).take_all()}

    def ref(users):
        hs = sorted({(u * knuth) % mod for u in users})[:k]
        n, kth = len(hs), hs[-1]
        return n, kth, (n if n < k else ((k - 1) * mod) // kth)

    big_users = {r["user_id"] for r in rows if r["event_type"] == "big"}
    n, kth, est = ref(big_users)
    assert (got["big"]["n_hashes"], got["big"]["kth_hash"],
            got["big"]["est_distinct"]) == (n, kth, est)
    assert abs(est - len(big_users)) / len(big_users) < 0.5  # sanity band
    assert got["small"]["est_distinct"] == 17                # exact
    assert got["small"]["n_hashes"] == 17


def test_grouped_quantiles_matches_numpy_reference(ray_session):
    from merge_machine_ray.stages.sketch import grouped_quantiles

    rng = np.random.default_rng(5)
    rows = [{"g": ["a", "b", "c"][int(rng.integers(0, 3))],
             "v": int(rng.integers(0, 500))} for _ in range(8_000)]
    qs = [0.5, 0.9, 0.99]
    got = {(r["g"], r["q_micro"]): r["value"]
           for r in grouped_quantiles(_docs_ds(rows), "g", "v",
                                      qs).take_all()}
    for g in "abc":
        vals = np.sort([r["v"] for r in rows if r["g"] == g])
        n = vals.size
        for q in qs:
            qm = int(round(q * 1_000_000))
            rank = max(1, (qm * n + 999_999) // 1_000_000)
            assert got[(g, qm)] == int(vals[rank - 1]), (g, q)
