"""bucket_hash_join unit tests (the explicit partitioned hash join)."""

import pyarrow as pa
import pytest


def test_bucket_hash_join_inner(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.joins import bucket_hash_join

    left = rd.from_arrow(pa.table({
        "a": pa.array([1, 2, 3, 4, 2], pa.int64()),
        "x": pa.array(["p", "q", "r", "s", "t"]),
    }))
    right = rd.from_arrow(pa.table({
        "doc_id": pa.array([2, 3, 9], pa.int64()),
        "payload": pa.array(["two", "three", "nine"]),
        "vec": pa.array([[1, 2], [3, 4], [5, 6]], pa.list_(pa.int64())),
    }))
    out = bucket_hash_join(left, right, "a", "doc_id",
                           num_buckets=4, right_suffix="_r")
    rows = sorted(out.take_all(), key=lambda r: (r["a"], r["x"]))
    # inner: rows with a∈{2,3} survive; duplicate left key joins twice
    assert [(r["a"], r["x"], r["payload_r"]) for r in rows] == [
        (2, "q", "two"), (2, "t", "two"), (3, "r", "three")]
    assert rows[0]["vec_r"] == [1, 2]


def test_bucket_hash_join_empty_sides(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.joins import bucket_hash_join

    left = rd.from_arrow(pa.table({"a": pa.array([1, 2], pa.int64()),
                                   "x": pa.array(["p", "q"])}))
    right = rd.from_arrow(pa.table({"doc_id": pa.array([7], pa.int64()),
                                    "y": pa.array(["z"])}))
    out = bucket_hash_join(left, right, "a", "doc_id", num_buckets=2)
    assert out.count() == 0


def test_minhash_dedup_keep_anti_join_path(ray_session):
    """broadcast_drop_limit=0 forces the bucketed anti-join branch (the
    100 TB path); it must keep exactly the same docs as the broadcast
    pc.is_in branch."""
    import ray.data as rd

    from merge_machine_ray.stages.dedup import minhash_dedup_keep

    rows = []
    for i in range(40):
        text = f"the quick brown fox jumps over dog number {i} " \
               f"with unique content token u{i}"
        rows.append({"doc_id": i, "text": text})
        if i % 4 == 0:  # plant exact near-dup copies
            rows.append({"doc_id": 1000 + i, "text": text})
    ds = rd.from_items(rows)
    kept_bc = sorted(r["doc_id"] for r in minhash_dedup_keep(
        ds, jaccard_threshold=0.8).take_all())
    kept_aj = sorted(r["doc_id"] for r in minhash_dedup_keep(
        ds, jaccard_threshold=0.8, broadcast_drop_limit=0).take_all())
    assert kept_bc == kept_aj
    assert len(kept_bc) == 40                 # one per distinct text
    assert all(d < 1000 for d in kept_bc)     # min-id representative kept


def test_bucket_semi_join_randomized(ray_session):
    """Semi ≡ EXISTS: keeps each qualifying left row exactly once even
    when the right side repeats the key; complements the anti join."""
    import numpy as np
    import ray.data as rd

    from merge_machine_ray.stages.joins import bucket_anti_join, bucket_semi_join

    rng = np.random.RandomState(3)
    lk = rng.randint(0, 300, 1000).astype(np.int64)
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk), "row": pa.array(np.arange(1000, dtype=np.int64))}))
    rk = rng.randint(0, 300, 500).astype(np.int64)  # dup right keys
    right = rd.from_arrow(pa.table({"rk": pa.array(rk)}))
    semi = bucket_semi_join(left, right, "k", "rk", num_buckets=7).take_all()
    anti = bucket_anti_join(left, right, "k", "rk", num_buckets=7).take_all()
    rset = set(rk.tolist())
    want_semi = sorted(r for k, r in zip(lk, range(1000)) if k in rset)
    assert sorted(r["row"] for r in semi) == want_semi
    assert len(semi) + len(anti) == 1000
    assert not (set(r["row"] for r in semi) & set(r["row"] for r in anti))


def test_bucket_hash_join_full_outer_randomized(ray_session):
    """how='full' ≡ pandas outer merge: matched rows inner-join; left
    misses get null right columns; right misses get null left columns
    with the key coalesced into the left key column."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from merge_machine_ray.stages.joins import bucket_hash_join

    rng = np.random.RandomState(5)
    lk = np.unique(rng.randint(0, 400, 250)).astype(np.int64)
    rk = np.unique(rng.randint(200, 600, 250)).astype(np.int64)
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk), "lv": pa.array(lk * 10)}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array(rk), "rv": pa.array(rk * 100)}))
    got = bucket_hash_join(left, right, "k", "rk", num_buckets=7,
                           how="full").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = pd.merge(pd.DataFrame({"k": lk, "lv": lk * 10}),
                    pd.DataFrame({"k": rk, "rv": rk * 100}),
                    on="k", how="outer").sort_values("k") \
        .reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    for c in ("lv", "rv"):
        gv = got[c].to_numpy(dtype=float, na_value=np.nan)
        wv = want[c].to_numpy(dtype=float, na_value=np.nan)
        assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all(), c


def test_bucket_hash_join_right_unique_enforced(ray_session):
    """right_unique=True (the default) must FAIL LOUDLY on duplicate
    right keys instead of silently joining only the first row of the
    equal-key run (ADVICE r3)."""
    import pytest
    import ray.data as rd
    from ray.exceptions import RayTaskError

    from merge_machine_ray.stages.joins import bucket_hash_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array([10, 20, 30], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 3], pa.int64()),
        "rv": pa.array([200, 201, 300], pa.int64())}))
    with pytest.raises((RayTaskError, ValueError),
                       match="duplicate right"):
        bucket_hash_join(left, right, "k", "rk",
                         num_buckets=1).to_pandas()


def test_bucket_hash_join_full_duplicate_right_no_spurious_rows(
        ray_session):
    """how='full', right_unique=False: a duplicate right key whose run
    matched a left row must NOT resurface as a spurious null-left row —
    the whole equal-key run counts as matched (ADVICE r3)."""
    import numpy as np
    import ray.data as rd

    from merge_machine_ray.stages.joins import bucket_hash_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([2, 5], pa.int64()),
        "lv": pa.array([20, 50], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 7], pa.int64()),
        "rv": pa.array([200, 201, 700], pa.int64())}))
    got = bucket_hash_join(left, right, "k", "rk", num_buckets=1,
                           right_unique=False, how="full").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    # k=2 joins one right row of the run; k=5 null right; k=7 null left;
    # NO extra null-left row for the duplicate rk=2
    assert got["k"].tolist() == [2, 5, 7]
    assert int(got.loc[0, "rv"]) in (200, 201)
    assert np.isnan(got.loc[1, "rv"])
    assert np.isnan(got.loc[2, "lv"]) and int(got.loc[2, "rv"]) == 700
