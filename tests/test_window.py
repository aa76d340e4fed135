"""stages/window.py — randomized parity vs DuckDB window functions."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _duck_windows(df: pd.DataFrame, rank_sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(rank_sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_window_parity_randomized(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.window import WindowSpec, window

    rng = np.random.RandomState(7)
    n = 5000
    df = pd.DataFrame({
        "part": rng.randint(0, 200, n).astype(np.int64),
        "val": rng.randint(0, 25, n).astype(np.int64),  # many ties
        "uid": np.arange(n, dtype=np.int64),
        "payload": rng.randint(-100, 100, n).astype(np.int64),
    })
    spec = WindowSpec(
        partition_by="part",
        order_by=[("val", True), ("uid", False)],
        row_number="rn", rank="rnk", dense_rank="drnk", rank_on=1,
        lag={"prev_payload": ("payload", 1), "prev2": ("payload", 2)})
    got = window(rd.from_pandas(df), spec,
                 keep_cols=["part", "uid", "val", "payload"],
                 num_buckets=7).to_pandas()
    want = _duck_windows(df, """
        SELECT part, uid, val, payload,
               row_number() OVER (PARTITION BY part
                                  ORDER BY val DESC, uid) AS rn,
               rank() OVER (PARTITION BY part ORDER BY val DESC) AS rnk,
               dense_rank() OVER (PARTITION BY part
                                  ORDER BY val DESC) AS drnk,
               lag(payload) OVER (PARTITION BY part
                                  ORDER BY val DESC, uid) AS prev_payload,
               lag(payload, 2) OVER (PARTITION BY part
                                     ORDER BY val DESC, uid) AS prev2
        FROM t""")
    g, w = _canon(got), _canon(want)
    assert len(g) == len(w) == n
    for c in g.columns:
        gv = g[c].to_numpy(dtype=float, na_value=np.nan)
        wv = w[c].to_numpy(dtype=float, na_value=np.nan)
        assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all(), c


def test_window_string_partitions_single_bucket(ray_session):
    """String partition keys + num_buckets=1 (every partition in one
    group: exercises segment-boundary arithmetic across partitions)."""
    import ray.data as rd

    from merge_machine_ray.stages.window import WindowSpec, window

    rng = np.random.RandomState(11)
    n = 1200
    df = pd.DataFrame({
        "host": rng.choice(["a.com", "b.org", "c.net", "d.io"], n),
        "score": rng.randint(0, 10, n).astype(np.int64),
        "uid": np.arange(n, dtype=np.int64),
    })
    spec = WindowSpec(partition_by="host",
                      order_by=[("score", False), ("uid", False)],
                      row_number="rn", lag={"prev_uid": ("uid", 1)})
    got = window(rd.from_pandas(df), spec, num_buckets=1).to_pandas()
    want = _duck_windows(df, """
        SELECT host, score, uid,
               row_number() OVER (PARTITION BY host
                                  ORDER BY score, uid) AS rn,
               lag(uid) OVER (PARTITION BY host
                              ORDER BY score, uid) AS prev_uid
        FROM t""")
    g, w = _canon(got), _canon(want)
    assert len(g) == len(w) == n
    for c in ["rn"]:
        assert (g[c].to_numpy() == w[c].to_numpy()).all()
    pg = g["prev_uid"].to_numpy(dtype=float, na_value=np.nan)
    pw = w["prev_uid"].to_numpy(dtype=float, na_value=np.nan)
    assert ((pg == pw) | (np.isnan(pg) & np.isnan(pw))).all()


def test_window_empty_and_singletons(ray_session):
    import ray.data as rd

    from merge_machine_ray.stages.window import WindowSpec, window

    df = pd.DataFrame({"part": np.array([1, 2, 3], np.int64),
                       "v": np.array([9, 8, 7], np.int64)})
    spec = WindowSpec(partition_by="part", order_by=[("v", False)],
                      row_number="rn", rank="rnk",
                      lag={"pv": ("v", 1)})
    out = window(rd.from_pandas(df), spec, num_buckets=2).to_pandas()
    assert sorted(out["rn"]) == [1, 1, 1]
    assert sorted(out["rnk"]) == [1, 1, 1]
    assert out["pv"].isna().all()


def test_window_lead_cumsum_parity(ray_session):
    import duckdb
    import ray.data as rd

    from merge_machine_ray.stages.window import WindowSpec, window

    rng = np.random.RandomState(23)
    n = 3000
    df = pd.DataFrame({
        "part": rng.randint(0, 97, n).astype(np.int64),
        "seq": np.arange(n, dtype=np.int64),
        "amount": rng.randint(1, 1000, n).astype(np.int64),
    })
    spec = WindowSpec(partition_by="part", order_by=[("seq", False)],
                      lead={"next_amount": ("amount", 1)},
                      cum_sum={"running_total": "amount"})
    got = window(rd.from_pandas(df), spec,
                 keep_cols=["part", "seq", "amount"],
                 num_buckets=5).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT part, seq, amount,
               lead(amount) OVER (PARTITION BY part ORDER BY seq)
                   AS next_amount,
               sum(amount) OVER (PARTITION BY part ORDER BY seq
                                 ROWS UNBOUNDED PRECEDING)
                   AS running_total
        FROM t""").fetchdf()
    g = _canon(got)
    w = _canon(want)
    assert len(g) == len(w) == n
    for c in g.columns:
        gv = g[c].to_numpy(dtype=float, na_value=np.nan)
        wv = w[c].to_numpy(dtype=float, na_value=np.nan)
        assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all(), c


def test_window_null_keys_parity(ray_session):
    """Null partition AND order keys (string + int): nulls must group as
    ONE partition and sort NULLS LAST like DuckDB — not crash on NaN
    dictionary indices or silently split partitions (ADVICE r3)."""
    import ray.data as rd

    from merge_machine_ray.stages.window import WindowSpec, window

    rng = np.random.RandomState(11)
    n = 3000
    part = np.array([f"p{v}" for v in rng.randint(0, 40, n)], dtype=object)
    part[rng.rand(n) < 0.1] = None
    val = rng.randint(0, 50, n).astype(np.float64)
    val[rng.rand(n) < 0.1] = np.nan
    df = pd.DataFrame({
        "part": part,
        "val": pd.array(np.where(np.isnan(val), None, val),
                        dtype=pd.Int64Dtype()),
        "uid": np.arange(n, dtype=np.int64),
        "payload": rng.randint(-100, 100, n).astype(np.int64),
    })
    tbl = pa.table({
        "part": pa.array(part, pa.string()),
        "val": pa.array([None if pd.isna(v) else int(v) for v in val],
                        pa.int64()),
        "uid": pa.array(df["uid"].to_numpy()),
        "payload": pa.array(df["payload"].to_numpy()),
    })
    spec = WindowSpec(
        partition_by="part",
        order_by=[("val", False), ("uid", False)],
        row_number="rn",
        lag={"prev_payload": ("payload", 1)})
    got = window(rd.from_arrow(tbl), spec,
                 keep_cols=["part", "uid", "val", "payload"],
                 num_buckets=5).to_pandas()
    want = _duck_windows(df, """
        SELECT part, uid, val, payload,
               row_number() OVER (PARTITION BY part
                                  ORDER BY val, uid) AS rn,
               lag(payload) OVER (PARTITION BY part
                                  ORDER BY val, uid) AS prev_payload
        FROM t""")
    got["part"] = got["part"].fillna("<null>")
    want["part"] = want["part"].fillna("<null>")
    g, w = _canon(got), _canon(want)
    assert len(g) == len(w) == n
    for c in g.columns:
        if c == "part":
            assert (g[c].to_numpy() == w[c].to_numpy()).all(), c
            continue
        gv = g[c].to_numpy(dtype=float, na_value=np.nan)
        wv = w[c].to_numpy(dtype=float, na_value=np.nan)
        assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all(), c


def test_window_nullable_int_partition(ray_session):
    """Nullable INT partition column: all null-keyed rows must land in
    one partition (NULL IS NOT DISTINCT FROM NULL)."""
    import ray.data as rd

    from merge_machine_ray.stages.window import WindowSpec, window

    tbl = pa.table({
        "part": pa.array([1, None, 2, None, 1, None], pa.int64()),
        "uid": pa.array(np.arange(6, dtype=np.int64)),
    })
    spec = WindowSpec(partition_by="part", order_by=[("uid", False)],
                      row_number="rn")
    got = window(rd.from_arrow(tbl), spec, keep_cols=["part", "uid"],
                 num_buckets=3).to_pandas().sort_values("uid")
    rn_by_uid = dict(zip(got["uid"], got["rn"]))
    # null partition rows are uids 1,3,5 → row_numbers 1,2,3 in uid order
    assert [rn_by_uid[u] for u in (1, 3, 5)] == [1, 2, 3]
    assert [rn_by_uid[u] for u in (0, 4)] == [1, 2]
    assert rn_by_uid[2] == 1


def test_range_join_matches_bruteforce_random(ray_session):
    """Banded range join = brute-force nested loop on random data,
    including empty windows, duplicate timestamps, negative bands."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from merge_machine_ray.stages.asof import range_join

    rng = np.random.default_rng(11)
    n_l, n_r = 400, 900
    lt = pa.table({
        "user_id": pa.array(rng.integers(0, 25, n_l), pa.int64()),
        "ts": pa.array(rng.integers(0, 5_000, n_l), pa.int64()),
        "event_id": pa.array(np.arange(n_l), pa.int64())})
    rt = pa.table({
        "user_id": pa.array(rng.integers(0, 25, n_r), pa.int64()),
        "ts": pa.array(rng.integers(0, 5_000, n_r), pa.int64()),
        "event_id": pa.array(np.arange(n_r) + 10_000, pa.int64())})
    lo, hi = -300, -1
    out = range_join(rd.from_arrow(lt).repartition(3),
                     rd.from_arrow(rt).repartition(4),
                     key="user_id", ts="ts", lo_offset=lo, hi_offset=hi,
                     left_cols=["event_id"],
                     right_cols=["ts", "event_id"]).take_all()
    got = sorted((r["event_id"], r["event_id_r"]) for r in out)
    want = sorted(
        (int(le), int(re))
        for lu, lts, le in zip(lt["user_id"].to_pylist(),
                               lt["ts"].to_pylist(),
                               lt["event_id"].to_pylist())
        for ru, rts, re in zip(rt["user_id"].to_pylist(),
                               rt["ts"].to_pylist(),
                               rt["event_id"].to_pylist())
        if lu == ru and lts + lo <= rts <= lts + hi)
    assert got == want and len(got) > 0
    # every output row carries consistent left/right payloads
    for r in out:
        assert r["ts"] + lo <= r["ts_r"] <= r["ts"] + hi
