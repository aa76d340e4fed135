"""DRIVER_EVAL_LIMIT gate parity: the ER-evaluation queries collect
their doc-sized tables to the driver under the gate (at bench scale the
distributed exchanges were pure per-stage overhead — ~5 s per query for
5,000 rows) and run the bucketed-join/groupby path above it.  Both
paths must produce byte-identical tables — integer arithmetic only, so
any diff is a real bug, not float noise.
"""

import pytest

from tests.test_queries_oracle import SF_DIR, _to_pandas

GATED = ["cluster_agreement", "blocking_quality", "er_threshold_sweep"]


@pytest.mark.parametrize("name", ["fellegi_sunter_weights",
                                  "fs_pair_scores", "fs_em_params"])
def test_gamma_gate_paths_identical(ray_session, name, monkeypatch):
    """comparison_vectors' driver pair build (DRIVER_SAMPLE_LIMIT) must
    emit the exact pair set of the window + bucketed-groupby path."""
    from merge_machine_ray.pipelines import queries as Q
    from merge_machine_ray.stages import fellegi as F

    q = Q.build_queries()[name]

    def run():
        Q._PIPE_MEMO.clear()  # γ is memoized per corpus — force rebuild
        df = _to_pandas(q(SF_DIR))
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    driver = run()
    monkeypatch.setattr(F, "DRIVER_SAMPLE_LIMIT", -1)
    dist = run()
    Q._PIPE_MEMO.clear()
    assert driver.equals(dist), (name, driver, dist)


@pytest.mark.parametrize("name", GATED)
def test_gate_paths_identical(ray_session, name, monkeypatch):
    from merge_machine_ray.pipelines import queries as Q

    q = Q.build_queries()[name]
    driver = _to_pandas(q(SF_DIR)).reset_index(drop=True)
    monkeypatch.setattr(Q, "DRIVER_EVAL_LIMIT", -1)
    dist = _to_pandas(q(SF_DIR)).reset_index(drop=True)
    assert list(driver.columns) == list(dist.columns)
    assert driver.equals(dist), (name, driver, dist)


def test_gamma_pair_limit_falls_back_to_distributed(ray_session,
                                                    monkeypatch):
    """The driver pair build must bound its OUTPUT too: with
    DRIVER_PAIR_LIMIT forced to 0 every emit falls back to the
    distributed path, and the pair set is unchanged."""
    from merge_machine_ray.pipelines import queries as Q
    from merge_machine_ray.stages import fellegi as F

    def run():
        Q._PIPE_MEMO.clear()
        df = _to_pandas(Q.build_queries()["fs_pair_scores"](SF_DIR))
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    normal = run()
    monkeypatch.setattr(F, "DRIVER_PAIR_LIMIT", 0)
    fallback = run()
    Q._PIPE_MEMO.clear()
    assert normal.equals(fallback)


def test_fs_em_twin_zero_pair_corpus(ray_session, tmp_path):
    """fs_em early-returns its init params on an empty γ histogram;
    the unrolled-CTE twin must replicate that (its CASE WHEN total=0
    guard) instead of flowing 0/0 NaNs through the clamp."""
    import duckdb
    import pyarrow.parquet as pq

    from merge_machine_ray.pipelines import queries as Q

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pq.write_table(src.slice(0, 0), str(tmp_path / "documents.parquet"))
    eng = Q.fs_em_params(str(tmp_path)).to_pandas() \
        .sort_values("field").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet'")
    twin = con.execute(Q._fs_em_sql()).fetchdf() \
        .sort_values("field").reset_index(drop=True)
    assert eng["m_micro"].tolist() == twin["m_micro"].tolist() == \
        [500000, 900000, 900000, 900000, 900000]
    assert eng["weight_milli"].tolist() == twin["weight_milli"].tolist()


def test_sum_c2_gate_parity(ray_session, monkeypatch):
    import pyarrow as pa
    import ray.data as rd

    from merge_machine_ray.pipelines import queries as Q

    ds = rd.from_arrow(pa.table({
        "a": pa.array([1, 1, 1, 2, 2, 3, 4, 4, 4, 4], pa.int64()),
        "k": pa.array(list("xxyxxzzzzw")),
    }))
    # a-groups: 3,2,1,4 → 3+1+0+6; k-groups: x=4,y=1,z=4,w=1 → 6+6;
    # (a,k)-groups: (1,x)=2,(1,y)=1,(2,x)=2,(3,z)=1,(4,z)=3,(4,w)=1
    cases = {("a",): 10, ("k",): 12, ("a", "k"): 5}
    for keys, want in cases.items():
        got_driver = Q._c2_of_sizes(Q._group_sizes_driver(
            Q._collect_tbl(ds, list(keys)), list(keys)))
        got_dist = Q._sum_c2(ds, list(keys))
        assert got_driver == got_dist == want, (keys, got_driver,
                                                got_dist, want)
