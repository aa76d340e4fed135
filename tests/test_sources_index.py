"""Readers (S1/S2 all-string contract) + reference-index artifact
(S3/S4) + J8 keyword search tests."""

import os

import pyarrow as pa
import pytest


def test_read_source_parquet_stringifies(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from merge_machine_ray.sources.readers import read_source_parquet

    t = pa.table({"a": pa.array([1, None, 3], pa.int64()),
                  "b": pa.array(["x", None, "z"])})
    p = str(tmp_path / "t.parquet")
    pq.write_table(t, p)
    rows = read_source_parquet(p).take_all()
    got = sorted((r["a"], r["b"]) for r in rows)  # row order not guaranteed
    assert got == [("", ""), ("1", "x"), ("3", "z")]


def test_read_source_csv(ray_session, tmp_path):
    from merge_machine_ray.sources.readers import read_source_csv

    p = str(tmp_path / "t.csv")
    with open(p, "w") as f:
        f.write("name,code\nalpha,1\nbeta,\n")
    rows = read_source_csv(p).take_all()
    assert rows[0] == {"name": "alpha", "code": "1"}
    assert rows[1]["code"] == ""


def test_ref_index_and_search(ray_session, tmp_path):
    import ray.data as rd

    from merge_machine_ray.fixtures.dirty_clean import ref_table
    from merge_machine_ray.io.ref_index import create_ref_index, load_idf, search

    ref = ref_table(120)
    idx_dir = str(tmp_path / "refindex")
    manifest = create_ref_index(
        rd.from_arrow(ref), idx_dir,
        columns_to_index={"denomination": ["standard", "french"],
                          "localite": ["standard"]})
    assert manifest["n_docs"] == 120
    assert os.path.exists(os.path.join(idx_dir, "_index.json"))

    idf = load_idf(idx_dir, "denomination", "standard")
    assert idf["n_docs"] == 120
    assert idf["keys"].size > 0

    # search for a known denomination; its row must rank first
    target = ref["denomination"][0].as_py()
    hits = search(idx_dir, target, "denomination", "standard", k=5).take_all()
    assert hits, "no search hits"
    assert hits[0]["denomination"] == target
    assert hits[0]["__search_score"] >= hits[-1]["__search_score"]
