"""Data-quality stage: column profiling with planted nulls/dup values
(the sf corpus is clean, so edges are exercised here) and the FK audit
with planted orphans; both against DuckDB on the same in-memory
tables."""

import duckdb
import pyarrow as pa

from merge_machine_ray.stages.profile import column_profile, fk_audit


def _mk(tbl):
    import ray.data
    return ray.data.from_arrow(tbl).repartition(4)


def test_column_profile_planted_edges(ray_session):
    t = pa.table({
        "k": pa.array([3, 1, 1, None, 7, 7, 7], pa.int64()),
        "s": pa.array(["b", None, "a", "a", "", None, "zz"]),
        "f": pa.array([1.5, None, 2.5, 2.5, 0.0, 1.0, 1.0],
                      pa.float64()),  # non-int/string: null min/max
    })
    got = column_profile(_mk(t), ["k", "s", "f"]).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        SELECT 'k' AS col_name, count(*) AS n_rows,
               count(*) - count(k) AS n_null,
               count(DISTINCT k) AS n_distinct,
               CAST(min(k) AS VARCHAR) AS min_v,
               CAST(max(k) AS VARCHAR) AS max_v FROM t
        UNION ALL
        SELECT 's', count(*), count(*) - count(s),
               count(DISTINCT s),
               CAST(min(s) AS VARCHAR), CAST(max(s) AS VARCHAR) FROM t
        UNION ALL
        SELECT 'f', count(*), count(*) - count(f),
               count(DISTINCT f), NULL, NULL FROM t
    """).fetchdf()
    g = got.set_index("col_name")
    w = want.set_index("col_name")
    for c in ("k", "s", "f"):
        for col in ("n_rows", "n_null", "n_distinct"):
            assert int(g.loc[c, col]) == int(w.loc[c, col]), (c, col)
    assert g.loc["k", "min_v"] == "1" and g.loc["k", "max_v"] == "7"
    assert g.loc["s", "min_v"] == "" and g.loc["s", "max_v"] == "zz"
    assert g.loc["f", "min_v"] is None and g.loc["f", "max_v"] is None


def test_column_profile_all_null_column(ray_session):
    t = pa.table({"x": pa.array([None, None], pa.int64())})
    got = column_profile(_mk(t), ["x"]).to_pandas()
    assert got.n_rows[0] == 2 and got.n_null[0] == 2
    assert got.n_distinct[0] == 0
    assert got.min_v[0] is None and got.max_v[0] is None


def test_fk_audit_planted_orphans(ray_session):
    child = pa.table({
        "ck": pa.array([1, 1, 2, 5, None, 9, 2], pa.int64())})
    parent = pa.table({"pk": pa.array([1, 2, 3], pa.int64())})
    out = fk_audit([("c->p", _mk(child), "ck", _mk(parent), "pk")],
                   num_buckets=8).to_pandas()
    # null child keys excluded; orphans = keys 5 and 9 -> 2 rows
    assert out.n_child[0] == 6
    assert out.n_matched[0] == 4
    assert out.n_orphans[0] == 2


def test_snapshot_diff_all_statuses(ray_session):
    from merge_machine_ray.stages.profile import snapshot_diff

    old = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": pa.array(["a", "b", "c", "d"])})
    new = pa.table({"doc_id": pa.array([2, 3, 5], pa.int64()),
                    "text": pa.array(["b", "C!", "e"])})
    out = {r["status"]: r["n_docs"]
           for r in snapshot_diff(_mk(old), _mk(new),
                                  num_buckets=8).take_all()}
    assert out == {"added": 1, "removed": 2,
                   "changed": 1, "unchanged": 1}


def test_snapshot_diff_empty_sides(ray_session):
    from merge_machine_ray.stages.profile import snapshot_diff

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    new = pa.table({"doc_id": pa.array([7], pa.int64()),
                    "text": pa.array(["x"])})
    out = {r["status"]: r["n_docs"]
           for r in snapshot_diff(_mk(empty), _mk(new),
                                  num_buckets=4).take_all()}
    assert out == {"added": 1}
