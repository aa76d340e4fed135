"""Driver-style conformance: every queries() entry with an oracle_sql()
twin must match DuckDB row-for-row (order-insensitive) at sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            # normalize unit (us vs ns differs by engine) then to int64;
            # NaT → INT64_MIN consistently
            df[c] = df[c].astype("datetime64[ns]").astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _compare(name: str, got: pd.DataFrame, want: pd.DataFrame):
    assert list(sorted(got.columns)) == list(sorted(want.columns)), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _canon(got), _canon(want)
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if np.issubdtype(g[c].dtype, np.floating):
            np.testing.assert_allclose(
                np.nan_to_num(gv.astype(float), nan=-1e308),
                np.nan_to_num(wv.astype(float), nan=-1e308),
                rtol=0, atol=1e-9, err_msg=f"{name}.{c}")
        else:
            mismatch = (gv != wv)
            assert not mismatch.any(), (
                f"{name}.{c}: first diff at row {np.argmax(mismatch)}: "
                f"{gv[np.argmax(mismatch)]} != {wv[np.argmax(mismatch)]}")


def _query_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as e

    got = _to_pandas(e.queries()[name](SF_DIR))
    want = _duck(e.oracle_sql()[name])
    _compare(name, got, want)


def test_oracle_schema_sweep_no_narrow_or_decimal_dtypes():
    """Kill the HUGEINT/int32 twin-dtype bug class permanently (it hit
    REVENUE_BY_SEGMENT_SQL in r2, CUSTOMER_RUNNING_SPEND_SQL and
    PRICE_QUARTILES_SQL in r3): every oracle SQL run under DuckDB must
    emit only dtypes the engine can emit — int64 / float64 / string /
    timestamp / bool / list — never decimal128 (DuckDB HUGEINT window
    sums), int32/int16 (bare integer literals), or float32. The driver
    hashes values per-dtype, so a dtype-class mismatch is a guaranteed
    red row even when values agree."""
    import __ray_entry__ as e
    import pyarrow as pa

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    banned = []
    for name, sql in sorted(e.oracle_sql().items()):
        tbl = con.execute(sql).arrow()
        for f in tbl.schema:
            typ = f.type
            ok = (
                pa.types.is_int64(typ) or pa.types.is_float64(typ)
                or pa.types.is_string(typ) or pa.types.is_large_string(typ)
                or pa.types.is_boolean(typ) or pa.types.is_timestamp(typ)
                or pa.types.is_date(typ) or pa.types.is_binary(typ)
                or pa.types.is_large_binary(typ) or pa.types.is_list(typ)
                or pa.types.is_large_list(typ) or pa.types.is_null(typ)
            )
            if not ok:
                banned.append((name, f.name, str(typ)))
    assert not banned, (
        "oracle SQL emits dtypes the engine never emits (add CASTs): "
        f"{banned}")


def test_rows_only_queries_run(ray_session):
    """Non-SQL queries must at least run and return stable row counts."""
    import __ray_entry__ as e

    q = e.queries()
    sqls = set(e.oracle_sql())
    for name in sorted(set(q) - sqls):
        df = _to_pandas(q[name](SF_DIR))
        assert df is not None
        assert len(df) >= 0


def test_planted_oracle_detects_content_change(ray_session):
    """Negative control for the planted-twin oracles: a twin with a REAL
    content edit (not the whitespace-only transform the fingerprint is
    invariant to) must drop planted pairs — i.e. the oracle can fail."""
    from merge_machine_ray.pipelines import queries as Q
    from merge_machine_ray.stages.textstats import fingerprint

    ds = Q._read(SF_DIR, "documents", ["doc_id", "text"])
    n_planted = len(_duck(Q._PLANTED_PAIRS_SQL))
    planted = Q._plant_doc_twins(
        ds, transform=lambda s: (s or "")[::-1])  # every window changes
    fp = planted.map_batches(lambda t: fingerprint(t),
                             batch_format="pyarrow") \
        .select_columns(["doc_id", "fingerprint"])
    pairs = _to_pandas(Q._planted_equal_pairs(fp, "fingerprint"))
    assert n_planted > 0
    assert len(pairs) < n_planted


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = _to_pandas(e.entry())
    assert len(df) > 0
    assert {"doc_id", "cluster_id"} <= set(df.columns)
