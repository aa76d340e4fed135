"""Crafted-fixture parity for golden_records and canopy_assign: a tiny
documents.parquet with PLANTED mode ties, dominance chains and orphans
is run through BOTH the Ray query and its DuckDB twin — the sf0.01
corpus rarely exercises these edges (mode ties, tight chains), so this
pins the deterministic tie-break semantics directly."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gc_docs")
    # three near-dup families (shared long text → exact-Jaccard
    # cluster), with lang/source mode TIES inside each; plus singletons
    rows = []
    fam = [
        ("alpha beta gamma delta epsilon zeta eta theta " * 6,
         ["en", "fr", "en", "fr"], ["s2", "s1", "s1", "s2"]),
        ("one two three four five six seven eight nine " * 6,
         ["de", "de", "es"], ["sX", "sA", "sA"]),
        ("red green blue cyan magenta yellow black white " * 6,
         ["pt", "it"], ["sq", "sq"]),
    ]
    i = 0
    for text, langs, sources in fam:
        for lang, src in zip(langs, sources):
            rows.append({"doc_id": i, "text": text + f"tail{i}",
                         "lang": lang, "source": src,
                         "n_chars": len(text) + i})
            i += 1
    for k in range(8):  # singletons, unique text
        rows.append({"doc_id": 100 + k,
                     "text": f"solo{k} unique words here nothing "
                             f"shared with others at all {k} " * 3,
                     "lang": "en", "source": "s0",
                     "n_chars": 40 + k})
    tbl = pa.Table.from_pylist(rows)
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _duck(sql: str, fixture_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{fixture_dir}/documents.parquet'")
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ["golden_records", "canopy_assign",
                                  "cluster_density"])
def test_crafted_fixture_matches_twin(ray_session, fixture_dir, name):
    import __ray_entry__ as e

    got = _canon(e.queries()[name](fixture_dir).to_pandas())
    want = _canon(_duck(e.oracle_sql()[name], fixture_dir))
    assert len(got) == len(want) and len(got) > 0
    for c in got.columns:
        gv, wv = got[c].to_numpy(), want[c].to_numpy()
        assert (gv == wv).all(), (name, c, got, want)


def test_golden_mode_tie_is_lexicographically_smallest(
        ray_session, fixture_dir):
    import __ray_entry__ as e

    g = e.queries()["golden_records"](fixture_dir).to_pandas()
    fam0 = g[g.cluster_id == 0].iloc[0]
    # family 0: langs en/fr 2-2 tie → 'en'; sources s1/s2 2-2 → 's1'
    assert fam0.lang_mode == "en" and fam0.source_mode == "s1"
    assert fam0.n_members == 4
