"""Phonetic + edit-distance kernels: the vectorized batch forms must be
BIT-identical to their scalar references (repo invariant for all
vectorized twins), and both must agree with the generated DuckDB
expressions the oracle twins use."""

import numpy as np
import pyarrow as pa

from merge_machine_ray.functions.phonetic import (
    soundex,
    soundex_batch,
    soundex_sql_expr,
)
from merge_machine_ray.functions.similarity import (
    levenshtein,
    levenshtein_batch,
)

_CLASSIC = [("Robert", "R163"), ("Rupert", "R163"), ("Ashcraft", "A226"),
            ("Ashcroft", "A226"), ("Tymczak", "T522"), ("Pfister", "P236"),
            ("Honeyman", "H555"), ("Smith", "S530"), ("Smyth", "S530")]


def test_soundex_classic_vectors():
    for name, code in _CLASSIC:
        assert soundex(name) == code, name


def _rand_names(rng, n):
    alpha = "abcdefghijklmnopqrstuvwxyzAEIOU'# 19-"
    return ["".join(rng.choice(list(alpha))
                    for _ in range(rng.randint(0, 14)))
            for _ in range(n)]


def test_soundex_batch_matches_scalar_and_sql():
    import duckdb
    import random

    rng = random.Random(17)
    names = ([n for n, _ in _CLASSIC] + ["", " ", "#123", "aaaa", "hwhw",
                                         "bpbpbpbpbpbpbpbp", None]
             + _rand_names(rng, 300))
    got = soundex_batch(pa.array(names, pa.string())).to_pylist()
    want = [soundex(n or "") for n in names]
    assert got == want
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, n VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(enumerate(names)))
    expr = soundex_sql_expr("coalesce(n, '')")
    duck = [r[0] for r in con.execute(
        f"SELECT {expr} FROM t ORDER BY i").fetchall()]
    assert duck == want


def test_levenshtein_batch_matches_scalar_and_duckdb():
    import duckdb
    import random

    rng = random.Random(23)
    xs = ["".join(rng.choice("abcde ") for _ in range(rng.randint(0, 16)))
          for _ in range(400)]
    ys = ["".join(rng.choice("abcdxy") for _ in range(rng.randint(0, 16)))
          for _ in range(400)]
    got = levenshtein_batch(xs, ys)
    want = [levenshtein(a, b) for a, b in zip(xs, ys)]
    assert got.tolist() == want
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, a VARCHAR, b VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)",
                    [(i, a, b) for i, (a, b) in
                     enumerate(zip(xs[:150], ys[:150]))])
    duck = [r[0] for r in con.execute(
        "SELECT levenshtein(a, b) FROM t ORDER BY i").fetchall()]
    assert duck == want[:150]


def test_levenshtein_edge_cases():
    assert levenshtein_batch(["", ""], ["", "abc"]).tolist() == [0, 3]
    assert levenshtein_batch(["abc"], [""]).tolist() == [3]
    assert levenshtein_batch(["kitten"], ["sitting"]).tolist() == [3]


def test_soundex_analyzer_links_phonetic_misspellings(ray_session):
    """End-to-end: a linking template over the new 'soundex' analyzer
    matches phonetically-equal but differently-spelled names that a
    token-equality analyzer cannot."""
    import pyarrow as pa
    import ray.data as rd

    from merge_machine_ray.functions.tokenize import ANALYZERS
    from merge_machine_ray.pipelines.linking import (
        LinkParams,
        link_datasets,
    )

    assert ANALYZERS["soundex"]("Robert Ashcraft") == ["R163", "A226"]

    ref = pa.table({
        "ref_id": pa.array([0, 1, 2], pa.int64()),
        "name": pa.array(["robert jones mill", "ashcraft trading house",
                          "tymczak and sons"]),
    })
    src = pa.table({
        "id_row": pa.array([10, 11, 12], pa.int64()),
        "name": pa.array(["rupert jones mill", "ashcroft trading house",
                          "tumshak and sons"]),  # phonetic twins
    })
    params = LinkParams.default_for(
        [{"source": "name", "ref": "name"}],
        analyzers=("soundex",), threshs=(0.6,))
    out = link_datasets(rd.from_arrow(src), rd.from_arrow(ref),
                        [{"source": "name", "ref": "name"}], params,
                        source_id_col="id_row",
                        ref_keep_cols=["ref_id"]).to_pandas()
    matched = out[out["__IS_MATCH"]]
    # ref keep-cols come back as strings (reference all-string CSV
    # semantics, S1)
    got = {int(k): int(v)
           for k, v in zip(matched["id_row"], matched["ref_id__REF"])}
    assert got == {10: 0, 11: 1, 12: 2}
