"""Dirty→clean linking pipeline tests (reference es_linker lifecycle,
SURVEY.md §3.3) + threshold learner (G2) + auto-label (J7)."""

import numpy as np
import pytest

from merge_machine_ray.fixtures.dirty_clean import (
    CERTAIN_KEY,
    MATCH_COLS,
    ref_table,
    source_table,
)
from merge_machine_ray.pipelines.linking import (
    LinkParams,
    link_datasets,
)
from merge_machine_ray.state.learner import auto_label, learn_threshold

N_REF = 300
N_SRC = 200


@pytest.fixture(scope="module")
def tables():
    ref = ref_table(N_REF)
    src = source_table(N_REF, N_SRC)
    truth = src["_ref_idx"].to_pylist()
    src = src.drop_columns(["_ref_idx"])
    return src, ref, truth


def test_auto_label_key_join(tables):
    src, ref, truth = tables
    labels = auto_label(src.to_pylist(), ref.to_pylist(),
                        CERTAIN_KEY["source"], CERTAIN_KEY["ref"])
    assert len(labels) > N_SRC * 0.4
    for si, rj, y in labels:
        assert y and truth[si] == rj  # key join agrees with planted truth


def test_learn_threshold_shapes():
    rng = np.random.RandomState(0)
    pos = 0.7 + 0.2 * rng.rand(50)
    neg = 0.1 + 0.3 * rng.rand(200)
    scores = np.concatenate([pos, neg])
    labels = np.array([True] * 50 + [False] * 200)
    th, p, r = learn_threshold(scores, labels)
    assert th is not None and 0.3 < th < 0.75
    assert p >= 0.95 and r >= 0.3
    # degenerate: too few observations
    assert learn_threshold([0.5], [True])[0] is None


def test_link_end_to_end(ray_session, tables):
    import ray.data as rd

    src, ref, truth = tables
    params = LinkParams.default_for(MATCH_COLS)
    # exact labelled pair injection (J5): label source row 0 by hand
    src_rows = src.to_pylist()
    params.exact_pairs = []

    out = link_datasets(
        rd.from_arrow(src), rd.from_arrow(ref), MATCH_COLS, params,
        source_id_col="id_row", ref_id_col=None,
        ref_keep_cols=["numero_uai", "denomination", "localite"])
    df = out.to_pandas()
    assert len(df) == N_SRC  # output length conservation (es_match.py:397)
    for c in ("__IS_MATCH", "__ID_REF", "__ID_QUERY", "__SCORE", "__THRESH",
              "__CONFIDENCE", "__SOURCE_GROUP", "numero_uai__REF",
              "denomination__REF"):
        assert c in df.columns, c

    # quality: among rows flagged as matches, the linked ref row should
    # be the planted one (measured by numero_uai equality)
    ref_rows = ref.to_pylist()
    want_uai = {str(i): ref_rows[j]["numero_uai"]
                for i, j in enumerate(truth)}
    matched = df[df["__IS_MATCH"]]
    assert len(matched) > N_SRC * 0.5, f"only {len(matched)} matches"
    correct = sum(want_uai[r.id_row] == r.numero_uai__REF
                  for r in matched.itertuples())
    precision = correct / len(matched)
    assert precision > 0.9, f"linking precision {precision:.3f}"


def test_link_light_mode_matches_carry(ray_session, tables):
    """attach='light' (24-byte band rows + pair dedup + feature joins —
    the 100 TB shuffle diet) must produce the same links as carry."""
    import ray.data as rd

    src, ref, truth = tables
    params = LinkParams.default_for(MATCH_COLS)
    kw = dict(source_id_col="id_row", ref_keep_cols=["numero_uai"])
    carry = link_datasets(rd.from_arrow(src), rd.from_arrow(ref), MATCH_COLS,
                          params, attach="carry", **kw).to_pandas()
    light = link_datasets(rd.from_arrow(src), rd.from_arrow(ref), MATCH_COLS,
                          params, attach="light", **kw).to_pandas()
    c = carry.sort_values("id_row").reset_index(drop=True)
    l = light.sort_values("id_row").reset_index(drop=True)
    assert len(c) == len(l) == N_SRC
    assert (c["__IS_MATCH"] == l["__IS_MATCH"]).all()
    m = c["__IS_MATCH"]
    assert (c.loc[m, "__ID_REF"].values == l.loc[m, "__ID_REF"].values).all()
    assert (c.loc[m, "numero_uai__REF"].values
            == l.loc[m, "numero_uai__REF"].values).all()


def test_link_fused_matches_staged(ray_session, tables, monkeypatch):
    """The fused light path (pair dedup + probe + score + select in one
    src-key-bucketed task) must match the staged path that runs above
    the feature broadcast limit (dedupe_pairs → _attach_side → score →
    re-bucket selection)."""
    import ray.data as rd

    from merge_machine_ray.stages import blocking

    src, ref, truth = tables
    params = LinkParams.default_for(MATCH_COLS)
    kw = dict(source_id_col="id_row", ref_keep_cols=["numero_uai"],
              attach="light")
    fused = link_datasets(rd.from_arrow(src), rd.from_arrow(ref),
                          MATCH_COLS, params, **kw).to_pandas()
    # 0-byte broadcast budget forces the staged (100 TB attach) branch
    monkeypatch.setattr(blocking, "BROADCAST_FEATURES_LIMIT", 0)
    staged = link_datasets(rd.from_arrow(src), rd.from_arrow(ref),
                           MATCH_COLS, params, **kw).to_pandas()
    f = fused.sort_values("id_row").reset_index(drop=True)
    s = staged.sort_values("id_row").reset_index(drop=True)
    assert len(f) == len(s) == N_SRC
    assert (f["__IS_MATCH"] == s["__IS_MATCH"]).all()
    m = f["__IS_MATCH"]
    assert (f.loc[m, "__ID_REF"].values == s.loc[m, "__ID_REF"].values).all()
    np.testing.assert_allclose(f.loc[m, "__SCORE"].values,
                               s.loc[m, "__SCORE"].values, rtol=1e-12)


def test_link_params_json_roundtrip(tmp_path):
    params = LinkParams.default_for(MATCH_COLS)
    params.exact_pairs = [(1, 2)]
    p = tmp_path / "params.json"
    params.to_json(str(p))
    back = LinkParams.from_json(str(p))
    assert len(back.queries) == len(params.queries)
    assert back.queries[0].thresh == params.queries[0].thresh
    assert back.queries[0].clauses[0].analyzer == \
        params.queries[0].clauses[0].analyzer
    assert back.exact_pairs == [(1, 2)]


def test_must_not_filters(ray_session, tables):
    import ray.data as rd

    from merge_machine_ray.pipelines.linking import (
        LinkParams,
        apply_must_filters,
        link_datasets,
    )

    src, ref, truth = tables
    # must_not: exclude every ref row whose denomination contains 'lycée'
    filtered = apply_must_filters(
        rd.from_arrow(ref), {}, {"denomination": ["lycée"]}).take_all()
    assert all("lycee" not in r["denomination"].lower()
               .replace("é", "e") for r in filtered)
    n_no_lycee = len(filtered)
    assert 0 < n_no_lycee < ref.num_rows

    # must: keep only 'paris' rows
    kept = apply_must_filters(
        rd.from_arrow(ref), {"localite": ["Paris"]}, {}).take_all()
    assert kept and all(r["localite"] == "paris" for r in kept)

    # end-to-end: linking with a must filter only links into the subset
    params = LinkParams.default_for(MATCH_COLS)
    params.must = {"localite": ["paris"]}
    out = link_datasets(rd.from_arrow(src), rd.from_arrow(ref), MATCH_COLS,
                        params, source_id_col="id_row",
                        ref_keep_cols=["localite"]).to_pandas()
    linked = out[out["__IS_MATCH"]]
    assert (linked["localite__REF"] == "paris").all()

    # JSON round-trip keeps the filters
    back = LinkParams.from_json(params.to_json())
    assert back.must == {"localite": ["paris"]}


def test_source_dedup_reinflation(ray_session, tables):
    """D1: rows duplicated on match columns are searched once and all
    reinflated with the same link (__SOURCE_GROUP shared)."""
    import pyarrow as pa
    import ray.data as rd

    src, ref, truth = tables
    rows = src.to_pylist()[:30]
    # duplicate the first 10 rows with different id_row values
    dupes = [dict(r, id_row=f"dup-{i}") for i, r in enumerate(rows[:10])]
    big = pa.Table.from_pylist(rows + dupes)
    params = LinkParams.default_for(MATCH_COLS)
    out = link_datasets(rd.from_arrow(big), rd.from_arrow(ref), MATCH_COLS,
                        params, source_id_col="id_row",
                        ref_keep_cols=["numero_uai"]).to_pandas()
    assert len(out) == 40  # length conservation incl. duplicates
    by_id = out.set_index("id_row")
    for i, r in enumerate(rows[:10]):
        a = by_id.loc[r["id_row"]]
        b = by_id.loc[f"dup-{i}"]
        assert a["__SOURCE_GROUP"] == b["__SOURCE_GROUP"]
        assert (a["__ID_REF"] == b["__ID_REF"]) or (
            pd_isna(a["__ID_REF"]) and pd_isna(b["__ID_REF"]))


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_source_group_keys_match_rowwise(ray_session):
    """Vectorized D1 group keys == the row-wise json+blake2b form,
    including null values (json null) vs missing columns ('')."""
    import json
    import random

    import numpy as np
    import pyarrow as pa

    from merge_machine_ray.functions.hashing import stable_hash64
    from merge_machine_ray.pipelines.linking import (
        _to_i64,
        source_group_keys,
    )

    rng = random.Random(4)
    n = 1500
    vals = [None, "", "a b", "x", "école"]
    t = pa.table({
        "c1": pa.array([rng.choice(vals) for _ in range(n)], pa.string()),
        "c2": pa.array([rng.choice(vals + [f"u{i}" for i in range(5)])
                        for _ in range(n)], pa.string()),
        "num": pa.array([rng.choice([None, 1, 2, 3])
                         for _ in range(n)], pa.int64()),
    })
    cols = ["c1", "missing_col", "c2", "num"]
    got = source_group_keys(t, cols, {})
    names = set(t.column_names)
    lists = [(c, t[c].to_pylist() if c in names else None) for c in cols]
    want = np.empty(n, np.int64)
    for i in range(n):
        basis = {c: ("" if v is None else v[i]) for c, v in lists}
        want[i] = _to_i64(stable_hash64(
            json.dumps(basis, sort_keys=True, default=str)))
    assert (got == want).all()
