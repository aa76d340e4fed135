"""Scripted console-labeller session (reference ConsoleLabeller REPL,
es_labeller.py:2713-2978): tab switching, y/n answers through the
prompt loop, filter updates with the ``must / col / [...]`` syntax,
invalid-input retries, and params export carrying the filters."""

import io

import pytest

from merge_machine_ray.fixtures.dirty_clean import (
    MATCH_COLS,
    ref_table,
    source_table,
)
from merge_machine_ray.state.console import ConsoleLabeller
from merge_machine_ray.state.interactive import InteractiveLabeller

N_REF = 80
N_SRC = 30


@pytest.fixture(scope="module")
def console_session(ray_session):
    ref = ref_table(N_REF)
    src = source_table(N_REF, N_SRC)
    truth = src["_ref_idx"].to_pylist()
    src_rows = src.drop_columns(["_ref_idx"]).to_pylist()
    return src_rows, ref.to_pylist(), truth


def _run_script(lab, lines):
    out = io.StringIO()
    console = ConsoleLabeller(lab, stdin=io.StringIO("\n".join(lines) + "\n"),
                              stdout=out)
    console.run()
    return console, out.getvalue()


def test_console_scripted_session(console_session):
    src_rows, ref_rows, truth = console_session
    lab = InteractiveLabeller(src_rows, ref_rows, MATCH_COLS)

    # answer correctly for the first few pairs, then quit
    answers = []
    probe = InteractiveLabeller(src_rows, ref_rows, MATCH_COLS,
                                candidates=lab.candidates)
    for _ in range(12):
        cur = probe.current_pair()
        if cur is None:
            break
        si, rk, _, _ = cur
        ans = "y" if truth[si] == rk else "n"
        answers.append(ans)
        probe.update(ans)

    script = ["h", "=menu", "=labeller"] + answers + ["bogus!", "quit"]
    console, rendered = _run_script(lab, script)
    assert console.finished
    # the console routed labels into the same session state the bare
    # protocol produced
    assert lab.matched == probe.matched
    assert "*** In tab: labeller ***" in rendered
    assert "*** In tab: menu ***" in rendered
    assert "INVALID ANSWER" in rendered
    assert "(S):" in rendered and "(R):" in rendered


def test_console_filter_tab(console_session):
    src_rows, ref_rows, truth = console_session
    lab = InteractiveLabeller(src_rows, ref_rows, MATCH_COLS)
    n_before = sum(len(v) for v in lab.candidates.values())

    script = [
        "=filter",
        'must_not_filters / denomination / ["lycée"]',
        "must_filters / localite / paris",
        "=labeller",
        "quit",
    ]
    console, rendered = _run_script(lab, script)
    assert console.must_not_filters == {"denomination": ["lycée"]}
    assert console.must_filters == {"localite": ["paris"]}
    # candidate pools pruned to the filtered referential subset
    n_after = sum(len(v) for v in lab.candidates.values())
    assert n_after < n_before
    for cands in lab.candidates.values():
        for rk in cands:
            assert ref_rows[rk]["localite"] == "paris"

    params = console.export_params()
    assert params.must == {"localite": ["paris"]}
    assert params.must_not == {"denomination": ["lycée"]}


def test_console_too_many_invalid_inputs(console_session):
    src_rows, ref_rows, _ = console_session
    lab = InteractiveLabeller(src_rows, ref_rows, MATCH_COLS)
    console = ConsoleLabeller(
        lab, stdin=io.StringIO("\n".join(["nope"] * 12) + "\n"),
        stdout=io.StringIO())
    with pytest.raises(RuntimeError):
        console.run()


def test_console_label_learn_export_link_cli_e2e(ray_session,
                                                 console_session,
                                                 tmp_path):
    """The full reference lifecycle in one test (r4 VERDICT #8,
    S6/S7/G2 tied to the batch path): a scripted console session
    labels pairs → learns a portfolio → exports a params JSON whose
    shape mirrors examples/data_1/learned_settings.json → the
    ``python -m merge_machine_ray link`` CLI consumes that file over
    parquet inputs and produces correct links."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from merge_machine_ray.__main__ import main

    src_rows, ref_rows, truth = console_session

    # --- scripted console session: answer every proposal from truth
    lab = InteractiveLabeller(src_rows, ref_rows, MATCH_COLS)
    probe = InteractiveLabeller(src_rows, ref_rows, MATCH_COLS,
                                candidates=lab.candidates)
    answers = []
    while True:
        cur = probe.current_pair()
        if cur is None:
            break
        si, rk, _, _ = cur
        ans = "y" if truth[si] == rk else "n"
        answers.append(ans)
        probe.update(ans)
    console, _ = _run_script(lab, answers + ["quit"])
    assert console.finished

    # --- export: the golden learned_settings.json shape (reference
    # examples/data_1: query_template entries with analyzer + boost,
    # must / must_not dicts, a positive learned thresh, exact_pairs)
    params = console.export_params()
    pjson = tmp_path / "learned_settings.json"
    params.to_json(str(pjson))
    d = json.loads(pjson.read_text())
    assert {"queries", "must", "must_not",
            "exact_pairs"} <= set(d)
    assert d["queries"], "no learned query exported"
    for q in d["queries"]:
        assert q["thresh"] > 0
        for c in q["clauses"]:
            assert c["analyzer"] and c["boost"] > 0
    assert isinstance(d["must"], dict) and isinstance(d["must_not"], dict)
    assert d["exact_pairs"], "session matches should export as J5 pairs"

    # --- drive the CLI on parquet inputs with the exported params
    src_dir, ref_dir, out_dir = (tmp_path / "src", tmp_path / "ref",
                                 tmp_path / "out")
    src_dir.mkdir(), ref_dir.mkdir()
    pq.write_table(pa.Table.from_pylist(src_rows),
                   src_dir / "part0.parquet")
    pq.write_table(pa.Table.from_pylist(ref_rows),
                   ref_dir / "part0.parquet")
    rc = main(["link", "--source", str(src_dir), "--ref", str(ref_dir),
               "--match-cols", json.dumps(MATCH_COLS),
               "--params", str(pjson), "--out", str(out_dir),
               "--source-id", "id_row", "--ref-keep", "numero_uai"])
    assert rc == 0

    out = pq.read_table(out_dir).to_pandas()
    assert len(out) == len(src_rows)  # row-count conservation
    assert {"__IS_MATCH", "__SCORE", "numero_uai__REF"} <= set(out.columns)
    matched = out[out["__IS_MATCH"]]
    assert len(matched) > 0
    want = {r["id_row"]: ref_rows[t]["numero_uai"]
            for r, t in zip(src_rows, truth)}
    correct = sum(want[r.id_row] == r.numero_uai__REF
                  for r in matched.itertuples())
    assert correct / len(matched) > 0.85
