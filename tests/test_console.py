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
