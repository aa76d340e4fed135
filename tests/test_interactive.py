"""Scripted interactive-labelling session (reference ConsoleLabeller,
es_labeller.py:1179-1243/1738-1867/2713-2978): candidate proposal from
the distributed blocking stage, y/n/u/f/p protocol, mid-session JSON
checkpoint, and the learned params reproducing high-precision linking
on held-out rows."""

import pytest

from merge_machine_ray.fixtures.dirty_clean import (
    MATCH_COLS,
    ref_table,
    source_table,
)
from merge_machine_ray.state.labeller import PortfolioLearner, generate_templates

N_REF = 200
N_SRC = 120


N_HOLD = 60


@pytest.fixture(scope="module")
def session_data(ray_session):
    ref = ref_table(N_REF)
    # rows are seeded per-index, so a longer table extends the session
    # rows with fresh held-out ones
    all_src = source_table(N_REF, N_SRC + N_HOLD)
    truth = all_src["_ref_idx"].to_pylist()
    all_rows = all_src.drop_columns(["_ref_idx"]).to_pylist()
    return all_rows, ref.to_pylist(), truth


def test_interactive_session_learns_linkable_params(ray_session, session_data,
                                                    tmp_path):
    import ray.data as rd

    from merge_machine_ray.state.interactive import (
        InteractiveLabeller,
        propose_candidates,
    )

    all_rows, ref_rows, truth = session_data
    src_rows = all_rows[:N_SRC]
    cands = propose_candidates(src_rows, ref_rows, MATCH_COLS)
    # blocking recall: the planted ref should be among proposals for
    # most sources (it shares most tokens)
    hit = sum(truth[si] in cands.get(si, []) for si in range(N_SRC))
    assert hit > N_SRC * 0.7, f"proposal recall {hit}/{N_SRC}"

    learner = PortfolioLearner(
        MATCH_COLS, ref_rows,
        templates=generate_templates(MATCH_COLS, max_templates=40))
    lab = InteractiveLabeller(src_rows, ref_rows, MATCH_COLS,
                              candidates=cands, learner=learner,
                              refit_every=20)

    # exercise u (skip) and p (undo) once each before the main session
    first = lab.current_pair()
    assert first is not None
    lab.update("u")
    lab.update("p")                      # undo the skip
    assert lab.current_pair()[:2] == first[:2]

    answers = 0
    while answers < 150:
        cur = lab.current_pair()
        if cur is None:
            break
        si, rk, _, _ = cur
        lab.update("y" if truth[si] == rk else "n")
        answers += 1
        if answers == 40:
            # mid-session kill: checkpoint + resume must continue
            ck = str(tmp_path / "labeller.json")
            lab.to_json(ck)
            lab = InteractiveLabeller.from_json(ck, src_rows, ref_rows,
                                                MATCH_COLS)
    n_pos = sum(1 for _, _, y in lab.learner.history if y)
    assert n_pos >= 20, f"only {n_pos} positive labels"

    # StatsLabeller-parity ledger: one step per finished source row,
    # per-template {precision, recall, utility, thresh, position}
    # snapshots, pruned to templates seen in the last 5 steps, and
    # restored across the mid-session checkpoint above
    st = lab.stats
    assert st.current_step >= 20
    assert len(st.query_order) == st.current_step
    ranked_steps = [o for o in st.query_order if o]
    assert ranked_steps, "no step recorded a ranked portfolio"
    tid = ranked_steps[-1][0]
    summary = st.query_stats[tid][str(len(st.query_order) - 1)]
    assert {"precision", "recall", "utility", "thresh",
            "position"} <= set(summary)
    assert summary["position"] == 0
    assert tid in st.query_definitions
    recent = set()
    for o in st.query_order[-5:]:
        recent.update(o)
    assert set(st.query_stats) <= recent  # _cleanup(5) pruning held

    params = lab.export_params()
    assert params.queries, "empty learned portfolio"
    assert params.exact_pairs   # confirmed matches exported as J5 pairs

    # held-out quality: link FRESH dirty rows with the LEARNED params
    import pyarrow as pa

    from merge_machine_ray.pipelines.linking import link_datasets

    hold_rows = all_rows[N_SRC:]
    params.exact_pairs = []     # judge the learned templates alone
    out = link_datasets(
        rd.from_arrow(pa.Table.from_pylist(hold_rows)),
        rd.from_arrow(pa.Table.from_pylist(
            [dict(r, __row_idx=i) for i, r in enumerate(ref_rows)])),
        MATCH_COLS, params, source_id_col="id_row", ref_id_col="__row_idx",
        ref_keep_cols=["numero_uai"]).to_pandas()
    assert len(out) == N_HOLD
    matched = out[out["__IS_MATCH"]]
    assert len(matched) >= 20, f"only {len(matched)} matches"
    correct = sum(int(ref_id) == truth[int(row_id)]
                  for ref_id, row_id in zip(matched["__ID_REF"],
                                            matched["id_row"]))
    precision = correct / len(matched)
    assert precision > 0.85, f"learned-params precision {precision:.3f}"


def test_expansion_milestones_fire_once(ray_session, session_data, tmp_path):
    """D6 milestone schedule (es_labeller.py:2092-2141): filter_by_core
    at 10 positives, multiply_by_core at 11 — each at most once, and the
    fired set survives a checkpoint round-trip."""
    from merge_machine_ray.state.interactive import (
        EXPAND_BY_CORE_AT,
        FILTER_BY_CORE_AT,
        InteractiveLabeller,
        propose_candidates,
    )

    all_rows, ref_rows, truth = session_data
    src_rows = all_rows[:N_SRC]
    cands = propose_candidates(src_rows, ref_rows, MATCH_COLS)
    learner = PortfolioLearner(
        MATCH_COLS, ref_rows,
        templates=generate_templates(MATCH_COLS, max_templates=40))
    lab = InteractiveLabeller(src_rows, ref_rows, MATCH_COLS,
                              candidates=cands, learner=learner,
                              refit_every=5)
    assert 11 in EXPAND_BY_CORE_AT and 10 in FILTER_BY_CORE_AT

    n_before = None
    for _ in range(400):
        cur = lab.current_pair()
        if cur is None or lab._nprl() >= 12:
            break
        si, rk, _, _ = cur
        if lab._nprl() == 10 and n_before is None:
            n_before = len(lab.learner.templates)
        lab.update("y" if truth[si] == rk else "n")
    assert lab._nprl() >= 12
    assert "filter:10" in lab.fired_milestones
    assert "expand:11" in lab.fired_milestones
    # expansion happened on a filtered population and added variants
    assert n_before is not None
    assert len(lab.learner.templates) > 0
    grown = len(lab.learner.templates)

    # firing is once-only: replaying the same counts cannot re-expand
    lab._apply_milestones()
    assert len(lab.learner.templates) == grown

    ck = str(tmp_path / "milestones.json")
    lab.to_json(ck)
    back = InteractiveLabeller.from_json(ck, src_rows, ref_rows, MATCH_COLS)
    assert back.fired_milestones == lab.fired_milestones
