"""Portfolio learner tests: template generation (D4/D5), per-template
threshold learning (G2), greedy cover (G5), majority vote (G4), and the
full auto-label → learn → link loop (the reference example lifecycle)."""

import pytest

from merge_machine_ray.fixtures.dirty_clean import (
    CERTAIN_KEY,
    MATCH_COLS,
    ref_table,
    source_table,
)
from merge_machine_ray.state.labeller import (
    PortfolioLearner,
    generate_templates,
)
from merge_machine_ray.state.learner import auto_label


def test_generate_templates():
    qs = generate_templates(MATCH_COLS, max_clauses=2)
    assert len(qs) > 10
    sizes = {len(q.clauses) for q in qs}
    assert sizes == {1, 2}
    analyzers = {c.analyzer for q in qs for c in q.clauses}
    assert "special_keyword" in analyzers and "n_grams" in analyzers


@pytest.fixture(scope="module")
def learned():
    import random

    ref = ref_table(150).to_pylist()
    src = source_table(150, 120).to_pylist()
    truth = [r.pop("_ref_idx") for r in src]
    labels = auto_label(src, ref, CERTAIN_KEY["source"], CERTAIN_KEY["ref"])
    learner = PortfolioLearner(MATCH_COLS, ref,
                               templates=generate_templates(
                                   MATCH_COLS, max_clauses=2,
                                   max_templates=40))
    rng = random.Random(7)
    for si, rj, y in labels[:40]:
        learner.add_labelled_pair(src[si], ref[rj], True)
        # hard negative: a different ref row
        wrong = rng.randrange(len(ref))
        if wrong != rj:
            learner.add_labelled_pair(src[si], ref[wrong], False)
    return learner, src, ref, truth


def test_evaluate_and_portfolio(learned):
    learner, src, ref, truth = learned
    results = learner.evaluate_templates()
    assert results, "no template learned a threshold"
    assert results[0]["precision"] >= 0.9
    portfolio = learner.greedy_portfolio()
    assert 1 <= len(portfolio) <= 3

    params = learner.export_params()
    assert params.queries
    assert all(q.thresh > 0 for q in params.queries)


def test_majority_vote(learned):
    learner, src, ref, truth = learned
    # a true pair should win the vote; a random wrong pair should lose
    assert learner.majority_vote(src[0], ref[truth[0]])
    wrong = ref[(truth[0] + 50) % len(ref)]
    assert not learner.majority_vote(src[0], wrong)


def test_learned_params_drive_linker(ray_session, learned):
    import ray.data as rd
    import pyarrow as pa

    from merge_machine_ray.pipelines.linking import link_datasets

    learner, src, ref, truth = learned
    params = learner.export_params()
    out = link_datasets(
        rd.from_arrow(pa.Table.from_pylist(src)),
        rd.from_arrow(pa.Table.from_pylist(ref)),
        MATCH_COLS, params, source_id_col="id_row",
        ref_keep_cols=["numero_uai"]).to_pandas()
    matched = out[out["__IS_MATCH"]]
    assert len(matched) > 0
    want = {str(i): ref[j]["numero_uai"] for i, j in enumerate(truth)}
    correct = sum(want[r.id_row] == r.numero_uai__REF
                  for r in matched.itertuples())
    assert correct / len(matched) > 0.85


def test_expansion_ops_and_checkpoint(learned, tmp_path):
    learner, src, ref, truth = learned
    n0 = len(learner.templates)
    stats = learner.core_token_stats()
    assert stats and all(0 <= v["score"] <= 1 for v in stats.values())

    learner.multiply_by_boost(top_k=3)
    assert len(learner.templates) > n0
    n1 = len(learner.templates)
    learner.multiply_by_core(top_k=3, core_min_score=0.5)
    assert len(learner.templates) >= n1

    # S6 checkpoint round-trip
    p = str(tmp_path / "labeller.json")
    learner.to_json(p)
    from merge_machine_ray.state.labeller import PortfolioLearner

    back = PortfolioLearner.from_json(p, ref)
    assert len(back.templates) == len(learner.templates)
    assert len(back.history) == len(learner.history)
    r1 = back.evaluate_templates()
    assert r1

    # K3 explore/exploit interleave covers all items exactly once
    items = list("abcdef")
    out = PortfolioLearner.sorta_sort(items, [1, 5, 3, 2, 6, 4])
    assert sorted(out) == sorted(items)

    # D6 filter_by_core drops templates with dead cores
    before = len(back.templates)
    back.filter_by_core(core_min_score=-1.0)  # nothing scores <= -1
    assert len(back.templates) == before


def test_reference_shaping_polynomials_exact():
    """shaping='reference' must evaluate the reference's lambdas
    (es_labeller.py:382-383) bit-for-bit."""
    import numpy as np

    from merge_machine_ray.state.learner import (
        _ref_f_precision,
        _ref_f_recall,
        learn_threshold,
    )

    t_p, t_r = 0.965, 0.3
    f_p = lambda x: (2 * max(x - t_p, 0) + min(t_p * (x / t_p) ** 4, t_p)) ** 1.5 / 2
    f_r = lambda x: max(x - t_r, 0) + min(t_r * (x / t_r) ** 4, t_r)
    xs = np.linspace(0.001, 1.0, 97)
    # rtol: numpy's ARRAY pow uses a SIMD codepath that may differ from
    # scalar pow by 1 ulp — formula parity, not bit parity, is the claim
    np.testing.assert_allclose(
        _ref_f_precision(xs, t_p),
        np.fromiter((f_p(x) for x in xs), float), rtol=1e-14)
    np.testing.assert_allclose(
        _ref_f_recall(xs, t_r),
        np.fromiter((f_r(x) for x in xs), float), rtol=1e-14)

    # a clean separation: both shapings find a cut between 0.8 and 0.3
    scores = [0.95, 0.9, 0.85, 0.8, 0.3, 0.25, 0.2, 0.1]
    labels = [True, True, True, True, False, False, False, False]
    for shaping in ("engine", "reference"):
        th, p, r = learn_threshold(scores, labels, t_p=t_p, t_r=t_r,
                                   shaping=shaping)
        assert th is not None and 0.3 < th < 0.8, (shaping, th)
        assert p == 1.0 and r == 1.0
