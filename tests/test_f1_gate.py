"""The pairwise-F1 ≥ 0.99 gate (BASELINE.json north_rule).

Labelled pairs are sampled AT THE PIPELINE'S BLOCKING KEYS (every
candidate pair the blocking stage produces on the small corpus), with
ground truth = planted entity identity from the fixture generator. The
Ray pipeline's match decisions must reach pairwise F1 ≥ 0.99 against
those labels — the analog of the reference's labelled-pair conformance
via the auto-label key join (``merge_machine/es_labeller.py:1572-1661``).
"""

import numpy as np
import pytest

from merge_machine_ray.fixtures.pages import pages_table
from merge_machine_ray.functions.hashing import stable_hash64
from merge_machine_ray.state.params import MatchParams

N_ENTITIES = 1200


def _to_i64(u):
    return u - (1 << 64) if u >= (1 << 63) else u


@pytest.fixture(scope="module")
def small_corpus():
    t = pages_table(0, N_ENTITIES, with_entity=True)
    ent = {_to_i64(stable_hash64(u)): e
           for u, e in zip(t["url"].to_pylist(), t["entity_id"].to_pylist())}
    return t.select(["url", "warc_ts", "html", "text", "lang"]), ent


def test_pairwise_f1_gate(ray_session, small_corpus):
    import ray.data as rd

    from merge_machine_ray.pipelines.entity_resolution import score_candidate_pairs

    table, ent = small_corpus
    params = MatchParams()
    scored, _ = score_candidate_pairs(rd.from_arrow(table), params)
    decisions: dict[tuple[int, int], bool] = {}
    scores: dict[tuple[int, int], float] = {}
    for b in scored.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, bb, m, s in zip(b["a"].to_pylist(), b["b"].to_pylist(),
                               b["is_match"].to_pylist(), b["score"].to_pylist()):
            decisions[(a, bb)] = bool(m)
            scores[(a, bb)] = s
    assert len(decisions) > 1000, "blocking produced too few labelled pairs"

    tp = fp = fn = tn = 0
    for (a, b), pred in decisions.items():
        truth = ent[a] == ent[b]
        if pred and truth:
            tp += 1
        elif pred:
            fp += 1
        elif truth:
            fn += 1
        else:
            tn += 1
    precision = tp / max(1, tp + fp)
    recall = tp / max(1, tp + fn)
    f1 = 2 * precision * recall / max(1e-9, precision + recall)
    assert f1 >= 0.99, (
        f"F1={f1:.4f} P={precision:.4f} R={recall:.4f} "
        f"(tp={tp} fp={fp} fn={fn} tn={tn})")

    # decision margin: threshold sits clear of both classes' tails
    pos = np.array([s for k, s in scores.items() if ent[k[0]] == ent[k[1]]])
    neg = np.array([s for k, s in scores.items() if ent[k[0]] != ent[k[1]]])
    assert np.quantile(pos, 0.005) > params.threshold
    assert np.quantile(neg, 0.995) < params.threshold
