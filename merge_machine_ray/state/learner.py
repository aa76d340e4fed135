"""Driver-side threshold learning (SURVEY.md §2.6 G2, §2.8 D4-D6).

Re-creates the reference's interactive learning *outcome* — a scored,
priority-ordered template portfolio with per-template decision
thresholds — from a labelled pair sample, without the ES round-trips:

* :func:`learn_threshold` — the rolling precision/recall threshold
  chooser (semantics of ``merge_machine/es_labeller.py:307-417``):
  sort labelled scores descending, compute rolling precision and
  recall, shape them toward the quality targets (precision 0.95 /
  recall 0.3, the reference's ``TARGET_PRECISION``/``TARGET_RECALL``,
  ``es_labeller.py:743-744``) and take the score at the best shaped
  product, requiring a minimum number of observations.
* :func:`auto_label` — the certain-key auto-labeller (J7,
  ``es_labeller.py:1572-1661``): mint ground-truth labels by an exact
  equi-join on a declared key column pair.
* :func:`learn_params` — fit a MatchParams threshold from labels.

All of this is small-data numpy on the driver — the reference keeps the
same state driver-side too (ST3).
"""

from __future__ import annotations

import numpy as np

from merge_machine_ray.state.params import MatchParams

TARGET_PRECISION = 0.95
TARGET_RECALL = 0.3
MIN_OBSERVATIONS = 4


def _shape_precision(p: np.ndarray, t_p: float = TARGET_PRECISION) -> np.ndarray:
    """Concave utility ~1 at/above target precision, dropping fast below
    (reference ``_f_precision`` semantics: precision shortfalls are
    punished superlinearly)."""
    return np.minimum(1.0, (np.maximum(p, 1e-9) / t_p) ** 3)


def _shape_recall(r: np.ndarray, t_r: float = TARGET_RECALL) -> np.ndarray:
    """Utility saturating once recall reaches the (modest) target
    (reference ``_f_recall``: recall beyond t_r barely helps)."""
    return np.minimum(1.0, (np.maximum(r, 0.0) / t_r) ** 0.5)


def _ref_f_precision(x: np.ndarray, t_p: float) -> np.ndarray:
    """The reference's exact precision-shaping polynomial
    (``es_labeller.py:382``): ``(2·max(x−t_p,0) + min(t_p·(x/t_p)⁴,
    t_p))^1.5 / 2`` — vectorized verbatim, reference default
    t_p=0.965."""
    return (2.0 * np.maximum(x - t_p, 0.0)
            + np.minimum(t_p * (x / t_p) ** 4, t_p)) ** 1.5 / 2.0


def _ref_f_recall(x: np.ndarray, t_r: float) -> np.ndarray:
    """The reference's exact recall-shaping polynomial
    (``es_labeller.py:383``): ``max(x−t_r,0) + min(t_r·(x/t_r)⁴,
    t_r)``, reference default t_r=0.3."""
    return np.maximum(x - t_r, 0.0) + np.minimum(t_r * (x / t_r) ** 4, t_r)


def learn_threshold(scores, labels, t_p: float = TARGET_PRECISION,
                    t_r: float = TARGET_RECALL,
                    min_obs: int = MIN_OBSERVATIONS,
                    shaping: str = "engine"):
    """→ (threshold, expected_precision, expected_recall).

    scores: iterable of pair scores; labels: bool same length.
    Returns (None, 0, 0) with fewer than ``min_obs`` labelled pairs.

    ``shaping``: "engine" (default) uses the saturating power curves
    tuned for this engine's 0-1 cosine score scale; "reference" uses
    the reference's exact ``_f_precision``/``_f_recall`` polynomials
    (``es_labeller.py:382-383``, ES-score scale) verbatim for parity
    runs. Both pick the max of shaped-precision × shaped-recall over
    real (distinct-score) cuts with the min-observations floor; the
    margin-aware tie-break below applies to both.
    """
    s = np.asarray(list(scores), dtype=np.float64)
    l = np.asarray(list(labels), dtype=bool)
    if s.size < min_obs or not l.any():
        return None, 0.0, 0.0
    order = np.argsort(-s, kind="stable")
    s, l = s[order], l[order]
    ranks = np.arange(1, s.size + 1)
    cum_pos = np.cumsum(l)
    rolling_precision = cum_pos / ranks
    rolling_recall = cum_pos / max(1, int(l.sum()))
    if shaping == "reference":
        utility = _ref_f_precision(rolling_precision, t_p) * \
            _ref_f_recall(rolling_recall, t_r)
    else:
        utility = _shape_precision(rolling_precision, t_p) * \
            _shape_recall(rolling_recall, t_r)
    utility[: min_obs - 1] = -np.inf  # too few observations above cut
    # a cut is only REAL between distinct scores: a midpoint inside an
    # equal-score run re-includes the whole run at apply time, so its
    # rolling p/r never describes the kept set (degenerate case: a tail
    # of zero-scoring negatives would yield an ~0 threshold that "keeps"
    # perfect precision on history but matches everything downstream)
    real_cut = np.concatenate((s[:-1] > s[1:], [True]))
    utility[~real_cut] = -np.inf
    # among equal-utility cuts (the shaped targets saturate, so many
    # cuts tie at 1.0) take the one with the WIDEST score gap — the
    # margin is what generalizes past the labelled sample; a zero-margin
    # "deepest" cut can report perfect history precision with a ~0
    # threshold that matches everything downstream. Ties → deepest.
    cand = np.flatnonzero(utility >= utility.max() - 1e-12)
    gaps = np.concatenate((s[:-1] - s[1:], [0.0]))
    best = int(cand[np.lexsort((-cand, -gaps[cand]))[0]])
    if best == s.size - 1:
        # best cut keeps everything → threshold carries no information;
        # fall back to just below the minimum score (reference: ≈0)
        thresh = float(s[-1]) - 1e-9
    else:
        # halfway between the last kept and first dropped score
        thresh = float((s[best] + s[best + 1]) / 2.0)
    # a zero similarity means NO token overlap at all — a template must
    # never declare such a pair a match, however the labelled sample
    # shook out (an all-positive sample of zero-scoring pairs would
    # otherwise learn a match-everything threshold)
    thresh = max(thresh, 1e-9)
    kept = s >= thresh
    if not (kept & l).any():
        return None, 0.0, 0.0  # template carries no signal for matches
    tp = int((kept & l).sum())
    precision = tp / max(1, int(kept.sum()))
    recall = tp / max(1, int(l.sum()))
    return thresh, precision, recall


def auto_label(source_rows: list[dict], ref_rows: list[dict],
               source_key: str, ref_key: str) -> list[tuple[int, int, bool]]:
    """J7 certain-key auto-labelling: (source_idx, ref_idx, True) for
    exact key equality; unmatched keys yield no label (the reference
    expects ≤1 hit per key, ``es_labeller.py:1572-1661``)."""
    ref_by_key: dict[str, int] = {}
    for j, r in enumerate(ref_rows):
        k = str(r.get(ref_key, "")).strip()
        if k:
            ref_by_key.setdefault(k, j)
    out = []
    for i, srow in enumerate(source_rows):
        k = str(srow.get(source_key, "")).strip()
        if k and k in ref_by_key:
            out.append((i, ref_by_key[k], True))
    return out


def learn_params(scores, labels, base: MatchParams | None = None) -> MatchParams:
    """Fit the decision threshold of a MatchParams from labelled pair
    scores (weights stay as configured; the reference learns boosts via
    the template population which we expose as weight config)."""
    base = MatchParams.from_any(base)
    thresh, p, r = learn_threshold(scores, labels)
    if thresh is not None:
        base.threshold = thresh
        base.expected_precision = p
        base.expected_recall = r
    return base
