"""Driver-side template-portfolio learning — the non-interactive
re-creation of the reference labeller's outcome (SURVEY.md §2.8 D4-D6,
§2.6 G2-G5; reference ``merge_machine/es_labeller.py``).

The reference learns, via interactive y/n labelling against ES:
an ordered portfolio of query templates with per-template thresholds
and expected precision/recall. Here the same end state is produced
from a labelled-pair sample (minted by the J7 certain-key auto-label
join or supplied by the user):

* :func:`generate_templates` — D4 search space: clause subsets ×
  analyzers (≥1 clause, sizes ≤ max_clauses), with D5 analyzer
  dominance ordering (exact ≻ french ≻ standard ≻ n_grams).
* :class:`PortfolioLearner` — scores every template on the labelled
  pairs (same per-clause tf·idf cosine math as the distributed
  LinkScorer), learns per-template thresholds (G2), ranks templates,
  and greedily picks a portfolio that maximizes marginal recall at the
  precision target (G5 greedy query cover). Majority voting across the
  top templates (G4) is exposed for pair adjudication.

Everything here is small-data numpy/python on the driver, matching the
reference's in-driver learning state (ST3). Export format =
:class:`~merge_machine_ray.pipelines.linking.LinkParams` JSON.
"""

from __future__ import annotations

import itertools
import math
from collections import Counter

import numpy as np

from merge_machine_ray.functions.hashing import crc_hash64
from merge_machine_ray.functions.tokenize import ANALYZERS
from merge_machine_ray.pipelines.linking import (
    LinkClause,
    LinkParams,
    LinkQuery,
    _concat_cols,
)
from merge_machine_ray.state.learner import learn_threshold

# D5 analyzer dominance: exact-ish analyzers rank before fuzzy ones
ANALYZER_PRIORITY = ("special_keyword", "french", "standard", "n_grams")


def generate_templates(match_cols: list[dict],
                       analyzers: tuple[str, ...] = ANALYZER_PRIORITY,
                       max_clauses: int = 3,
                       max_templates: int = 200) -> list[LinkQuery]:
    """D4 search space: for each analyzer, all clause subsets of size
    1..max_clauses over the column pairings (the reference requires ≥2
    distinct col pairs for compound templates and caps the population —
    ``es_labeller.py:104-153,2212-2233``)."""
    pairings = []
    for mc in match_cols:
        src = mc["source"]
        src = (src,) if isinstance(src, str) else tuple(src)
        refs = mc["ref"]
        refs = (refs,) if isinstance(refs, str) else tuple(refs)
        for r in refs:
            pairings.append((src, r))
    out: list[LinkQuery] = []
    for analyzer in analyzers:
        for size in range(1, min(max_clauses, len(pairings)) + 1):
            for combo in itertools.combinations(pairings, size):
                out.append(LinkQuery(
                    [LinkClause(s, r, analyzer, 1.0) for s, r in combo],
                    thresh=0.5))
                if len(out) >= max_templates:
                    return out
    return out


class PortfolioLearner:
    """Learn a priority-ordered template portfolio from labelled pairs.

    labelled_pairs: list of (source_row: dict, ref_row: dict, label: bool).
    ref_rows: the clean referential sample used for IDF statistics.
    """

    def __init__(self, match_cols: list[dict], ref_rows: list[dict],
                 templates: list[LinkQuery] | None = None,
                 max_portfolio: int = 3):
        self.match_cols = match_cols
        self.templates = templates or generate_templates(match_cols)
        self.max_portfolio = max_portfolio
        self._idf_cache: dict[tuple, dict] = {}
        self.ref_rows = ref_rows
        self.history: list[tuple[dict, dict, bool]] = []
        self.results: list[dict] = []

    # -- feature math (mirrors LinkScorer, driver-side) -----------------
    def _idf(self, cols: tuple[str, ...], analyzer: str) -> dict:
        key = (cols, analyzer)
        got = self._idf_cache.get(key)
        if got is None:
            df: Counter = Counter()
            for r in self.ref_rows:
                toks = set(ANALYZERS[analyzer](_concat_cols(r, cols)))
                df.update(crc_hash64(t) for t in toks)
            n = len(self.ref_rows)
            got = {h: math.log((n + 1) / (c + 1)) + 1 for h, c in df.items()
                   if c >= 2}
            got["__default__"] = math.log((n + 1) / 2.0) + 1.0
            self._idf_cache[key] = got
        return got

    def _clause_sim(self, clause: LinkClause, srow: dict, rrow: dict) -> float:
        idf = self._idf((clause.ref,), clause.analyzer)
        default = idf["__default__"]

        def weights(toks):
            tf = Counter(crc_hash64(t) for t in toks)
            w = {h: c * idf.get(h, default) for h, c in tf.items()}
            return w, math.sqrt(sum(v * v for v in w.values()))

        wa, na = weights(ANALYZERS[clause.analyzer](
            _concat_cols(srow, clause.source)))
        wb, nb = weights(ANALYZERS[clause.analyzer](
            _concat_cols(rrow, (clause.ref,))))
        if na == 0 or nb == 0:
            return 0.0
        dot = sum(v * wb[h] for h, v in wa.items() if h in wb)
        return dot / (na * nb)

    def template_score(self, q: LinkQuery, srow: dict, rrow: dict) -> float:
        qn = q.normalized()
        return sum(c.boost * self._clause_sim(c, srow, rrow)
                   for c in qn.clauses)

    # -- learning --------------------------------------------------------
    def add_labelled_pair(self, srow: dict, rrow: dict, label: bool) -> None:
        self.history.append((srow, rrow, label))

    def evaluate_templates(self) -> list[dict]:
        """G2 per template: learn threshold + expected precision/recall
        on the labelled history; sorted by (precision, recall) utility
        with D5 analyzer priority as tie-break (K2 sort)."""
        results = []
        for ti, q in enumerate(self.templates):
            scores = [self.template_score(q, s, r) for s, r, _ in self.history]
            labels = [y for _, _, y in self.history]
            th, p, r = learn_threshold(scores, labels)
            if th is None:
                continue
            prio = min((ANALYZER_PRIORITY.index(c.analyzer)
                        if c.analyzer in ANALYZER_PRIORITY else 99)
                       for c in q.clauses)
            results.append({"template": ti, "thresh": th, "precision": p,
                            "recall": r, "scores": scores,
                            "utility": p * r, "analyzer_priority": prio})
        results.sort(key=lambda d: (-d["utility"], d["analyzer_priority"]))
        self.results = results
        return results

    def greedy_portfolio(self) -> list[dict]:
        """G5: repeatedly pick the template adding most NEW true matches
        on the still-uncovered labelled positives; stop when no
        improvement or the portfolio cap is reached."""
        if not self.results or (self.results and
                                len(self.results[0]["scores"])
                                != len(self.history)):
            self.evaluate_templates()   # results stale vs grown history
        labels = np.array([y for _, _, y in self.history], dtype=bool)
        covered = np.zeros(len(self.history), dtype=bool)
        chosen: list[dict] = []
        remaining = list(self.results)
        while remaining and len(chosen) < self.max_portfolio:
            best, best_gain = None, 0
            for cand in remaining:
                kept = np.array(cand["scores"]) >= cand["thresh"]
                gain = int((kept & labels & ~covered).sum())
                fp = int((kept & ~labels).sum())
                if gain - fp > best_gain:
                    best, best_gain = cand, gain - fp
            if best is None:
                break
            chosen.append(best)
            kept = np.array(best["scores"]) >= best["thresh"]
            covered |= kept & labels
            remaining.remove(best)
        return chosen

    def majority_vote(self, srow: dict, rrow: dict,
                      max_num_voters: int = 10) -> bool:
        """G4: plurality over the top templates' match decisions
        (reference ``es_labeller.py:1438-1459``)."""
        if not self.results:
            self.evaluate_templates()
        votes = 0
        voters = self.results[:max_num_voters]
        for res in voters:
            q = self.templates[res["template"]]
            if self.template_score(q, srow, rrow) >= res["thresh"]:
                votes += 1
        return votes * 2 > len(voters)

    def core_token_stats(self) -> dict:
        """G3 core-query token statistics (reference
        ``es_labeller.py:533-635``): per single-clause template, counts
        of source/ref/intersection tokens over labelled MATCHES and
        score = P(intersection > 0 | match)."""
        stats: dict[str, dict] = {}
        matches = [(s, r) for s, r, y in self.history if y]
        for q in self.templates:
            if len(q.clauses) != 1:
                continue
            c = q.clauses[0]
            key = f"{'+'.join(c.source)}→{c.ref}.{c.analyzer}"
            if key in stats or not matches:
                continue
            inter_pos = 0
            n_src = n_ref = n_int = 0
            for srow, rrow in matches:
                ts = set(ANALYZERS[c.analyzer](_concat_cols(srow, c.source)))
                tr = set(ANALYZERS[c.analyzer](_concat_cols(rrow, (c.ref,))))
                n_src += len(ts)
                n_ref += len(tr)
                inter = len(ts & tr)
                n_int += inter
                inter_pos += inter > 0
            stats[key] = {
                "n_source_tokens": n_src, "n_ref_tokens": n_ref,
                "n_intersection": n_int,
                "score": inter_pos / len(matches),
            }
        return stats

    # -- D6 template-population expansion ops ---------------------------
    def multiply_by_boost(self, top_k: int = 5) -> None:
        """D6 ``multiply_by_boost``: for each top template, derive
        variants doubling one clause's boost (renormalized at scoring
        time); dedupe against the existing population (D3)."""
        if not self.results:
            self.evaluate_templates()
        seen = {self._tkey(q) for q in self.templates}
        for res in self.results[:top_k]:
            q = self.templates[res["template"]]
            for i in range(len(q.clauses)):
                clauses = [LinkClause(c.source, c.ref, c.analyzer,
                                      c.boost * (2.0 if j == i else 1.0))
                           for j, c in enumerate(q.clauses)]
                cand = LinkQuery(clauses, q.thresh)
                if self._tkey(cand) not in seen:
                    seen.add(self._tkey(cand))
                    self.templates.append(cand)

    def multiply_by_core(self, top_k: int = 5, core_min_score: float = 0.5):
        """D6 ``multiply_by_core``: append high-scoring single-clause
        cores (by G3 token stats) to the top templates."""
        stats = self.core_token_stats()
        good_cores = []
        for q in self.templates:
            if len(q.clauses) == 1:
                c = q.clauses[0]
                key = f"{'+'.join(c.source)}→{c.ref}.{c.analyzer}"
                if stats.get(key, {}).get("score", 0.0) >= core_min_score:
                    good_cores.append(c)
        if not self.results:
            self.evaluate_templates()
        seen = {self._tkey(q) for q in self.templates}
        for res in self.results[:top_k]:
            q = self.templates[res["template"]]
            have = {(c.source, c.ref, c.analyzer) for c in q.clauses}
            for core in good_cores:
                if (core.source, core.ref, core.analyzer) in have:
                    continue
                cand = LinkQuery(q.clauses + [LinkClause(
                    core.source, core.ref, core.analyzer, 1.0)], q.thresh)
                if self._tkey(cand) not in seen:
                    seen.add(self._tkey(cand))
                    self.templates.append(cand)

    def filter_by_core(self, core_min_score: float = 0.1) -> None:
        """D6 ``filter_by_core``: drop templates containing a clause
        whose core scores ≤ threshold on the labelled matches."""
        stats = self.core_token_stats()
        if not stats:
            return

        def ok(q: LinkQuery) -> bool:
            for c in q.clauses:
                key = f"{'+'.join(c.source)}→{c.ref}.{c.analyzer}"
                if key in stats and stats[key]["score"] <= core_min_score:
                    return False
            return True

        self.templates = [q for q in self.templates if ok(q)]
        self.results = []

    @staticmethod
    def _tkey(q: LinkQuery) -> tuple:
        return tuple(sorted((c.source, c.ref, c.analyzer, c.boost)
                            for c in q.clauses))

    @staticmethod
    def sorta_sort(items: list, scores: list[float], seed: int = 42) -> list:
        """K3 explore/exploit schedule (reference ``_sorta_sort``,
        ``es_labeller.py:1473-1500``): interleave a random half with a
        score-sorted half so early labelling explores before metrics
        stabilize."""
        import random

        rng = random.Random(seed)
        order = sorted(range(len(items)), key=lambda i: -scores[i])
        shuffled = list(range(len(items)))
        rng.shuffle(shuffled)
        out, used = [], set()
        for rank, shuf in zip(order, shuffled):
            for pick in (rank, shuf):
                if pick not in used:
                    used.add(pick)
                    out.append(items[pick])
        return out

    # -- S6 checkpointing ------------------------------------------------
    def to_dict(self) -> dict:
        return {
            "match_cols": self.match_cols,
            "max_portfolio": self.max_portfolio,
            "templates": [
                {"thresh": q.thresh,
                 "clauses": [{"source": list(c.source), "ref": c.ref,
                              "analyzer": c.analyzer, "boost": c.boost}
                             for c in q.clauses]}
                for q in self.templates],
            "history": [[s, r, bool(y)] for s, r, y in self.history],
        }

    def to_json(self, path: str) -> None:
        import json

        from merge_machine_ray.state.serialize import NumpySafeEncoder

        with open(path, "w") as f:
            json.dump(self.to_dict(), f, cls=NumpySafeEncoder)

    @classmethod
    def from_dict(cls, d: dict, ref_rows: list[dict]) -> "PortfolioLearner":
        templates = [
            LinkQuery([LinkClause(tuple(c["source"]), c["ref"],
                                  c["analyzer"], c["boost"])
                       for c in q["clauses"]], q["thresh"])
            for q in d["templates"]]
        self = cls(d["match_cols"], ref_rows, templates=templates,
                   max_portfolio=d.get("max_portfolio", 3))
        for s, r, y in d.get("history", []):
            self.add_labelled_pair(s, r, y)
        return self

    @classmethod
    def from_json(cls, path: str, ref_rows: list[dict]) -> "PortfolioLearner":
        import json

        with open(path) as f:
            return cls.from_dict(json.load(f), ref_rows)

    def export_params(self) -> LinkParams:
        """S7 learned-params export (``es_labeller.py:2269-2301``):
        priority-ordered portfolio with thresholds + label ledgers."""
        chosen = self.greedy_portfolio()
        # priority order for first-match-wins: highest-precision (then
        # most-exact-analyzer) templates first — D5 dominance, the
        # reference emits best_queries precision-sorted
        chosen.sort(key=lambda d: (-d["precision"], d["analyzer_priority"],
                                   -d["thresh"]))
        queries = []
        for res in chosen:
            q = self.templates[res["template"]]
            queries.append(LinkQuery([LinkClause(c.source, c.ref, c.analyzer,
                                                 c.boost) for c in q.clauses],
                                     thresh=res["thresh"]))
        params = LinkParams(queries=queries or
                            [self.templates[0]] if self.templates else [])
        return params
