"""Interactive labelling loop — the driver-side re-creation of the
reference's ``ConsoleLabeller`` session (reference
``merge_machine/es_labeller.py:1179-1243`` candidate proposal generator
``_init_ref_gen``/``_next_row``, ``:1738-1867`` ``update``/
``update_pair`` y/n/u/f/p protocol, ``:2713-2978`` console loop).

The reference proposes, for one dirty source row at a time, candidate
referential rows fetched by its current query templates, consumes
keyboard answers, and updates its template learning state after each
label. Here:

* candidate proposal comes from the DISTRIBUTED blocking stage
  (:func:`propose_candidates` — LinkFeaturize → LinkBandKeys → one
  bucketed groupby — the same machinery the linking pipeline uses, so
  labelling sees exactly the pairs linking would see);
* answers feed :class:`PortfolioLearner` (D4-D6/G2-G5 math) after every
  label, and templates are re-evaluated every ``refit_every`` labels;
* the whole session state checkpoints to JSON (S6) and the learned
  portfolio exports as :class:`LinkParams` (S7), ready for
  :func:`~merge_machine_ray.pipelines.linking.link_datasets`.

The loop itself is driver-side by nature (a human answers one pair at a
time); all heavy work (blocking) is Ray-distributed.
"""

from __future__ import annotations

import json

import pyarrow as pa

from merge_machine_ray.pipelines.linking import (
    LinkBandKeys,
    LinkFeaturize,
    LinkParams,
    _emit_cross_pairs_fn,
)
from merge_machine_ray.state.labeller import PortfolioLearner

#: D6 milestone schedule (reference ``es_labeller.py:2092-2141``):
#: template-population expansion / filtering fire at fixed counts of
#: POSITIVE labels (``_nprl``), each milestone at most once per session
#: (the reference's ``already_expanded`` set).
EXPAND_BY_CORE_AT = frozenset({11, 17})
EXPAND_BY_BOOST_AT = frozenset({14, 22, 30, 60, 120, 240})
FILTER_BY_CORE_AT = frozenset({10, 20})

#: reference VALID_ANSWERS (es_labeller.py:715-722)
VALID_ANSWERS = {
    "y": "y", "yes": "y", "1": "y",
    "n": "n", "no": "n", "0": "n",
    "u": "u", "uncertain": "u",
    "f": "f", "forget_row": "f",
    "p": "p", "previous": "p",
}


def propose_candidates(source_rows: list[dict], ref_rows: list[dict],
                       match_cols: list[dict],
                       params: LinkParams | None = None,
                       max_per_source: int = 12) -> dict[int, list[int]]:
    """Distributed candidate proposal: run the linking blocking stage
    over both sides and return, per source row index, the candidate ref
    row indices ranked by number of shared LSH bands (the analog of the
    reference's per-query ES hit lists)."""
    import copy

    import ray.data as rd

    p = copy.deepcopy(params or LinkParams.default_for(match_cols))
    # labelling wants RECALL: more, narrower bands than the production
    # linking run (128 perms / 32 bands → r=4; a dirty 6-token record
    # with half its shingles edited still collides w.p. ≈ 1-(1-s⁴)³²)
    p.num_bands = max(32, p.num_bands)
    n_src = len(source_rows)

    # key both sides by ROW INDEX via an injected id column so the pair
    # list maps back to rows (the D1 group key would merge exact dups)
    src_tagged = [dict(r, __row_idx=i) for i, r in enumerate(source_rows)]
    ref_tagged = [dict(r, __row_idx=i) for i, r in enumerate(ref_rows)]
    feat_s = rd.from_arrow(pa.Table.from_pylist(src_tagged)) \
        .repartition(4).map_batches(
            LinkFeaturize(p, 0, "__row_idx", []), batch_format="pyarrow")
    feat_r = rd.from_arrow(pa.Table.from_pylist(ref_tagged)) \
        .repartition(4).map_batches(
            LinkFeaturize(p, 1, "__row_idx", []), batch_format="pyarrow")
    # source rows are keyed by the D1 content hash — rebuild an index
    # from that hash to row ids for the map-back
    key_f = LinkFeaturize(p, 0, "__row_idx", [])
    src_key_to_rows: dict[int, list[int]] = {}
    for i, r in enumerate(src_tagged):
        src_key_to_rows.setdefault(key_f._key_of(r), []).append(i)

    bands = feat_s.union(feat_r).map_batches(
        LinkBandKeys(p, 32), batch_format="pyarrow")
    n_ext = len(key_f.extractions)
    pairs = bands.groupby("bucket").map_groups(
        _emit_cross_pairs_fn(p.block_cap, n_ext), batch_format="pyarrow")

    counts: dict[tuple[int, int], int] = {}
    for b in pairs.select_columns(["src_key", "ref_key"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for sk, rk in zip(b["src_key"].to_pylist(), b["ref_key"].to_pylist()):
            for si in src_key_to_rows.get(sk, ()):
                counts[(si, rk)] = counts.get((si, rk), 0) + 1

    by_src: dict[int, list[tuple[int, int]]] = {}
    for (si, rk), c in counts.items():
        by_src.setdefault(si, []).append((c, rk))
    out: dict[int, list[int]] = {}
    for si in range(n_src):
        cands = sorted(by_src.get(si, ()), key=lambda t: (-t[0], t[1]))
        out[si] = [rk for _, rk in cands[:max_per_source]]
    return out



class StatsLedger:
    """Per-step template-performance ledger — parity with the
    reference's ``StatsLabeller`` (``es_labeller.py:2629-2707``): each
    time the session finishes a source row it snapshots, per currently
    ranked template, ``{precision, recall, utility, thresh, position}``
    under the step counter, appends the step's template-id order, and
    prunes stats for templates absent from the last ``keep_steps``
    steps (the reference's ``_cleanup(5)``). Round-trips through the
    session checkpoint."""

    def __init__(self, keep_steps: int = 5):
        self.query_definitions: dict[str, list] = {}
        self.query_stats: dict[str, dict] = {}
        self.query_order: list[list[str]] = []
        self.current_step = 0
        self.keep_steps = keep_steps

    @staticmethod
    def _template_id(q) -> str:
        import hashlib

        tup = tuple((tuple(c.source), c.ref, c.analyzer, c.boost)
                    for c in q.clauses) + (q.thresh,)
        return hashlib.md5(str(tup).encode("utf-8")).hexdigest()

    def record(self, results: list[dict], templates: list) -> None:
        order = []
        for pos, r in enumerate(results):
            q = templates[r["template"]]
            tid = self._template_id(q)
            self.query_definitions.setdefault(tid, [
                {"source": list(c.source), "ref": c.ref,
                 "analyzer": c.analyzer, "boost": c.boost}
                for c in q.clauses])
            self.query_stats.setdefault(tid, {})[str(self.current_step)] = {
                "precision": r["precision"], "recall": r["recall"],
                "utility": r["utility"], "thresh": r["thresh"],
                "position": pos,
            }
            order.append(tid)
        self.query_order.append(order)
        self.current_step += 1
        self._cleanup(self.keep_steps)

    def _cleanup(self, num_empty: int) -> None:
        if self.current_step < num_empty:
            return
        recent: set[str] = set()
        for step in self.query_order[-num_empty:]:
            recent.update(step)
        for tid in list(self.query_stats):
            if tid not in recent:
                del self.query_stats[tid]
                self.query_definitions.pop(tid, None)
        self.query_order = [[t for t in step if t in self.query_stats]
                            for step in self.query_order]

    def to_dict(self) -> dict:
        return {"query_definitions": self.query_definitions,
                "query_stats": self.query_stats,
                "query_order": self.query_order,
                "current_step": self.current_step,
                "keep_steps": self.keep_steps}

    @classmethod
    def from_dict(cls, d: dict) -> "StatsLedger":
        self = cls(keep_steps=d.get("keep_steps", 5))
        self.query_definitions = d.get("query_definitions", {})
        self.query_stats = d.get("query_stats", {})
        self.query_order = d.get("query_order", [])
        self.current_step = d.get("current_step", 0)
        return self


class InteractiveLabeller:
    """y/n/u/f/p labelling session over blocking-proposed pairs.

    Answers (reference semantics, ``es_labeller.py:1739-1867``):
    ``y`` — pair is a match: record positive label, advance to the next
    source row; ``n`` — not a match: record negative label, propose the
    source's next candidate; ``u`` — uncertain: skip without labelling;
    ``f`` — forget this source row entirely; ``p`` — undo the previous
    answer and re-propose that pair.
    """

    def __init__(self, source_rows: list[dict], ref_rows: list[dict],
                 match_cols: list[dict],
                 candidates: dict[int, list[int]] | None = None,
                 learner: PortfolioLearner | None = None,
                 max_proposals_per_source: int = 4, refit_every: int = 10):
        self.source_rows = source_rows
        self.ref_rows = ref_rows
        self.match_cols = match_cols
        self.candidates = candidates if candidates is not None else \
            propose_candidates(source_rows, ref_rows, match_cols)
        self.learner = learner or PortfolioLearner(match_cols, ref_rows)
        self.max_proposals = max_proposals_per_source
        self.refit_every = refit_every
        self.labels_since_fit = 0
        self.stats = StatsLedger()
        # session state
        self.matched: dict[int, int | None] = {}   # src → ref (None = no match)
        self.answered: set[tuple[int, int]] = set()
        self.src_order = [si for si in range(len(source_rows))
                          if self.candidates.get(si)]
        self.src_ptr = 0
        self.ref_ptr = 0
        self._undo: list[dict] = []
        self.fired_milestones: set[str] = set()
        self.status = "ACTIVE" if self.src_order else "NO_ITEMS_TO_LABEL"
        self._skip_answered_forward()

    # -- proposal cursor -------------------------------------------------
    def _ranked_candidates(self, si: int) -> list[int]:
        """Current proposal order for one source: blocking rank, re-
        ranked by the learner's best template once labels exist (the
        reference re-ranks by current_query score). Early in the
        session the K3 ``_sorta_sort`` explore/exploit schedule
        interleaves lower-ranked candidates so the label sample
        contains NEGATIVES even when the top proposal is almost always
        the true match."""
        pool = self.candidates.get(si, [])
        if self.learner.results:
            best = self.learner.results[0]
            q = self.learner.templates[best["template"]]
            srow = self.source_rows[si]
            pool = sorted(pool, key=lambda rk: -self.learner.template_score(
                q, srow, self.ref_rows[rk]))
        elif len(pool) > 1:
            scores = [-i for i in range(len(pool))]  # blocking rank
            pool = PortfolioLearner.sorta_sort(pool, scores, seed=si)
            if si % 2 == 1:
                # alternate which arm leads: sorta_sort always starts
                # with the top-ranked item, and a good blocker would
                # then never surface a negative to label
                pool[0], pool[1] = pool[1], pool[0]
        return pool[:self.max_proposals]

    def _skip_answered_forward(self) -> None:
        while self.src_ptr < len(self.src_order):
            si = self.src_order[self.src_ptr]
            if si in self.matched:
                self.src_ptr += 1
                self.ref_ptr = 0
                continue
            cands = self._ranked_candidates(si)
            while self.ref_ptr < len(cands) and \
                    (si, cands[self.ref_ptr]) in self.answered:
                self.ref_ptr += 1
            if self.ref_ptr >= len(cands):
                self.src_ptr += 1
                self.ref_ptr = 0
                continue
            return
        self.status = "NO_ITEMS_TO_LABEL"

    def current_pair(self) -> tuple[int, int, dict, dict] | None:
        """→ (source_idx, ref_idx, source_row, ref_row) or None when the
        session is exhausted."""
        if self.status != "ACTIVE" or self.src_ptr >= len(self.src_order):
            return None
        si = self.src_order[self.src_ptr]
        cands = self._ranked_candidates(si)
        if self.ref_ptr >= len(cands):
            return None
        rk = cands[self.ref_ptr]
        return si, rk, self.source_rows[si], self.ref_rows[rk]

    # -- answer protocol ---------------------------------------------------
    def update(self, user_input: str) -> None:
        ans = VALID_ANSWERS.get(str(user_input).strip().lower())
        if ans is None:
            raise ValueError(f"invalid answer {user_input!r}; one of "
                             f"{sorted(set(VALID_ANSWERS))}")
        if ans == "p":
            self._undo_last()
            return
        cur = self.current_pair()
        if cur is None:
            return
        si, rk, srow, rrow = cur
        self._undo.append({"src_ptr": self.src_ptr, "ref_ptr": self.ref_ptr,
                           "hist_len": len(self.learner.history),
                           "answered": (si, rk),
                           "matched": dict(self.matched)})
        if ans == "y":
            self.learner.add_labelled_pair(srow, rrow, True)
            self.answered.add((si, rk))
            self.matched[si] = rk
            self.src_ptr += 1
            self.ref_ptr = 0
            self._maybe_refit()
            self._apply_milestones()
            self.stats.record(self.learner.results, self.learner.templates)
        elif ans == "n":
            self.learner.add_labelled_pair(srow, rrow, False)
            self.answered.add((si, rk))
            self.ref_ptr += 1
            self._maybe_refit()
        elif ans == "u":
            self.answered.add((si, rk))
            self.ref_ptr += 1
        elif ans == "f":
            self.matched[si] = None
            self.src_ptr += 1
            self.ref_ptr = 0
            self.stats.record(self.learner.results, self.learner.templates)
        self._skip_answered_forward()

    def _maybe_refit(self) -> None:
        self.labels_since_fit += 1
        if self.labels_since_fit >= self.refit_every:
            self.labels_since_fit = 0
            if len(self.learner.history) >= 4:
                self.learner.evaluate_templates()

    def _nprl(self) -> int:
        """Current number of positively-labelled source rows (reference
        ``_nprl``, es_labeller.py:2155-2162)."""
        return sum(1 for v in self.matched.values() if v is not None)

    def _apply_milestones(self) -> None:
        """D6 milestone schedule (reference ``filter_``/``expand``,
        es_labeller.py:2092-2141): at fixed positive-label counts,
        filter the template population by core score and expand it by
        core / boost variants — each milestone fires at most once."""
        if len(self.learner.history) < 4:
            return
        n = self._nprl()
        fkey, ekey = f"filter:{n}", f"expand:{n}"
        if n in FILTER_BY_CORE_AT and fkey not in self.fired_milestones:
            self.fired_milestones.add(fkey)
            self.learner.filter_by_core()
            if self.learner.templates:
                self.learner.evaluate_templates()
        if ekey in self.fired_milestones:
            return
        if n in EXPAND_BY_CORE_AT:
            self.fired_milestones.add(ekey)
            self.learner.multiply_by_core()
            self.learner.evaluate_templates()
        elif n in EXPAND_BY_BOOST_AT:
            self.fired_milestones.add(ekey)
            self.learner.multiply_by_boost()
            self.learner.evaluate_templates()

    def _undo_last(self) -> None:
        if not self._undo:
            return
        snap = self._undo.pop()
        self.src_ptr = snap["src_ptr"]
        self.ref_ptr = snap["ref_ptr"]
        del self.learner.history[snap["hist_len"]:]
        self.answered.discard(snap["answered"])
        self.matched = snap["matched"]
        self.status = "ACTIVE"

    # -- S6 checkpoint / S7 export ---------------------------------------
    def to_dict(self) -> dict:
        return {
            "learner": self.learner.to_dict(),
            "candidates": {str(k): v for k, v in self.candidates.items()},
            "matched": {str(k): v for k, v in self.matched.items()},
            "answered": sorted(self.answered),
            "src_ptr": self.src_ptr, "ref_ptr": self.ref_ptr,
            "status": self.status,
            "stats": self.stats.to_dict(),
            "fired_milestones": sorted(self.fired_milestones),
        }

    def to_json(self, path: str) -> None:
        from merge_machine_ray.state.serialize import NumpySafeEncoder

        with open(path, "w") as f:
            json.dump(self.to_dict(), f, cls=NumpySafeEncoder)

    @classmethod
    def from_json(cls, path: str, source_rows: list[dict],
                  ref_rows: list[dict], match_cols: list[dict]
                  ) -> "InteractiveLabeller":
        with open(path) as f:
            d = json.load(f)
        learner = PortfolioLearner.from_dict(d["learner"], ref_rows)
        self = cls(source_rows, ref_rows, match_cols,
                   candidates={int(k): v for k, v in d["candidates"].items()},
                   learner=learner)
        self.matched = {int(k): v for k, v in d["matched"].items()}
        self.answered = {tuple(p) for p in d["answered"]}
        self.src_ptr = d["src_ptr"]
        self.ref_ptr = d["ref_ptr"]
        self.status = d["status"]
        self.stats = StatsLedger.from_dict(d.get("stats", {}))
        self.fired_milestones = set(d.get("fired_milestones", []))
        if self.learner.history:
            self.learner.evaluate_templates()
        self._skip_answered_forward()
        return self

    def export_params(self) -> LinkParams:
        """Learned portfolio + the session's confirmed pairs as J5
        exact-pair overrides (keyed by the D1 source-group hash, the key
        link_datasets joins on)."""
        params = self.learner.export_params()
        key_f = LinkFeaturize(LinkParams.default_for(self.match_cols),
                              0, None, [])
        for si, rk in self.matched.items():
            if rk is None:
                continue
            params.exact_pairs.append(
                (key_f._key_of(self.source_rows[si]), rk))
        return params
