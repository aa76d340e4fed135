"""Console front-end of the interactive labeller — the terminal REPL
shell of the reference's ``ConsoleLabeller`` (reference
``merge_machine/es_labeller.py:2713-2978``): tabbed prompt loop
(``menu`` / ``labeller`` / ``filter``), y/n/u/f/p/q/h answers, filter
updates with the ``{must_filters|must_not_filters} / {column} /
{list}`` syntax, and an invalid-input retry loop.

The session mechanics (proposal cursor, learning state, checkpoints,
params export) live in :class:`InteractiveLabeller`; this class only
renders and routes input. Streams are injectable so scripted tests can
drive a full console session without a TTY.
"""

from __future__ import annotations

import ast
import sys

from merge_machine_ray.state.interactive import (
    VALID_ANSWERS,
    InteractiveLabeller,
)

TABS = ("menu", "labeller", "filter")
VALID_TAB_CHANGES = ("=l", "=labeller", "=f", "=filter", "=m", "=menu")

HELP = (
    "\n*** HELP: What am I supposed to do? ***\n"
    "The labeller learns the optimal parameters to use with the linking\n"
    "pipeline. Switch between the labeller tab (label candidate pairs as\n"
    "match / not-match) and the filter tab (restrict the referential with\n"
    "mandatory or forbidden words per column)."
)

LABELLER_INSTRUCTIONS = """Valid answers are:
(y)es / 1
(n)o / 0
(p)revious
(u)ncertain
(f)orget
(q)uit
(h)elp"""

FILTER_INSTRUCTIONS = (
    "Filter instructions:\n"
    "Update filters for a given column with the following syntax:\n"
    "{must_filters or must_not_filters} / {column} / {list_of_elements}\n"
    '\n  e.g.: must_not_filters / category / ["archived"]\n'
    '  e.g.: must_filters / city / ["Lyon"]\n'
)

GENERAL_INSTRUCTIONS = (
    'Switch tab by entering "=labeller", "=menu" or "=filter".\n'
    'Quit labeller by typing "quit". Help with "help".'
)


class ConsoleLabeller:
    """Terminal REPL over :class:`InteractiveLabeller` (ST3 + the S6
    console shell). ``stdin``/``stdout`` default to the process streams
    and can be replaced by any file-like pair for scripted sessions."""

    def __init__(self, labeller: InteractiveLabeller,
                 stdin=None, stdout=None):
        self.labeller = labeller
        self.current_tab = "labeller"
        self.finished = False
        self.must_filters: dict[str, list[str]] = {}
        self.must_not_filters: dict[str, list[str]] = {}
        self._in = stdin or sys.stdin
        self._out = stdout or sys.stdout

    # -- plumbing --------------------------------------------------------
    def _print(self, *parts) -> None:
        self._out.write(" ".join(str(p) for p in parts) + "\n")

    # -- input validation / routing (reference :2764-2814) --------------
    def user_input_is_valid(self, user_input: str) -> bool:
        if not user_input:
            return False
        if user_input[0] == "=":
            return user_input[:2] in VALID_TAB_CHANGES
        if user_input in ("q", "quit", "h", "help"):
            return True
        if self.current_tab == "labeller":
            return str(user_input).strip().lower() in VALID_ANSWERS
        if self.current_tab == "filter":
            vals = [x.strip() for x in user_input.split("/", 2)]
            return (user_input.count("/") >= 2
                    and vals[0] in ("must_filters", "must_not_filters"))
        return False  # menu accepts no orders (reference parity)

    def process_input(self, user_input: str) -> None:
        if user_input in ("q", "quit"):
            self.finished = True
        elif user_input in ("h", "help"):
            self._print(HELP)
            self.display_instructions()
        elif user_input[0] == "=":
            self.change_tab(user_input)
        elif self.current_tab == "labeller":
            if self.labeller.status == "ACTIVE":
                self.labeller.update(user_input)
                if self.labeller.current_pair() is None:
                    self.finished = True
            else:
                self._print(f">>> Current status is {self.labeller.status}."
                            " Labeller update was not performed")
        elif self.current_tab == "filter":
            self.update_filter(user_input)

    def change_tab(self, user_input: str) -> None:
        head = user_input.lower()[:2]
        self.current_tab = {"=l": "labeller", "=f": "filter",
                            "=m": "menu"}.get(head, self.current_tab)

    # -- rendering (reference display/display_pair :2818-2904) ----------
    def display(self) -> None:
        self._print("\n" + "*" * 50)
        self._print(f"*** In tab: {self.current_tab} ***")
        if self.current_tab == "labeller":
            if self.labeller.status == "ACTIVE":
                self.display_pair()
            else:
                self._print(">>> Labelling is not possible. Status is:",
                            self.labeller.status)
        elif self.current_tab == "menu":
            self._print("*** THE MERGE MACHINE (Ray Data) ***")
        elif self.current_tab == "filter":
            self.display_filter()
        if self.finished:
            self._print(">>> No more pairs to label. Type quit to exit.")

    def display_pair(self) -> None:
        cur = self.labeller.current_pair()
        if cur is None:
            self.finished = True
            self._print(">>> No more pairs to label.")
            return
        si, rk, srow, rrow = cur
        lr = self.labeller.learner
        if lr.results:
            best = lr.results[0]
            q = lr.templates[best["template"]]
            score = lr.template_score(q, srow, rrow)
            self._print(f"Query / Precision: {best['precision']:.3f}; "
                        f"Recall: {best['recall']:.3f}")
            self._print(f"Score: {score:.4f}; Query thresh: "
                        f"{best['thresh']:.4f}; Is match: "
                        f"{score >= best['thresh']}")
        self._print(f"\n(S): {si}")
        self._print(f"(R): {rk}")
        for match in self.labeller.match_cols:
            src_cols = match["source"]
            src_cols = [src_cols] if isinstance(src_cols, str) else src_cols
            ref_cols = match["ref"]
            ref_cols = [ref_cols] if isinstance(ref_cols, str) else ref_cols
            self._print("")
            for c in src_cols:
                self._print(f"(S): {c} -> {srow.get(c)}")
            for c in ref_cols:
                self._print(f"(R): {c} -> {rrow.get(c)}")

    def display_filter(self) -> None:
        self._print(FILTER_INSTRUCTIONS)
        self._print("Current filters:")
        for key, values in self.must_filters.items():
            self._print(f"must_filters / {key} / {values}")
        for key, values in self.must_not_filters.items():
            self._print(f"must_not_filters / {key} / {values}")

    def display_instructions(self) -> None:
        self._print(f"\n*** INSTRUCTIONS for {self.current_tab} ***")
        if self.current_tab == "labeller":
            self._print(LABELLER_INSTRUCTIONS)
        elif self.current_tab == "filter":
            self._print(FILTER_INSTRUCTIONS)
        self._print("\n" + GENERAL_INSTRUCTIONS)

    # -- filter tab (reference update_filter :2930-2955) -----------------
    def update_filter(self, user_input: str) -> None:
        values = [x.strip() for x in user_input.split("/", 2)]
        condition, column = values[0], values[1]
        try:  # literal list syntax; a bare word becomes a 1-list
            parsed = ast.literal_eval(values[2])
            phrases = [parsed] if isinstance(parsed, str) else list(parsed)
        except (ValueError, SyntaxError):
            phrases = [values[2]]
        if condition == "must_filters":
            self.must_filters[column] = phrases
        else:
            self.must_not_filters[column] = phrases
        self._apply_filters_to_candidates()

    def _apply_filters_to_candidates(self) -> None:
        """The analog of the reference's ``update_musts`` re-search:
        prune every source's candidate list so future proposals only
        surface ref rows passing the current filters (normalized
        substring semantics, same as ``apply_must_filters``)."""
        from merge_machine_ray.functions.normalize import normalize_text

        must_n = {c: [normalize_text(p) for p in ps]
                  for c, ps in self.must_filters.items()}
        must_not_n = {c: [normalize_text(p) for p in ps]
                      for c, ps in self.must_not_filters.items()}

        def ok(rrow: dict) -> bool:
            for col, phrases in must_n.items():
                v = normalize_text(str(rrow.get(col, "")))
                if any(ph not in v for ph in phrases):
                    return False
            for col, phrases in must_not_n.items():
                v = normalize_text(str(rrow.get(col, "")))
                if any(ph in v for ph in phrases):
                    return False
            return True

        lab = self.labeller
        keep = [i for i, r in enumerate(lab.ref_rows) if ok(r)]
        keep_set = set(keep)
        lab.candidates = {si: [rk for rk in cands if rk in keep_set]
                          for si, cands in lab.candidates.items()}
        lab._skip_answered_forward()
        if lab.current_pair() is None:
            self.finished = True

    # -- REPL loop (reference next_action/console_labeller :2957-2978) ---
    def next_action(self) -> None:
        display = True
        for _ in range(10):
            if display:
                self.display()
            user_input = self._in.readline()
            if not user_input:          # EOF = quit
                self.finished = True
                return
            user_input = user_input.strip()
            if self.user_input_is_valid(user_input):
                self.process_input(user_input)
                return
            self._print("\n/!\\ INVALID ANSWER /!\\")
            self.display_instructions()
            display = False
        raise RuntimeError("Too many consecutive wrong orders")

    def run(self, max_num_actions: int = 200) -> None:
        for _ in range(max_num_actions):
            if self.finished:
                return
            self.next_action()

    def export_params(self):
        """S7 export with the console-tab filters folded in (the
        reference persists must/must_not alongside the learned
        queries)."""
        params = self.labeller.export_params()
        params.must = dict(self.must_filters)
        params.must_not = dict(self.must_not_filters)
        return params
