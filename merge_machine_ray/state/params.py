"""Learned match parameters — the JSON artifact of the learning loop.

Mirrors the reference's ``learned_settings.json`` contract
(``merge_machine/es_labeller.py:2269-2301``, golden example
``examples/data_1/learned_settings.json``): a serializable model the
batch linker consumes, with per-field weights in place of ES boosts and
one decision threshold in place of the per-template ``best_thresh``.
Hand-written params are a first-class escape hatch (reference
``HOW_TO.md:103-144``).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass
class MatchParams:
    # field weights (ES template boost analog); sim_ints is the
    # integers-analyzer Jaccard (reference A3 — ids/codes in text)
    w_text: float = 0.55
    w_ints: float = 0.30
    w_host: float = 0.03
    w_url: float = 0.10
    w_lang: float = 0.02
    # decision threshold on the weighted score (per-template best_thresh analog)
    threshold: float = 0.54
    # blocking configuration (the "index mapping" analog)
    analyzer: str = "standard"
    num_perm: int = 128
    num_bands: int = 16
    shingle_width: int = 3
    block_cap: int = 64
    # provenance / learning metadata
    expected_precision: float | None = None
    expected_recall: float | None = None
    exact_pairs: list = field(default_factory=list)
    non_matching_pairs: list = field(default_factory=list)

    @classmethod
    def from_any(cls, obj) -> "MatchParams":
        if obj is None:
            return cls()
        if isinstance(obj, cls):
            return obj
        if isinstance(obj, str):
            with open(obj) as f:
                obj = json.load(f)
        known = {k: v for k, v in dict(obj).items() if k in cls.__dataclass_fields__}
        return cls(**known)

    def to_json(self, path: str | None = None) -> str:
        s = json.dumps(asdict(self), indent=2, sort_keys=True)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s
