"""Pure, deterministic per-record functions (no Ray dependency).

These are the Ray-engine equivalents of the reference's Elasticsearch
analyzers and scoring primitives (see SURVEY.md §2.3, §2.9). Every
function here must be a pure function of its inputs — the byte-identity
and F1 gates depend on it.
"""

from merge_machine_ray.functions.hashing import stable_hash64
from merge_machine_ray.functions.normalize import (
    extract_text_from_html,
    normalize_text,
)
from merge_machine_ray.functions.tokenize import ANALYZERS, analyze
from merge_machine_ray.functions.similarity import (
    jaccard,
    jaro_winkler,
    tfidf_cosine,
)

__all__ = [
    "stable_hash64",
    "extract_text_from_html",
    "normalize_text",
    "ANALYZERS",
    "analyze",
    "jaccard",
    "jaro_winkler",
    "tfidf_cosine",
]
