"""Pairwise similarity metrics — in-repo implementations (no jellyfish /
sklearn / datasketch in the sandbox; SURVEY.md §7.4).

These are the scoring features of the north-star pipeline: Jaro-Winkler
on url/host, TF-IDF cosine on text tokens, exact match on lang — the
Ray equivalent of the reference's boosted must/should query templates
scored by Lucene BM25 (``merge_machine/query_templates.py``,
``helpers.py:65-152``).
"""

from __future__ import annotations

import math
from collections import Counter


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    flags1 = [False] * len1
    flags2 = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c1:
                flags1[i] = flags2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(len1):
        if flags1[i]:
            while not flags2[j]:
                j += 1
            if s1[i] != s2[j]:
                transpositions += 1
            j += 1
    t = transpositions / 2
    m = matches
    return (m / len1 + m / len2 + (m - t) / m) / 3


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1,
                 max_prefix: int = 4) -> float:
    """Standard Jaro-Winkler (prefix boost only when jaro > 0.7)."""
    j = jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip(s1[:max_prefix], s2[:max_prefix]):
        if a != b:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1 - j)


def jaccard(a, b) -> float:
    """Jaccard similarity of two iterables (treated as sets)."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    if not inter:
        return 0.0
    return inter / (len(sa) + len(sb) - inter)


def tfidf_cosine(tokens_a: list[str], tokens_b: list[str],
                 idf: dict[str, float], default_idf: float = 1.0) -> float:
    """Cosine of tf·idf vectors. ``idf`` is the broadcast corpus table
    (built by the groupby IDF job, SURVEY.md §2.6 G7); unseen tokens get
    ``default_idf``."""
    if not tokens_a or not tokens_b:
        return 0.0
    ca, cb = Counter(tokens_a), Counter(tokens_b)
    na = math.sqrt(sum((tf * idf.get(t, default_idf)) ** 2 for t, tf in ca.items()))
    nb = math.sqrt(sum((tf * idf.get(t, default_idf)) ** 2 for t, tf in cb.items()))
    if na == 0.0 or nb == 0.0:
        return 0.0
    dot = 0.0
    small, large = (ca, cb) if len(ca) <= len(cb) else (cb, ca)
    for t, tf in small.items():
        if t in large:
            w = idf.get(t, default_idf)
            dot += tf * w * large[t] * w
    return dot / (na * nb)


def containment(a, b) -> float:
    """|A∩B| / min(|A|,|B|) — useful for substring-ish near-dup."""
    sa, sb = set(a), set(b)
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / min(len(sa), len(sb))
