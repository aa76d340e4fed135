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


def jaro_winkler_batch(xs: list[str], ys: list[str],
                       prefix_weight: float = 0.1,
                       max_prefix: int = 4):
    """Numpy-batched :func:`jaro_winkler` over N string pairs — an exact
    emulation of the scalar greedy matcher (same flags walk, same IEEE
    operation order), vectorized across PAIRS: the O(L²) window scan
    runs as L×L boolean passes over all N pairs at once instead of N
    python loops. Pairs longer than 64 chars (rare: host/path are
    pre-truncated upstream) fall back to the scalar form."""
    import numpy as np

    n = len(xs)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    l1 = np.fromiter((len(s) for s in xs), np.int64, count=n)
    l2 = np.fromiter((len(s) for s in ys), np.int64, count=n)
    lm = int(max(l1.max(initial=0), l2.max(initial=0), 1))
    if lm > 64:
        return np.array([jaro_winkler(x, y, prefix_weight, max_prefix)
                         for x, y in zip(xs, ys)], dtype=np.float64)
    if n * lm * lm > 128 * 1024 * 1024:   # bound the (n,lm,lm) tensor
        step = max(1, (128 * 1024 * 1024) // (lm * lm))
        return np.concatenate([
            jaro_winkler_batch(xs[k:k + step], ys[k:k + step],
                               prefix_weight, max_prefix)
            for k in range(0, n, step)])
    X = np.array(xs, dtype=f"U{lm}").view(np.uint32).reshape(n, lm)
    Y = np.array(ys, dtype=f"U{lm}").view(np.uint32).reshape(n, lm)
    eq_all = (l1 == l2) & (X == Y).all(axis=1)
    d = np.maximum(l1, l2) // 2 - 1
    ar = np.arange(lm)
    # sentinel-pad both sides with DIFFERENT values so pad positions
    # (i ≥ l1 / j ≥ l2) never register a character match — this removes
    # every per-iteration length/window row check from the hot loop
    X[ar[None, :] >= l1[:, None]] = np.uint32(0xFFFFFFFF)
    Y[ar[None, :] >= l2[:, None]] = np.uint32(0xFFFFFFFE)
    # greedy flags walk in TRANSPOSED (lm, n) layout: every inner op is
    # a CONTIGUOUS n-vector (broadcast (n,lm,lm) tensors measured ~25×
    # slower per element than contiguous SIMD passes). The (i, k=i-j)
    # double loop visits j ascending per i — the scalar walk's order.
    XT = np.ascontiguousarray(X.T)
    YT = np.ascontiguousarray(Y.T)
    dmax = int(d.max(initial=0)) if n else 0
    kd_abs = [d >= a for a in range(dmax + 1)]   # |i-j| ≤ d row masks
    flags1T = np.zeros((lm, n), bool)
    flags2T = np.zeros((lm, n), bool)
    active = ~eq_all & (l1 > 0) & (l2 > 0)
    for i in range(lm):
        pend = active.copy()
        xt_i = XT[i]
        for k in range(min(i, dmax), max(i - lm + 1, -dmax) - 1, -1):
            j = i - k
            ok = (xt_i == YT[j]) & kd_abs[abs(k)] & ~flags2T[j] & pend
            if ok.any():
                flags2T[j] |= ok
                flags1T[i] |= ok
                pend &= ~ok
                if not pend.any():
                    break
    m = flags1T.sum(axis=0)
    mmax = int(m.max(initial=0))
    transp = np.zeros(n, np.int64)
    if mmax:
        # compact matched chars in walk order with lm column passes
        # (running per-pair counters — no full-matrix cumsum/nonzero)
        M1 = np.zeros((n, mmax), np.uint32)
        M2 = np.zeros((n, mmax), np.uint32)
        cnt1 = np.zeros(n, np.int64)
        cnt2 = np.zeros(n, np.int64)
        for i in range(lm):
            r = np.nonzero(flags1T[i])[0]
            if r.size:
                M1[r, cnt1[r]] = XT[i][r]
                cnt1[r] += 1
            r = np.nonzero(flags2T[i])[0]
            if r.size:
                M2[r, cnt2[r]] = YT[i][r]
                cnt2[r] += 1
        colmask = ar[:mmax][None, :] < m[:, None]
        transp = ((M1 != M2) & colmask).sum(axis=1)
    t = transp / 2
    ms = np.maximum(m, 1).astype(np.float64)
    ls1 = np.maximum(l1, 1).astype(np.float64)
    ls2 = np.maximum(l2, 1).astype(np.float64)
    j = (m / ls1 + m / ls2 + (m - t) / ms) / 3
    j = np.where(m > 0, j, 0.0)
    j = np.where(eq_all, 1.0, j)
    p = min(max_prefix, lm)
    eqp = (X[:, :p] == Y[:, :p]) & (ar[:p][None, :]
                                    < np.minimum(l1, l2)[:, None])
    prefix = np.cumprod(eqp, axis=1).sum(axis=1)
    return np.where(j > 0.7, j + prefix * prefix_weight * (1 - j), j)


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


def levenshtein(s1: str, s2: str) -> int:
    """Unit-cost edit distance (insert/delete/substitute) — scalar
    reference DP; semantics match DuckDB's ``levenshtein``."""
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def levenshtein_batch(xs, ys):
    """Vectorized-ACROSS-PAIRS Levenshtein for SHORT strings (blocking
    keys, name words): the DP grid loops are over the two max lengths
    (La·Lb scalar iterations), every cell update is a numpy op over
    ALL pairs at once — no per-pair python. Rows finish at their own
    ``len(y)`` via a result snapshot, so ragged pairs are exact.
    Returns int64 distances."""
    import numpy as np

    n = len(xs)
    if n == 0:
        return np.empty(0, np.int64)
    la = np.fromiter((len(s) for s in xs), np.int64, n)
    lb = np.fromiter((len(s) for s in ys), np.int64, n)
    La, Lb = int(la.max()), int(lb.max())
    # codepoint matrices padded with two DIFFERENT sentinels so padding
    # never matches anything
    A = np.full((n, La), -1, np.int64)
    B = np.full((n, Lb), -2, np.int64)
    for i, s in enumerate(xs):
        if s:
            A[i, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                          dtype=np.uint32).astype(np.int64)
    for i, s in enumerate(ys):
        if s:
            B[i, :len(s)] = np.frombuffer(s.encode("utf-32-le"),
                                          dtype=np.uint32).astype(np.int64)
    dp = np.broadcast_to(np.arange(La + 1, dtype=np.int64),
                         (n, La + 1)).copy()
    res = np.where(lb == 0, la, 0)
    for j in range(1, Lb + 1):
        new = np.empty_like(dp)
        new[:, 0] = j
        bj = B[:, j - 1]
        for i in range(1, La + 1):
            sub = dp[:, i - 1] + (A[:, i - 1] != bj)
            np.minimum(sub, dp[:, i] + 1, out=sub)
            np.minimum(sub, new[:, i - 1] + 1, out=sub)
            new[:, i] = sub
        dp = new
        done = lb == j
        if done.any():
            res[done] = dp[done, la[done]]
    return res
