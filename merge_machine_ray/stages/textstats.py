"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Each is a single vectorized ``map_batches`` stage; stopword tables and
compiled regexes live in the callable's ``__init__`` (once per actor),
matching the reference's analyzer-resource pattern (SURVEY.md §2.4 ST1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from merge_machine_ray.functions.hashing import crc_hash64

_MASK63 = (1 << 63) - 1

# pinned per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for on with as are was at be "
                    "this have from or by not but they his her she he you we".split()),
    "fr": frozenset("le la les de des du un une et en est que qui dans pour "
                    "sur avec au aux ce cette il elle nous vous ils par pas".split()),
    "de": frozenset("der die das und ist von zu mit den dem ein eine nicht "
                    "auch auf für als sich im es an werden oder aber".split()),
    "es": frozenset("el la los las de del un una y en es que por con para "
                    "se su al lo como más pero sus le ya o este".split()),
}



def _token_stopword_hits(text_col, stop_arrs):
    """Shared vectorized core for LangId/StopwordRatio: lowercase +
    unicode-letter-run tokenize the whole column once, then per
    stopword table one ``pc.is_in`` over the UNIQUE tokens
    (dictionary-encoded once) and a ``np.bincount`` segment-sum per
    row. Returns ``(n_tok[n], hits[n, len(stop_arrs)])`` — no per-row
    python."""
    n = len(text_col)
    text = pc.utf8_lower(pc.fill_null(text_col, ""))
    toks = pc.split_pattern_regex(text, r"[^\p{L}]+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    flat = toks.values
    hits = np.zeros((n, len(stop_arrs)), dtype=np.int64)
    if not len(flat):
        return np.zeros(n, dtype=np.int64), hits
    # one row id per flat token: bincount over masked row ids is the
    # fast segment-sum (np.add.reduceat measured 4-5× slower here)
    row_ids = np.repeat(np.arange(n), np.diff(offsets))
    # dictionary-encode once: every membership test then runs over the
    # (few-thousand) UNIQUE tokens instead of re-hashing all ~millions
    # of flat tokens per language table
    enc = flat.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    uniq = enc.dictionary
    nonempty = pc.utf8_length(uniq).to_numpy(zero_copy_only=False) > 0
    n_tok = np.bincount(row_ids[nonempty[codes]], minlength=n)
    for li, arr in enumerate(stop_arrs):
        isin_u = pc.is_in(uniq, value_set=arr).to_numpy(
            zero_copy_only=False)
        hits[:, li] = np.bincount(row_ids[isin_u[codes]], minlength=n)
    return n_tok, hits


class LangId:
    """Stopword-profile language ID (n-gram heuristic): the language
    whose stopword set covers the largest token fraction wins; 'und'
    (undetermined) when no profile reaches ``min_ratio``.

    Vectorized: Arrow lowercase + regex split tokenizes the whole
    batch; per-language hits are one ``pc.is_in`` over the flattened
    token array + a segment-sum (``np.add.reduceat``) per row — no
    per-row python token loop. Stopword value-sets are built once in
    ``__init__``."""

    def __init__(self, col: str = "text", out_col: str = "lang_pred",
                 min_ratio: float = 0.05):
        self.col = col
        self.out_col = out_col
        self.min_ratio = min_ratio
        self.langs = sorted(LANG_PROFILES)
        self.stop_arrs = [pa.array(sorted(LANG_PROFILES[lang]))
                          for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        n_tok, hits = _token_stopword_hits(batch[self.col], self.stop_arrs)
        best = hits.argmax(axis=1)          # ties → first lang in sorted order
        best_hits = hits[np.arange(n), best]
        ok = (n_tok > 0) & (best_hits > 0) & \
            (best_hits / np.maximum(n_tok, 1) >= self.min_ratio)
        langs = np.array(self.langs)
        preds = np.where(ok, langs[best], "und")
        return batch.append_column(self.out_col, pa.array(preds.tolist(),
                                                          pa.string()))


def add_quality_scores(batch: pa.Table, col: str = "text") -> pa.Table:
    """Vectorized quality features: n_chars, n_tokens, mean token length,
    punctuation ratio, digit ratio, uppercase ratio. Arrow kernels only."""
    text = pc.fill_null(batch[col], "")
    n_chars = pc.utf8_length(text)
    toks = pc.count_substring_regex(text, r"\S+")
    punct = pc.count_substring_regex(text, r"[.,;:!?]")
    digits = pc.count_substring_regex(text, r"[0-9]")
    upper = pc.count_substring_regex(text, r"[A-Z]")
    denom = pc.max_element_wise(n_chars, pa.scalar(1, pa.int32()))
    out = batch
    out = out.append_column("n_chars_q", n_chars.cast(pa.int64()))
    out = out.append_column("n_tokens_q", toks.cast(pa.int64()))
    out = out.append_column(
        "punct_ratio", pc.divide(punct.cast(pa.float64()),
                                 denom.cast(pa.float64())))
    out = out.append_column(
        "digit_ratio", pc.divide(digits.cast(pa.float64()),
                                 denom.cast(pa.float64())))
    out = out.append_column(
        "upper_ratio", pc.divide(upper.cast(pa.float64()),
                                 denom.cast(pa.float64())))
    return out


class StopwordRatio:
    """Fraction of tokens that are stopwords of ``lang_col`` (quality
    signal: natural prose has a stable stopword rate).

    Vectorized through :func:`_token_stopword_hits` (one tokenize +
    one ``pc.is_in`` per language per batch); the row's language picks
    its hit column via ``pc.index_in`` — no per-row python loop.
    Tokens are unicode-letter runs of the lowered text, the same
    tokens LangId scores (round 1 ran a python ``findall`` per row)."""

    def __init__(self, col: str = "text", lang_col: str | None = "lang",
                 out_col: str = "stopword_ratio"):
        self.col = col
        self.lang_col = lang_col
        self.out_col = out_col
        self.langs = sorted(LANG_PROFILES)
        self.lang_arr = pa.array(self.langs)
        self.stop_arrs = [pa.array(sorted(LANG_PROFILES[lang]))
                          for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        n_tok, hits = _token_stopword_hits(batch[self.col], self.stop_arrs)
        en = self.langs.index("en")
        if self.lang_col and self.lang_col in batch.column_names:
            # unknown/missing languages fall back to the en profile
            sel = pc.index_in(pc.fill_null(batch[self.lang_col], "en"),
                              value_set=self.lang_arr)
            sel = pc.fill_null(sel, en).to_numpy(zero_copy_only=False)
        else:
            sel = np.full(n, en)
        chosen = hits[np.arange(n), sel]
        ratio = chosen / np.maximum(n_tok, 1)
        return batch.append_column(self.out_col,
                                   pa.array(ratio, pa.float64()))


def token_count(batch: pa.Table, col: str = "text",
                out_col: str = "n_tokens") -> pa.Table:
    """Whitespace token count — fully vectorized Arrow kernel."""
    text = pc.fill_null(batch[col], "")
    toks = pc.count_substring_regex(text, r"\S+")
    return batch.append_column(out_col, toks.cast(pa.int64()))


def bpe_ish_token_count(batch: pa.Table, col: str = "text",
                        out_col: str = "n_bpe_tokens") -> pa.Table:
    """BPE-flavoured token proxy: letter runs + single digits + single
    punctuation marks (a cheap, deterministic stand-in for a trained
    BPE vocabulary). One Arrow RE2 count kernel per batch (round 1 ran
    a python ``findall`` per row); the alternation has no overlapping
    branches, so RE2 leftmost-first counting matches python ``re``."""
    text = pc.fill_null(batch[col], "")
    out = pc.count_substring_regex(text, r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]")
    return batch.append_column(out_col, out.cast(pa.int64()))


_FP_POW = np.uint64(0x100000001B3)          # FNV-ish odd multiplier
_FP_MIX1 = np.uint64(0xFF51AFD7ED558CCD)     # murmur3 finalizer constants
_FP_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _window_hashes(data: np.ndarray, window: int) -> np.ndarray:
    """All ``window``-byte polynomial hashes of a byte array, fully
    vectorized: H[i] = Σ_j data[i+j]·P^(w−1−j) (uint64 wraparound), then
    a murmur-style finalizer so magnitude order doesn't leak into the
    min. ``window`` shifted adds — no per-window python calls."""
    m = data.size - window + 1
    h = np.zeros(m, dtype=np.uint64)
    p = np.uint64(1)
    for j in range(window - 1, -1, -1):
        h += data[j:j + m].astype(np.uint64) * p
        p *= _FP_POW
    h ^= h >> np.uint64(33)
    h *= _FP_MIX1
    h ^= h >> np.uint64(33)
    h *= _FP_MIX2
    h ^= h >> np.uint64(33)
    return h


def fingerprint(batch: pa.Table, col: str = "text",
                out_col: str = "fingerprint", window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: min rolling-hash over
    ``window``-byte windows of the whitespace-normalized lowercased
    text — stable under whitespace-only edits. One vectorized
    numpy pass per doc (round 1 hashed every window with a separate
    python crc call — O(len) python ops per doc)."""
    out = []
    with np.errstate(over="ignore"):
        for s in batch[col].to_pylist():
            s = " ".join((s or "").split()).lower()
            b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
            if b.size < window:
                out.append(crc_hash64(s) & _MASK63)
                continue
            out.append(int(_window_hashes(b, window).min()) & _MASK63)
    return batch.append_column(out_col, pa.array(out, pa.int64()))


# --------------------------------------------------------- PII scrubbing
# A 100 TB training-data pipeline redacts PII before anything else ships.
# All three patterns are RE2 (shared by Arrow and DuckDB, so the SQL twin
# replays them verbatim); replacement order is part of the contract:
# emails first (their local parts may contain digits), then IPs (dotted
# quads would otherwise half-match the phone rule), then phones.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\b\d{3}-\d{4}\b", "[PHONE]"),
)


def redact_pii(batch: pa.Table, col: str = "text",
               out_col: str = "clean_text",
               count_cols: bool = True) -> pa.Table:
    """Vectorized PII redaction: one ``pc.replace_substring_regex``
    pass per pattern (compiled RE2, no per-row python). With
    ``count_cols``, emits ``n_emails / n_ips / n_phones`` hit counts
    (counted on the ORIGINAL text, before any replacement)."""
    text = pc.fill_null(batch[col], "")
    if count_cols:
        names = ("n_emails", "n_ips", "n_phones")
        for (pat, _), name in zip(PII_PATTERNS, names):
            batch = batch.append_column(
                name, pc.count_substring_regex(text, pattern=pat)
                .cast(pa.int64()))
    clean = text
    for pat, repl in PII_PATTERNS:
        clean = pc.replace_substring_regex(clean, pattern=pat,
                                           replacement=repl)
    return batch.append_column(out_col, clean)


def repetition_stats(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition quality signals, fully vectorized:
    per-doc duplicate-token and duplicate-bigram fractions in exact
    integer micro units (``(10⁶·(n−distinct))//n`` — integer division,
    so the DuckDB twin's ``//`` matches bit-for-bit). Tokens are
    nonempty ``\\S+`` runs. One dictionary-encode of the flat token
    column + one lexsort per batch; bigrams are code pairs folded into
    int64 keys — no per-row python."""
    n = batch.num_rows
    text = pc.fill_null(batch[col], "")
    toks = pc.split_pattern_regex(text, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    n_tok = np.zeros(n, np.int64)
    dup_tok = np.zeros(n, np.int64)
    dup_bg = np.zeros(n, np.int64)
    if len(flat):
        row_ids = np.repeat(np.arange(n), np.diff(offsets))
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pc.utf8_length(enc.dictionary).to_numpy(
            zero_copy_only=False) > 0
        m = keep[codes]
        row_ids, codes = row_ids[m], codes[m]
        n_tok = np.bincount(row_ids, minlength=n).astype(np.int64)
        # distinct tokens per row: unique (row, code) pairs
        o = np.lexsort((codes, row_ids))
        r_s, c_s = row_ids[o], codes[o]
        first = np.empty(r_s.size, bool)
        first[:1] = True
        first[1:] = (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])
        d_tok = np.bincount(r_s[first], minlength=n).astype(np.int64)
        # bigrams: adjacent codes in ORIGINAL order within a row
        V = np.int64(len(enc.dictionary) + 1)
        same_row = row_ids[1:] == row_ids[:-1]
        bg_rows = row_ids[:-1][same_row]
        bg_keys = codes[:-1][same_row] * V + codes[1:][same_row]
        n_bg = np.bincount(bg_rows, minlength=n).astype(np.int64)
        ob = np.lexsort((bg_keys, bg_rows))
        br, bk = bg_rows[ob], bg_keys[ob]
        bfirst = np.empty(br.size, bool)
        bfirst[:1] = True
        bfirst[1:] = (br[1:] != br[:-1]) | (bk[1:] != bk[:-1])
        d_bg = np.bincount(br[bfirst], minlength=n).astype(np.int64)
        nz = n_tok > 0
        dup_tok[nz] = (1_000_000 * (n_tok[nz] - d_tok[nz])) // n_tok[nz]
        bz = n_bg > 0
        dup_bg[bz] = (1_000_000 * (n_bg[bz] - d_bg[bz])) // n_bg[bz]
    return batch.append_column("n_tokens_r", pa.array(n_tok)) \
        .append_column("dup_token_frac_micro", pa.array(dup_tok)) \
        .append_column("dup_bigram_frac_micro", pa.array(dup_bg))
