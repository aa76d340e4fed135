"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Each is a single vectorized ``map_batches`` stage; stopword tables and
compiled regexes live in the callable's ``__init__`` (once per actor),
matching the reference's analyzer-resource pattern (SURVEY.md §2.4 ST1).
"""

from __future__ import annotations

import re

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


class LangId:
    """Stopword-profile language ID (n-gram heuristic): the language
    whose stopword set covers the largest token fraction wins; 'und'
    (undetermined) when no profile reaches ``min_ratio``."""

    def __init__(self, col: str = "text", out_col: str = "lang_pred",
                 min_ratio: float = 0.05):
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.col = col
        self.out_col = out_col
        self.min_ratio = min_ratio

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for s in batch[self.col].to_pylist():
            toks = self.word.findall((s or "").lower())
            if not toks:
                preds.append("und")
                continue
            best_lang, best_hits = "und", 0
            for lang in sorted(LANG_PROFILES):
                hits = sum(1 for t in toks if t in LANG_PROFILES[lang])
                if hits > best_hits:
                    best_lang, best_hits = lang, hits
            preds.append(best_lang if best_hits / len(toks) >= self.min_ratio
                         else "und")
        return batch.append_column(self.out_col, pa.array(preds, pa.string()))


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
    signal: natural prose has a stable stopword rate)."""

    def __init__(self, col: str = "text", lang_col: str | None = "lang",
                 out_col: str = "stopword_ratio"):
        self.word = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.col = col
        self.lang_col = lang_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = (batch[self.lang_col].to_pylist()
                 if self.lang_col and self.lang_col in batch.column_names
                 else ["en"] * batch.num_rows)
        out = []
        for s, lang in zip(batch[self.col].to_pylist(), langs):
            toks = self.word.findall((s or "").lower())
            stops = LANG_PROFILES.get(lang, LANG_PROFILES["en"])
            out.append(sum(1 for t in toks if t in stops) / max(1, len(toks)))
        return batch.append_column(self.out_col, pa.array(out, pa.float64()))


def token_count(batch: pa.Table, col: str = "text",
                out_col: str = "n_tokens") -> pa.Table:
    """Whitespace token count — fully vectorized Arrow kernel."""
    text = pc.fill_null(batch[col], "")
    toks = pc.count_substring_regex(text, r"\S+")
    return batch.append_column(out_col, toks.cast(pa.int64()))


_BPE_ISH = re.compile(r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]")


def bpe_ish_token_count(batch: pa.Table, col: str = "text",
                        out_col: str = "n_bpe_tokens") -> pa.Table:
    """BPE-flavoured token proxy: letter runs + single digits + single
    punctuation marks (a cheap, deterministic stand-in for a trained
    BPE vocabulary)."""
    out = [len(_BPE_ISH.findall(s or "")) for s in batch[col].to_pylist()]
    return batch.append_column(out_col, pa.array(out, pa.int64()))


def fingerprint(batch: pa.Table, col: str = "text",
                out_col: str = "fingerprint", window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: min rolling-hash over
    ``window``-gram character windows of the normalized text — stable
    under whitespace-only edits."""
    out = []
    for s in batch[col].to_pylist():
        s = " ".join((s or "").split()).lower()
        if len(s) < window:
            out.append(crc_hash64(s) & _MASK63)
            continue
        best = min(crc_hash64(s[i : i + window])
                   for i in range(len(s) - window + 1))
        out.append(best & _MASK63)
    return batch.append_column(out_col, pa.array(out, pa.int64()))
