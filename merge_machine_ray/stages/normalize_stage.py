"""Stage [1]: extract + normalize + featurize (SURVEY.md §7.1).

One ``map_batches`` pass over zero-copy Arrow blocks that

* extracts visible text from ``html`` (when present) — byte-identical to
  the sequential oracle (BASELINE.json per-row invariant);
* normalizes text with the canonical vectorized chain;
* derives ``doc_id`` (stable 64-bit hash of the url), ``host`` and the
  hashed token array used by blocking + scoring;
* **drops ``html`` immediately** so downstream shuffles never move the
  heavy binary column (SURVEY.md §7.4).

Replaces the reference's insert-time pre-processing + ES analysis chain
(``merge_machine/es_insert.py:22-27,113-167``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from merge_machine_ray.functions.hashing import crc_hash64, stable_hash64
from merge_machine_ray.functions.normalize import (
    normalize_column,
    url_host,
)
from merge_machine_ray.functions.tokenize import ANALYZERS


def _to_i64(u: int) -> int:
    """uint64 → int64 two's-complement view (Arrow int64-friendly)."""
    return u - (1 << 64) if u >= (1 << 63) else u


_MASK31 = (1 << 31) - 1


def tok31(h: int) -> int:
    """31-bit token hash (int32-safe): token features ride every band
    row through the blocking shuffle, so halving their width halves the
    dominant shuffle payload. Collision odds ~k²/2³² stay negligible at
    corpus vocab sizes; the IDF table and oracle use the same fold."""
    return h & _MASK31


class Featurize:
    """Callable for ``map_batches(..., batch_format="pyarrow")``.

    Stateless per batch, but defined as a class so analyzer selection is
    resolved once. Input columns: ``url`` (+ ``html`` or ``text`` +
    optional ``lang``). Output: url, doc_id, host, lang, n_tokens,
    tok_hashes(list<int64>), norm_text (optionally dropped).
    """

    def __init__(self, analyzer: str = "standard", keep_norm_text: bool = False,
                 id_col: str = "url", text_col: str = "text"):
        self.analyzer = analyzer
        self._tokenize = ANALYZERS[analyzer]
        self.keep_norm_text = keep_norm_text
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = set(batch.column_names)
        if "html" in names:
            from merge_machine_ray.functions.normalize import (
                extract_text_column,
            )

            text = extract_text_column(batch["html"])
        else:
            text = batch[self.text_col]
        norm = normalize_column(text)
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()

        ids = batch[self.id_col].to_pylist()
        if self.id_col == "url":
            doc_id = [_to_i64(stable_hash64(u)) for u in ids]
            hosts = [url_host(u) for u in ids]
            # url path (host stripped, 48 chars) — all downstream
            # consumers (Jaro-Winkler) use exactly this slice, so the
            # full url never rides the shuffle
            paths = []
            for u, h in zip(ids, hosts):
                i = u.find(h) if h else -1
                paths.append((u[i + len(h):] if i >= 0 else u)[:24])
        else:
            doc_id = [int(i) for i in ids]
            hosts = [""] * len(ids)
            paths = [""] * len(ids)

        n = batch.num_rows
        if self.analyzer == "standard":
            tok_arr, n_tok_arr, int_arr = self._token_cols_vectorized(norm, n)
        else:
            tok_arr, n_tok_arr, int_arr = self._token_cols_scalar(norm)

        cols: dict[str, pa.Array] = {}
        if "url" in names:
            cols["url"] = batch["url"]
        cols["doc_id"] = pa.array(doc_id, pa.int64())
        cols["host"] = pa.array(hosts, pa.string())
        cols["path"] = pa.array(paths, pa.string())
        cols["lang"] = batch["lang"] if "lang" in names else pa.array(
            [""] * batch.num_rows, pa.string())
        cols["n_tokens"] = n_tok_arr
        cols["tok_hashes"] = tok_arr
        cols["int_hashes"] = int_arr
        if self.keep_norm_text:
            cols["norm_text"] = norm
        return pa.table(cols)

    @staticmethod
    def _hash_distinct31(tokens: pa.Array) -> "np.ndarray":
        """tok31(crc) per element, computed once per DISTINCT token."""
        import pyarrow.compute as pc

        enc = pc.dictionary_encode(tokens)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        v31 = np.fromiter((tok31(crc_hash64(t))
                           for t in enc.dictionary.to_pylist()),
                          np.int64, count=len(enc.dictionary))
        return v31[enc.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)] if len(enc) \
            else np.empty(0, np.int64)

    def _token_cols_vectorized(self, norm: pa.Array, n: int):
        """standard-analyzer fast path: flat tokenization (RE2 twin),
        distinct-level hashing, one lexsort for the int-shingle sets —
        byte-identical to the scalar loop (parity test in
        tests/test_pipeline_er.py)."""
        from merge_machine_ray.functions.tokenize import (
            integer_shingle_tokens_flat,
            standard_tokens_flat,
        )

        flat_t, off_t = standard_tokens_flat(norm)
        th = self._hash_distinct31(flat_t)
        tok_arr = pa.ListArray.from_arrays(
            pa.array(off_t, pa.int32()), pa.array(th.astype(np.int32)))
        n_tok_arr = pa.array(np.diff(off_t).astype(np.int32))
        irows, itoks = integer_shingle_tokens_flat(norm)
        ih = self._hash_distinct31(itoks)
        o = np.lexsort((ih, irows))
        r_s, v_s = irows[o], ih[o]
        keep = np.ones(r_s.size, bool)
        keep[1:] = (r_s[1:] != r_s[:-1]) | (v_s[1:] != v_s[:-1])
        r_u, v_u = r_s[keep], v_s[keep]
        ioff = np.concatenate(
            ([0], np.cumsum(np.bincount(r_u, minlength=n))))
        int_arr = pa.ListArray.from_arrays(
            pa.array(ioff, pa.int32()), pa.array(v_u.astype(np.int32)))
        return tok_arr, n_tok_arr, int_arr

    def _token_cols_scalar(self, norm: pa.Array):
        integers = ANALYZERS["integers"]
        tok_hash_lists = []
        int_hash_lists = []
        n_tokens = []
        # batch-level token→hash memo: the vocabulary repeats heavily
        # (stopwords, shared entity tokens), so most tokens hash once
        # per batch instead of once per occurrence (profiled: the hash
        # step was 38% of featurize)
        memo: dict[str, int] = {}
        for s in norm.to_pylist():
            toks = self._tokenize(s)
            n_tokens.append(len(toks))
            hl = []
            for t in toks:
                v = memo.get(t)
                if v is None:
                    v = tok31(crc_hash64(t))
                    memo[t] = v
                hl.append(v)
            tok_hash_lists.append(hl)
            # integers-analyzer feature set (reference A3): ids/codes
            # buried in text are strong per-entity discriminators
            ih = set()
            for t in integers(s):
                v = memo.get(t)
                if v is None:
                    v = tok31(crc_hash64(t))
                    memo[t] = v
                ih.add(v)
            int_hash_lists.append(sorted(ih))
        return (pa.array(tok_hash_lists, pa.list_(pa.int32())),
                pa.array(n_tokens, pa.int32()),
                pa.array(int_hash_lists, pa.list_(pa.int32())))


def featurize(ds, analyzer: str = "standard", keep_norm_text: bool = False,
              id_col: str = "url", text_col: str = "text", batch_size: int = 4096):
    return ds.map_batches(
        Featurize(analyzer=analyzer, keep_norm_text=keep_norm_text,
                  id_col=id_col, text_col=text_col),
        batch_format="pyarrow", batch_size=batch_size,
    )
