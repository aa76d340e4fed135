"""Stage [5]: pairwise scoring (SURVEY.md §7.1).

The Ray equivalent of the reference's boosted must/should query
templates scored by Lucene BM25 (``merge_machine/query_templates.py``,
``helpers.py:65-152``): a weighted per-field similarity —
Jaro-Winkler on url/host, TF-IDF cosine on text tokens, integers-
analyzer Jaccard, exact match on lang.

State model: the precomputed IDF table (the reference's ES corpus
statistics, ST1) is broadcast ONCE via ``ray.put`` and read zero-copy
inside STATELESS map_batches tasks through a per-worker-process cache —
never re-shipped per batch. An explicit actor pool remains available
via the ``concurrency`` argument, but the task form is the default: a
fixed actor pool reserves its CPUs up front and starves the upstream
shuffle stages (measured), while tasks share CPUs work-conservingly.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from merge_machine_ray.functions.similarity import (
    jaro_winkler,
    jaro_winkler_batch,
)
from merge_machine_ray.state.params import MatchParams

_EMPTY_I64 = np.empty(0, dtype=np.int64)
_EMPTY_F64 = np.empty(0, dtype=np.float64)


class PairScorer:
    """Actor-pool callable for ``map_batches(PairScorer, concurrency=N)``.

    Input: candidate-pair rows with per-side features (suffix ``_a`` /
    ``_b``): tok_hashes, and optionally url / host / lang. Output: the
    pair ids + per-field similarities + weighted ``score`` +
    ``is_match``. Missing or empty fields contribute 0.

    FULLY vectorized across the batch (the LinkScorer flat form,
    pipelines/linking.py:458): both sides' ragged token lists are
    deduped per row with ONE lexsort, IDF is one searchsorted over the
    flat uniques, norms accumulate with ``np.add.at`` (element-
    sequential → deterministic), and the per-pair sparse dot products /
    set intersections come from one lexsort + adjacent-equal merge.
    Jaro-Winkler runs once per DISTINCT string pair (dictionary-encode
    + cross-batch cache — the reference's ref_id_to_data cache, ST2).
    """

    def __init__(self, idf_ref=None, params: dict | MatchParams | None = None):
        import ray

        idf = ray.get(idf_ref) if isinstance(idf_ref, ray.ObjectRef) else idf_ref
        if idf is None:
            self.idf_keys = np.empty(0, dtype=np.int64)
            self.idf_vals = np.empty(0, dtype=np.float64)
            self.default_idf = 1.0
        else:
            self.idf_keys = idf["keys"]
            self.idf_vals = idf["vals"]
            self.default_idf = float(idf["default"])
        self.params = MatchParams.from_any(params)
        self._jw_cache: dict[tuple[str, str], float] = {}

    def _weights(self, hashes) -> tuple[np.ndarray, np.ndarray, float]:
        """→ (sorted unique hashes, tf·idf weights, vector norm) — fully
        vectorized (one searchsorted per doc, not per token). Accepts a
        python list or a numpy view over arrow list-buffer values."""
        if len(hashes) == 0:
            return _EMPTY_I64, _EMPTY_F64, 0.0
        arr = np.asarray(hashes, dtype=np.int64)
        uniq, counts = np.unique(arr, return_counts=True)
        if self.idf_keys.size:
            pos = np.searchsorted(self.idf_keys, uniq).clip(
                max=self.idf_keys.size - 1)
            hit = self.idf_keys[pos] == uniq
            idf = np.where(hit, self.idf_vals[pos], self.default_idf)
        else:
            idf = np.full(uniq.size, self.default_idf)
        w = counts * idf
        return uniq, w, float(np.sqrt((w * w).sum()))

    def _idf_of(self, vals: np.ndarray) -> np.ndarray:
        """IDF lookup for a flat hash array (searchsorted + hit check)."""
        if self.idf_keys.size and vals.size:
            pos = np.searchsorted(self.idf_keys, vals).clip(
                max=self.idf_keys.size - 1)
            hit = self.idf_keys[pos] == vals
            return np.where(hit, self.idf_vals[pos], self.default_idf)
        return np.full(vals.size, self.default_idf)

    @staticmethod
    def _row_unique(offsets: np.ndarray, values: np.ndarray, n: int):
        """Flat list column → per-row sorted-unique entries with counts:
        (row_ids, uniq_vals, counts), ascending by (row, hash). One
        lexsort over the whole batch — the vectorized replacement for a
        per-row ``np.unique`` (LinkScorer's flat form, linking.py:458)."""
        if values.size == 0:
            return _EMPTY_I64, _EMPTY_I64, _EMPTY_I64
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        o = np.lexsort((values, rows))
        r, v = rows[o], values[o]
        first = np.concatenate(
            ([True], (r[1:] != r[:-1]) | (v[1:] != v[:-1])))
        starts = np.flatnonzero(first)
        cnts = np.diff(np.concatenate((starts, [r.size])))
        return r[starts], v[starts], cnts

    @staticmethod
    def _merge_dot(rows_a, keys_a, w_a, rows_b, keys_b, w_b, n):
        """Per-row sparse dot product of two flat (row, key, weight)
        sets by ONE lexsort + adjacent-equal merge (no per-pair python).
        ``np.add.at`` accumulates element-sequentially in ascending
        (row, hash) order — deterministic, matches a scalar loop."""
        R = np.concatenate((rows_a, rows_b))
        K = np.concatenate((keys_a, keys_b))
        S = np.concatenate((np.zeros(rows_a.size, np.int8),
                            np.ones(rows_b.size, np.int8)))
        W = np.concatenate((w_a, w_b))
        o = np.lexsort((S, K, R))
        Ro, Ko, So, Wo = R[o], K[o], S[o], W[o]
        m = ((Ro[1:] == Ro[:-1]) & (Ko[1:] == Ko[:-1])
             & (So[:-1] == 0) & (So[1:] == 1))
        num = np.zeros(n)
        if m.any():
            np.add.at(num, Ro[:-1][m], Wo[:-1][m] * Wo[1:][m])
        return num

    def _jw_col(self, batch: pa.Table, name_a: str, name_b: str,
                n: int) -> np.ndarray:
        """Vectorized Jaro-Winkler column: dictionary-encode the
        distinct (a, b) string pairs (docs repeat across pairs — the
        reference's ref_id_to_data cache, ST2), compute JW once per
        distinct pair through the cross-batch cache, scatter back."""
        ca, cb = batch[name_a], batch[name_b]
        valid = pc.and_kleene(
            pc.and_kleene(ca.is_valid(), cb.is_valid()),
            pc.and_kleene(pc.not_equal(ca, ""), pc.not_equal(cb, "")))
        mask = pc.fill_null(valid, False).to_numpy(zero_copy_only=False)
        if not mask.any():
            return np.zeros(n)
        combined = pc.binary_join_element_wise(
            pc.fill_null(ca, ""), pc.fill_null(cb, ""), "\x00")
        if isinstance(combined, pa.ChunkedArray):
            combined = combined.combine_chunks()
        enc = combined.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        vals = np.empty(len(enc.dictionary))
        miss_j: list[int] = []
        miss_x: list[str] = []
        miss_y: list[str] = []
        miss_key: list[tuple] = []
        for j, s in enumerate(enc.dictionary.to_pylist()):
            x, y = s.split("\x00", 1)
            key = (x, y) if x <= y else (y, x)
            got = self._jw_cache.get(key)
            if got is None:
                miss_j.append(j)
                miss_x.append(x)
                miss_y.append(y)
                miss_key.append(key)
            else:
                vals[j] = got
        if miss_j:
            if len(miss_j) >= 64:
                # numpy-batched JW over the miss set (exact emulation of
                # the scalar greedy matcher; ~10× at 100k+ misses)
                mv = jaro_winkler_batch(miss_x, miss_y)
            else:
                mv = [jaro_winkler(x, y)
                      for x, y in zip(miss_x, miss_y)]
            for j, key, v in zip(miss_j, miss_key, mv):
                v = float(v)
                self._jw_cache[key] = v
                vals[j] = v
        if len(self._jw_cache) > 1_000_000:
            self._jw_cache.clear()
        return np.where(mask, vals[codes], 0.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.params
        batch = batch.combine_chunks()
        n = batch.num_rows
        names = set(batch.column_names)

        def list_col(name):
            """list<int32/64> column → (offsets, values) numpy views —
            avoids a python-list materialization per row."""
            if name not in names:
                return None
            arr = batch[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            return (arr.offsets.to_numpy(zero_copy_only=False),
                    arr.values.to_numpy(zero_copy_only=False))

        toks_a, toks_b = list_col("tok_hashes_a"), list_col("tok_hashes_b")
        ints_a, ints_b = list_col("int_hashes_a"), list_col("int_hashes_b")

        sim_text = np.zeros(n)
        sim_ints = np.zeros(n)
        sim_host = np.zeros(n)
        sim_url = np.zeros(n)
        sim_lang = np.zeros(n)

        # -- tf·idf cosine over token hashes: flat lexsort-merge form --
        if toks_a is not None and n:
            ra, va, ca_cnt = self._row_unique(toks_a[0], toks_a[1], n)
            rb, vb, cb_cnt = self._row_unique(toks_b[0], toks_b[1], n)
            wa = ca_cnt * self._idf_of(va)
            wb = cb_cnt * self._idf_of(vb)
            na2 = np.zeros(n)
            nb2 = np.zeros(n)
            np.add.at(na2, ra, wa * wa)
            np.add.at(nb2, rb, wb * wb)
            denom = np.sqrt(na2) * np.sqrt(nb2)
            num = self._merge_dot(ra, va, wa, rb, vb, wb, n)
            np.divide(num, denom, out=sim_text, where=denom > 0)

        # -- integers-analyzer Jaccard: int_hashes are pre-sorted unique
        # sets (featurize), so counts are 1 and the merge counts the
        # intersection directly --
        if ints_a is not None and n:
            io_a, iv_a = ints_a
            io_b, iv_b = ints_b
            sz_a = np.diff(io_a).astype(np.float64)
            sz_b = np.diff(io_b).astype(np.float64)
            rows_ia = np.repeat(np.arange(n, dtype=np.int64), np.diff(io_a))
            rows_ib = np.repeat(np.arange(n, dtype=np.int64), np.diff(io_b))
            inter = self._merge_dot(
                rows_ia, iv_a.astype(np.int64, copy=False),
                np.ones(iv_a.size),
                rows_ib, iv_b.astype(np.int64, copy=False),
                np.ones(iv_b.size), n)
            union = sz_a + sz_b - inter
            np.divide(inter, union, out=sim_ints, where=union > 0)

        if "host_a" in names and n:
            sim_host = self._jw_col(batch, "host_a", "host_b", n)
        if "path_a" in names and n:
            # JW over the pre-truncated url path (featurize keeps
            # exactly the 24-char slice JW consumes)
            sim_url = self._jw_col(batch, "path_a", "path_b", n)
        if "lang_a" in names and n:
            la, lb = batch["lang_a"], batch["lang_b"]
            eq = pc.and_kleene(pc.equal(la, lb), pc.not_equal(la, ""))
            sim_lang = pc.fill_null(eq, False) \
                .to_numpy(zero_copy_only=False).astype(np.float64)

        score = (p.w_text * sim_text + p.w_ints * sim_ints
                 + p.w_host * sim_host
                 + p.w_url * sim_url + p.w_lang * sim_lang)
        out = {"a": batch["a"], "b": batch["b"]}
        out.update({
            "sim_text": pa.array(sim_text), "sim_ints": pa.array(sim_ints),
            "sim_host": pa.array(sim_host),
            "sim_url": pa.array(sim_url), "sim_lang": pa.array(sim_lang),
            "score": pa.array(score),
            "is_match": pa.array(score >= p.threshold),
        })
        return pa.table(out)


_SCORER_CACHE: dict = {}


def _scorer_for(idf_ref, params_json: str) -> PairScorer:
    """Per-worker-process scorer cache. The IDF table is immutable
    broadcast state: ``ray.get`` of the same ObjectRef inside a task is
    a zero-copy shared-memory read, so STATELESS tasks with a process
    cache beat an actor pool here — a fixed actor pool RESERVES its
    CPUs up front and starves the upstream shuffle stages (observed:
    32-cpu run slower than 8-cpu), while tasks share CPUs work-
    conservingly with the producers."""
    key = (idf_ref.hex() if hasattr(idf_ref, "hex") else id(idf_ref),
           params_json)
    got = _SCORER_CACHE.get(key)
    if got is None:
        got = PairScorer(idf_ref=idf_ref, params=json.loads(params_json))
        _SCORER_CACHE.clear()
        _SCORER_CACHE[key] = got
    return got


def score_pairs(pairs_with_features, idf_ref=None, params=None,
                concurrency: int | tuple | None = None, batch_size: int = 8192):
    """Scoring stage as a stateless task pool with per-worker scorer
    cache (see _scorer_for). ``concurrency`` is accepted for explicit
    actor-pool mode (tests / constrained environments)."""
    if concurrency is not None:
        if isinstance(concurrency, int):
            concurrency = (1, concurrency)
        return pairs_with_features.map_batches(
            PairScorer,
            fn_constructor_kwargs={"idf_ref": idf_ref, "params": params},
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency)
    from dataclasses import asdict

    params_json = json.dumps(asdict(MatchParams.from_any(params)),
                             sort_keys=True)

    def score(batch: pa.Table) -> pa.Table:
        return _scorer_for(idf_ref, params_json)(batch)

    return pairs_with_features.map_batches(
        score, batch_format="pyarrow", batch_size=batch_size)
