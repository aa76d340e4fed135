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
import math

import numpy as np
import pyarrow as pa

from merge_machine_ray.functions.similarity import jaro_winkler
from merge_machine_ray.state.params import MatchParams

_EMPTY_I64 = np.empty(0, dtype=np.int64)
_EMPTY_F64 = np.empty(0, dtype=np.float64)


class PairScorer:
    """Actor-pool callable for ``map_batches(PairScorer, concurrency=N)``.

    Input: candidate-pair rows with per-side features (suffix ``_a`` /
    ``_b``): tok_hashes, and optionally url / host / lang. Output: the
    pair ids (+urls when present) + per-field similarities + weighted
    ``score`` + ``is_match``. Missing or empty fields contribute 0.
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.params
        batch = batch.combine_chunks()
        n = batch.num_rows
        names = set(batch.column_names)

        def col(name):
            return batch[name].to_pylist() if name in names else None

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
        path_a, path_b = col("path_a"), col("path_b")
        host_a, host_b = col("host_a"), col("host_b")
        lang_a, lang_b = col("lang_a"), col("lang_b")

        ids_a = batch["a"].to_pylist()
        ids_b = batch["b"].to_pylist()
        sim_text = np.zeros(n)
        sim_ints = np.zeros(n)
        sim_host = np.zeros(n)
        sim_url = np.zeros(n)
        sim_lang = np.zeros(n)
        # memoize per-doc tf·idf weights by doc id within the batch (docs
        # repeat across pairs — the reference's ref_id_to_data cache, ST2)
        cache: dict[int, tuple[np.ndarray, np.ndarray, float]] = {}
        jw_cache: dict[tuple[str, str], float] = {}

        def weights(doc_id: int, lc, i: int):
            got = cache.get(doc_id)
            if got is None:
                offsets, values = lc
                got = self._weights(values[offsets[i]:offsets[i + 1]])
                cache[doc_id] = got
            return got

        def jw(x: str, y: str) -> float:
            key = (x, y) if x <= y else (y, x)
            got = jw_cache.get(key)
            if got is None:
                got = jaro_winkler(x, y)
                jw_cache[key] = got
            return got

        if ints_a is not None:
            io_a, iv_a = ints_a
            io_b, iv_b = ints_b
        for i in range(n):
            ua, wa, na = weights(ids_a[i], toks_a, i)
            ub, wb, nb = weights(ids_b[i], toks_b, i)
            if na > 0 and nb > 0:
                # sorted-unique intersection via ONE searchsorted — no
                # concat+argsort per pair (np.intersect1d's constant)
                if ua.size <= ub.size:
                    pos = np.searchsorted(ub, ua).clip(max=ub.size - 1)
                    hit = ub[pos] == ua
                    if hit.any():
                        sim_text[i] = float(wa[hit] @ wb[pos[hit]]) \
                            / (na * nb)
                else:
                    pos = np.searchsorted(ua, ub).clip(max=ua.size - 1)
                    hit = ua[pos] == ub
                    if hit.any():
                        sim_text[i] = float(wb[hit] @ wa[pos[hit]]) \
                            / (na * nb)
            if ints_a is not None:
                la = iv_a[io_a[i]:io_a[i + 1]]
                lb = iv_b[io_b[i]:io_b[i + 1]]
                if la.size and lb.size:
                    # int_hashes are pre-sorted unique sets (featurize)
                    if la.size > lb.size:
                        la, lb = lb, la
                    pos = np.searchsorted(lb, la).clip(max=lb.size - 1)
                    inter = int((lb[pos] == la).sum())
                    if inter:
                        sim_ints[i] = inter / (la.size + lb.size - inter)
            if host_a is not None and host_a[i] and host_b[i]:
                sim_host[i] = jw(host_a[i], host_b[i])
            if path_a is not None and path_a[i] and path_b[i]:
                # JW over the pre-truncated url path (featurize keeps
                # exactly the 24-char slice JW consumes)
                sim_url[i] = jw(path_a[i], path_b[i])
            if lang_a is not None and lang_a[i] and lang_a[i] == lang_b[i]:
                sim_lang[i] = 1.0
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
