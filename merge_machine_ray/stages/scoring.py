"""Stage [5]: pairwise scoring actor pool (SURVEY.md §7.1).

The Ray equivalent of the reference's boosted must/should query
templates scored by Lucene BM25 (``merge_machine/query_templates.py``,
``helpers.py:65-152``): a weighted per-field similarity —
Jaro-Winkler on url/host, TF-IDF cosine on text tokens, exact match on
lang — computed inside a ``map_batches`` ACTOR pool whose ``__init__``
loads the precomputed IDF table once per actor (the reference's ES
corpus statistics, SURVEY.md §2.4 ST1).

The IDF table is broadcast once via ``ray.put`` on the driver and read
per actor in ``__init__`` — never re-shipped per batch.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from merge_machine_ray.functions.similarity import jaro_winkler
from merge_machine_ray.state.params import MatchParams


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

    def _weights(self, hashes: list[int]) -> tuple[dict[int, float], float]:
        from collections import Counter

        tf = Counter(hashes)
        w: dict[int, float] = {}
        for h, c in tf.items():
            i = int(np.searchsorted(self.idf_keys, h))
            if i < self.idf_keys.size and self.idf_keys[i] == h:
                w[h] = c * self.idf_vals[i]
            else:
                w[h] = c * self.default_idf
        norm = math.sqrt(sum(v * v for v in w.values()))
        return w, norm

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.params
        n = batch.num_rows
        names = set(batch.column_names)

        def col(name):
            return batch[name].to_pylist() if name in names else None

        toks_a, toks_b = col("tok_hashes_a"), col("tok_hashes_b")
        ints_a, ints_b = col("int_hashes_a"), col("int_hashes_b")
        url_a, url_b = col("url_a"), col("url_b")
        host_a, host_b = col("host_a"), col("host_b")
        lang_a, lang_b = col("lang_a"), col("lang_b")

        sim_text = np.zeros(n)
        sim_ints = np.zeros(n)
        sim_host = np.zeros(n)
        sim_url = np.zeros(n)
        sim_lang = np.zeros(n)
        # memoize per-doc tf·idf weights within the batch (docs repeat
        # across pairs — the reference's ref_id_to_data cache, ST2)
        cache: dict[tuple, tuple[dict[int, float], float]] = {}

        def weights(hs: list[int]):
            k = tuple(hs)
            got = cache.get(k)
            if got is None:
                got = self._weights(hs)
                cache[k] = got
            return got

        for i in range(n):
            wa, na = weights(toks_a[i])
            wb, nb = weights(toks_b[i])
            if na > 0 and nb > 0:
                small, large = (wa, wb) if len(wa) <= len(wb) else (wb, wa)
                dot = sum(v * large[h] for h, v in small.items() if h in large)
                sim_text[i] = dot / (na * nb)
            if ints_a is not None:
                sa, sb = set(ints_a[i]), set(ints_b[i])
                if sa and sb:
                    inter = len(sa & sb)
                    sim_ints[i] = inter / (len(sa) + len(sb) - inter)
            if host_a is not None and host_a[i] and host_b[i]:
                sim_host[i] = jaro_winkler(host_a[i], host_b[i])
            if url_a is not None and url_a[i] and url_b[i]:
                sim_url[i] = jaro_winkler(url_a[i], url_b[i])
            if lang_a is not None and lang_a[i] and lang_a[i] == lang_b[i]:
                sim_lang[i] = 1.0
        score = (p.w_text * sim_text + p.w_ints * sim_ints
                 + p.w_host * sim_host
                 + p.w_url * sim_url + p.w_lang * sim_lang)
        out = {"a": batch["a"], "b": batch["b"]}
        if url_a is not None:
            out["url_a"] = batch["url_a"]
            out["url_b"] = batch["url_b"]
        out.update({
            "sim_text": pa.array(sim_text), "sim_ints": pa.array(sim_ints),
            "sim_host": pa.array(sim_host),
            "sim_url": pa.array(sim_url), "sim_lang": pa.array(sim_lang),
            "score": pa.array(score),
            "is_match": pa.array(score >= p.threshold),
        })
        return pa.table(out)


def score_pairs(pairs_with_features, idf_ref=None, params=None,
                concurrency: int | tuple | None = None, batch_size: int = 2048):
    """Scoring stage. ``concurrency`` defaults to an AUTOSCALING pool
    (1, cpus-1): a fixed pool equal to the CPU count can reserve every
    core and starve the upstream band/shuffle stages into a deadlock —
    the pool must leave headroom for producers."""
    if concurrency is None:
        import ray

        total = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(1, total - 1))
    elif isinstance(concurrency, int):
        concurrency = (1, concurrency)
    return pairs_with_features.map_batches(
        PairScorer, fn_constructor_kwargs={"idf_ref": idf_ref, "params": params},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
