"""Per-record B-cubed precision/recall — the record-level ER quality
metric (Bagga & Baldwin 1998; Amigó et al. 2009 showed it is the
extrinsic clustering metric that satisfies all four formal
constraints). For record i with predicted cluster C(i) and truth
cluster T(i):

    precision(i) = |C(i) ∩ T(i)| / |C(i)|
    recall(i)    = |C(i) ∩ T(i)| / |T(i)|

Complements the PAIRWISE agreement metric (``queries.cluster_agreement``):
pairwise scores are dominated by the largest clusters (C(n,2) weighting),
B-cubed weights every record equally — evaluation suites report both.

Ray-native shape (same as ``stages/window.py``): the (id, pred, truth)
assignment table rides TWO narrow bucketed exchanges — first keyed by
the predicted cluster (cells C∩T nest inside C, so |C| and |C∩T| are
both segment counts of one lexsort), then keyed by the truth cluster
for |T|. Per-bucket work is one lexsort + bincount — no per-partition
python, no all-pairs anything. Ratios are exact half-up integer micros
(floor((n·1e6)/d + 0.5) in pure int64) so the DuckDB twin can reproduce
them bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from merge_machine_ray.stages.pairs import auto_buckets
from merge_machine_ray.stages.window import _partition_hash, _sort_key

__all__ = ["bcubed_per_record"]


def _seg_counts(keys: tuple[np.ndarray, ...]) -> np.ndarray:
    """Per-row count of rows sharing the composite key, in ORIGINAL row
    order. One lexsort + segment-boundary bincount; exact (the keys are
    injective per distinct value — ``_sort_key`` ranks, not hashes)."""
    n = keys[0].size
    o = np.lexsort(tuple(reversed(keys)))
    change = np.zeros(n, bool)
    change[:1] = True
    for k in keys:
        kv = k[o]
        change[1:] |= kv[1:] != kv[:-1]
    seg_id = np.cumsum(change) - 1
    per_sorted = np.bincount(seg_id)[seg_id]
    out = np.empty(n, np.int64)
    out[o] = per_sorted
    return out


def _ratio_micro_vec(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """Vector twin of ``queries._ratio_micro``: half-up integer micro
    ratio in pure int64 (no float, no rounding-mode divergence vs SQL).
    Denominators here are segment counts ≥ 1, so no zero guard."""
    return (num * 2_000_000 + den) // (2 * den)


def bcubed_per_record(assign_ds, id_col: str = "doc_id",
                      pred_col: str = "cluster_id",
                      truth_col: str = "rep_id",
                      num_buckets: int | None = None):
    """Dataset of (id, predicted cluster, truth cluster) → Dataset of
    per-record B-cubed rows: ``(id_col, cell_n, csize, tsize,
    b3_prec_micro, b3_rec_micro)`` — intersection size, predicted and
    truth cluster sizes, and the two exact integer-micro ratios.
    Corpus-level B³ P/R is then a plain mean over records (weighting
    every record equally is the point of the metric)."""
    if num_buckets is None:
        num_buckets = auto_buckets(assign_ds.count())

    def bucket_by(col: str):
        def add(t: pa.Table) -> pa.Table:
            h = _partition_hash(t[col]) % np.uint64(num_buckets)
            return t.append_column(
                "__bucket", pa.array(h.astype(np.int32)))
        return add

    def pred_pass(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        pk = _sort_key(g[pred_col], False)
        tk = _sort_key(g[truth_col], False)
        return pa.table({
            id_col: g[id_col],
            truth_col: g[truth_col],
            "cell_n": pa.array(_seg_counts((pk, tk))),
            "csize": pa.array(_seg_counts((pk,))),
        })

    def truth_pass(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        tk = _sort_key(g[truth_col], False)
        tsize = _seg_counts((tk,))
        cell = g["cell_n"].to_numpy(zero_copy_only=False)
        csize = g["csize"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: g[id_col],
            "cell_n": g["cell_n"],
            "csize": g["csize"],
            "tsize": pa.array(tsize),
            "b3_prec_micro": pa.array(_ratio_micro_vec(cell, csize)),
            "b3_rec_micro": pa.array(_ratio_micro_vec(cell, tsize)),
        })

    keyed = assign_ds.select_columns([id_col, pred_col, truth_col])
    return (keyed
            .map_batches(bucket_by(pred_col), batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(pred_pass, batch_format="pyarrow")
            .map_batches(bucket_by(truth_col), batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(truth_pass, batch_format="pyarrow"))
