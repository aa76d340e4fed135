"""LLM sequence packing: global token offsets over a deterministic
corpus order.

The step after chunking/mixture in a training-data pipeline: documents
are concatenated in a reproducible shuffle order and the flat token
stream is cut into fixed-length training sequences that CROSS document
boundaries (the standard "pack then split every ``seq_len`` tokens"
scheme).  The deliverable per document is its global token offset and
the [first, last] training-sequence ids it lands in — enough to
materialize any sequence shard independently, which is what makes the
write side resumable.

Scale shape (the reason this isn't ``ds.sort`` + a window): a global
prefix sum in a fixed order.  The order key is the multiplicative hash
used by ``stages/sketch`` (pure function of the id — stable across
runs and partitionings, SQL-replayable).  Because the hash is uniform,
its TOP BITS are a pre-sorted range partitioner: bucket ``h >> shift``
ascending is exactly global ``(h, id)`` order.  So the job is

1. one narrow partial-sum pass → per-bucket token totals (≤ n_buckets
   rows to the driver — bounded, never corpus-sized),
2. an exclusive prefix sum over those totals = each bucket's global
   base offset (driver, tiny),
3. one bucketed window pass (``stages/window``: lexsort + cumsum per
   bucket) → within-bucket running totals, plus the broadcast base.

Two narrow exchanges carrying (id, hash, n_tokens) rows; text never
rides a shuffle.  No global range sort, no driver materialization of
the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from merge_machine_ray.stages.sketch import _KNUTH, _MOD
from merge_machine_ray.stages.window import WindowSpec, window

__all__ = ["packed_sequences", "packed_sequences_sql", "token_offsets"]


def _feats_fn(id_col: str, text_col: str, shift: int):
    from merge_machine_ray.stages.decontam import _split_tokens

    def feats(t: pa.Table) -> pa.Table:
        toks = _split_tokens(t[text_col])
        n = np.diff(toks.offsets.to_numpy(zero_copy_only=False)
                    .astype(np.int64))
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_MOD)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n),
            "__h": pa.array(h.astype(np.int64)),
            "__pbkt": pa.array((h >> np.uint64(shift)).astype(np.int32)),
        })

    return feats


def token_offsets(ds, id_col: str = "doc_id", text_col: str = "text",
                  n_buckets: int = 256):
    """Dataset → (id, n_tokens, tok_start) with ``tok_start`` the
    row's exclusive prefix sum of whitespace-token counts in global
    ``(mhash(id), id)`` order.  See module docstring for the shape."""
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
    shift = 32 - (n_buckets.bit_length() - 1)
    feats = ds.map_batches(_feats_fn(id_col, text_col, shift),
                           batch_format="pyarrow")

    # pass 1: per-bucket totals → driver prefix sum (≤ n_buckets rows)
    totals = {int(r["__pbkt"]): int(r["sum(n_tokens)"])
              for r in feats.groupby("__pbkt").sum("n_tokens")
              .take_all()}
    base = np.zeros(n_buckets + 1, dtype=np.int64)
    for b, s in totals.items():
        base[b + 1] = s
    base = np.cumsum(base)[:-1]  # exclusive: tokens in buckets < b

    # pass 2: within-bucket cumsum in (h, id) order
    spec = WindowSpec(partition_by="__pbkt",
                      order_by=[("__h", False), (id_col, False)],
                      cum_sum={"__cum": "n_tokens"})
    w = window(feats, spec, keep_cols=[id_col, "n_tokens", "__pbkt"])

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        cum = t["__cum"].to_numpy(zero_copy_only=False)
        bkt = t["__pbkt"].to_numpy(zero_copy_only=False).astype(np.int64)
        start = cum - n + base[bkt]
        return pa.table({id_col: t[id_col], "n_tokens": t["n_tokens"],
                         "tok_start": pa.array(start)})

    return w.map_batches(finish, batch_format="pyarrow")


def packed_sequences(ds, seq_len: int, id_col: str = "doc_id",
                     text_col: str = "text", n_buckets: int = 256):
    """Per-document packed-sequence assignment: append to
    :func:`token_offsets` the first/last training-sequence ids the doc
    occupies when the concatenated corpus is cut every ``seq_len``
    tokens (``seq_first = tok_start // L``,
    ``seq_last = (tok_start + n_tokens - 1) // L``) and the number of
    sequences spanned.  Every column is exact int64 arithmetic, so the
    DuckDB twin (:func:`packed_sequences_sql`) matches bit for bit."""
    off = token_offsets(ds, id_col=id_col, text_col=text_col,
                        n_buckets=n_buckets)

    def seqs(t: pa.Table) -> pa.Table:
        s = t["tok_start"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        first = s // seq_len
        last = (s + n - 1) // seq_len  # n ≥ 1 always ('' → [''])
        return pa.table({
            id_col: t[id_col], "n_tokens": t["n_tokens"],
            "tok_start": t["tok_start"],
            "seq_first": pa.array(first), "seq_last": pa.array(last),
            "n_seqs": pa.array(last - first + 1),
        })

    return off.map_batches(seqs, batch_format="pyarrow")


def packed_sequences_sql(table: str, seq_len: int,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """DuckDB twin of :func:`packed_sequences`: the same hash order as
    one window cumsum (global ``ORDER BY (h, id)`` equals the engine's
    bucket-then-within-bucket order because the bucket is the hash's
    top bits)."""
    return f"""
WITH t AS (
  SELECT {id_col},
         CAST(len(string_split({text_col}, ' ')) AS BIGINT) AS n_tokens,
         (CAST({id_col} AS HUGEINT) * {_KNUTH}) % {_MOD} AS h
  FROM {table}),
c AS (
  SELECT {id_col}, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY h, {id_col}) AS BIGINT)
             - n_tokens AS tok_start
  FROM t)
SELECT {id_col}, n_tokens, tok_start,
       tok_start // {seq_len} AS seq_first,
       (tok_start + n_tokens - 1) // {seq_len} AS seq_last,
       (tok_start + n_tokens - 1) // {seq_len}
           - tok_start // {seq_len} + 1 AS n_seqs
FROM c
"""
