"""Source readers (SURVEY.md §2.1 S1/S2).

The reference loads every table as strings (``dtype=str``, NaN→'' —
``examples/example.py:49-54``) because ES analysis operates on text.
These wrappers reproduce that contract on Ray Datasets; chunking is
inherent (the streaming executor reads block-by-block), so the
reference's 40k-row chunked reader (S2) needs no special code path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _stringify(batch: pa.Table) -> pa.Table:
    cols = {}
    for name in batch.column_names:
        col = batch[name]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            cols[name] = pc.fill_null(col, "")
        else:
            cols[name] = pc.fill_null(col.cast(pa.string()), "")
    return pa.table(cols)


def read_source_csv(paths, **kwargs):
    """S1: CSV → all-string Dataset with nulls as '' (reference dirty
    'source' loading semantics)."""
    import ray.data as rd

    return rd.read_csv(paths, **kwargs).map_batches(
        _stringify, batch_format="pyarrow")


def read_source_parquet(paths, columns=None, **kwargs):
    """Parquet variant of the all-string contract (pruned at the read)."""
    import ray.data as rd

    return rd.read_parquet(paths, columns=columns, **kwargs).map_batches(
        _stringify, batch_format="pyarrow")


def read_source_json(paths, **kwargs):
    import ray.data as rd

    return rd.read_json(paths, **kwargs).map_batches(
        _stringify, batch_format="pyarrow")
