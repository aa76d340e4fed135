"""Zero-copy extraction of embedding columns to numpy matrices.

An Arrow ``list<float>`` / ``fixed_size_list<float>`` column is one
contiguous values buffer plus offsets; reading it row-by-row with
``to_pylist()`` boxes every float through Python (measured ~50× slower
than reshaping the flat buffer). Every vector stage (ANN, hyperplane
LSH, IVF) goes through :func:`list_to_matrix` instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """``list<number>`` column (uniform row length) → ``(n, dim)``
    numpy matrix, reshaping the flat Arrow values buffer — no per-row
    Python boxing. Raises on ragged rows or nulls (embedding columns
    are dense by contract)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError("embedding column contains nulls")
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
    else:
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        dim = int(widths[0])
        if not (widths == dim).all():
            raise ValueError("ragged embedding column")
    # flatten() honors slice offsets and returns the values for exactly
    # these rows (zero-copy when the column is dense)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(dtype, copy=False).reshape(n, dim)
