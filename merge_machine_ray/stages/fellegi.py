"""Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter,
JASA 1969) — the foundational decision model for ER: each candidate
pair gets a comparison vector γ of per-field agreement indicators; the
model parameters are, per field k,

    m_k = P(γ_k = agree | pair is a true match)
    u_k = P(γ_k = agree | pair is a non-match)

and the pair's match weight is Σ_k log(m_k/u_k) over agreeing fields
(+ log((1-m)/(1-u)) over disagreeing ones). This module provides the
three distributed pieces:

- ``comparison_vectors``: blocked + deterministically SAMPLED candidate
  pairs with per-field agreement columns (the γ table). Sampling is a
  per-block hash-ranked cap (the standard way to bound the quadratic
  pair space when estimating parameters — u in particular only needs a
  sample of non-matches, Fellegi & Sunter §3.3);
- ``fs_weights``: supervised m/u estimation against a truth label —
  exact integer-micro output so a DuckDB twin reproduces it bit-for-bit;
- ``fs_em``: the classic UNSUPERVISED EM estimation (Winkler 1988)
  over the agreement-PATTERN histogram — the E/M steps run on the
  driver over 2^k pattern counts (k small by construction); only the
  histogram fold is distributed.

Reference scope note: the reference engine learns per-template
query-confidence thresholds from labeller feedback
(es_labeller.py's precision/recall machinery); Fellegi-Sunter is the
classical statistical counterpart a record-linkage engine is expected
to expose, and the learned ``mu_ratio`` ranking plays the same role as
the reference's template confidence ordering.

Ray-native shape: the sampled γ table is tiny by construction
(cap²/2 pairs per block × blocks actually touched), every fold is a
map-side partial + one small groupby-sum; nothing corpus-sized ever
reaches the driver."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

__all__ = ["comparison_vectors", "fs_weights", "fs_em"]

#: Same knob as ``pipelines/queries.DRIVER_EVAL_LIMIT``: an input at
#: or under this many rows builds its γ pairs on the driver with the
#: IDENTICAL pair-emit kernel (the blocked sample is a few narrow
#: columns per row — plus the truth string, so order hundreds of MB
#: at the 2M cap — and at bench scale the window + bucketed-groupby
#: exchanges were pure per-stage overhead: measured ~5 s → <1 s for
#: 5,000 docs). Above it the two-exchange distributed path runs
#: unchanged. Forced-gate parity tested.
DRIVER_SAMPLE_LIMIT = int(os.environ.get("DRIVER_EVAL_LIMIT",
                                         "2000000"))

#: The row gate alone does not bound the OUTPUT: Σ C(min(block, cap),
#: 2) pairs can reach ~cap/2 × the input rows (63M pairs from 2M rows
#: of dense cap-64 blocks). The driver path additionally computes the
#: EXACT capped pair count from the run lengths (free — the runs are
#: already ranked) and falls back to the distributed emit above this.
DRIVER_PAIR_LIMIT = int(os.environ.get("DRIVER_PAIR_LIMIT",
                                       "10000000"))


def comparison_vectors(ds, block_col: str, field_cols: list[str],
                       id_col: str = "doc_id",
                       truth_col: str | None = None, cap: int = 64,
                       num_buckets: int = 64,
                       n_rows: int | None = None):
    """Dataset with (id, block key, comparison fields[, truth key]) →
    Dataset of candidate pairs ``(id_a, id_b, agree_<f>... [, is_match])``
    — all pairs within a block, after capping each block to its first
    ``cap`` rows under the deterministic multiplicative id-hash order
    (``stages/sketch``'s Knuth hash; ties by id). agreement = exact
    equality of the field values (equality semantics match SQL ``=`` on
    non-null values — callers fill nulls).

    One narrow exchange keyed by block-hash bucket; within a bucket,
    blocks are contiguous runs of one lexsort and pair emission is a
    vectorized position-distance sweep (no per-block python).

    ``n_rows``: caller-supplied input row count (cheap for parquet-
    backed callers). When given and ≤ ``DRIVER_SAMPLE_LIMIT``, the
    narrow input collects to the driver and the SAME rank/cap rule and
    the SAME ``emit`` kernel run locally — identical pairs, zero
    exchanges (forced-gate parity tested). Opt-in so no caller pays a
    hidden extra ``count()`` execution pass."""
    import pyarrow.compute as pc

    from merge_machine_ray.stages.sketch import _KNUTH, _MOD
    from merge_machine_ray.stages.window import WindowSpec, window

    cols = [id_col, block_col, *field_cols] + (
        [truth_col] if truth_col else [])

    def add_hkey(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        hk = (ids * np.uint64(_KNUTH) % np.uint64(_MOD)).astype(np.int64)
        return t.select(cols).append_column("hkey", pa.array(hk))

    spec = WindowSpec(partition_by=block_col,
                      order_by=[("hkey", False), (id_col, False)],
                      row_number="rk")
    ranked = window(ds.map_batches(add_hkey, batch_format="pyarrow"),
                    spec, keep_cols=cols)
    sampled = ranked.map_batches(
        lambda t: t.filter(pc.less_equal(t["rk"], cap)).select(cols),
        batch_format="pyarrow")

    from merge_machine_ray.stages.window import _partition_hash

    def add_bucket(t: pa.Table) -> pa.Table:
        h = _partition_hash(t[block_col]) % np.uint64(num_buckets)
        return t.append_column("__bkt", pa.array(h.astype(np.int32)))

    cmp_cols = list(field_cols) + ([truth_col] if truth_col else [])
    out_names = [f"agree_{f}" for f in field_cols] + (
        ["is_match"] if truth_col else [])

    def _codes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        """Equality-preserving int codes for any column type."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_string(col.type) or pa.types.is_large_string(
                col.type):
            enc = pc.dictionary_encode(col)
            return enc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        return col.to_numpy(zero_copy_only=False).astype(np.int64)

    def emit(g: pa.Table) -> pa.Table:
        g = g.combine_chunks()
        n = g.num_rows
        blk = _codes(g[block_col])
        ids = g[id_col].to_numpy(zero_copy_only=False)
        o = np.lexsort((ids, blk))
        blk_s, id_s = blk[o], ids[o]
        vals = {c: _codes(g[c])[o] for c in cmp_cols}
        if n:
            change = np.ones(n, bool)
            change[1:] = blk_s[1:] != blk_s[:-1]
            max_run = int(np.bincount(np.cumsum(change) - 1).max())
        else:
            max_run = 0
        la, lb = [], []
        ag: dict[str, list[np.ndarray]] = {c: [] for c in cmp_cols}
        for d in range(1, min(max_run, cap)):
            if d >= n:
                break
            same = blk_s[d:] == blk_s[:-d]
            li = np.flatnonzero(same)
            if li.size == 0:
                continue
            la.append(id_s[li])
            lb.append(id_s[li + d])
            for c in cmp_cols:
                v = vals[c]
                ag[c].append((v[li] == v[li + d]).astype(np.int8))
        schema_cols: dict[str, pa.Array] = {
            "id_a": pa.array(np.concatenate(la) if la
                             else np.empty(0, np.int64)),
            "id_b": pa.array(np.concatenate(lb) if lb
                             else np.empty(0, np.int64)),
        }
        for c, name in zip(cmp_cols, out_names):
            schema_cols[name] = pa.array(
                np.concatenate(ag[c]) if ag[c] else np.empty(0, np.int8))
        return pa.table(schema_cols)

    if n_rows is not None and n_rows <= DRIVER_SAMPLE_LIMIT:
        import ray.data as rd

        batches = list(ds.map_batches(add_hkey, batch_format="pyarrow")
                       .iter_batches(batch_size=1 << 20,
                                     batch_format="pyarrow"))
        if not batches:
            return rd.from_arrow(emit(pa.table(
                {c: pa.array([], pa.int64()) for c in cols})))
        t = pa.concat_tables(batches).combine_chunks()
        # rank within block by (hkey asc, id asc) — the WindowSpec
        # order — then keep the first `cap` rows per block
        blk = _codes(t[block_col])
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        hk = t["hkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((ids, hk, blk))
        bs = blk[o]
        change = np.ones(bs.size, bool)
        change[1:] = bs[1:] != bs[:-1]
        starts = np.flatnonzero(change)
        run_id = np.cumsum(change) - 1
        rk = np.arange(bs.size, dtype=np.int64) - starts[run_id]
        # the gate bounds INPUT rows but the OUTPUT is Σ C(run,2) —
        # up to ~cap/2 × larger; fall back to the distributed emit
        # when the exact pair count would not be driver-comfortable
        capped_runs = np.minimum(
            np.diff(np.concatenate((starts, [bs.size]))), cap)
        n_pairs = int((capped_runs * (capped_runs - 1) // 2).sum())
        if n_pairs <= DRIVER_PAIR_LIMIT:
            capped = t.select(cols).take(pa.array(o[rk < cap]))
            # emit() lexsorts by (block, id) itself, so one call over
            # the whole capped sample equals the union of per-bucket
            # calls
            return rd.from_arrow(emit(capped))

    return (sampled.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__bkt").map_groups(emit, batch_format="pyarrow"))


def _ratio_micro_int(num: int, den: int) -> int:
    return 0 if den == 0 else (num * 2_000_000 + den) // (2 * den)


def fs_weights(pairs_ds, field_cols: list[str]) -> pa.Table:
    """Supervised Fellegi-Sunter parameter estimation from a labeled γ
    table (``comparison_vectors`` output with ``is_match``): one row
    per field with exact int64 counts and half-up integer-micro
    ``m_micro``/``u_micro``/``mu_ratio_micro`` (the agreement-weight
    ordering; monotone in log2(m/u), kept as a plain ratio so the
    DuckDB twin is bit-exact — no float log). Map-side partial sums +
    one tiny fold."""
    names = [f"agree_{f}" for f in field_cols]

    def partial(t: pa.Table) -> pa.Table:
        m = t["is_match"].to_numpy(zero_copy_only=False).astype(bool)
        row: dict[str, list[int]] = {
            "n_match": [int(m.sum())], "n_unmatch": [int((~m).sum())]}
        for nm in names:
            a = t[nm].to_numpy(zero_copy_only=False).astype(bool)
            row[f"am_{nm}"] = [int((a & m).sum())]
            row[f"au_{nm}"] = [int((a & ~m).sum())]
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in row.items()})

    parts = pairs_ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    tot = {c: int(parts.sum(c) or 0) for c in parts.schema().names}
    n_m, n_u = tot["n_match"], tot["n_unmatch"]
    rows = []
    for f, nm in zip(field_cols, names):
        am, au = tot[f"am_{nm}"], tot[f"au_{nm}"]
        m_micro = _ratio_micro_int(am, n_m)
        u_micro = _ratio_micro_int(au, n_u)
        rows.append({
            "field": f, "n_match_pairs": n_m, "n_unmatch_pairs": n_u,
            "agree_match": am, "agree_unmatch": au,
            "m_micro": m_micro, "u_micro": u_micro,
            "mu_ratio_micro": _ratio_micro_int(m_micro, u_micro),
        })
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("field", pa.string()), ("n_match_pairs", pa.int64()),
        ("n_unmatch_pairs", pa.int64()), ("agree_match", pa.int64()),
        ("agree_unmatch", pa.int64()), ("m_micro", pa.int64()),
        ("u_micro", pa.int64()), ("mu_ratio_micro", pa.int64())]))


def fs_em(pairs_ds, field_cols: list[str], n_iter: int = 25,
          init_m: float = 0.9, init_u: float = 0.1,
          init_p: float = 0.5) -> dict:
    """Unsupervised Fellegi-Sunter estimation via EM over the
    agreement-pattern histogram (Winkler 1988): the γ table folds to
    2^k pattern counts (map-side bincount partials + one tiny
    groupby-sum), then the standard two-component conditional-
    independence EM runs on the driver over those counts — identical
    to per-pair EM because the likelihood only depends on γ. Returns
    ``{"m": ndarray, "u": ndarray, "p": float, "counts": ndarray,
    "weights": ndarray}`` where ``weights[k] = log2(m_k/u_k)``.
    Deterministic: fixed init, fixed iteration count, float64."""
    names = [f"agree_{f}" for f in field_cols]
    k = len(names)
    nbins = 1 << k

    def partial(t: pa.Table) -> pa.Table:
        idx = np.zeros(t.num_rows, np.int64)
        for bit, nm in enumerate(names):
            a = t[nm].to_numpy(zero_copy_only=False).astype(np.int64)
            idx |= a << bit
        c = np.bincount(idx, minlength=nbins)
        nz = np.flatnonzero(c)
        return pa.table({"pat": pa.array(nz.astype(np.int64)),
                         "n": pa.array(c[nz].astype(np.int64))})

    counts = np.zeros(nbins, np.int64)
    for r in (pairs_ds.map_batches(partial, batch_format="pyarrow")
              .groupby("pat").sum("n").take_all()):
        counts[int(r["pat"])] = int(r["sum(n)"])

    # agreement indicator matrix: patterns × fields
    pats = np.arange(nbins)
    gamma = ((pats[:, None] >> np.arange(k)[None, :]) & 1).astype(float)
    m = np.full(k, init_m)
    u = np.full(k, init_u)
    p = init_p
    total = counts.sum()
    if total == 0:
        return {"m": m, "u": u, "p": p, "counts": counts,
                "weights": np.log2(m / u)}
    for _ in range(n_iter):
        lm = (gamma * np.log(m) + (1 - gamma) * np.log1p(-m)).sum(1)
        lu = (gamma * np.log(u) + (1 - gamma) * np.log1p(-u)).sum(1)
        pm = p * np.exp(lm)
        pu = (1 - p) * np.exp(lu)
        w = pm / (pm + pu)  # P(match | pattern)
        wc = w * counts
        wn = (1 - w) * counts
        sm, sn = wc.sum(), wn.sum()
        m = np.clip((wc[:, None] * gamma).sum(0) / sm, 1e-9, 1 - 1e-9)
        u = np.clip((wn[:, None] * gamma).sum(0) / sn, 1e-9, 1 - 1e-9)
        p = sm / total
    return {"m": m, "u": u, "p": p, "counts": counts,
            "weights": np.log2(m / u)}
