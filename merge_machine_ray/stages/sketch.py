"""Corpus-statistics operators a large-scale training-data pipeline
needs beyond the reference's own inventory (same family as
``stages/textstats.py``): deterministic hash sampling, exact token
heavy-hitters, and exact distributed quantiles.

Scale notes (the 100 TB contract):

* :func:`hash_sample` is a pure map-side filter — no shuffle, no
  state, reproducible across runs and engines (the multiplicative
  hash is plain integer arithmetic, so a SQL oracle can replay it).
* :func:`token_heavy_hitters` shuffles only (token, partial-count)
  rows — one row per distinct token per block — then reduces the
  vocabulary-sized aggregate with local top-k + one tiny reduce (the
  K1 pattern from ``pipelines/queries.topk_per_priority``).
* :func:`column_quantiles` never sorts the data: per-block value
  histograms (bounded domains — token counts, quality scores in
  fixed-point) fold into one cumulative histogram, and each quantile
  is a searchsorted rank lookup. Exact, one pass, O(domain) driver
  memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: Knuth multiplicative constant (2^32 / golden ratio) — the sampling
#: hash must stay expressible in plain SQL integer arithmetic so the
#: DuckDB oracle can replay the exact keep-set.
_KNUTH = 2654435761
_MOD = 1 << 32


def hash_sample(ds, id_col: str, keep_pct: float):
    """Deterministic ``keep_pct``% sample by multiplicative hash of a
    non-negative integer id: keep iff ``(id * 2654435761) mod 2^32 <
    keep_pct/100 * 2^32``. Unlike ``Dataset.random_sample`` the keep
    decision is a pure function of the id — stable across runs,
    resumable, and replayable by the SQL oracle."""
    cut = int(keep_pct / 100.0 * _MOD)

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_MOD)
        return t.filter(pa.array(h < np.uint64(cut)))

    return ds.map_batches(keep, batch_format="pyarrow")


def hash_sample_sql(table: str, id_col: str, keep_pct: float) -> str:
    """DuckDB twin of :func:`hash_sample` (HUGEINT avoids the 64-bit
    multiply overflow)."""
    cut = int(keep_pct / 100.0 * _MOD)
    return (f"SELECT * FROM {table} WHERE "
            f"(CAST({id_col} AS HUGEINT) * {_KNUTH}) % {_MOD} < {cut}")


def stratified_sample(ds, id_col: str, stratum_col: str,
                      rates: dict[str, float], default_pct: float = 100.0):
    """Per-stratum deterministic sampling (corpus re-balancing: keep
    20% of the dominant language, all of the rare ones). Same
    multiplicative id hash as :func:`hash_sample`; the keep CUT is
    looked up per row from the (tiny, broadcast-by-closure) stratum →
    rate map via one ``pc.index_in`` — map-side only, no shuffle,
    resumable, and exactly replayable in SQL (CASE over the same
    arithmetic)."""
    keys = pa.array(list(rates.keys()), pa.string())
    cuts = np.array([int(p / 100.0 * _MOD) for p in rates.values()],
                    dtype=np.uint64)
    default_cut = np.uint64(int(default_pct / 100.0 * _MOD))

    def keep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_MOD)
        idx = pc.index_in(pc.cast(t[stratum_col], pa.string()),
                          value_set=keys)
        iv = idx.to_numpy(zero_copy_only=False)
        miss = idx.is_null().to_numpy(zero_copy_only=False)
        cut = np.where(miss, default_cut,
                       cuts[np.where(miss, 0, iv).astype(np.int64)])
        return t.filter(pa.array(h < cut))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample_sql(table: str, id_col: str, stratum_col: str,
                          rates: dict[str, float],
                          default_pct: float = 100.0) -> str:
    """DuckDB twin of :func:`stratified_sample`."""
    cases = " ".join(
        f"WHEN '{k}' THEN {int(p / 100.0 * _MOD)}"
        for k, p in rates.items())
    default_cut = int(default_pct / 100.0 * _MOD)
    return (f"SELECT * FROM {table} WHERE "
            f"(CAST({id_col} AS HUGEINT) * {_KNUTH}) % {_MOD} < "
            f"CASE CAST({stratum_col} AS VARCHAR) {cases} "
            f"ELSE {default_cut} END")


def hash_split(ds, id_col: str, splits: list[tuple[str, float]]):
    """Deterministic train/val/test assignment — the split every
    training-data pipeline needs. Appends a ``split`` column chosen by
    the same multiplicative id hash as :func:`hash_sample`: row → the
    first split whose cumulative percentage cut exceeds
    ``(id * 2654435761) mod 2^32``. Pure function of the id: stable
    across runs and partitionings, resumable, map-side only (no
    shuffle), and exactly replayable in SQL. The last split absorbs
    any rounding remainder (percentages should sum to 100)."""
    names = [n for n, _ in splits]
    cuts = np.cumsum([p / 100.0 * _MOD for _, p in splits]) \
        .astype(np.uint64)
    cuts[-1] = np.uint64(_MOD)  # remainder → last split
    name_arr = np.array(names)

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_MOD)
        idx = np.searchsorted(cuts, h, side="right")
        return t.append_column("split", pa.array(name_arr[idx]))

    return ds.map_batches(assign, batch_format="pyarrow")


def hash_split_sql(table: str, id_col: str,
                   splits: list[tuple[str, float]]) -> str:
    """DuckDB twin of :func:`hash_split` (same cumulative-cut CASE)."""
    cuts = np.cumsum([p / 100.0 * _MOD for _, p in splits]).astype(np.uint64)
    whens = " ".join(
        f"WHEN (CAST({id_col} AS HUGEINT) * {_KNUTH}) % {_MOD} "
        f"< {int(c)} THEN '{n}'"
        for (n, _), c in zip(splits[:-1], cuts[:-1]))
    return (f"SELECT *, CASE {whens} ELSE '{splits[-1][0]}' END AS split "
            f"FROM {table}")


def shuffle_by_hash(ds, id_col: str, salt: int = 0):
    """Deterministic global shuffle: append ``shuffle_key`` =
    multiplicative hash of ``id + salt`` and sort by it (ties broken by
    the id inside the hash's injectivity on < 2^32 ids). Training
    pipelines need a REPRODUCIBLE corpus order before sequence packing;
    ``Dataset.random_shuffle`` is nondeterministic across runs and
    partitionings, this is a pure function of (id, salt). The sort is
    Ray Data's distributed range sort — the same all-to-all a random
    shuffle pays, but resumable and replayable in SQL."""

    def key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids + np.uint64(salt)) * np.uint64(_KNUTH)) % np.uint64(_MOD)
        return t.append_column("shuffle_key", pa.array(h.astype(np.int64)))

    return ds.map_batches(key, batch_format="pyarrow") \
        .sort(["shuffle_key", id_col])


def _token_count_partial(t: pa.Table, text_col: str,
                         pattern: str) -> pa.Table:
    """Per-batch (token, occurrences) — every occurrence counted, one
    vectorized unique over the flattened token array."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(t[text_col].cast(pa.string()), "")),
        pattern)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    flat = flat.filter(pc.not_equal(flat, ""))
    if not len(flat):
        return pa.table({"tok": pa.array([], pa.string()),
                         "pn": pa.array([], pa.int64())})
    d = pc.dictionary_encode(flat)
    codes = d.indices.to_numpy(zero_copy_only=False)
    counts = np.bincount(codes, minlength=len(d.dictionary))
    return pa.table({"tok": d.dictionary,
                     "pn": pa.array(counts.astype(np.int64))})


def token_heavy_hitters(ds, text_col: str = "text", k: int = 20,
                        pattern: str = "[^a-z0-9]+"):
    """Exact top-``k`` most frequent tokens with counts, ties broken by
    token ascending. Partial counts combine inside each block before
    the (vocabulary-sized) groupby sum; the final top-k is local top-k
    per block + one tiny reduce — no global sort of the vocabulary."""
    from ray.data.aggregate import Sum

    agg = ds.map_batches(
        lambda t: _token_count_partial(t, text_col, pattern),
        batch_format="pyarrow").groupby("tok") \
        .aggregate(Sum("pn", alias_name="n"))

    def local_topk(t: pa.Table) -> pa.Table:
        n = t["n"].cast(pa.int64())
        t = t.set_column(t.column_names.index("n"), "n", n)
        if t.num_rows <= k:
            return t
        idx = pc.select_k_unstable(
            t, k, [("n", "descending"), ("tok", "ascending")])
        return t.take(idx)

    parts = agg.map_batches(local_topk, batch_format="pyarrow")
    tbl = pa.concat_tables(
        parts.iter_batches(batch_size=65536, batch_format="pyarrow"))
    idx = pc.select_k_unstable(
        tbl, min(k, tbl.num_rows),
        [("n", "descending"), ("tok", "ascending")])
    out = tbl.take(idx)
    # select_k_unstable does not order ties deterministically — final
    # exact sort of the k-row result
    return out.sort_by([("n", "descending"), ("tok", "ascending")])


def column_quantiles(ds, value_col: str, quantiles: list[float],
                     max_domain: int = 1 << 22):
    """EXACT quantiles of a non-negative bounded integer column without
    sorting the dataset: per-block ``bincount`` histograms fold into one
    cumulative histogram; each quantile is the smallest value whose
    cumulative count reaches rank ``ceil(q·n)`` (DuckDB
    ``quantile_disc`` semantics). Returns an Arrow table
    ``(q_micro, value)``.

    The histogram is O(domain) — fine for token counts, byte lengths,
    fixed-point scores; ``max_domain`` guards against unbounded ids."""

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if v.size and (v.min() < 0 or v.max() >= max_domain):
            raise ValueError(
                f"column_quantiles: {value_col} outside [0, {max_domain})")
        h = np.bincount(v) if v.size else np.zeros(1, dtype=np.int64)
        nz = np.flatnonzero(h)
        return pa.table({"val": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(h[nz].astype(np.int64))})

    # fold the per-block sparse histograms on the driver: the combined
    # histogram is ≤ domain-sized regardless of dataset size
    acc: dict[int, int] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for v, c in zip(b["val"].to_numpy(zero_copy_only=False),
                        b["cnt"].to_numpy(zero_copy_only=False)):
            acc[int(v)] = acc.get(int(v), 0) + int(c)
    if not acc:
        return pa.table({"q_micro": pa.array([], pa.int64()),
                         "value": pa.array([], pa.int64())})
    vals = np.array(sorted(acc), dtype=np.int64)
    cum = np.cumsum([acc[int(v)] for v in vals])
    n = int(cum[-1])
    out_q, out_v = [], []
    for q in quantiles:
        # integer-exact rank ceil(q·n) for rational q via micro units
        # (float ceil drifts: double(0.3)*10 → 2.9999999999999996)
        q_micro = int(round(q * 1_000_000))
        rank = max(1, (q_micro * n + 999_999) // 1_000_000)
        pos = int(np.searchsorted(cum, rank))
        out_q.append(q_micro)
        out_v.append(int(vals[min(pos, vals.size - 1)]))
    return pa.table({"q_micro": pa.array(out_q, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})


def _ranks_for(quantiles: list[float], n: int) -> list[tuple[int, int]]:
    """(q_micro, rank) pairs with the integer-exact ceil(q·n) rank
    convention shared by :func:`column_quantiles` and DuckDB
    ``quantile_disc``."""
    out = []
    for q in quantiles:
        q_micro = int(round(q * 1_000_000))
        out.append((q_micro, max(1, (q_micro * n + 999_999) // 1_000_000)))
    return out


def column_quantiles_refine(ds, value_col: str, quantiles: list[float],
                            coarse_bins: int = 1 << 20,
                            max_refine: int = 4_000_000):
    """EXACT quantiles of an UNBOUNDED integer column (prices in cents,
    ids, byte offsets) without a global sort — the classic two-pass
    distributed selection:

    pass 0  Min/Max/Count aggregate (sizes the coarse grid);
    pass 1  per-block histogram of ``(v−min) >> shift`` → one
            driver-folded cumulative grid locates each quantile's
            coarse BIN and its residual rank within it;
    pass 2  per-block exact (value, count) pairs restricted to the few
            needed bins (a map-side filter, ≤ 2^shift distinct values
            per bin) → select the residual rank exactly.

    Driver memory is O(coarse_bins + distinct values inside needed
    bins), never O(n); ``max_refine`` guards a pathological bin (raise
    rather than silently truncate — re-run with more ``coarse_bins``).
    Same ``quantile_disc`` rank convention as :func:`column_quantiles`.
    """
    from ray.data.aggregate import Count, Max, Min

    row = ds.aggregate(Min(value_col), Max(value_col), Count())
    n = int(row["count()"])
    if n == 0:
        return pa.table({"q_micro": pa.array([], pa.int64()),
                         "value": pa.array([], pa.int64())})
    vmin = int(row[f"min({value_col})"])
    vmax = int(row[f"max({value_col})"])
    span = vmax - vmin + 1
    shift = 0
    while (span >> shift) > coarse_bins:
        shift += 1
    nbins = (span >> shift) + 1

    def coarse(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = (v - vmin) >> shift
        h = np.bincount(idx, minlength=1) if v.size else \
            np.zeros(1, np.int64)
        nz = np.flatnonzero(h)
        return pa.table({"bin": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(h[nz].astype(np.int64))})

    grid = np.zeros(nbins, np.int64)
    for b in ds.map_batches(coarse, batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        np.add.at(grid, b["bin"].to_numpy(zero_copy_only=False),
                  b["cnt"].to_numpy(zero_copy_only=False))
    cum = np.cumsum(grid)
    targets = _ranks_for(quantiles, n)
    # each rank → (coarse bin, residual rank inside that bin)
    locs = []
    for q_micro, rank in targets:
        bpos = int(np.searchsorted(cum, rank))
        residual = rank - (int(cum[bpos - 1]) if bpos else 0)
        locs.append((q_micro, bpos, residual))
    needed = np.array(sorted({b for _, b, _ in locs}), np.int64)

    def refine(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = (v - vmin) >> shift
        pos = np.searchsorted(needed, idx).clip(max=needed.size - 1)
        keep = needed[pos] == idx
        vals, cnts = np.unique(v[keep], return_counts=True)
        return pa.table({"val": pa.array(vals),
                         "cnt": pa.array(cnts.astype(np.int64))})

    acc: dict[int, int] = {}
    for b in ds.map_batches(refine, batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for v, c in zip(b["val"].to_numpy(zero_copy_only=False),
                        b["cnt"].to_numpy(zero_copy_only=False)):
            acc[int(v)] = acc.get(int(v), 0) + int(c)
        if len(acc) > max_refine:
            raise ValueError(
                "column_quantiles_refine: refinement bins hold "
                f">{max_refine} distinct values; raise coarse_bins")
    fvals = np.array(sorted(acc), np.int64)
    fbins = (fvals - vmin) >> shift
    fcnts = np.array([acc[int(v)] for v in fvals], np.int64)
    out_q, out_v = [], []
    for q_micro, bpos, residual in locs:
        m = fbins == bpos
        bc = np.cumsum(fcnts[m])
        sel = int(np.searchsorted(bc, residual))
        out_q.append(q_micro)
        out_v.append(int(fvals[m][min(sel, int(m.sum()) - 1)]))
    return pa.table({"q_micro": pa.array(out_q, pa.int64()),
                     "value": pa.array(out_v, pa.int64())})


def kmv_distinct(ds, group_col: str, id_col: str, k: int = 64):
    """KMV (k-minimum-values) distinct-count sketch per group — the
    classic mergeable cardinality estimator (Bar-Yossef et al. 2002):
    keep the ``k`` smallest DISTINCT hash values of ``id_col`` per
    group; if fewer than ``k`` survive the count is exact, else
    ``est = (k-1)·M // h_k``. Unlike HLL the whole computation is a
    deterministic pure function of the ids (the multiplicative hash
    shared by the sampling/split ops), so the estimate is stable
    across runs and partitionings and the DuckDB twin
    (:func:`kmv_distinct_sql`) matches bit for bit.

    Scale shape: each batch emits at most ``k`` (group, hash) rows per
    group present in it — the exchange carries sketch partials, never
    id-cardinality rows — and the final groupby folds sorted unions.
    ``k ≥ 2`` required (k distinct hashes make ``h_k ≥ k-1 > 0``)."""
    assert k >= 2
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ((ids * np.uint64(_KNUTH)) % np.uint64(_MOD)).astype(np.int64)
        enc = pc.dictionary_encode(
            pc.cast(t[group_col], pa.string())).combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((h, codes))
        cs, hs = codes[o], h[o]
        keep = np.empty(len(o), bool)
        keep[:1] = True
        keep[1:] = (cs[1:] != cs[:-1]) | (hs[1:] != hs[:-1])
        cs, hs = cs[keep], hs[keep]           # distinct (group, hash)
        seg = np.empty(len(cs), bool)
        seg[:1] = True
        seg[1:] = cs[1:] != cs[:-1]
        idx = np.arange(len(cs), dtype=np.int64)
        seg_start = np.maximum.accumulate(np.where(seg, idx, -1))
        top = (idx - seg_start) < k           # k smallest per group
        return pa.table({group_col: enc.dictionary.take(
                             pa.array(cs[top])).cast(pa.string()),
                         "__kmv_h": pa.array(hs[top])})

    def fold(g: pa.Table) -> pa.Table:
        hs = np.unique(g["__kmv_h"].to_numpy(zero_copy_only=False))[:k]
        n = int(hs.size)
        kth = int(hs[-1])
        est = n if n < k else ((k - 1) * _MOD) // kth
        return pa.table({group_col: g[group_col][:1].cast(pa.string()),
                         "n_hashes": pa.array([n], pa.int64()),
                         "kth_hash": pa.array([kth], pa.int64()),
                         "est_distinct": pa.array([est], pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(fold, batch_format="pyarrow")


def kmv_distinct_sql(table: str, group_col: str, id_col: str,
                     k: int = 64) -> str:
    """DuckDB twin of :func:`kmv_distinct` (same hash, same k-min,
    same integer estimator)."""
    return f"""
WITH h AS (SELECT DISTINCT {group_col},
                  (CAST({id_col} AS HUGEINT) * {_KNUTH}) % {_MOD} AS hh
           FROM {table}),
r AS (SELECT {group_col}, hh,
             row_number() OVER (PARTITION BY {group_col}
                                ORDER BY hh) AS rn
      FROM h)
SELECT CAST({group_col} AS VARCHAR) AS {group_col},
       CAST(count(*) AS BIGINT) AS n_hashes,
       CAST(max(hh) AS BIGINT) AS kth_hash,
       CAST(CASE WHEN count(*) < {k} THEN count(*)
            ELSE (({k} - 1) * CAST({_MOD} AS HUGEINT)) // max(hh)
            END AS BIGINT) AS est_distinct
FROM r WHERE rn <= {k}
GROUP BY {group_col}
"""


def grouped_quantiles(ds, group_col: str, value_col: str,
                      quantiles: list[float], max_domain: int = 1 << 22):
    """EXACT per-group quantiles of a non-negative bounded integer
    column, fully distributed (the grouped sibling of
    :func:`column_quantiles`): each batch emits sparse (group, value,
    count) histogram rows — bounded by the value domain per group, not
    by row count — and one groupby folds each group's histogram and
    reads the ``ceil(q·n)`` ranks (DuckDB ``quantile_disc``
    semantics). Returns a Dataset of (group, q_micro, value)."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if v.size and (v.min() < 0 or v.max() >= max_domain):
            raise ValueError(
                f"grouped_quantiles: {value_col} outside [0, {max_domain})")
        enc = pc.dictionary_encode(
            pc.cast(t[group_col], pa.string())).combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((v, codes))
        cs, vs = codes[o], v[o]
        new = np.empty(len(o), bool)
        new[:1] = True
        new[1:] = (cs[1:] != cs[:-1]) | (vs[1:] != vs[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate([starts, [len(o)]]))
        return pa.table({
            group_col: enc.dictionary.take(
                pa.array(cs[starts])).cast(pa.string()),
            "__qv": pa.array(vs[starts]),
            "__qc": pa.array(cnt.astype(np.int64))})

    def fold(g: pa.Table) -> pa.Table:
        v = g["__qv"].to_numpy(zero_copy_only=False)
        c = g["__qc"].to_numpy(zero_copy_only=False)
        o = np.argsort(v, kind="stable")
        v, c = v[o], c[o]
        new = np.empty(v.size, bool)
        new[:1] = True
        new[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(new)
        vals = v[starts]
        sums = np.add.reduceat(c, starts)
        cum = np.cumsum(sums)
        n = int(cum[-1])
        qm, qv = [], []
        for q_micro, rank in _ranks_for(quantiles, n):
            pos = int(np.searchsorted(cum, rank))
            qm.append(q_micro)
            qv.append(int(vals[min(pos, vals.size - 1)]))
        return pa.table({
            group_col: g[group_col][:1].cast(pa.string())
            .take(pa.array(np.zeros(len(qm), dtype=np.int64))),
            "q_micro": pa.array(qm, pa.int64()),
            "value": pa.array(qv, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(group_col).map_groups(fold, batch_format="pyarrow")
