"""Web link-graph construction and analysis over Ray Data.

Edges are integer (src, dst) rows extracted from crawled pages
(``functions/urls.extract_hrefs`` + an id parse).  Two operators:

- :func:`degree_table` — per-node out/in degree, the basic crawl-graph
  audit (two tiny groupbys + one full-outer bucketed join; the edge
  list rides each exchange once as two int64 columns).
- :func:`pagerank` — fixed-iteration PageRank in EXACT integer micro
  arithmetic, so the result is a pure function of the edge list and a
  DuckDB twin (:func:`pagerank_sql_ctes`, K unrolled CTE levels)
  matches bit for bit.  Per iteration: ranks join edges on src (one
  bucketed hash join), per-edge contribution ``r // outdeg`` (floor —
  order-independent), groupby dst sum, left-join back onto the node
  set.  Iteration state is one (node, rank) row per node, materialized
  in the object store between rounds — never on the driver.  Dangling
  mass is dropped (the "no redistribution" variant); both engine and
  twin implement the same rule:

      r'(v) = (100-D)·1_000_000 // (100·n) + D·S(v) // 100,
      S(v)  = Σ_{u→v} r(u) // outdeg(u)

At cluster scale the node-hash bucketing of the join/groupby spreads
hot pages; the only driver-resident values are scalar counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from merge_machine_ray.stages.joins import bucket_hash_join

__all__ = ["degree_table", "pagerank", "pagerank_sql_ctes",
           "triangle_stats", "triangle_sql_ctes"]

#: Edge count below which PageRank runs its driver fast path (same
#: exact integer arithmetic, numpy bincount-style folds per round).
#: The same bounded-driver contract as the clustering module's driver
#: CC: a 20M-edge int64 edge list is ~320 MB of driver heap, with a
#: peak resident working set ~8–10× that (~3 GB — concat/unique/
#: argsort/per-pass temporaries), sized for a driver with tens of GB;
#: above it the distributed loop (one bucketed join + groupby-sum +
#: left join per round) takes over. Raised from 2M together with
#: clustering's gate after the flagship measured the distributed
#: rounds' per-exchange overhead dominating mid-size graphs (a 21 s
#: cliff at 2.9M edges for plain CC; the iterative PageRank loop pays
#: several exchanges PER ROUND, so its cliff is steeper).
DRIVER_EDGE_LIMIT = 20_000_000


def _snapshot(ds, max_blocks: int | None = None):
    """Execute and CUT LINEAGE: rebuild the dataset from its
    materialized object-store blocks (zero-copy refs). Plain
    ``materialize()`` is not enough for iterative loops here —
    ``Dataset.union`` (inside bucket_hash_join) re-splices the full
    upstream LOGICAL plan instead of reusing the snapshot, so each
    round's plan would embed every previous round and wall time grows
    superlinearly (measured 2× per iteration before this cut).

    ``max_blocks`` bounds the snapshot's block count: each join/
    groupby round otherwise ADDS ~bucket-count blocks to the iteration
    state (measured 128→224→320 across three rounds on a 4k-node
    graph), and per-block fixed costs then dominate. Iterative state
    must keep a CONSTANT block budget — sized to the cluster, not to
    the round number."""
    import ray.data

    mat = ds.materialize()
    if max_blocks is not None and mat.num_blocks() > max_blocks:
        mat = mat.repartition(max_blocks).materialize()
    return ray.data.from_arrow_refs(mat.to_arrow_refs())


def _nodes(edges_ds):
    """Distinct node ids of src ∪ dst (one groupby over narrow rows)."""

    def both(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(
            np.unique(np.concatenate([s, d])))})

    return edges_ds.map_batches(both, batch_format="pyarrow") \
        .groupby("node").count().select_columns(["node"])


def degree_table(edges_ds):
    """(node, out_deg, in_deg) with zeros for one-sided nodes."""
    odeg = edges_ds.groupby("src").count()

    def o_named(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"],
                         "out_deg": t["count()"].cast(pa.int64())})

    ideg = edges_ds.groupby("dst").count()

    def i_named(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["dst"],
                         "in_deg": t["count()"].cast(pa.int64())})

    both = bucket_hash_join(odeg.map_batches(o_named,
                                             batch_format="pyarrow"),
                            ideg.map_batches(i_named,
                                             batch_format="pyarrow"),
                            "node", "node", how="full")

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "node": t["node"],
            "out_deg": pc.fill_null(t["out_deg"], 0),
            "in_deg": pc.fill_null(t["in_deg"], 0)})

    return both.map_batches(fill, batch_format="pyarrow")


def _pagerank_driver(edges_ds, iters: int, damping_pct: int):
    """Bounded driver fast path: identical integer arithmetic over
    numpy arrays (edge list ≤ DRIVER_EDGE_LIMIT). One np.add.at fold
    per round replaces three distributed exchanges."""
    import ray.data

    src_parts, dst_parts = [], []
    for b in edges_ds.iter_batches(batch_size=1 << 16,
                                   batch_format="pyarrow"):
        src_parts.append(b["src"].to_numpy(zero_copy_only=False))
        dst_parts.append(b["dst"].to_numpy(zero_copy_only=False))
    src = (np.concatenate(src_parts) if src_parts
           else np.empty(0, np.int64)).astype(np.int64)
    dst = (np.concatenate(dst_parts) if dst_parts
           else np.empty(0, np.int64)).astype(np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    n = nodes.size
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "rank_micro": pa.array([], pa.int64())})
    if n == 0:
        return ray.data.from_arrow(empty)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    outdeg = np.bincount(si, minlength=n).astype(np.int64)
    deg_per_edge = outdeg[si]
    d = damping_pct
    teleport = (100 - d) * 1_000_000 // (100 * n)
    r = np.full(n, 1_000_000 // n, dtype=np.int64)
    for _ in range(iters):
        contrib = r[si] // deg_per_edge
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, di, contrib)
        r = teleport + (d * s) // 100
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes), "rank_micro": pa.array(r)}))


def pagerank(edges_ds, iters: int = 5, damping_pct: int = 85,
             driver_edge_limit: int | None = None):
    """Fixed-iteration integer-micro PageRank (see module docstring).
    Returns a Dataset of (node, rank_micro). Below
    ``driver_edge_limit`` (default DRIVER_EDGE_LIMIT) the exact same
    arithmetic runs on the driver; above it, distributed, with a hard
    lineage cut per round (see :func:`_snapshot`)."""
    limit = DRIVER_EDGE_LIMIT if driver_edge_limit is None \
        else driver_edge_limit
    edges_ds = _snapshot(edges_ds)
    if edges_ds.count() <= limit:
        return _pagerank_driver(edges_ds, iters, damping_pct)
    nodes = _snapshot(_nodes(edges_ds))
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda t: pa.table({"node": pa.array([], pa.int64()),
                                "rank_micro": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    d = damping_pct
    teleport = (100 - d) * 1_000_000 // (100 * n)
    r0 = 1_000_000 // n

    odeg = edges_ds.groupby("src").count()

    def deg_named(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["src"],
                         "deg": t["count()"].cast(pa.int64())})

    # static per-edge outdeg attach — one join, reused every iteration
    edges_deg = bucket_hash_join(
        edges_ds, odeg.map_batches(deg_named, batch_format="pyarrow"),
        "src", "src")
    edges_deg = _snapshot(edges_deg)

    def init(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"],
                         "rank_micro": pa.array(
                             np.full(t.num_rows, r0, dtype=np.int64))})

    state_blocks = max(edges_deg.num_blocks(), 1)
    ranks = _snapshot(nodes.map_batches(init, batch_format="pyarrow"),
                      max_blocks=state_blocks)

    for _ in range(iters):
        with_r = bucket_hash_join(edges_deg, ranks, "src", "node")

        def contrib(t: pa.Table) -> pa.Table:
            r = t["rank_micro"].to_numpy(zero_copy_only=False)
            deg = t["deg"].to_numpy(zero_copy_only=False)
            return pa.table({"dst": t["dst"],
                             "c": pa.array(r // deg)})

        sums = with_r.map_batches(contrib, batch_format="pyarrow") \
            .groupby("dst").sum("c")

        def s_named(t: pa.Table) -> pa.Table:
            return pa.table({"node": t["dst"],
                             "s": t["sum(c)"].cast(pa.int64())})

        joined = bucket_hash_join(
            nodes, sums.map_batches(s_named, batch_format="pyarrow"),
            "node", "node", how="left")

        def update(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            s = pc.fill_null(t["s"], 0).to_numpy(zero_copy_only=False)
            r = teleport + (d * s) // 100
            return pa.table({"node": t["node"],
                             "rank_micro": pa.array(r)})

        ranks = _snapshot(joined.map_batches(update,
                                            batch_format="pyarrow"),
                          max_blocks=state_blocks)

    return ranks


def pagerank_sql_ctes(edges_cte: str, iters: int = 5,
                      damping_pct: int = 85) -> str:
    """DuckDB twin: given a CTE body named ``edges`` (src, dst), emit
    the full query computing the same integer-micro PageRank with
    ``iters`` unrolled levels."""
    d = damping_pct
    parts = [f"""
WITH edges AS ({edges_cte}),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges
           UNION ALL SELECT dst FROM edges)),
nn AS (SELECT count(*) AS n FROM nodes),
odeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
         FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000 // (SELECT n FROM nn) AS BIGINT) AS r
       FROM nodes)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
s{i} AS (SELECT e.dst AS node,
                CAST(sum(p.r // o.deg) AS BIGINT) AS s
         FROM edges e
         JOIN r{i - 1} p ON e.src = p.node
         JOIN odeg o ON e.src = o.src
         GROUP BY e.dst),
r{i} AS (SELECT nd.node,
                CAST((100 - {d}) * 1000000 // (100 * (SELECT n FROM nn))
                     + {d} * COALESCE(s.s, 0) // 100 AS BIGINT) AS r
         FROM nodes nd LEFT JOIN s{i} s USING (node))""")
    parts.append(f"""
SELECT node, r AS rank_micro FROM r{iters}""")
    return "".join(parts)


# ------------------------------------------------------------ triangles
def _canon_edges(edges_ds, num_buckets: int):
    """(src, dst) → distinct canonical undirected edges ``(a < b)``.
    Self-loops drop; the cross-batch dedup is the pair machinery's
    bucketed lexsort (one exchange)."""
    from merge_machine_ray.stages.pairs import dedupe_pairs

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        m = s != d
        s, d = s[m], d[m]
        return pa.table({"id_a": pa.array(np.minimum(s, d)),
                         "id_b": pa.array(np.maximum(s, d))})

    return dedupe_pairs(edges_ds.map_batches(canon,
                                             batch_format="pyarrow"),
                        num_buckets)


def _und_degrees(und_ds):
    """Distinct-edge list → (node, deg) — per-batch ``np.unique``
    partial counts, then one narrow groupby-sum."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        un, c = np.unique(np.concatenate((a, b)), return_counts=True)
        return pa.table({"node": pa.array(un),
                         "c": pa.array(c.astype(np.int64))})

    return und_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("c", alias_name="deg"))


_TRI_NODES_SCHEMA = pa.schema([("node", pa.int64()), ("c", pa.int64())])
_WEDGE_SCHEMA = pa.schema([("x", pa.int64()), ("y", pa.int64()),
                           ("w", pa.int64())])


def _triangle_driver(edges_ds):
    """Bounded driver fast path (edge list ≤ DRIVER_EDGE_LIMIT): the
    identical degree-oriented wedge-check on compressed numpy ids —
    one lexsort + one repeat/arange wedge expansion + one sorted-key
    membership probe replaces nine distributed exchanges. Arithmetic
    is bit-identical to the distributed path (pure integer)."""
    import ray.data

    src_parts, dst_parts = [], []
    for t in edges_ds.iter_batches(batch_size=1 << 16,
                                   batch_format="pyarrow"):
        src_parts.append(t["src"].to_numpy(zero_copy_only=False))
        dst_parts.append(t["dst"].to_numpy(zero_copy_only=False))
    src = (np.concatenate(src_parts) if src_parts
           else np.empty(0, np.int64)).astype(np.int64)
    dst = (np.concatenate(dst_parts) if dst_parts
           else np.empty(0, np.int64)).astype(np.int64)
    m = src != dst
    a = np.minimum(src[m], dst[m])
    b = np.maximum(src[m], dst[m])
    empty = pa.table({"node": pa.array([], pa.int64()),
                      "deg": pa.array([], pa.int64()),
                      "n_triangles": pa.array([], pa.int64()),
                      "clustering_micro": pa.array([], pa.int64())})
    if not a.size:
        return ray.data.from_arrow(empty)
    o = np.lexsort((b, a))
    a, b = a[o], b[o]
    keep = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    a, b = a[keep], b[keep]
    nodes = np.unique(np.concatenate((a, b)))
    n = nodes.size
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    deg = (np.bincount(ai, minlength=n)
           + np.bincount(bi, minlength=n)).astype(np.int64)
    # compressed ids preserve node order, so (deg, compressed-id)
    # ordering == the distributed path's (deg, node) ordering
    a_low = (deg[ai] < deg[bi]) | ((deg[ai] == deg[bi]) & (ai < bi))
    u = np.where(a_low, ai, bi)
    v = np.where(a_low, bi, ai)
    dv = deg[v]
    o = np.lexsort((v, dv, u))
    u, v = u[o], v[o]
    cuts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
    sizes = np.diff(np.concatenate((cuts, [u.size])))
    pos = np.arange(u.size)
    rep = np.repeat(cuts + sizes, sizes) - pos - 1
    npairs = int(rep.sum())
    tri = np.zeros(n, dtype=np.int64)
    if npairs:
        A = np.repeat(pos, rep)
        within = (np.arange(npairs) - np.repeat(
            np.concatenate(([0], np.cumsum(rep)))[:-1], rep))
        wx, wy, ww = v[A], v[A + 1 + within], u[A]
        ekeys = np.sort(u.astype(np.int64) * n + v)
        wkeys = wx.astype(np.int64) * n + wy
        p = np.searchsorted(ekeys, wkeys)
        hit = np.zeros(wkeys.size, dtype=bool)
        inb = p < ekeys.size
        hit[inb] = ekeys[p[inb]] == wkeys[inb]
        tri = (np.bincount(wx[hit], minlength=n)
               + np.bincount(wy[hit], minlength=n)
               + np.bincount(ww[hit], minlength=n)).astype(np.int64)
    denom = deg * (deg - 1)
    cc = np.where(denom >= 2, (2_000_000 * tri)
                  // np.maximum(denom, 1), 0)
    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes), "deg": pa.array(deg),
        "n_triangles": pa.array(tri), "clustering_micro": pa.array(cc)}))


def triangle_stats(edges_ds, num_buckets: int = 64,
                   driver_edge_limit: int | None = None):
    """Exact per-node triangle counts + local clustering coefficient
    over a (src, dst) edge list — the compact-forward / MapReduce
    degree-orientation algorithm (Latapy 2008; Cohen, "Graph Twiddling
    in a MapReduce World", 2009):

    1. canonical distinct undirected edges (one bucketed dedup);
    2. degrees (one narrow groupby-sum);
    3. orient every edge from its lower endpoint under the total order
       ``(deg, node)`` (two bucketed joins attach endpoint degrees) —
       out-degree under this orientation is O(√m) even on power-law
       graphs, which is what bounds the wedge blowup at scale;
    4. per low endpoint, emit all out-neighbor pairs as wedges ordered
       by the same ``(deg, node)`` key (one bucketed exchange, the
       block-pairs repeat/arange expansion — zero per-node python);
    5. match wedges against oriented edges in one bucketed exchange on
       the closing pair (in-bucket rank compression keeps keys exact
       at any id width — no packed-int64 assumption), each hit = one
       triangle, folded immediately into per-node partial counts;
    6. left-join counts back onto the degree table.

    ``clustering_micro = (2_000_000 · t) // (deg · (deg − 1))`` — exact
    integer arithmetic end to end (int64-safe through deg ≲ 3·10⁶;
    beyond that the quotient needs a 128-bit fold), so the DuckDB twin
    (:func:`triangle_sql_ctes`) matches bit for bit.  Per-triangle the
    exchanges carry two/three int64 columns only; nothing
    corpus-sized ever lands on the driver.
    """
    limit = DRIVER_EDGE_LIMIT if driver_edge_limit is None \
        else driver_edge_limit
    edges_ds = _snapshot(edges_ds)
    if edges_ds.count() <= limit:
        return _triangle_driver(edges_ds)
    # und feeds three branches and deg two; oriented feeds two. Snapshot
    # each (object-store blocks, lineage CUT — union inside
    # bucket_hash_join re-splices logical plans, so a plain
    # materialize() would still re-run the edge extraction per branch:
    # observed 7× upstream re-execution without these).
    und = _snapshot(_canon_edges(edges_ds, num_buckets))
    deg = _snapshot(_und_degrees(und))

    with_da = bucket_hash_join(und, deg, "a", "node",
                               num_buckets=num_buckets,
                               right_suffix="_a")
    with_db = bucket_hash_join(with_da, deg, "b", "node",
                               num_buckets=num_buckets,
                               right_suffix="_b")

    def orient(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        da = t["deg_a"].to_numpy(zero_copy_only=False)
        db = t["deg_b"].to_numpy(zero_copy_only=False)
        a_low = (da < db) | ((da == db) & (a < b))
        u = np.where(a_low, a, b)
        v = np.where(a_low, b, a)
        dv = np.where(a_low, db, da)
        return pa.table({"u": pa.array(u), "v": pa.array(v),
                         "dv": pa.array(dv.astype(np.int64)),
                         "bucket": pa.array(
                             (u % num_buckets).astype(np.int32))})

    oriented = _snapshot(with_db.map_batches(orient,
                                             batch_format="pyarrow"))

    def wedges(g: pa.Table) -> pa.Table:
        u = g["u"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        dv = g["dv"].to_numpy(zero_copy_only=False)
        # neighbor runs per u, neighbors ascending by (deg, node) so an
        # emitted pair (x, y) carries the CLOSING edge's orientation
        o = np.lexsort((v, dv, u))
        u, v = u[o], v[o]
        cuts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        sizes = np.diff(np.concatenate((cuts, [u.size])))
        pos = np.arange(u.size)
        rep = np.repeat(cuts + sizes, sizes) - pos - 1
        npairs = int(rep.sum())
        if not npairs:
            return _WEDGE_SCHEMA.empty_table()
        A = np.repeat(pos, rep)
        within = (np.arange(npairs) - np.repeat(
            np.concatenate(([0], np.cumsum(rep)))[:-1], rep))
        return pa.table({"x": pa.array(v[A]),
                         "y": pa.array(v[A + 1 + within]),
                         "w": pa.array(u[A])})

    wedge_ds = oriented.groupby("bucket").map_groups(
        wedges, batch_format="pyarrow")

    # closing-edge match: wedges and oriented edges share one bucketed
    # exchange on the (x, y) pair; w = -1 tags the edge side (node ids
    # are non-negative by contract)
    def tag_wedge(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        return pa.table({"x": t["x"], "y": t["y"], "w": t["w"],
                         "mbkt": pa.array(
                             ((x * 1000003 + y) % num_buckets)
                             .astype(np.int32))})

    def tag_edge(t: pa.Table) -> pa.Table:
        x = t["u"].to_numpy(zero_copy_only=False)
        y = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({"x": t["u"], "y": t["v"],
                         "w": pa.array(np.full(t.num_rows, -1,
                                               dtype=np.int64)),
                         "mbkt": pa.array(
                             ((x * 1000003 + y) % num_buckets)
                             .astype(np.int32))})

    tagged = wedge_ds.map_batches(tag_wedge, batch_format="pyarrow") \
        .union(oriented.map_batches(tag_edge, batch_format="pyarrow"))

    def match(g: pa.Table) -> pa.Table:
        x = g["x"].to_numpy(zero_copy_only=False)
        y = g["y"].to_numpy(zero_copy_only=False)
        w = g["w"].to_numpy(zero_copy_only=False)
        is_edge = w < 0
        # exact in-bucket composite keys by rank compression
        ux = np.unique(x)
        uy = np.unique(y)
        key = (np.searchsorted(ux, x).astype(np.int64) * uy.size
               + np.searchsorted(uy, y))
        ek = np.sort(key[is_edge])          # unique: simple graph
        wk = key[~is_edge]
        pos = np.searchsorted(ek, wk)
        hit = np.zeros(wk.size, dtype=bool)
        inb = pos < ek.size
        hit[inb] = ek[pos[inb]] == wk[inb]
        nodes = np.concatenate((x[~is_edge][hit], y[~is_edge][hit],
                                w[~is_edge][hit]))
        if not nodes.size:
            return _TRI_NODES_SCHEMA.empty_table()
        un, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(un),
                         "c": pa.array(c.astype(np.int64))})

    from ray.data.aggregate import Sum

    tri = tagged.groupby("mbkt").map_groups(
        match, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("c", alias_name="n_triangles"))

    out = bucket_hash_join(deg, tri, "node", "node",
                           num_buckets=num_buckets, how="left")

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        tr = pc.fill_null(t["n_triangles"], 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        denom = d * (d - 1)
        cc = np.where(denom >= 2, (2_000_000 * tr)
                      // np.maximum(denom, 1), 0)
        return pa.table({"node": t["node"],
                         "deg": pa.array(d),
                         "n_triangles": pa.array(tr),
                         "clustering_micro": pa.array(cc)})

    return out.map_batches(finalize, batch_format="pyarrow")


def triangle_sql_ctes(edges_cte: str) -> str:
    """DuckDB twin of :func:`triangle_stats`: canonical distinct
    undirected edges, the one-per-triangle three-way join over the
    ``a < b`` order, per-node unnested counts, integer-division
    clustering coefficient."""
    return f"""
WITH edges AS ({edges_cte}),
und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM edges WHERE src <> dst),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
          (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        GROUP BY node),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
tn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM
         (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
       GROUP BY node)
SELECT d.node, d.deg,
       CAST(COALESCE(tn.n_triangles, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN d.deg >= 2
                 THEN (CAST(2000000 AS BIGINT)
                       * COALESCE(tn.n_triangles, 0))
                      // (d.deg * (d.deg - 1))
                 ELSE 0 END AS BIGINT) AS clustering_micro
FROM deg d LEFT JOIN tn USING (node)
"""
