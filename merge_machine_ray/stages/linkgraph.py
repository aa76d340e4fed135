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

__all__ = ["degree_table", "pagerank", "pagerank_sql_ctes"]

#: Edge count below which PageRank runs its driver fast path (same
#: exact integer arithmetic, numpy bincount-style folds per round).
#: The same bounded-driver contract as the clustering module's driver
#: CC: a 2M-edge int64 edge list is ~32 MB of driver heap; above it
#: the distributed loop (one bucketed join + groupby-sum + left join
#: per round) takes over.
DRIVER_EDGE_LIMIT = 2_000_000


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
