"""Link-graph stage: degrees + integer-micro PageRank vs a sequential
reference on random graphs, and the href-extraction kernel contract."""

import collections

import numpy as np
import pyarrow as pa


def _edges_ds(edges):
    import ray.data as rd

    t = pa.table({"src": pa.array([s for s, _ in edges], pa.int64()),
                  "dst": pa.array([d for _, d in edges], pa.int64())})
    return rd.from_arrow(t).repartition(4)


def _ref_pagerank(edges, iters=5, d=85):
    nodes = sorted({s for s, _ in edges} | {x for _, x in edges})
    n = len(nodes)
    outdeg = collections.Counter(s for s, _ in edges)
    r = {v: 1_000_000 // n for v in nodes}
    for _ in range(iters):
        s = collections.defaultdict(int)
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {v: (100 - d) * 1_000_000 // (100 * n) + d * s[v] // 100
             for v in nodes}
    return r


def test_pagerank_matches_reference_random_graph(ray_session):
    from merge_machine_ray.stages.linkgraph import pagerank

    rng = np.random.default_rng(3)
    edges = [(int(rng.integers(0, 200)), int(rng.integers(0, 200)))
             for _ in range(1_500)]
    got = {r["node"]: r["rank_micro"]
           for r in pagerank(_edges_ds(edges), iters=5).take_all()}
    want = _ref_pagerank(edges, iters=5)
    assert got == want
    # mass sanity: total rank stays within [teleport-only, 1] micros
    assert 0 < sum(got.values()) <= 1_000_000 + len(want)


def test_pagerank_driver_and_distributed_paths_identical(ray_session):
    """The bounded driver fast path and the distributed loop (forced
    via driver_edge_limit=0) are the same pure function of the edge
    list — and both match the sequential reference."""
    from merge_machine_ray.stages.linkgraph import pagerank

    rng = np.random.default_rng(17)
    edges = [(int(rng.integers(0, 80)), int(rng.integers(0, 80)))
             for _ in range(400)]
    fast = {r["node"]: r["rank_micro"]
            for r in pagerank(_edges_ds(edges), iters=3).take_all()}
    slow = {r["node"]: r["rank_micro"]
            for r in pagerank(_edges_ds(edges), iters=3,
                              driver_edge_limit=0).take_all()}
    assert fast == slow == _ref_pagerank(edges, iters=3)


def test_pagerank_sink_heavy_node_ranks_highest(ray_session):
    """A node every other node links to must out-rank all others."""
    from merge_machine_ray.stages.linkgraph import pagerank

    edges = [(i, 0) for i in range(1, 30)] + \
            [(i, (i % 7) + 1) for i in range(1, 30)]
    got = {r["node"]: r["rank_micro"]
           for r in pagerank(_edges_ds(edges), iters=5).take_all()}
    assert got[0] == max(got.values())
    assert got == _ref_pagerank(edges, iters=5)


def test_degree_table_full_outer_zeros(ray_session):
    from merge_machine_ray.stages.linkgraph import degree_table

    edges = [(1, 2), (1, 3), (2, 3), (4, 1)]
    got = {r["node"]: (r["out_deg"], r["in_deg"])
           for r in degree_table(_edges_ds(edges)).take_all()}
    assert got == {1: (2, 1), 2: (1, 1), 3: (0, 2), 4: (1, 0)}


def test_extract_hrefs_contract():
    from merge_machine_ray.functions.urls import extract_hrefs

    html = pa.array([
        '<a href="http://a/1">x</a><p href="u2">',
        "plain text",
        "",
        None,
        'href="tail',          # unterminated quote → rest of string
    ])
    assert extract_hrefs(html).to_pylist() == [
        ["http://a/1", "u2"], [], [], [], ["tail"]]


def _ref_triangles(edges):
    """Brute-force per-node triangle counts on the simple undirected
    graph (set-intersection over neighbor sets)."""
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = collections.defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    rows = {}
    for node in sorted(adj):
        nb = adj[node]
        t = sum(len(adj[x] & nb) for x in nb) // 2
        d = len(nb)
        cc = (2_000_000 * t) // (d * (d - 1)) if d >= 2 else 0
        rows[node] = (d, t, cc)
    return rows


def test_triangle_stats_matches_brute_force_random_graphs(ray_session):
    from merge_machine_ray.stages.linkgraph import triangle_stats

    rng = np.random.default_rng(11)
    for _ in range(3):
        edges = [(int(rng.integers(0, 40)), int(rng.integers(0, 40)))
                 for _ in range(160)]
        got = {r["node"]: (r["deg"], r["n_triangles"],
                           r["clustering_micro"])
               for r in triangle_stats(_edges_ds(edges)).take_all()}
        assert got == _ref_triangles(edges)


def test_triangle_driver_and_distributed_paths_identical(ray_session):
    from merge_machine_ray.stages.linkgraph import triangle_stats

    rng = np.random.default_rng(13)
    edges = [(int(rng.integers(0, 60)), int(rng.integers(0, 60)))
             for _ in range(300)]
    drv = sorted(map(tuple, (r.values() for r in
                             triangle_stats(_edges_ds(edges)).take_all())))
    dist = sorted(map(tuple, (r.values() for r in triangle_stats(
        _edges_ds(edges), num_buckets=8,
        driver_edge_limit=0).take_all())))
    assert drv == dist


def test_triangle_stats_planted_clique_and_path(ray_session):
    from merge_machine_ray.stages.linkgraph import triangle_stats

    # K4 on {0..3} (every node: deg 3, 3 triangles, clustering 1.0)
    # plus a dangling 2-path 4-5-6 (zero triangles; middle deg 2)
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(4, 5), (5, 6), (5, 4)]          # duplicate edge too
    got = {r["node"]: (r["deg"], r["n_triangles"],
                       r["clustering_micro"])
           for r in triangle_stats(_edges_ds(edges)).take_all()}
    for v in range(4):
        assert got[v] == (3, 3, 1_000_000)
    assert got[5] == (2, 0, 0)
    assert got[4] == (1, 0, 0) and got[6] == (1, 0, 0)
