#!/usr/bin/env python
"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": "er_pages_e2e", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ...}

Headline = flagship ER pipeline (extract → block → score → cluster) over
a deterministic synthetic pages corpus (~3× sf0.1 documents scale),
generated once into /tmp and reused. Additional queries cover the wide
operator families (groupby aggregate, window, near-dup, ANN, IDF).

``--scaling`` runs the same job in two fresh processes at
RAY_GRAFT_CPUS=8 and 32 and reports throughput + scaling efficiency
(sandbox stand-in for N vs 4N nodes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ENTITIES = int(os.environ.get("GRAFT_BENCH_ENTITIES", "40000"))
PAGES_DIR = os.environ.get(
    "GRAFT_PAGES_DIR", f"/tmp/mm_ray_bench_pages_{BENCH_ENTITIES}")


def ensure_pages_corpus() -> None:
    """Generate the bench pages corpus in parallel Ray tasks (one shard
    per task, deterministic per entity range); skipped when present."""
    import ray

    marker = os.path.join(PAGES_DIR, "_DONE")
    if os.path.exists(marker):
        return
    os.makedirs(PAGES_DIR, exist_ok=True)
    shard = 2000

    @ray.remote(num_cpus=1)
    def gen(lo: int, hi: int) -> str:
        import pyarrow.parquet as pq

        from merge_machine_ray.fixtures.pages import pages_table

        path = os.path.join(PAGES_DIR, f"pages-{lo:08d}.parquet")
        if not os.path.exists(path):
            pq.write_table(pages_table(lo, hi), path, row_group_size=10000)
        return path

    refs = [gen.remote(lo, min(lo + shard, BENCH_ENTITIES))
            for lo in range(0, BENCH_ENTITIES, shard)]
    ray.get(refs)
    with open(marker, "w") as f:
        f.write(str(BENCH_ENTITIES))


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Push-based shuffle for the sort-based exchanges: interleaved A/B
    # at 1.05M docs / 32 CPUs measured 14.7/14.9/15.5 s sort-based vs
    # 13.3/12.8/13.5 s push-based on the flagship (~10-13% — the pair
    # exchange dominates); semantics identical (shuffle strategy only).
    ctx.use_push_based_shuffle = True

    import ray.data as rd

    from merge_machine_ray.pipelines import queries as Q
    from merge_machine_ray.pipelines.entity_resolution import resolve_entities

    ensure_pages_corpus()
    # warm the page cache so we measure compute + shuffle, not cold disk
    rd.read_parquet(PAGES_DIR).count()

    timings: dict[str, float] = {}

    t0 = time.time()
    ds = rd.read_parquet(PAGES_DIR)
    out = resolve_entities(ds)
    n_docs = 0
    for b in out.iter_batches(batch_size=65536, batch_format="pyarrow"):
        n_docs += b.num_rows
    headline = time.time() - t0
    timings["er_pages"] = round(headline, 3)

    def timed(name: str, fn):
        import pyarrow as pa

        t = time.time()
        res = fn(SF_DIR)
        if not isinstance(res, pa.Table):  # arrow results are already run
            for _ in res.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"):
                pass
        timings[name] = round(time.time() - t, 3)

    if os.environ.get("GRAFT_HEADLINE_ONLY") == "1":
        result = {
            "metric": "er_pages_e2e", "value": round(headline, 3),
            "unit": "sec", "queries": timings, "sf": SF_DIR,
            "num_cpus": NUM_CPUS, "bench_docs": n_docs,
            "docs_per_sec": round(n_docs / headline, 1),
        }
        ray.shutdown()
        return result

    # dirty→clean linking bench: seeded fixture pair (ref 20k / src 10k)
    def linking_bench(_sf):
        import ray.data as rd

        from merge_machine_ray.fixtures.dirty_clean import (
            MATCH_COLS,
            ref_table,
            source_table,
        )
        from merge_machine_ray.pipelines.linking import LinkParams, link_datasets

        ref = ref_table(20_000)
        src = source_table(20_000, 10_000)
        src = src.drop_columns(["_ref_idx"])
        return link_datasets(rd.from_arrow(src), rd.from_arrow(ref),
                             MATCH_COLS, LinkParams.default_for(MATCH_COLS),
                             source_id_col="id_row",
                             ref_keep_cols=["numero_uai"])

    timed("linking_20k_10k", linking_bench)

    # unique-text variant (r3 VERDICT #8): the 20k/10k fixture's heavy
    # categorical repetition flatters the featurize memo; appending a
    # per-row-unique token to the main clause column (consistently on
    # both sides, so match structure is preserved) forces one analyzer
    # run per ROW — the worst case for dirty web-text sources.
    def linking_unique_bench(_sf):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from merge_machine_ray.fixtures.dirty_clean import (
            MATCH_COLS,
            ref_table,
            source_table,
        )
        from merge_machine_ray.pipelines.linking import (
            LinkParams,
            link_datasets,
        )

        n_ref, n_src = 50_000, 25_000
        ref = ref_table(n_ref)
        src = source_table(n_ref, n_src)
        uniq_ref = pa.array([f"loc{i:06d}" for i in range(n_ref)])
        di = ref.schema.get_field_index("denomination")
        ref = ref.set_column(di, "denomination", pc.binary_join_element_wise(
            ref["denomination"], uniq_ref, " "))
        ridx = src["_ref_idx"].to_numpy(zero_copy_only=False)
        uniq_src = pa.array([f"loc{int(j):06d}" for j in ridx])
        ei = src.schema.get_field_index("etab")
        src = src.set_column(ei, "etab", pc.binary_join_element_wise(
            src["etab"], uniq_src, " "))
        src = src.drop_columns(["_ref_idx"])
        return link_datasets(rd.from_arrow(src), rd.from_arrow(ref),
                             MATCH_COLS, LinkParams.default_for(MATCH_COLS),
                             source_id_col="id_row",
                             ref_keep_cols=["numero_uai"])

    timed("linking_unique_50k_25k", linking_unique_bench)
    timed("q1_pricing_summary", Q.q1_pricing_summary)
    timed("events_hourly", Q.events_hourly)
    timed("idf_table", Q.idf_table)
    timed("minhash_near_dups", Q.minhash_near_dups)
    timed("simhash_near_dups", Q.simhash_near_dups)
    timed("embedding_near_dups", Q.embedding_near_dups)
    timed("lang_id_pred", Q.lang_id_pred)
    timed("ann_topk", Q.ann_topk)
    timed("er_documents", Q.er_documents)
    timed("cluster_agreement", Q.cluster_agreement)
    timed("blocking_quality", Q.blocking_quality)
    timed("decontaminated_docs", Q.decontaminated_docs)
    timed("doc_chunks", Q.doc_chunks)
    timed("incremental_dedup", Q.incremental_dedup_docs)
    timed("pages_host_stats", Q.pages_host_stats)
    timed("doc_keywords", Q.doc_keywords_q)
    timed("bigram_pmi", Q.bigram_pmi_q)
    timed("host_quota_docs", Q.host_quota_docs)
    timed("line_dedup_docs", Q.line_dedup_docs)
    timed("latest_page_snapshot", Q.latest_page_snapshot)
    timed("canonical_url_dedup", Q.canonical_url_dedup)
    timed("repeated_span_docs", Q.repeated_span_docs)
    timed("doc_lm_score", Q.doc_lm_score)
    timed("weighted_jaccard_dups", Q.weighted_jaccard_dups)
    timed("metablocking_wep", Q.metablocking_wep)
    timed("fellegi_sunter_weights", Q.fellegi_sunter_weights)
    timed("er_threshold_sweep", Q.er_threshold_sweep)
    timed("fs_pair_scores", Q.fs_pair_scores)
    timed("blocking_key_stats", Q.blocking_key_stats)
    timed("packed_sequences", Q.packed_sequences_q)
    timed("distinct_users_kmv", Q.distinct_users_kmv)
    timed("link_pagerank", Q.link_pagerank)
    timed("bpe_merges", Q.bpe_merges_q)
    timed("bpe_token_counts", Q.bpe_token_counts_q)
    timed("nb_doc_classifier", Q.nb_doc_classifier)
    timed("bm25_search", Q.bm25_search)
    timed("table_profile", Q.table_profile)
    timed("event_rate_anomalies", Q.event_rate_anomalies)
    timed("mirror_hosts", Q.mirror_hosts_q)
    timed("doc_novelty", Q.doc_novelty)
    timed("image_near_dups", Q.image_near_dups_planted)
    timed("audio_near_dups", Q.audio_near_dups_planted)
    timed("video_near_dups", Q.video_near_dups_planted)

    # incremental ER: cluster all but the last shard (untimed), then
    # time folding the last shard in — old-old pairs are pruned before
    # the scoring pool, so the add costs featurize+banding (linear)
    # plus scoring only the increment-touching pairs
    import glob as _glob

    from merge_machine_ray.pipelines.entity_resolution import (
        resolve_entities_incremental,
    )

    shards = sorted(_glob.glob(os.path.join(PAGES_DIR, "*.parquet")))
    if len(shards) >= 2:
        old_p, new_p = shards[:-1], shards[-1:]
        prev = resolve_entities(rd.read_parquet(old_p)).materialize()
        t0 = time.time()
        inc = resolve_entities_incremental(
            rd.read_parquet(old_p), rd.read_parquet(new_p), prev)
        for _ in inc.iter_batches(batch_size=65536,
                                  batch_format="pyarrow"):
            pass
        timings["er_incremental_add"] = round(time.time() - t0, 3)

    result = {
        "metric": "er_pages_e2e",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "bench_docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 1),
    }
    ray.shutdown()
    return result


def _host_ceiling_probe(levels: tuple[int, int],
                        seconds: float = 5.0) -> dict:
    """Aggregate pure-numpy uint64 throughput of N independent processes
    at both parallelism levels — the SAME-WINDOW upper bound on any
    engine's N→4N speedup. This shared VM does not reliably supply 4×
    the compute from 8→32 slots: measured ALU aggregates ranged 1.98×
    to 3.06× across windows on identical code. Raw engine efficiency is
    therefore reported alongside the ceiling and the ceiling-normalized
    efficiency (engine speedup / host speedup)."""
    import multiprocessing as mp

    import numpy as np

    def burn(q, size):
        rng = np.random.RandomState(0)
        a = rng.randint(0, 1 << 62, size=size).astype(np.uint64)
        t0 = time.time()
        iters = 0
        while time.time() - t0 < seconds:
            with np.errstate(over="ignore"):
                b = a * np.uint64(0x9E3779B97F4A7C15)
                b ^= b >> np.uint64(33)
                b *= np.uint64(0xBF58476D1CE4E5B9)
                b ^= b >> np.uint64(29)
            iters += 1
        q.put(iters)

    agg = {}
    # alu: 256 KB working set (L2-resident, pure compute ceiling);
    # dram: 16 MB working set (memory-bandwidth ceiling — what the
    # shuffle/object-store-bound stages are actually limited by; a
    # multi-NODE cluster brings per-node bandwidth, a single socket
    # does not)
    for kind, size in (("alu", 1 << 15), ("dram", 1 << 21)):
        for n in levels:
            q = mp.Queue()
            ps = [mp.Process(target=burn, args=(q, size))
                  for _ in range(n)]
            for p in ps:
                p.start()
            for p in ps:
                p.join()
            agg[(kind, n)] = sum(q.get() for _ in ps) / seconds \
                * (size / (1 << 15))
    return agg


def run_scaling() -> dict:
    levels = tuple(int(x) for x in os.environ.get(
        "GRAFT_SCALING_LEVELS", "8,32").split(","))
    n_lo, n_hi = levels

    def run(ncpu: int) -> dict:
        # scaling runs use a larger corpus (~1M docs): at the default
        # size the pipeline finishes in ~10-20 s where fixed session
        # overheads and machine noise swamp the scaling signal
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_HEADLINE_ONLY="1",
                   GRAFT_BENCH_ENTITIES=os.environ.get(
                       "GRAFT_BENCH_ENTITIES", "300000"))
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # The sandbox host's effective core allocation fluctuates (shared
    # VM): interleave repeated runs of both levels and take the best
    # time per level, so one noisy window can't skew the ratio; probe
    # the host's own N→4N compute ceiling in the same window.
    host = _host_ceiling_probe(levels)
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    runs_lo, runs_hi = [], []
    for _ in range(repeats):
        runs_lo.append(run(n_lo))
        runs_hi.append(run(n_hi))
    lo = min(runs_lo, key=lambda r: r["value"])
    hi = min(runs_hi, key=lambda r: r["value"])
    t_lo, t_hi = lo["value"], hi["value"]
    speedup = t_lo / t_hi
    alu_speedup = host[("alu", n_hi)] / host[("alu", n_lo)]
    dram_speedup = host[("dram", n_hi)] / host[("dram", n_lo)]
    eff = speedup / (n_hi / n_lo)
    return {
        "metric": "scaling_efficiency",
        "levels": [n_lo, n_hi],
        f"sec_{n_lo}": t_lo, f"sec_{n_hi}": t_hi,
        f"docs_per_sec_{n_lo}": lo["docs_per_sec"],
        f"docs_per_sec_{n_hi}": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "host_alu_ceiling_speedup": round(alu_speedup, 3),
        "host_dram_ceiling_speedup": round(dram_speedup, 3),
        "efficiency_vs_alu_ceiling": round(speedup / alu_speedup, 3),
        "efficiency_vs_dram_ceiling": round(speedup / dram_speedup, 3),
        "bench_docs": hi["bench_docs"],
        f"all_sec_{n_lo}": [r["value"] for r in runs_lo],
        f"all_sec_{n_hi}": [r["value"] for r in runs_hi],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
