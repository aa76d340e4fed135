"""Per-stage partitioned Parquet checkpoints with lineage metadata —
the resumability contract of the north rule ("every stage checkpoints
per-partition Parquet with lineage metadata so a killed ray job resumes
mid-pipeline"). The reference has no linking resume at all (whole run
redone, SURVEY.md §4); this is the Ray-native upgrade.

Layout per stage::

    <root>/<stage>/
        _manifest.json          {input_fingerprint, config_fingerprint,
                                 completed: {partition_id: row_count}}
        part-<id>.parquet       one file per input partition, written to
                                a temp name then atomically renamed

A resumed run with the same fingerprints skips completed partitions and
recomputes only the missing ones; a changed fingerprint invalidates the
whole stage directory (stale partitions can never mix in — SURVEY.md
§7.4 "content-addressed").
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq


def fingerprint_of(obj) -> str:
    """Stable fingerprint of a config / input description (JSON-based)."""
    from merge_machine_ray.functions.hashing import stable_hash64

    return f"{stable_hash64(json.dumps(obj, sort_keys=True, default=str)):016x}"


class StageCheckpoint:
    def __init__(self, root: str, stage: str, input_fingerprint: str,
                 config_fingerprint: str = ""):
        self.dir = os.path.join(root, stage)
        self.manifest_path = os.path.join(self.dir, "_manifest.json")
        self.input_fp = input_fingerprint
        self.config_fp = config_fingerprint
        os.makedirs(self.dir, exist_ok=True)
        self.manifest = self._load_or_init()
        import threading

        # partition files are unique per id; only the shared manifest
        # needs serializing (concurrent edge-range threads, resumable.py)
        self._manifest_lock = threading.Lock()

    def __getstate__(self):
        # the lock can't pickle into Ray task closures; a deserialized
        # copy (remote worker) gets its own fresh lock — manifest writes
        # only ever happen on the driver, so cross-process locking is
        # not needed
        d = dict(self.__dict__)
        d.pop("_manifest_lock", None)
        return d

    def __setstate__(self, d):
        import threading

        self.__dict__.update(d)
        self._manifest_lock = threading.Lock()

    def _load_or_init(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                m = json.load(f)
            if (m.get("input_fingerprint") == self.input_fp
                    and m.get("config_fingerprint") == self.config_fp):
                return m
            # fingerprints changed → stale stage, wipe partitions
            for name in os.listdir(self.dir):
                if name.endswith(".parquet"):
                    os.unlink(os.path.join(self.dir, name))
        return {"input_fingerprint": self.input_fp,
                "config_fingerprint": self.config_fp,
                "completed": {}}

    def _flush_manifest(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=2, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    def is_done(self, partition_id: str) -> bool:
        return partition_id in self.manifest["completed"]

    def pending(self, partition_ids: list[str]) -> list[str]:
        return [p for p in partition_ids if not self.is_done(p)]

    def partition_path(self, partition_id: str) -> str:
        return os.path.join(self.dir, f"part-{partition_id}.parquet")

    def write_partition(self, partition_id: str, table: pa.Table,
                        metrics: dict | None = None) -> None:
        """Atomic write (temp file + rename) then manifest update — a
        kill between the two leaves a completed file that the next run
        re-registers idempotently."""
        final = self.partition_path(partition_id)
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        os.close(fd)
        try:
            pq.write_table(table, tmp, row_group_size=64 * 1024)
            os.replace(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        with self._manifest_lock:
            self.manifest["completed"][partition_id] = {
                "rows": table.num_rows, **(metrics or {})}
            self._flush_manifest()

    def read_all(self):
        """→ ray.data.Dataset over the completed partitions."""
        import ray.data as rd

        paths = [self.partition_path(p) for p in self.manifest["completed"]]
        return rd.read_parquet(paths)


def run_stage_checkpointed(ckpt: StageCheckpoint, partition_ids: list[str],
                           make_table, parallel: bool = True):
    """Compute only PENDING partitions (``make_table(partition_id) →
    pa.Table``, executed as Ray tasks when ``parallel``), write each
    atomically, return the full stage Dataset."""
    pending = ckpt.pending(partition_ids)
    if pending:
        if parallel:
            import ray

            @ray.remote(num_cpus=1)
            def compute(pid: str) -> tuple[str, pa.Table]:
                return pid, make_table(pid)

            for pid, table in ray.get([compute.remote(p) for p in pending]):
                ckpt.write_partition(pid, table)
        else:
            for pid in pending:
                ckpt.write_partition(pid, make_table(pid))
    return ckpt.read_all()


_REPORT_SCHEMA = pa.schema([
    ("stage", pa.string()), ("partition", pa.string()),
    ("rows", pa.int64()), ("elapsed_ms", pa.int64()),
    ("input_fingerprint", pa.string()),
    ("config_fingerprint", pa.string()),
])


def lineage_report(root: str) -> pa.Table:
    """Operational lineage view over a checkpointed run: one row per
    COMPLETED partition across every stage directory under ``root``,
    with its row count, wall time and the stage's input/config
    fingerprints (the invalidation keys). This is the queryable form
    of the per-partition lineage + metrics the manifests record —
    feed it to a Dataset for fleet-level aggregation, or eyeball it
    to find the slow/fat partition after a resume."""
    stages, parts, rows_, ms, ifp, cfp = [], [], [], [], [], []
    if os.path.isdir(root):
        for stage in sorted(os.listdir(root)):
            mp = os.path.join(root, stage, "_manifest.json")
            if not os.path.isfile(mp):
                continue
            with open(mp) as f:
                m = json.load(f)
            for pid, met in sorted(m.get("completed", {}).items()):
                if not isinstance(met, dict):   # legacy bare row count
                    met = {"rows": met}
                stages.append(stage)
                parts.append(pid)
                rows_.append(int(met.get("rows", 0)))
                ms.append(int(met.get("elapsed_ms", -1)))
                ifp.append(str(m.get("input_fingerprint", "")))
                cfp.append(str(m.get("config_fingerprint", "")))
    return pa.table({
        "stage": pa.array(stages, pa.string()),
        "partition": pa.array(parts, pa.string()),
        "rows": pa.array(rows_, pa.int64()),
        "elapsed_ms": pa.array(ms, pa.int64()),
        "input_fingerprint": pa.array(ifp, pa.string()),
        "config_fingerprint": pa.array(cfp, pa.string()),
    }).cast(_REPORT_SCHEMA)
