"""CLI entry points for ``ray job submit`` / standalone runs.

    python -m merge_machine_ray er --input /data/pages --out /out/clusters
    python -m merge_machine_ray er --input ... --out ... --resumable --ckpt /out/ckpt
    python -m merge_machine_ray link --source /data/dirty --ref /data/clean \
        --match-cols '[{"source": "etab", "ref": "denomination"}]' --out /out/linked

Owns its Ray session (guarded: a pre-initialised session — e.g. the one
``ray job submit`` provides — is reused, per the driver contract that
library code never calls ``ray.init``).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)


def run_er(args) -> int:
    import ray.data as rd

    _ensure_ray()
    if args.resumable:
        from merge_machine_ray.pipelines.resumable import (
            resolve_entities_resumable,
        )

        shards = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        if not shards:
            print(f"no parquet shards under {args.input}", file=sys.stderr)
            return 2
        out = resolve_entities_resumable(
            shards, out_root=args.ckpt or os.path.join(args.out, "_ckpt"))
        out.write_parquet(args.out)
    else:
        from merge_machine_ray.pipelines.entity_resolution import (
            resolve_entities,
        )

        params = None
        if args.params:
            with open(args.params) as f:
                params = json.load(f)
        ds = rd.read_parquet(args.input)
        resolve_entities(ds, params=params,
                         id_col=args.id_col).write_parquet(args.out)
    print(f"clusters written to {args.out}")
    return 0


def run_link(args) -> int:
    import ray.data as rd

    from merge_machine_ray.pipelines.linking import LinkParams, link_datasets

    _ensure_ray()
    match_cols = json.loads(args.match_cols)
    params = (LinkParams.from_json(args.params) if args.params
              else LinkParams.default_for(match_cols))
    out = link_datasets(rd.read_parquet(args.source),
                        rd.read_parquet(args.ref),
                        match_cols, params,
                        source_id_col=args.source_id or None,
                        ref_keep_cols=(args.ref_keep.split(",")
                                       if args.ref_keep else []))
    out.write_parquet(args.out)
    print(f"linked output written to {args.out}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="merge_machine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    er = sub.add_parser("er", help="flagship entity resolution over pages")
    er.add_argument("--input", required=True, help="parquet dir of pages")
    er.add_argument("--out", required=True, help="output parquet dir")
    er.add_argument("--id-col", default="url")
    er.add_argument("--params", help="MatchParams JSON path")
    er.add_argument("--resumable", action="store_true",
                    help="per-stage checkpointed run (kill-safe)")
    er.add_argument("--ckpt", help="checkpoint root (resumable mode)")
    er.set_defaults(fn=run_er)

    lk = sub.add_parser("link", help="dirty→clean record linkage")
    lk.add_argument("--source", required=True, help="dirty parquet dir")
    lk.add_argument("--ref", required=True, help="clean parquet dir")
    lk.add_argument("--match-cols", required=True,
                    help='JSON: [{"source": ..., "ref": ...}, ...]')
    lk.add_argument("--out", required=True)
    lk.add_argument("--params", help="learned LinkParams JSON path")
    lk.add_argument("--source-id", help="source id column")
    lk.add_argument("--ref-keep", help="comma list of ref columns to keep")
    lk.set_defaults(fn=run_link)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
