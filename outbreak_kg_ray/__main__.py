"""CLI entry point — the ``ray job submit`` surface.

    python -m outbreak_kg_ray build --sf-dir /data/sf0.1 \
        --out /data/kg_out --ckpt /data/kg_ckpt [--part-rows 50000]

Builds the canonical node/edge Parquet tables with per-partition
checkpointing; a killed run re-submitted with the same ``--ckpt``
resumes from completed partitions (state/checkpoint.py). ``status``
prints the checkpoint manifest (per-partition lineage + metrics).

Owns a Ray session only when run standalone (guarded init) — library
code never calls ray.init (driver contract, __ray_entry__.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _ensure_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")


def cmd_build(args: argparse.Namespace) -> int:
    _ensure_ray()
    from .pipelines import kg

    t0 = time.perf_counter()
    products = kg.kg_products_dataset(
        args.sf_dir,
        ckpt_root=args.ckpt,
        part_rows=args.part_rows,
        repeat=args.repeat,
    )
    os.makedirs(args.out, exist_ok=True)
    kg.canonical_edges(args.sf_dir, products).write_parquet(
        os.path.join(args.out, "edges")
    )
    kg.canonical_nodes(args.sf_dir, products).write_parquet(
        os.path.join(args.out, "nodes")
    )
    import pyarrow.dataset as pads

    n_edges = pads.dataset(os.path.join(args.out, "edges")).count_rows()
    n_nodes = pads.dataset(os.path.join(args.out, "nodes")).count_rows()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "edges": n_edges,
        "nodes": n_nodes,
        "wall_s": round(dt, 2),
        "triples_per_sec": round(n_edges / dt, 1),
        "out": args.out,
        "ckpt": args.ckpt,
    }))
    return 0


def cmd_status(args: argparse.Namespace) -> int:
    from .state import Checkpointer

    ckpt = Checkpointer(args.ckpt)
    metas = ckpt.partition_metas("kg_products")
    man_path = os.path.join(args.ckpt, "kg_products", "manifest.json")
    manifest = None
    if os.path.exists(man_path):
        with open(man_path) as f:
            manifest = json.load(f)
    print(json.dumps({"manifest": manifest, "partitions": metas}, indent=1))
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    """Run registered TableBuilders (the §2.10 extension surface) to
    a sink: every stock product table plus any user-registered ones,
    or a --tables subset."""
    _ensure_ray()
    from . import registry

    names = args.tables.split(",") if args.tables else None
    out = registry.build_tables(
        args.sf_dir, args.out, names=names, fmt=args.format
    )
    print(json.dumps(out, indent=1))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="outbreak_kg_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build canonical KG tables")
    b.add_argument("--sf-dir", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--ckpt", required=True)
    b.add_argument("--part-rows", type=int, default=50_000)
    b.add_argument("--repeat", type=int, default=1)
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("status", help="show checkpoint manifest")
    s.add_argument("--ckpt", required=True)
    s.set_defaults(fn=cmd_status)

    e = sub.add_parser(
        "export", help="run registered TableBuilders to parquet/tsv"
    )
    e.add_argument("--sf-dir", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--tables", default=None,
                   help="comma-separated subset (default: all)")
    e.add_argument("--format", choices=("parquet", "tsv"),
                   default="parquet")
    e.set_defaults(fn=cmd_export)

    args = ap.parse_args(argv)
    rc = args.fn(args)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
