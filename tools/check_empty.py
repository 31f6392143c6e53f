"""Empty-input robustness sweeps over ``queries()``.

Default mode: clone the sf0.001 table schemas with ZERO rows in EVERY
table and run every entry — operators must return an empty (or
trivially degenerate) result, never crash.  The fast representative
subset runs in ``tests/test_empty_corpus.py``; this tool is the full
surface.

One-sided mode (``--empty t1,t2``): empty ONLY the named tables and
keep the rest at sf0.001 — the blind spot that bit
``nation_account_reconciliation`` (ADVICE r2): a join whose one side
aggregates a zero-row read emits schema-less blocks and crashes in
acero unless the op pins schemas or degenerates.  Sweep each fact
table one at a time with e.g.::

    for t in supplier customer orders lineitem events documents \
             embeddings part nation region; do
        python tools/check_empty.py --empty $t || echo "FAIL $t"
    done

Usage: python tools/check_empty.py [--empty t1,t2] [--only q1,q2] [src_sf_dir]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    import pyarrow.parquet as pq
    import ray
    import ray.data

    ap = argparse.ArgumentParser()
    ap.add_argument("src", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--empty", default=None,
        help="comma-separated tables to empty (default: all)",
    )
    ap.add_argument(
        "--only", default=None,
        help="comma-separated query names to run (default: all)",
    )
    args = ap.parse_args()

    empty_set = (
        set(args.empty.split(",")) if args.empty else set(ALL_TABLES)
    )
    unknown = empty_set - set(ALL_TABLES)
    if unknown:
        sys.exit(f"unknown table(s): {sorted(unknown)}")

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    d = tempfile.mkdtemp(prefix="empty_sf_")
    for t in ALL_TABLES:
        tab = pq.read_table(f"{args.src}/{t}.parquet")
        if t in empty_set:
            tab = tab.slice(0, 0)
        pq.write_table(tab, os.path.join(d, f"{t}.parquet"))

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as e

    chosen = set(args.only.split(",")) if args.only else None
    failures = 0
    for name, fn in e.queries().items():
        if chosen is not None and name not in chosen:
            continue
        try:
            r = fn(d)
            n = r.count() if isinstance(r, ray.data.Dataset) else len(r)
            print(f"{name}: ok rows={n}")
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: CRASH {type(ex).__name__}: {str(ex)[:120]}")
            failures += 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
