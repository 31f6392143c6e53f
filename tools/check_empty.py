"""Exhaustive empty-input robustness sweep: clone the sf0.001 table
schemas with ZERO rows and run every ``queries()`` entry against
them.  Every operator must return an empty (or trivially degenerate)
result — never crash.  The fast representative subset runs in
``tests/test_empty_corpus.py``; this tool is the full surface.

Usage: python tools/check_empty.py [src_sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile


def main() -> None:
    import pyarrow.parquet as pq
    import ray
    import ray.data

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    d = tempfile.mkdtemp(prefix="empty_sf_")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        pq.write_table(
            pq.read_table(f"{src}/{t}.parquet").slice(0, 0),
            os.path.join(d, f"{t}.parquet"),
        )

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as e

    failures = 0
    for name, fn in e.queries().items():
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
