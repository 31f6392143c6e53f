"""Exact out-of-band oracle for `name_clusters` at scales where the
recursive-closure SQL is infeasible (sf0.1: DuckDB's RECURSIVE reach
CTE exceeded 40 GB / 240 s).

The SQL oracle is `min-reachable-name per name over the
fuzzy_name_pairs graph`; that is exactly union-find with min-label
representatives.  `fuzzy_name_pairs` itself IS hash-verified against
its DuckDB oracle at every scale, so: take the ORACLE's pair table
(DuckDB), run driver union-find (the semantics, not the engine code
path), and hash-compare against the engine's distributed
`name_clusters` result with the same value-hash as check_queries.

Usage: python tools/verify_name_clusters.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import duckdb
    import pandas as pd
    import ray

    from tools.check_queries import TABLES, to_pandas, value_hash

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("GRAFT_CHECK_CPUS", "8")),
            include_dashboard=False,
        )

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    pairs = con.execute(e.oracle_sql()["fuzzy_name_pairs"]).fetchdf()

    # min-label union-find over the oracle's pair table
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    names = set(pairs["name_a"]) | set(pairs["name_b"])
    for a, b in zip(pairs["name_a"], pairs["name_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-label representative == the SQL's min(m) per group
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    oracle = pd.DataFrame(
        {"name": sorted(names)}
    )
    oracle["cluster"] = [find(n) for n in oracle["name"]]

    mine = to_pandas(e.queries()["name_clusters"](sf_dir))
    rows_ok = len(mine) == len(oracle)
    schema_ok = sorted(mine.columns) == sorted(oracle.columns)
    hash_ok = (
        value_hash(mine) == value_hash(oracle)
        if rows_ok and schema_ok else False
    )
    status = "PASS" if (rows_ok and schema_ok and hash_ok) else "FAIL"
    print(
        f"name_clusters[{sf_dir}]: {status} "
        f"rows={len(mine)}/{len(oracle)} schema={schema_ok} "
        f"hash={hash_ok} (union-find oracle over the hash-verified "
        f"fuzzy_name_pairs SQL)"
    )
    sys.exit(0 if status == "PASS" else 1)


if __name__ == "__main__":
    main()
