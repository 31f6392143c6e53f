"""Local replica of the driver's correctness gate: run queries()
vs oracle_sql() side-by-side on a given sf dir and compare rows,
schema (column-name set) and a value hash over name-sorted columns.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd


TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> None:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    only = sys.argv[2:] or None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                df = to_pandas(fn(sf_dir))
                print(f"{name}: no_oracle rows={len(df)}")
            except Exception as ex:  # noqa: BLE001
                print(f"{name}: ERROR {ex}")
                failures += 1
            continue
        try:
            mine = to_pandas(fn(sf_dir))
            oracle = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {ex}")
            failures += 1
            continue
        rows_ok = len(mine) == len(oracle)
        schema_ok = sorted(mine.columns) == sorted(oracle.columns)
        hash_ok = (
            value_hash(mine) == value_hash(oracle)
            if rows_ok and schema_ok
            else False
        )
        status = "PASS" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{name}: {status} rows={len(mine)}/{len(oracle)} "
            f"schema={schema_ok} hash={hash_ok}"
        )
        if status == "FAIL" and schema_ok and rows_ok:
            merged = mine[sorted(mine.columns)].round(6)
            print("  mine:", merged.head(3).to_dict("records"))
            print(
                "  oracle:",
                oracle[sorted(oracle.columns)].round(6)
                .head(3)
                .to_dict("records"),
            )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
