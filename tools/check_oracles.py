"""Local driver-parity harness: run every queries() entry and its
oracle_sql() through DuckDB on the same sf dir, compare row count,
schema, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return (
            f"SCHEMA MISMATCH ray={sorted(ray_df.columns)} "
            f"sql={sorted(sql_df.columns)}"
        )
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT MISMATCH ray={len(ray_df)} sql={len(sql_df)}"
    a, b = normalize(ray_df), normalize(sql_df)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                      check_exact=False, atol=1e-6)
    except AssertionError as e:
        diff_rows = (a != b).any(axis=1) if a.shape == b.shape else None
        detail = ""
        if diff_rows is not None and diff_rows.any():
            i = int(np.argmax(diff_rows.values))
            detail = f"\n  first diff row {i}:\n  ray: {a.iloc[i].to_dict()}\n  sql: {b.iloc[i].to_dict()}"
        return f"VALUE MISMATCH: {str(e).splitlines()[-1]}{detail}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for tbl in ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tbl}.parquet')"
        )

    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            results[name] = f"RAY ERROR: {type(e).__name__}: {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(ray_df)} rows)"
            continue
        try:
            sql_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"SQL ERROR: {type(e).__name__}: {e}"
            continue
        results[name] = compare(name, ray_df, sql_df)

    width = max(len(k) for k in results)
    n_bad = 0
    for name, status in results.items():
        flag = "✓" if status == "OK" or status.startswith("rows-only") else "✗"
        if flag == "✗":
            n_bad += 1
        print(f"{flag} {name:<{width}} {status}")
    print(f"\n{len(results) - n_bad}/{len(results)} OK")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
