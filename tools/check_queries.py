"""Local replica of the driver's correctness gate: run queries()
vs oracle_sql() side-by-side on a given sf dir and compare rows,
schema (column-name set) and a value hash over name-sorted columns.

Usage: python tools/check_queries.py [sf_dir] [query ...]

Env knobs (for the big-sf sweeps):
- GRAFT_CHECK_CPUS: Ray CPUs for the engine side (default 8)
- GRAFT_ORACLE_TIMEOUT: seconds per ORACLE query before
  con.interrupt() (default 0 = unlimited).  A timed-out oracle is
  reported as ORACLE_TIMEOUT with the engine's row count — the
  engine side completed; the ORACLE is what's infeasible at that
  scale (e.g. recursive transitive-closure SQL at sf0.1).
- GRAFT_CHECK_RESUME: path to a previous run's log; queries that
  already have a result line there are skipped (crash/kill resume
  for multi-hour sweeps).
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

    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("GRAFT_CHECK_CPUS", "8")),
            include_dashboard=False,
        )

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

    import os
    import threading

    oracle_timeout = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0"))
    done: set[str] = set()
    resume_log = os.environ.get("GRAFT_CHECK_RESUME")
    if resume_log and os.path.exists(resume_log):
        import re

        pat = re.compile(
            r"^(\w+): (PASS|FAIL|ERROR|no_oracle|ORACLE_TIMEOUT)"
        )
        with open(resume_log) as f:
            for line in f:
                m = pat.match(line.strip())
                if m:
                    done.add(m.group(1))
        print(f"# resuming: {len(done)} queries already done in "
              f"{resume_log}", flush=True)

    def run_oracle(sql: str):
        """Oracle with an interrupt watchdog: DuckDB has no statement
        timeout, so a runaway closure query would hang the sweep."""
        if oracle_timeout <= 0:
            return con.execute(sql).fetchdf()
        timer = threading.Timer(oracle_timeout, con.interrupt)
        timer.start()
        try:
            return con.execute(sql).fetchdf()
        finally:
            timer.cancel()

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in done:
            continue
        if name not in oracles:
            try:
                df = to_pandas(fn(sf_dir))
                print(f"{name}: no_oracle rows={len(df)}", flush=True)
            except Exception as ex:  # noqa: BLE001
                print(f"{name}: ERROR {ex}", flush=True)
                failures += 1
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {ex}", flush=True)
            failures += 1
            continue
        try:
            oracle = run_oracle(oracles[name])
        except duckdb.InterruptException:
            print(f"{name}: ORACLE_TIMEOUT rows={len(mine)} "
                  f"(engine completed; oracle exceeded "
                  f"{oracle_timeout:.0f}s)", flush=True)
            continue
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {ex}", flush=True)
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
            f"schema={schema_ok} hash={hash_ok}",
            flush=True,
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
