"""Sinks: Neo4j-bulk-import-style golden TSVs and partitioned Parquet.

Golden mode reproduces the reference's sorted-set TSV emission
(kg/build.py:89-94 et al., T1): dedup + lexicographic sort + header
row, written with csv.writer(delimiter='\\t') — byte-comparable.
Scale mode writes a directory of Parquet part files (resumable; see
state/checkpoint.py for the manifest layer).
"""

from __future__ import annotations

import csv
import os

# engine column name → Neo4j import header (kg/build.py:71-72,179,263)
NEO4J_HEADERS = {
    "curie": "curie:ID",
    "name": "name:string",
    "labels": ":LABEL",
    "timestamp": "timestamp:string",
    "start_id": ":START_ID",
    "rel_type": ":TYPE",
    "end_id": ":END_ID",
    "count": "count:int",
    "years_data": "years_data:string",
}


def write_sorted_tsv(ds, path: str, columns: list[str]) -> int:
    """Materialize (small, final table), sort rows lexicographically
    like ``sorted(list(set(...)))``, write header + rows. Returns the
    row count."""
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    rows = sorted(
        tuple("" if v is None else v for v in row)
        for row in df[columns].itertuples(index=False, name=None)
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", newline="") as fh:
        writer = csv.writer(fh, delimiter="\t")
        writer.writerow([NEO4J_HEADERS.get(c, c) for c in columns])
        writer.writerows(rows)
    return len(rows)


def write_table_parquet(ds, out_dir: str, *, min_rows_per_file: int = 500_000):
    """Streaming Parquet sink — never materializes on the driver."""
    os.makedirs(out_dir, exist_ok=True)
    try:
        ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
    except TypeError:  # older Ray: num_rows_per_file
        ds.write_parquet(out_dir, num_rows_per_file=min_rows_per_file)
    return out_dir
