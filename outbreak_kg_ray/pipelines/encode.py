"""Dictionary encoding + sparse-matrix literature ranking (reference
kg/mesh_csr.py).

The reference streams a 339M-row CSV building first-seen-order
integer encodings and a PMID×MeSH CSR matrix (mesh_csr.py:51-99).
First-seen order is inherently sequential, so this engine substitutes
*sorted* order (dense rank over the sorted distinct keys) —
documented deviation; the ids are internal (SURVEY.md §7).

Over the testdata the (mesh_id, major, pmid) stream is modeled on the
events table: mesh_id := event_type, pmid := user_id,
major := event_id % 2, value := major + 1 (mesh_csr.py:77).

The Fisher-exact literature ranking (mesh_csr.py:102-166) is a
serving-side computation over the encoded triples.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import MESH_ID_EXCLUDE
from outbreak_kg_ray.functions.rounding import round_half_away


def events_triples(sf_dir: str):
    """events → (mesh_id, pmid, value) rows (the 339M-row CSV analog,
    column-pruned at the read)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )

    def shape(t: pa.Table) -> pa.Table:
        eids = t.column("event_id").to_pylist()
        return pa.table(
            {
                "mesh_id": t.column("event_type"),
                "pmid": pa.array(
                    [str(u) for u in t.column("user_id").to_pylist()],
                    pa.string(),
                ),
                "value": pa.array(
                    [(e % 2) + 1 for e in eids], pa.int64()
                ),
            }
        )

    return ds.map_batches(shape, batch_format="pyarrow")


def _rank_map(ds, col: str) -> dict[str, int]:
    """Sorted-order dense rank of a column's distinct values. The
    distinct sets are small relative to the stream (vocabulary-sized);
    at scale this is a ``unique → sort → zip_with_index`` broadcast."""
    values = sorted(ds.unique(col))
    return {v: i for i, v in enumerate(values)}


def dict_encoded_triples(sf_dir: str):
    """→ (pmid_idx, mesh_idx, value) encoded stream
    (mesh_csr.py:51-77 with sorted-rank ids)."""
    triples = events_triples(sf_dir)
    mesh_rank = _rank_map(triples, "mesh_id")
    pmid_rank = _rank_map(triples, "pmid")

    def encode(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pmid_idx": pa.array(
                    [pmid_rank[p] for p in t.column("pmid").to_pylist()],
                    pa.int64(),
                ),
                "mesh_idx": pa.array(
                    [mesh_rank[m] for m in t.column("mesh_id").to_pylist()],
                    pa.int64(),
                ),
                "value": t.column("value"),
            }
        )

    return triples.map_batches(encode, batch_format="pyarrow")


def build_sparse(sf_dir: str):
    """Assemble the PMID×MeSH sparse structure + rank maps (serving
    artifact, mesh_csr.py:91-99) as dict-of-dicts; duplicate
    (pmid, mesh) entries sum, matching scipy's coo→csr handling.
    (scipy is unavailable in this environment — SURVEY.md §7 replaces
    the npz artifact with a Parquet triples table + this assembly.)"""
    triples = events_triples(sf_dir)
    mesh_rank = _rank_map(triples, "mesh_id")
    pmid_rank = _rank_map(triples, "pmid")
    matrix: dict[int, dict[int, int]] = {}
    for batch in dict_encoded_triples(sf_dir).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for p, m, v in zip(
            batch.column("pmid_idx").to_pylist(),
            batch.column("mesh_idx").to_pylist(),
            batch.column("value").to_pylist(),
        ):
            row = matrix.setdefault(p, {})
            row[m] = row.get(m, 0) + v
    return matrix, mesh_rank, pmid_rank


def literature_pvalues(sf_dir: str, query_mesh_terms: list[str]):
    """Fisher-exact ranking (mesh_csr.py:102-166): PMIDs sharing
    enough of the query MeSH set, ranked by
    (overlap desc, coverage desc, pval asc). Fisher is computed from
    scratch (functions/stats.py) — scipy is unavailable here.

    Faithful details: publication_counts sums matrix VALUES
    (major+1), not presence (mesh_csr.py:116); threshold is
    len(terms)-1 for ≤4 terms else 3 (mesh_csr.py:118)."""
    import pandas as pd

    from ..functions.stats import fisher_exact_greater

    matrix, mesh_rank, pmid_rank = build_sparse(sf_dir)
    query = set(query_mesh_terms) - MESH_ID_EXCLUDE
    mesh_indices = [mesh_rank[m] for m in sorted(query) if m in mesh_rank]
    if not mesh_indices:
        return pd.DataFrame(columns=["pmid", "overlap_n", "coverage", "pval"])
    pmid_reverse = {v: k for k, v in pmid_rank.items()}
    total_terms = len(mesh_rank)
    threshold = len(mesh_indices) - 1 if len(mesh_indices) <= 4 else 3
    query_set = set(mesh_indices)
    rows = []
    for pidx, row in matrix.items():
        pub_count = sum(v for m, v in row.items() if m in query_set)
        if pub_count < threshold:
            continue
        target_set = set(row)
        overlap = query_set & target_set
        pval = fisher_exact_greater(
            len(overlap),
            len(query_set - target_set),
            len(target_set - query_set),
            total_terms - len(query_set | target_set),
        )
        rows.append(
            {
                "pmid": pmid_reverse[pidx],
                "overlap_n": len(overlap),
                "coverage": round_half_away(len(overlap) / len(query_set), 6),
                "pval": round_half_away(float(pval), 9),
            }
        )
    df = pd.DataFrame(rows)
    if len(df):
        df = df.sort_values(
            ["overlap_n", "coverage", "pval", "pmid"],
            ascending=[False, False, True, True],
        ).reset_index(drop=True)
    return df
