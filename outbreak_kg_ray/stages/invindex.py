"""Inverted-index construction (term → df + capped posting list) —
the serving-side search artifact a corpus pipeline emits.

Skew is the whole problem at scale: a stopword's posting list is the
corpus.  So postings are COMBINER-BOUNDED end-to-end: each block
emits, per term, its distinct-doc count and its first
``postings_cap`` doc_ids (a doc lives in exactly one block, so block
partials never overlap and dfs add).  The term groupby then merges
rows whose size is ≤ #blocks × cap, takes the first ``cap`` of the
merged sorted ids, and flags ``truncated`` — no stage ever holds an
unbounded posting list, mirroring how real indexes shard hot terms.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from outbreak_kg_ray.sources.io import read_parquet_clean

POSTINGS_CAP = 64


def inverted_index(sf_dir: str, *, cap: int = POSTINGS_CAP):
    """→ (term, df, postings, truncated): exact document frequency,
    the first ``cap`` doc_ids ascending (comma-joined), and whether
    the list was cut."""

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def partials(t: pa.Table) -> pa.Table:
        per_term: dict[str, list[int]] = {}
        for did, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            for w in set(text.split()):
                per_term.setdefault(w, []).append(did)
        terms, dfs, posts = [], [], []
        for w, ids in per_term.items():
            ids.sort()
            terms.append(w)
            dfs.append(len(ids))
            posts.append(ids[:cap])
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "pdf": pa.array(dfs, pa.int64()),
            "ppost": pa.array(posts, pa.list_(pa.int64())),
        })

    def merge(g: pa.Table) -> pa.Table:
        # Arrow-native group merge (no pandas round-trip): the list
        # column's flattened values concatenate zero-copy
        df = int(pc.sum(g.column("pdf")).as_py())
        ids = np.sort(
            g.column("ppost").combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            )
        )
        return pa.table({
            "term": g.column("term").slice(0, 1),
            "df": pa.array([df], pa.int64()),
            "postings": pa.array(
                [",".join(str(i) for i in ids[:cap])], pa.string()
            ),
            "truncated": pa.array([df > cap], pa.bool_()),
        })

    return (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .map_groups(merge, batch_format="pyarrow")
    )
