"""Fused single-pass KG-product stage.

The reference runs its NER pass once and then every downstream builder
re-reads the pickled annotations (promed_ner.py:152-153). The Ray-Data
equivalent here: ONE actor-pool pass over the extracted docs that
annotates each doc once and emits a *tagged-union* row set consumed by
all mention-derived builders — no second NER pass, no per-doc shuffle:

- ``kind='doc'``   — one row per document: ``doc_id``
- ``kind='term'``  — per-doc distinct grounded term rows
  (``doc_id, db, id, entry_name``; promed_ner.py:156-177 / A1)
- ``kind='pair'``  — batch-partial co-occurrence counts
  (``start_id, end_id, n``; kg/build.py:52-94 / A3) — combiner-style,
  so a hub pair contributes at most one row per batch (skew bound)

Downstream consumers are column-pruned filters over this one table,
which is also the natural per-partition checkpoint unit
(state/checkpoint.py): a resumed run replays only missing partitions
of this stage and every builder picks up from Parquet.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from ..fixtures.lexicon import MESH_TYPES
from .cooccur import doc_pairs
from .ner import LexicalGrounder, doc_terms

PRODUCT_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("doc_id", pa.string()),
        ("db", pa.string()),
        ("id", pa.string()),
        ("entry_name", pa.string()),
        ("start_id", pa.string()),
        ("end_id", pa.string()),
        ("n", pa.int64()),
    ]
)


class FusedKgStage:
    """Actor-pool stage: docs(doc_id, sections) → tagged product rows.

    Grounder built once per actor (stateful-stage pattern); each doc is
    annotated exactly once and feeds terms AND pair generation.
    """

    def __init__(self, lexicon=None, mesh_types: dict[str, str] | None = None):
        self.grounder = LexicalGrounder(lexicon)
        self.mesh_types = mesh_types if mesh_types is not None else MESH_TYPES

    def __call__(self, batch: pa.Table) -> pa.Table:
        # column-at-a-time build: per-row work is ONLY the term-tuple
        # appends; constant/null columns materialize as Arrow arrays
        # directly (the generic per-cell emit() was 15% of the stage)
        doc_ids = batch.column("doc_id").to_pylist()
        t_doc, t_db, t_id, t_name = [], [], [], []
        pair_counter: Counter = Counter()
        for doc_id, sections in zip(
            doc_ids, batch.column("sections").to_pylist()
        ):
            terms = doc_terms(self.grounder, sections)
            for db, id_, name in terms:
                t_doc.append(doc_id)
                t_db.append(db)
                t_id.append(id_)
                t_name.append(name)
            pair_counter.update(doc_pairs(terms, self.mesh_types))

        n_d, n_t, n_p = len(doc_ids), len(t_doc), len(pair_counter)
        parts = [
            pa.table(
                {
                    "kind": pa.array(["doc"] * n_d, pa.string()),
                    "doc_id": pa.array(doc_ids, pa.string()),
                    "db": pa.nulls(n_d, pa.string()),
                    "id": pa.nulls(n_d, pa.string()),
                    "entry_name": pa.nulls(n_d, pa.string()),
                    "start_id": pa.nulls(n_d, pa.string()),
                    "end_id": pa.nulls(n_d, pa.string()),
                    "n": pa.nulls(n_d, pa.int64()),
                },
                schema=PRODUCT_SCHEMA,
            ),
            pa.table(
                {
                    "kind": pa.array(["term"] * n_t, pa.string()),
                    "doc_id": pa.array(t_doc, pa.string()),
                    "db": pa.array(t_db, pa.string()),
                    "id": pa.array(t_id, pa.string()),
                    "entry_name": pa.array(t_name, pa.string()),
                    "start_id": pa.nulls(n_t, pa.string()),
                    "end_id": pa.nulls(n_t, pa.string()),
                    "n": pa.nulls(n_t, pa.int64()),
                },
                schema=PRODUCT_SCHEMA,
            ),
            pa.table(
                {
                    "kind": pa.array(["pair"] * n_p, pa.string()),
                    "doc_id": pa.nulls(n_p, pa.string()),
                    "db": pa.nulls(n_p, pa.string()),
                    "id": pa.nulls(n_p, pa.string()),
                    "entry_name": pa.nulls(n_p, pa.string()),
                    "start_id": pa.array(
                        [s for s, _ in pair_counter], pa.string()
                    ),
                    "end_id": pa.array(
                        [e for _, e in pair_counter], pa.string()
                    ),
                    "n": pa.array(list(pair_counter.values()), pa.int64()),
                },
                schema=PRODUCT_SCHEMA,
            ),
        ]
        # no combine_chunks: the 3-chunk columns are fine downstream
        # and re-copying 6M string cells per block costs more than it
        # saves
        return pa.concat_tables(parts)


_STAGE_CACHE: dict[str, FusedKgStage] = {}


def _cached_fused_batch(batch: pa.Table) -> pa.Table:
    """Task-pool entry: grounder state built once per *worker process*
    (module cache) and reused by every task scheduled there."""
    stage = _STAGE_CACHE.get("fused")
    if stage is None:
        stage = _STAGE_CACHE["fused"] = FusedKgStage()
    return stage(batch)


def kg_products(docs_ds, *, batch_size: int = 256, concurrency=None,
                compute: str = "tasks"):
    """docs → tagged product Dataset (one NER pass).

    ``compute="tasks"`` (default): plain task pool with the grounder
    cached per worker process — fully elastic, no actor-pool spin-up
    or ramp lag. The right choice for lightweight stage state (a
    compiled lexicon regex). ``compute="actors"``: explicit
    autoscaling actor pool — the right choice when the stage state is
    heavy (a warmed NER model per the north-star GPU path), where
    construction cost must be paid exactly once per worker.
    """
    projected = docs_ds.select_columns(["doc_id", "sections"])
    if compute == "tasks":
        # batch_size=None: per-block batches — a row-count batch size
        # would coalesce upstream blocks and collapse task fan-out
        # (state is worker-cached, so batch granularity is free).
        return projected.map_batches(
            _cached_fused_batch,
            batch_format="pyarrow",
            batch_size=None,
        )
    from .ner import default_concurrency

    return projected.map_batches(
        FusedKgStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )
