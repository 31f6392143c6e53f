"""Per-alert term-pair co-occurrence with in-stage combining.

Reference semantics (kg/build.py:52-94 / A3): per alert, all 2-term
combinations of the sorted distinct term list, pair canonicalized by
entry name, generic names excluded, kept only for "interesting" type
direction pairs (geoloc×pathogen, disease×pathogen, geoloc×disease,
tested in both directions), then globally counted.

Scale shape: the pair *generation* needs only one doc at a time, so
it runs inside the NER pass — no per-doc shuffle at all. Counting is
combiner-style: each batch emits one partial-count row per distinct
pair in the batch, and the only all-to-all exchange is the final
``groupby([start_id, end_id]).sum`` over already-collapsed partials.
Hub-entity skew (the reference's "disease" ×80k case) is bounded by
the same combining: a hub pair contributes ≤1 row per batch.
"""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pyarrow as pa

from ..config import KG_EXCLUDE_NAMES
from ..fixtures.lexicon import MESH_TYPES
from .ner import LexicalGrounder, doc_terms

_PAIR_SCHEMA = pa.schema(
    [("start_id", pa.string()), ("end_id", pa.string()), ("n", pa.int64())]
)


def is_interesting_pair(a_type: str | None, b_type: str | None) -> bool:
    """kg/build.py:64-68 condition for ONE direction (a_, b_)."""
    return (
        (a_type == "geoloc" and b_type == "pathogen")
        or (a_type == "disease" and b_type == "pathogen")
        or (a_type == "geoloc" and b_type == "disease")
    )


def doc_pairs(terms: list[tuple[str, str, str]],
              mesh_types: dict[str, str]) -> list[tuple[str, str]]:
    """Interesting canonical pairs for one alert's sorted term list.
    Faithful to the reference's both-direction test loop
    (kg/build.py:58-69), which appends the canonical pair once per
    satisfied direction."""
    out = []
    for a, b in combinations(terms, 2):
        a, b = tuple(sorted([a, b], key=lambda x: x[2]))
        if a[2] in KG_EXCLUDE_NAMES or b[2] in KG_EXCLUDE_NAMES:
            continue
        for a_, b_ in ((a, b), (b, a)):
            if is_interesting_pair(
                mesh_types.get(a_[1]), mesh_types.get(b_[1])
            ):
                out.append((f"{a[0]}:{a[1]}", f"{b[0]}:{b[1]}"))
    return out


class CooccurStage:
    """Actor-pool stage: docs(doc_id, sections) → partial pair counts.

    Annotation + per-doc distinct + pair generation + per-batch
    Counter combine, all in one pass over the doc."""

    def __init__(self, lexicon=None, mesh_types: dict[str, str] | None = None):
        self.grounder = LexicalGrounder(lexicon)
        self.mesh_types = mesh_types if mesh_types is not None else MESH_TYPES

    def __call__(self, batch: pa.Table) -> pa.Table:
        counter: Counter = Counter()
        for sections in batch.column("sections").to_pylist():
            terms = doc_terms(self.grounder, sections)
            counter.update(doc_pairs(terms, self.mesh_types))
        if not counter:
            return pa.table(
                {"start_id": [], "end_id": [], "n": []}, schema=_PAIR_SCHEMA
            )
        starts, ends, ns = [], [], []
        for (s, e), n in counter.items():
            starts.append(s)
            ends.append(e)
            ns.append(n)
        return pa.table(
            {"start_id": starts, "end_id": ends, "n": ns}, schema=_PAIR_SCHEMA
        )


def cooccurrence_counts(docs_ds, *, batch_size: int = 256, concurrency=None):
    """docs → counted (start_id, end_id, count) Dataset."""
    from ray.data.aggregate import Sum

    from .ner import default_concurrency

    partials = docs_ds.select_columns(["doc_id", "sections"]).map_batches(
        CooccurStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_concurrency(),
    )
    return partials.groupby(["start_id", "end_id"]).aggregate(
        Sum("n", alias_name="count")
    )
