"""Alert co-occurrence "realism" scoring (reference
kg/realism_score.py).

Semantics: per-alert MeSH term sets from the alert→entity mention
edges (realism_score.py:55-67); all unordered term pairs sorted by
MeSH id; pair count log-normalized by the number of alerts
(realism_score.py:69-73); query-time logsumexp scoring with the
MeSH-ID stoplist (realism_score.py:77-87).

Shape: the per-alert pair generation happens inside the NER pass
(same combiner pattern as stages/cooccur.py); the normalization
constant (alert count) is a scalar broadcast.
"""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import numpy as np
import pyarrow as pa

from ..config import KG_EXCLUDE_NAMES, MESH_ID_EXCLUDE
from ..fixtures.lexicon import MESH_TYPES
from ..stages.ner import LexicalGrounder, doc_terms
from .kg import docs_dataset


class RealismPairStage:
    """docs → partial (mesh_a, mesh_b, n) counts over *edge-filtered*
    term sets (the input to realism is promed_alert_edges.tsv, i.e.
    typed + name-stoplisted mentions — kg/build.py:173-178)."""

    def __init__(self, lexicon=None):
        self.grounder = LexicalGrounder(lexicon)

    def __call__(self, batch: pa.Table) -> pa.Table:
        counter: Counter = Counter()
        docs_with_terms = 0
        for sections in batch.column("sections").to_pylist():
            mesh_ids = {
                mid
                for db, mid, name in doc_terms(self.grounder, sections)
                if db == "MESH"
                and name not in KG_EXCLUDE_NAMES
                and MESH_TYPES.get(mid) in ("disease", "pathogen", "geoloc")
            }
            if mesh_ids:
                docs_with_terms += 1
            for t1, t2 in combinations(sorted(mesh_ids), 2):
                counter[(t1, t2)] += 1  # already sorted by mesh id
        a, b, n = [], [], []
        for (x, y), c in counter.items():
            a.append(x)
            b.append(y)
            n.append(c)
        # marker row: per-batch count of alerts with ≥1 filtered term —
        # folds the normalization-constant pass into this same NER pass
        if docs_with_terms:
            a.append("")
            b.append("")
            n.append(docs_with_terms)
        return pa.table(
            {
                "mesh_a": pa.array(a, pa.string()),
                "mesh_b": pa.array(b, pa.string()),
                "n": pa.array(n, pa.int64()),
            }
        )


def pair_counts(sf_dir: str):
    """→ counted (mesh_a, mesh_b, count) Dataset including the ("","")
    normalization marker row (combiner pattern; ONE NER pass)."""
    from ray.data.aggregate import Sum

    from ..stages.ner import default_concurrency

    docs = docs_dataset(sf_dir).select_columns(["doc_id", "sections"])
    partials = docs.map_batches(
        RealismPairStage, batch_format="pyarrow",
        batch_size=256, concurrency=default_concurrency(),
    )
    return partials.groupby(["mesh_a", "mesh_b"]).aggregate(
        Sum("n", alias_name="count")
    )


def realism_table(sf_dir: str):
    """→ Dataset (mesh_a, mesh_b, count, score) with
    score = round(ln(count) − ln(num_alerts), 6). The alert count
    (realism_score.py:70, ``len(terms_by_alert)``) rides along as the
    ("", "") marker row — no second corpus pass.

    Scale shape: the pair table NEVER lands on the driver (it is
    lexicon²-bounded today, corpus-derived tomorrow) — the counts
    materialize once in the OBJECT STORE, only the 1-row marker is
    collected for the normalization scalar, and the score is a
    per-batch Arrow kernel; point lookups slice the distributed
    table (``realism_lookup``)."""
    import pyarrow.compute as pc

    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    from ..functions.rounding import pa_round_half_away

    out_schema = {
        "mesh_a": pa.string(), "mesh_b": pa.string(),
        "count": pa.int64(), "score": pa.float64(),
    }
    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(out_schema)
    # materialized once (object store, distributed): two consumers —
    # the 1-row marker collect and the scored stream
    counts = pair_counts(sf_dir).materialize()

    def marker_only(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(
                pc.equal(t.column("mesh_a"), pa.scalar("")),
                pc.equal(t.column("mesh_b"), pa.scalar("")),
            )
        )

    marker = counts.map_batches(
        marker_only, batch_format="pyarrow"
    ).take(1)
    num_alerts = int(marker[0]["count"]) if marker else 1
    log_n = float(np.log(num_alerts))

    def score(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.schema(list(out_schema.items())).empty_table()
        keep = pc.or_(
            pc.not_equal(t.column("mesh_a"), pa.scalar("")),
            pc.not_equal(t.column("mesh_b"), pa.scalar("")),
        )
        t = t.filter(keep)
        cnt = t.column("count").cast(pa.int64())
        s = pc.subtract(
            pc.ln(pc.cast(cnt, pa.float64())), pa.scalar(log_n)
        )
        return pa.table(
            {
                "mesh_a": t.column("mesh_a"),
                "mesh_b": t.column("mesh_b"),
                "count": cnt,
                "score": pa_round_half_away(s, 6),
            }
        )

    return counts.map_batches(score, batch_format="pyarrow").sort(
        ["mesh_a", "mesh_b"]
    )


def realism_lookup(sf_dir: str, mesh_ids: list[str]) -> dict:
    """Collect ONLY the query-relevant slice of the pair-score table:
    rows where both endpoints are in ``mesh_ids`` (a handful of ids
    per request). The full table stays distributed."""
    import pyarrow.compute as pc

    ids = sorted(set(mesh_ids))
    if not ids:
        return {}
    id_arr = pa.array(ids, pa.string())

    def slice_batch(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.and_(
                pc.is_in(t.column("mesh_a"), value_set=id_arr),
                pc.is_in(t.column("mesh_b"), value_set=id_arr),
            )
        )

    sliced = realism_table(sf_dir).map_batches(
        slice_batch, batch_format="pyarrow"
    ).to_pandas()
    return {
        (a, b): float(s)
        for a, b, s in zip(
            sliced["mesh_a"], sliced["mesh_b"], sliced["score"]
        )
    }


def logsumexp_score(mesh_ids: list[str], score_lookup: dict, num_alerts: int):
    """Query-time scorer (realism_score.py:77-87): pairwise scores
    with -inf default, logsumexp, high/medium/low at −4.5 / −7.
    logsumexp is the from-scratch implementation (functions/stats.py)
    — scipy is not available in this environment."""
    from ..functions.stats import logsumexp

    scores = {}
    for t1, t2 in combinations(sorted(set(mesh_ids)), 2):
        if t1 in MESH_ID_EXCLUDE or t2 in MESH_ID_EXCLUDE:
            continue
        # typed-node membership test: the reference's mesh_types comes
        # from mesh_hierarchy_nodes.tsv which holds disease/pathogen/
        # geoloc only (realism_score.py:38-50,82) — 'other'-typed
        # lexicon entries (Vaccines, Case Reports, ...) are not members
        typed = ("disease", "pathogen", "geoloc")
        if MESH_TYPES.get(t1) not in typed or MESH_TYPES.get(t2) not in typed:
            continue
        scores[(t1, t2)] = score_lookup.get((t1, t2), -np.inf)
    if not scores:
        return scores, -np.inf, "low"
    total = float(logsumexp(list(scores.values())))
    cls = "high" if total > -4.5 else ("medium" if total > -7 else "low")
    return scores, total, cls
