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
    """→ pandas (mesh_a, mesh_b, count, score) with
    score = round(ln(count) − ln(num_alerts), 6). The alert count
    (realism_score.py:70, ``len(terms_by_alert)``) rides along as the
    ("", "") marker row — no second corpus pass. Small, final."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        import pandas as pd

        return pd.DataFrame({
            "mesh_a": pd.Series(dtype=object),
            "mesh_b": pd.Series(dtype=object),
            "count": pd.Series(dtype="int64"),
            "score": pd.Series(dtype="float64"),
        })
    df = pair_counts(sf_dir).to_pandas()
    marker = df[(df["mesh_a"] == "") & (df["mesh_b"] == "")]
    num_alerts = int(marker["count"].iloc[0]) if len(marker) else 1
    df = df[(df["mesh_a"] != "") | (df["mesh_b"] != "")].copy()
    from ..functions.rounding import np_round_half_away

    df["score"] = np_round_half_away(
        (np.log(df["count"]) - np.log(num_alerts)).to_numpy(), 6
    )
    return df.sort_values(["mesh_a", "mesh_b"]).reset_index(drop=True)


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
