"""Typed relation-pattern extraction — the north-star relation
vocabulary beyond ``has_case_count``: ``causes``, ``transmitted_by``,
``located_in`` (north_rule: "(subj, pred, obj) triples for relations
like causes, located_in, has_case_count and transmitted_by using
pattern/dependency extractors").

The reference corpus carries these relations as free-text sentences
("Ebola is caused by Ebolavirus", "cholera spread to Kenya"); the
synthetic corpus has none, so — exactly like the case-count family
(contexts.py:240) — a deterministic relation-sentence stream is
synthesized per alert from the alert's OWN mention entities, and the
ENGINE does the real extraction work:

1. **pattern classification** — an ordered list of compiled regex
   templates (first match wins; inverse templates like "is caused by"
   swap subject/object),
2. **lexical grounding** — the captured subject/object surfaces are
   grounded against the mention lexicon (lowercased-name lookup, the
   same authority the NER grounder uses),
3. **type gating** — a triple is emitted only when the (subject type,
   object type) pair is admissible for the predicate (causes:
   pathogen→disease; transmitted_by: disease|pathogen→pathogen;
   located_in: disease|pathogen→geoloc) and subject ≠ object,
4. **canonicalization** — distinct / evidence-counted via one
   triple-vocabulary-bounded groupby (≤ 3·LEX_N² keys by
   construction — never corpus-scale state).

Synthesis formulas (mirrored in the DuckDB oracle — keep in sync):

- ``tid[doc]   = (doc_id * 7 + 3) % len(REL_TEMPLATES)``
- ``a, b       = mention_names(doc_id)[0], mention_names(doc_id)[1]``
  (every alert has ≥ 2 mentions: n_ment = 2 + doc_id % 4)
- ``sentence   = REL_TEMPLATES[tid].format(a=a, b=b)``

Scale shape: one ``map_batches`` pass over a 2-column projected read
does synthesis + classification + grounding + gating batch-locally;
the only exchange is the vocabulary-bounded triple groupby.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..fixtures.lexicon import MENTION_LEXICON
from ..sources.pages import archive_number, mention_names

# ---------------------------------------------------------------------------
# Synthesis side: the deterministic sentence pool. Two templates are
# deliberately relation-free (plain conjunction; hedged "linked to")
# so the classifier's negative path is exercised.
# ---------------------------------------------------------------------------

REL_TEMPLATES = [
    "{a} causes {b}",
    "{a} is caused by {b}",
    "{a} is transmitted by {b}",
    "{a} was detected in {b}",
    "{a} is located in {b}",
    "{a} and {b} were reported this week",
    "officials suspect {a} may be linked to {b}",
    "an outbreak of {a} spread to {b}",
    "{a} can be transmitted by contact with {b}",
    "outbreak of {a} confirmed, caused by {b}",
]
NT = len(REL_TEMPLATES)


def relation_sentence(doc_id: int) -> str:
    names = mention_names(doc_id)
    tid = (doc_id * 7 + 3) % NT
    return REL_TEMPLATES[tid].format(a=names[0], b=names[1])


# ---------------------------------------------------------------------------
# Extraction side: ordered pattern list (first match wins).
# inverse=True means the surface order is (object, subject) — the
# emitted triple swaps them ("A is caused by B" ⇒ causes(B, A)).
# ---------------------------------------------------------------------------

REL_PATTERNS: list[tuple[str, bool, re.Pattern]] = [
    ("causes", True, re.compile(
        r"^outbreak of (?P<a>.+?) confirmed, caused by (?P<b>.+)$")),
    ("causes", True, re.compile(r"^(?P<a>.+?) is caused by (?P<b>.+)$")),
    ("causes", False, re.compile(r"^(?P<a>.+?) causes (?P<b>.+)$")),
    ("transmitted_by", False, re.compile(
        r"^(?P<a>.+?) can be transmitted by contact with (?P<b>.+)$")),
    ("transmitted_by", False, re.compile(
        r"^(?P<a>.+?) is transmitted by (?P<b>.+)$")),
    ("located_in", False, re.compile(
        r"^an outbreak of (?P<a>.+?) spread to (?P<b>.+)$")),
    ("located_in", False, re.compile(
        r"^(?P<a>.+?) was detected in (?P<b>.+)$")),
    ("located_in", False, re.compile(
        r"^(?P<a>.+?) is located in (?P<b>.+)$")),
]

# grounding authority: lowercased surface → (mesh_id, name, type)
_LEX_BY_NAME = {
    name.lower(): (mid, name, mtype)
    for mid, name, mtype, _p in MENTION_LEXICON
}

# (subject types, object types) admissible per predicate — applied
# AFTER inverse-swap, i.e. to the semantic (subj, obj) pair.
REL_GATES: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "causes": (("pathogen",), ("disease",)),
    "transmitted_by": (("disease", "pathogen"), ("pathogen",)),
    "located_in": (("disease", "pathogen"), ("geoloc",)),
}


def classify_relation(sentence: str):
    """Real pattern extraction: → (rel_type, subj_surface,
    obj_surface) or None when no pattern matches (conjunction /
    hedged sentences)."""
    for rel, inverse, pat in REL_PATTERNS:
        m = pat.match(sentence)
        if m is None:
            continue
        a, b = m.group("a"), m.group("b")
        return (rel, b, a) if inverse else (rel, a, b)
    return None


def extract_typed_relation(sentence: str):
    """classify → ground → type-gate. → (rel_type, subj_id,
    subj_name, subj_type, obj_id, obj_name, obj_type) or None."""
    hit = classify_relation(sentence)
    if hit is None:
        return None
    rel, subj_surface, obj_surface = hit
    subj = _LEX_BY_NAME.get(subj_surface.lower())
    obj = _LEX_BY_NAME.get(obj_surface.lower())
    if subj is None or obj is None:
        return None  # ungroundable surface — no triple
    subj_types, obj_types = REL_GATES[rel]
    if subj[2] not in subj_types or obj[2] not in obj_types:
        return None
    if subj[0] == obj[0]:
        return None  # self-relation
    return (rel, subj[0], subj[1], subj[2], obj[0], obj[1], obj[2])


# ---------------------------------------------------------------------------
# Dataset pipelines
# ---------------------------------------------------------------------------

_SENT_SCHEMA = {"doc_id": pa.int64(), "sentence": pa.string()}
_PATT_SCHEMA = {
    "doc_id": pa.int64(), "rel_type": pa.string(),
    "subj_text": pa.string(), "obj_text": pa.string(),
}
_EDGE_SCHEMA = {
    "start_id": pa.string(), "rel_type": pa.string(),
    "end_id": pa.string(),
}
_EVID_SCHEMA = {**_EDGE_SCHEMA, "n_alerts": pa.int64()}


def _doc_ids(sf_dir: str):
    from ..sources.io import read_parquet_clean

    return read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )


def _empty_if_no_docs(sf_dir: str, schema):
    from ..sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset(schema)
    return None


def relation_sentences(sf_dir: str):
    """→ (doc_id, sentence) — the synthesized relation-sentence
    stream, one per alert."""
    empty = _empty_if_no_docs(sf_dir, _SENT_SCHEMA)
    if empty is not None:
        return empty

    def synth(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sentence": pa.array(
                    [relation_sentence(d) for d in ids], pa.string()
                ),
            }
        )

    return _doc_ids(sf_dir).map_batches(synth, batch_format="pyarrow")


def pattern_relations(sf_dir: str):
    """→ (doc_id, rel_type, subj_text, obj_text) — pattern
    classification output (post inverse-swap, pre type-gate);
    unmatched sentences emit no row."""
    empty = _empty_if_no_docs(sf_dir, _PATT_SCHEMA)
    if empty is not None:
        return empty

    def extract(t: pa.Table) -> pa.Table:
        out = {k: [] for k in _PATT_SCHEMA}
        for d in t.column("doc_id").to_pylist():
            hit = classify_relation(relation_sentence(d))
            if hit is None:
                continue
            rel, s, o = hit
            out["doc_id"].append(d)
            out["rel_type"].append(rel)
            out["subj_text"].append(s)
            out["obj_text"].append(o)
        return pa.table(
            {k: pa.array(v, _PATT_SCHEMA[k]) for k, v in out.items()}
        )

    return _doc_ids(sf_dir).map_batches(extract, batch_format="pyarrow")


def _typed_triples(sf_dir: str, *, with_doc: bool = False):
    """Shared batch pass: synth → classify → ground → gate."""
    cols = (["doc_id"] if with_doc else []) + list(_EDGE_SCHEMA)

    def extract(t: pa.Table) -> pa.Table:
        out: dict[str, list] = {k: [] for k in cols}
        for d in t.column("doc_id").to_pylist():
            hit = extract_typed_relation(relation_sentence(d))
            if hit is None:
                continue
            rel, sid, _sn, _st, oid, _on, _ot = hit
            if with_doc:
                out["doc_id"].append(d)
            out["start_id"].append(f"MESH:{sid}")
            out["rel_type"].append(rel)
            out["end_id"].append(f"MESH:{oid}")
        types = {**_EDGE_SCHEMA, "doc_id": pa.int64()}
        return pa.table({k: pa.array(v, types[k]) for k, v in out.items()})

    return _doc_ids(sf_dir).map_batches(extract, batch_format="pyarrow")


def typed_relation_edges(sf_dir: str):
    """→ distinct (start_id, rel_type, end_id) — the canonicalized
    typed-relation edge table (KG product). Vocabulary-bounded
    groupby (≤ 3·LEX_N² keys)."""
    empty = _empty_if_no_docs(sf_dir, _EDGE_SCHEMA)
    if empty is not None:
        return empty
    from .kg import distinct

    return distinct(
        _typed_triples(sf_dir), ["start_id", "rel_type", "end_id"]
    )


def relation_evidence(sf_dir: str):
    """→ (start_id, rel_type, end_id, n_alerts) — each typed triple
    with its supporting-alert count (KG evidence weighting).
    Batch-local partial counts collapse before the vocabulary-bounded
    exchange."""
    empty = _empty_if_no_docs(sf_dir, _EVID_SCHEMA)
    if empty is not None:
        return empty
    from ray.data.aggregate import Sum

    keys = ["start_id", "rel_type", "end_id"]

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([("start_id", "count")])
        return g.rename_columns(keys + ["n"])

    partials = _typed_triples(sf_dir).map_batches(
        partial, batch_format="pyarrow"
    )
    out = partials.groupby(keys).aggregate(Sum("n", alias_name="n_alerts"))

    def pin(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("n_alerts"),
            "n_alerts",
            pc.cast(t.column("n_alerts"), pa.int64()),
        )

    return out.map_batches(pin, batch_format="pyarrow")


def relation_type_counts(sf_dir: str):
    """→ (rel_type, n_edges, n_alerts) — distinct-edge and total
    evidence counts per predicate (tiny: ≤ 3 rows)."""
    schema = {
        "rel_type": pa.string(), "n_edges": pa.int64(),
        "n_alerts": pa.int64(),
    }
    empty = _empty_if_no_docs(sf_dir, schema)
    if empty is not None:
        return empty
    from ray.data.aggregate import Count, Sum

    out = relation_evidence(sf_dir).groupby("rel_type").aggregate(
        Count(alias_name="n_edges"), Sum("n_alerts", alias_name="n_alerts")
    )

    def pin(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "rel_type": t.column("rel_type"),
                "n_edges": pc.cast(t.column("n_edges"), pa.int64()),
                "n_alerts": pc.cast(t.column("n_alerts"), pa.int64()),
            }
        )

    return out.map_batches(pin, batch_format="pyarrow")


def disease_causers(sf_dir: str):
    """Composed KG query: per disease, the pathogens reported to
    cause it — (disease_id, disease_name, n_pathogens, n_alerts)."""
    schema = {
        "disease_id": pa.string(), "disease_name": pa.string(),
        "n_pathogens": pa.int64(), "n_alerts": pa.int64(),
    }
    empty = _empty_if_no_docs(sf_dir, schema)
    if empty is not None:
        return empty
    from ray.data.aggregate import Count, Sum

    names = {f"MESH:{mid}": name for mid, name, _t, _p in MENTION_LEXICON}
    ev = relation_evidence(sf_dir).map_batches(
        lambda t: t.filter(pc.equal(t.column("rel_type"), "causes")),
        batch_format="pyarrow",
    )
    out = ev.groupby("end_id").aggregate(
        Count(alias_name="n_pathogens"),
        Sum("n_alerts", alias_name="n_alerts"),
    )

    def shape(t: pa.Table) -> pa.Table:
        ends = t.column("end_id").to_pylist()
        return pa.table(
            {
                "disease_id": pa.array(ends, pa.string()),
                "disease_name": pa.array(
                    [names.get(e) for e in ends], pa.string()
                ),
                "n_pathogens": pc.cast(
                    t.column("n_pathogens"), pa.int64()
                ),
                "n_alerts": pc.cast(t.column("n_alerts"), pa.int64()),
            }
        )

    return out.map_batches(shape, batch_format="pyarrow")
