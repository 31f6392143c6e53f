"""Typed relation-pattern extraction (pipelines/relations.py).

The synthesis→extraction equivalence rests on two invariants pinned
here: (1) the classifier inverts every template exactly (right
predicate, right subject/object order) for EVERY lexicon name pair,
and (2) no lexicon name contains a pattern keyword that could make a
non-greedy capture split a name.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from outbreak_kg_ray.fixtures.lexicon import MENTION_LEXICON, MESH_TYPES
from outbreak_kg_ray.pipelines.relations import (
    NT,
    REL_GATES,
    REL_TEMPLATES,
    classify_relation,
    extract_typed_relation,
    relation_sentence,
)

# template idx → (expected predicate or None, inverse?)
EXPECTED = {
    0: ("causes", False),
    1: ("causes", True),
    2: ("transmitted_by", False),
    3: ("located_in", False),
    4: ("located_in", False),
    5: (None, False),
    6: (None, False),
    7: ("located_in", False),
    8: ("transmitted_by", False),
    9: ("causes", True),
}

NAMES = [name for _m, name, _t, _p in MENTION_LEXICON]
KEYWORDS = [
    " causes ", " is caused by ", "confirmed, caused by",
    " is transmitted by ", "can be transmitted by contact with",
    " was detected in ", " is located in ", "an outbreak of",
    " spread to ", " and ", "linked to", "outbreak of",
]


def test_expected_covers_all_templates():
    assert set(EXPECTED) == set(range(NT)) == set(range(len(REL_TEMPLATES)))


def test_no_lexicon_name_contains_pattern_keyword():
    for name in NAMES:
        low = f" {name.lower()} "
        for kw in KEYWORDS:
            assert kw not in low, (name, kw)


def test_classifier_inverts_every_template_for_every_name_pair():
    # every name in the a-slot (b fixed) and every name in the b-slot
    # (a fixed) — covers per-name capture behavior for all templates.
    pairs = [(a, NAMES[0]) for a in NAMES] + [(NAMES[1], b) for b in NAMES]
    for tid, tmpl in enumerate(REL_TEMPLATES):
        rel, inverse = EXPECTED[tid]
        for a, b in pairs:
            got = classify_relation(tmpl.format(a=a, b=b))
            if rel is None:
                assert got is None, (tid, a, b, got)
            else:
                want = (rel, b, a) if inverse else (rel, a, b)
                assert got == want, (tid, a, b, got)


def test_type_gates():
    by_type: dict[str, tuple[str, str]] = {}
    for mid, name, mtype, _p in MENTION_LEXICON:
        by_type.setdefault(mtype, (mid, name))
    path = by_type["pathogen"][1]
    dis = by_type["disease"][1]
    geo = by_type["geoloc"][1]

    hit = extract_typed_relation(f"{path} causes {dis}")
    assert hit is not None and hit[0] == "causes"
    assert MESH_TYPES[hit[1]] == "pathogen" and MESH_TYPES[hit[4]] == "disease"
    # wrong-type subject: disease causes disease → gated out
    assert extract_typed_relation(f"{dis} causes {dis}") is None
    # inverse template grounds + gates the swapped pair
    hit = extract_typed_relation(f"{dis} is caused by {path}")
    assert hit is not None and hit[1:2] != hit[4:5]
    assert MESH_TYPES[hit[1]] == "pathogen"
    # located_in needs a geoloc object
    assert extract_typed_relation(f"{dis} was detected in {geo}") is not None
    assert extract_typed_relation(f"{dis} was detected in {path}") is None
    # self-relation suppressed
    assert extract_typed_relation(f"{path} is transmitted by {path}") is None
    # ungroundable surface → no triple
    assert extract_typed_relation("wibble causes wobble") is None


def test_gates_are_type_sound():
    for rel, (subj_types, obj_types) in REL_GATES.items():
        assert all(t in ("disease", "pathogen", "geoloc") for t in subj_types)
        assert all(t in ("disease", "pathogen", "geoloc") for t in obj_types)


def test_relation_sentence_formula():
    # doc 0: tid = 3 → "was detected in"; names from the mention formula
    from outbreak_kg_ray.sources.pages import mention_names

    s = relation_sentence(0)
    a, b = mention_names(0)[:2]
    assert s == f"{a} was detected in {b}"


@pytest.mark.usefixtures("ray_session")
def test_edges_pipeline_matches_rowwise_recompute():
    from outbreak_kg_ray.pipelines.relations import typed_relation_edges

    sf = "/root/testdata/sf0.001"
    got = typed_relation_edges(sf).to_pandas()
    assert set(got.columns) == {"start_id", "rel_type", "end_id"}
    assert (got["rel_type"].isin(["causes", "transmitted_by",
                                  "located_in"])).all()

    import duckdb

    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/documents.parquet'"
    ).fetchone()[0]
    want = set()
    for d in range(n):
        hit = extract_typed_relation(relation_sentence(d))
        if hit:
            want.add((f"MESH:{hit[1]}", hit[0], f"MESH:{hit[4]}"))
    assert set(map(tuple, got.itertuples(index=False))) == want


@pytest.mark.usefixtures("ray_session")
def test_empty_documents_schemas(tmp_path):
    import pandas as pd

    pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                  "text": pd.Series([], dtype="string"),
                  "lang": pd.Series([], dtype="string")}).to_parquet(
        tmp_path / "documents.parquet")
    from outbreak_kg_ray.pipelines import relations as R

    for fn in (R.relation_sentences, R.pattern_relations,
               R.typed_relation_edges, R.relation_evidence,
               R.relation_type_counts, R.disease_causers):
        ds = fn(str(tmp_path))
        assert ds.count() == 0
