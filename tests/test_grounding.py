"""Scored, ambiguity-aware grounding (Gilda analog —
kg/client.py:323-378 create_custom_grounder/get_curie and the
scored-groundings walk promed_ner.py:160-176)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from outbreak_kg_ray.stages.grounding import (
    ScoredGrounder,
    ground_terms,
    grounding_curies,
    query_surface,
    scored_groundings,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def grounder():
    return ScoredGrounder()


def test_candidate_table_shape():
    terms = ground_terms()
    # every candidate is (ns, id, entry_name, text, status)
    assert all(len(t) == 5 for t in terms)
    assert {t[0] for t in terms} == {"MESH", "geonames"}
    assert {t[4] for t in terms} == {"name", "synonym"}
    # rows are unique
    assert len(set(terms)) == len(terms)


def test_within_namespace_ambiguity_curie_tiebreak(grounder):
    # "Marburg" is a synonym of BOTH MESH:D008379 (disease) and
    # MESH:D029044 (virus) — same tier/status/ns, curie ascending wins.
    cands = grounder.ground("Marburg")
    assert [c["id"] for c in cands] == ["D008379", "D029044"]
    assert [c["rank"] for c in cands] == [1, 2]
    assert cands[0]["score"] == cands[1]["score"] == 90


def test_cross_namespace_ambiguity_mesh_priority(grounder):
    # "United States" is a MESH primary name AND a geonames primary
    # name: same tier/status, MESH (ns_rank 0) outranks geonames.
    cands = grounder.ground("United States")
    assert cands[0]["ns"] == "MESH" and cands[0]["id"] == "D014481"
    assert cands[1]["ns"] == "geonames" and cands[1]["id"] == "6252001"
    assert cands[0]["score"] == 100 and cands[1]["score"] == 99


def test_match_tier_exact_beats_casefold(grounder):
    exact = grounder.ground("Cholera")
    folded = grounder.ground("CHOLERA")
    assert exact[0]["match_tier"] == 0 and exact[0]["score"] == 100
    assert folded[0]["match_tier"] == 1 and folded[0]["score"] == 80
    assert exact[0]["id"] == folded[0]["id"] == "D002771"


def test_synonym_ranks_below_primary_name(grounder):
    # "Flu" (synonym) scores below what "Influenza" (name) would
    syn = grounder.ground("Flu")
    name = grounder.ground("Influenza")
    assert syn[0]["status"] == "synonym" and syn[0]["score"] == 90
    assert name[0]["status"] == "name" and name[0]["score"] == 100
    assert syn[0]["id"] == name[0]["id"] == "D007251"


def test_get_curie_walk(grounder):
    # top-1 walk (kg/client.py:368-378)
    assert grounder.get_curie("Marburg") == "MESH:D008379"
    assert grounder.get_curie("NYC") == "geonames:5128581"
    assert grounder.get_curie("Atlantis") is None
    # curie passthrough: ':' in name → returned as-is, ungrounded
    assert grounder.get_curie("doid:4325") == "doid:4325"
    assert grounder.get_curie("MESH:D003715") == "MESH:D003715"


def test_normalization_whitespace_collapse(grounder):
    got = grounder.ground("  united   states ")
    assert got and got[0]["id"] == "D014481"
    assert got[0]["match_tier"] == 1  # not an exact surface match


def test_query_surface_formula_determinism():
    # mode 0 = verbatim, 1 = lower, 2 = upper
    s0, s1, s2 = query_surface(0), query_surface(1), query_surface(2)
    assert s1 == s1.lower() and s2 == s2.upper()
    assert query_surface(300) == query_surface(300)


def test_scored_groundings_dataset(ray_session):
    t = scored_groundings(SF).take_all()
    assert t, "sf0.001 must produce grounding rows"
    by_q: dict[int, list] = {}
    for r in t:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        # ranks are 1..n and scores non-increasing
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        # no curie-shaped queries leak into the grounder
        assert all(":" not in r["query"] for r in rows)


def test_grounding_curies_dataset(ray_session):
    rows = grounding_curies(SF).take_all()
    assert len(rows) == 500  # one per document
    by_query = {}
    for r in rows:
        by_query.setdefault(r["query"], r["curie"])
    # decoys are NULL in every case-mangled form
    for decoy in ("Atlantis", "atlantis", "ATLANTIS"):
        if decoy in by_query:
            assert by_query[decoy] is None
    # passthrough keeps the curie verbatim
    for q, c in by_query.items():
        if ":" in q:
            assert c == q


def test_grounding_on_empty_corpus(ray_session, tmp_path):
    pq.write_table(
        pa.table({
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
        }),
        os.path.join(tmp_path, "documents.parquet"),
    )
    from outbreak_kg_ray.stages.grounding import ambiguous_groundings

    assert scored_groundings(str(tmp_path)).count() == 0
    assert grounding_curies(str(tmp_path)).count() == 0
    assert ambiguous_groundings(str(tmp_path)).count() == 0
