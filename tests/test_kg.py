"""KG builder tests against analytic oracles (reference semantics
recomputed from the synthesis formulas, not from the engine)."""

import json
from collections import Counter
from itertools import combinations

import pyarrow.parquet as pq
import pytest

from outbreak_kg_ray.config import KG_EXCLUDE_NAMES, LOCATION_MESH_MAPPING
from outbreak_kg_ray.fixtures import lexicon as lex
from outbreak_kg_ray.pipelines import kg
from outbreak_kg_ray.sources.pages import archive_number, date_str
from .oracle import expected_terms


def _doc_ids(sf_dir):
    return pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).column("doc_id").to_pylist()


# Pipeline outputs are cached per module: each builder executes its
# whole Dataset pipeline (incl. NER actor-pool spin-up), so tests
# share one materialization instead of re-running it per assert.

@pytest.fixture(scope="module")
def cooc_edges_df(sf_dir):
    return kg.cooccurrence_edges(sf_dir).to_pandas()


@pytest.fixture(scope="module")
def canon_nodes_df(sf_dir):
    return kg.canonical_nodes(sf_dir).to_pandas()


@pytest.fixture(scope="module")
def canon_edges_df(sf_dir):
    return kg.canonical_edges(sf_dir).to_pandas()


def test_alert_nodes_timestamps(sf_dir):
    df = kg.alert_nodes(sf_dir).to_pandas()
    got = dict(zip(df["curie"], df["timestamp"]))
    for d in _doc_ids(sf_dir):
        expect = "" if d % 3 == 2 else date_str(d)
        assert got[f"promed:{archive_number(d)}"] == expect
    assert set(df["labels"]) == {"alert"}


def _expected_mention_edges(doc_ids):
    edges = set()
    for d in doc_ids:
        for db, mid, name in expected_terms(d):
            if name in KG_EXCLUDE_NAMES:
                continue
            if lex.MESH_TYPES.get(mid) not in ("disease", "pathogen", "geoloc"):
                continue
            edges.add((f"promed:{archive_number(d)}", "mentions", f"MESH:{mid}"))
    return edges


def test_alert_mention_edges_oracle(sf_dir):
    df = kg.alert_mention_edges(sf_dir).to_pandas()
    got = set(map(tuple, df[["start_id", "rel_type", "end_id"]].values))
    assert got == _expected_mention_edges(_doc_ids(sf_dir))


def _expected_cooccurrence(doc_ids):
    """Direct reimplementation of kg/build.py:52-94 over the
    analytically-known per-alert term lists."""
    cnt = Counter()
    for d in doc_ids:
        terms = expected_terms(d)
        for a, b in combinations(terms, 2):
            a, b = tuple(sorted([a, b], key=lambda x: x[2]))
            if a[2] in KG_EXCLUDE_NAMES or b[2] in KG_EXCLUDE_NAMES:
                continue
            ta, tb = lex.MESH_TYPES.get(a[1]), lex.MESH_TYPES.get(b[1])
            for x, y in ((ta, tb), (tb, ta)):
                if (
                    (x == "geoloc" and y == "pathogen")
                    or (x == "disease" and y == "pathogen")
                    or (x == "geoloc" and y == "disease")
                ):
                    cnt[(f"{a[0]}:{a[1]}", f"{b[0]}:{b[1]}")] += 1
    return cnt


def test_cooccurrence_counts_oracle(sf_dir, cooc_edges_df):
    df = cooc_edges_df
    got = {
        (r.start_id, r.end_id): r.count
        for r in df.itertuples(index=False)
    }
    assert got == dict(_expected_cooccurrence(_doc_ids(sf_dir)))
    assert set(df["rel_type"]) == {"occurs_with"}


def test_mesh_hierarchy():
    nodes = kg.mesh_hierarchy_nodes().to_pandas()
    assert len(nodes) == sum(
        1 for _m, _n, t, _p in lex.ONTOLOGY
        if t in ("disease", "pathogen", "geoloc")
    )
    edges = kg.mesh_hierarchy_edges().to_pandas()
    expected_edges = {
        (f"MESH:{m}", "isa", f"MESH:{p}")
        for m, _n, t, p in lex.ONTOLOGY
        if t in ("disease", "pathogen", "geoloc")
        and p is not None
        and lex.MESH_TYPES.get(p) == t
    }
    assert set(map(tuple, edges.values)) == expected_edges


def test_pathogen_disease_edges_xref_and_umls_drop():
    df = kg.pathogen_disease_edges().to_pandas()
    got = set(map(tuple, df.values))
    expected = set()
    for s, e in lex.PATHOGEN_DISEASE_RELS:
        if s.startswith("umls") or e.startswith("umls"):
            continue
        def xref(c):
            ns, i = c.split(":", 1)
            return (lex.NCBITAXON_TO_MESH if ns == "ncbitaxon"
                    else lex.DOID_TO_MESH).get(i)
        ms, me = xref(s), xref(e)
        if ms and me:
            expected.add((f"MESH:{ms}", "has_pathogen", f"MESH:{me}"))
    assert got == expected
    assert ("MESH:D007835", "has_pathogen", "MESH:D007835") not in got


def test_disease_phenotype_uppercase_and_filter():
    df = kg.disease_phenotype_edges().to_pandas()
    got = set(map(tuple, df.values))
    expected = {
        (s.upper(), "has_phenotype", e.upper())
        for s, e in lex.DISEASE_PHENOTYPE_RELS
        if s.startswith("mesh") and e.startswith("mesh")
    }
    assert got == expected


def test_indicator_edges_semantics():
    df = kg.indicator_edges("health").to_pandas()
    # shared dev series dropped from health (J6)
    assert not any(df["end_id"] == "wdi:NY.GDP.PCAP.CD")
    # ungroundable country absent; Viet Nam mapped through to Vietnam
    assert "MESH:D014744" in set(df["start_id"])
    # years_data JSON: parses, 4-digit keys, 3-decimal values
    yd = json.loads(df["years_data"].iloc[0])
    assert all(len(k) == 4 for k in yd)
    assert all(round(v, 3) == v for v in yd.values())
    # Atlantis must not be present: groundable countries only
    n_countries = len(set(df["start_id"]))
    groundable = {
        LOCATION_MESH_MAPPING.get(c, c) for c in lex.INDICATOR_COUNTRIES
    } & {n for _m, n, t, _p in lex.ONTOLOGY if t == "geoloc"}
    assert n_countries == len(groundable)


def test_geoname_suppression_and_remap():
    nodes = kg.geoname_nodes().to_pandas()
    kept = set(nodes["name"])
    # MeSH-groundable geonames suppressed (D4)
    assert "United States" not in kept and "France" not in kept
    assert "Cameroon" in kept and "Paris" in kept
    edges = kg.geoname_edges().to_pandas()
    e = {(r.start_id, r.end_id) for r in edges.itertuples(index=False)}
    # parent groundable → remapped to MESH curie (J4)
    assert ("geonames:5128581", "MESH:D014481") in e
    # parent not groundable → geoname curie retained
    assert ("geonames:2220957", "geonames:2233387") in e
    # Viet Nam parent goes through LOCATION_MESH_MAPPING
    assert ("geonames:1566083", "MESH:D014744") in e


def test_canonicalization_merges_labels(canon_nodes_df, canon_edges_df):
    nodes = canon_nodes_df
    assert nodes["curie"].is_unique
    # a mesh node present in both hierarchy and cooccurrence keeps one row
    row = nodes[nodes["curie"] == "MESH:D014744"]
    assert len(row) == 1
    assert "entity" in row["labels"].iloc[0] and "geoloc" in row["labels"].iloc[0]
    edges = canon_edges_df
    assert len(edges) == len(
        edges.drop_duplicates(
            ["start_id", "rel_type", "end_id", "count", "years_data"]
        )
    )
    # count/years_data null except for occurs_with / has_indicator
    occ = edges[edges["rel_type"] == "occurs_with"]
    assert occ["count"].notna().all()
    men = edges[edges["rel_type"] == "mentions"]
    assert men["count"].isna().all()


def test_golden_tsv_writer(tmp_path):
    from outbreak_kg_ray.sources.writers import write_sorted_tsv

    ds = kg.mesh_hierarchy_edges()
    p = tmp_path / "mesh_hierarchy_edges.tsv"
    n = write_sorted_tsv(ds, str(p), ["start_id", "rel_type", "end_id"])
    lines = p.read_text().splitlines()
    assert lines[0] == ":START_ID\t:TYPE\t:END_ID"
    assert len(lines) == n + 1
    body = lines[1:]
    assert body == sorted(body)


def test_auto_combine_both_branches(ray_session, monkeypatch):
    """The combine-strategy switch must produce identical results on
    both branches (single-block vs distributed groupby) — driven by
    forcing the threshold to 0 (round-1 VERDICT #8)."""
    from outbreak_kg_ray.pipelines import kg

    sf = "/root/testdata/sf0.001"

    def counts(q):
        df = q.to_pandas().sort_values(["start_id", "end_id"])
        return df.reset_index(drop=True)

    single = counts(kg.cooccurrence_edges(sf, kg.kg_products_dataset(sf)))
    nodes_single = (
        kg.canonical_nodes(sf).to_pandas()
        .sort_values("curie").reset_index(drop=True)
    )
    monkeypatch.setattr(kg, "SINGLE_BLOCK_COMBINE_ROWS", 0)
    dist = counts(kg.cooccurrence_edges(sf, kg.kg_products_dataset(sf)))
    nodes_dist = (
        kg.canonical_nodes(sf).to_pandas()
        .sort_values("curie").reset_index(drop=True)
    )
    assert single.values.tolist() == dist.values.tolist()
    assert nodes_single.values.tolist() == nodes_dist.values.tolist()


# ---------------------------------------------------------------------------
# round 4: incremental KG maintenance (base products + delta batch)
# ---------------------------------------------------------------------------


def test_incremental_equals_full_rebuild(ray_session):
    from outbreak_kg_ray.pipelines import kg

    sf = "/root/testdata/sf0.001"

    def key(rows):
        return sorted(
            tuple((k, repr(v)) for k, v in sorted(r.items())) for r in rows
        )

    full_e = key(kg.canonical_edges(sf).take_all())
    incr_e = key(kg.canonical_edges_incremental(sf).take_all())
    assert incr_e == full_e

    full_n = key(kg.canonical_nodes(sf).take_all())
    incr_n = key(kg.canonical_nodes_incremental(sf).take_all())
    assert incr_n == full_n


def test_incremental_split_point():
    from outbreak_kg_ray.pipelines.kg import _doc_id_split

    k = _doc_id_split("/root/testdata/sf0.001")
    # 500 docs with ids 0..499 → midpoint splits both halves non-empty
    assert k is not None and 0 < k < 499
