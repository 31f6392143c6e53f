"""Deterministic ontology / lexicon fixtures.

The reference resolves entity types and hierarchy through live
ontology services (indra ``mesh_client`` / ``bio_ontology`` /
``pyobo`` — reference kg/build.py:10-11, kg/util.py:4-31) and grounds
names with Gilda's lexical grounder (promed_ner.py:49-50). This engine
replaces those services with *versioned lookup tables*: a small,
fully deterministic ontology in MeSH shape, shippable to every actor.

Only the four root IDs carry reference semantics
(kg/util.py:4-31): D005842 Geographic Locations (geoloc root),
D001419 Bacteria and D014780 Viruses (pathogen roots), D004194
Diseases (disease root). Leaf IDs are fixture identifiers in MeSH
``D######`` format.

Everything here is pure data with a *fixed order* — the mention
synthesis formula (sources/pages.py) and the DuckDB oracle SQL
(__ray_entry__.py) both index into ``MENTION_LEXICON`` by position,
so order changes are breaking.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Ontology: (mesh_id, name, type, parent_id). type ∈
# {disease, pathogen, geoloc, other}; parent_id=None for roots.
# Types are what the reference's is_disease / is_pathogen / is_geoloc
# predicates (kg/util.py:4-31) would compute via isa-closure to roots.
# ---------------------------------------------------------------------------

ROOTS = [
    ("D004194", "Diseases", "disease", None),
    ("D001419", "Bacteria", "pathogen", None),
    ("D014780", "Viruses", "pathogen", None),
    ("D005842", "Geographic Locations", "geoloc", None),
]

CONTINENTS = [
    ("D000350", "Africa", "geoloc", "D005842"),
    ("D001208", "Americas", "geoloc", "D005842"),
    ("D001104", "Asia", "geoloc", "D005842"),
    ("D005060", "Europe", "geoloc", "D005842"),
]

COUNTRIES = [
    ("D014481", "United States", "geoloc", "D001208"),
    ("D001938", "Brazil", "geoloc", "D001208"),
    ("D002170", "Canada", "geoloc", "D001208"),
    ("D014744", "Vietnam", "geoloc", "D001104"),
    ("D007194", "India", "geoloc", "D001104"),
    ("D002681", "China", "geoloc", "D001104"),
    ("D007564", "Japan", "geoloc", "D001104"),
    ("D009540", "Nigeria", "geoloc", "D000350"),
    ("D007630", "Kenya", "geoloc", "D000350"),
    ("D004534", "Egypt", "geoloc", "D000350"),
    ("D005602", "France", "geoloc", "D005060"),
    ("D005858", "Germany", "geoloc", "D005060"),
    ("D013030", "Spain", "geoloc", "D005060"),
    ("D002009", "Bulgaria", "geoloc", "D005060"),
    ("D003092", "Congo", "geoloc", "D000350"),
]

DISEASES = [
    ("D002771", "Cholera", "disease", "D004194"),
    ("D003715", "Dengue", "disease", "D004194"),
    ("D008288", "Malaria", "disease", "D004194"),
    ("D007251", "Influenza", "disease", "D004194"),
    ("D008457", "Measles", "disease", "D004194"),
    ("D011818", "Rabies", "disease", "D004194"),
    ("D000881", "Anthrax", "disease", "D004194"),
    ("D014376", "Tuberculosis", "disease", "D004194"),
    ("D015004", "Yellow Fever", "disease", "D004194"),
    ("D019142", "Ebola Hemorrhagic Fever", "disease", "D004194"),
    ("D015003", "Lumpy Skin Disease", "disease", "D004194"),
    ("D005585", "Avian Influenza", "disease", "D007251"),
    ("D008379", "Marburg Virus Disease", "disease", "D004194"),
    ("D007835", "Lassa Fever", "disease", "D004194"),
    ("D045908", "Monkeypox", "disease", "D004194"),
    ("D010930", "Plague", "disease", "D004194"),
    ("D007922", "Leptospirosis", "disease", "D004194"),
    ("D002006", "Brucellosis", "disease", "D004194"),
    # In KG_EXCLUDE_NAMES (kg/build.py:39-43) *and* in the reference
    # mesh_csr/realism ID exclude list (kg/mesh_csr.py:27-48):
    ("D004196", "Disease Outbreaks", "disease", "D004194"),
]

PATHOGENS = [
    ("D029043", "Ebolavirus", "pathogen", "D014780"),
    ("D029044", "Marburgvirus", "pathogen", "D014780"),
    ("D003716", "Dengue Virus", "pathogen", "D014780"),
    ("D009980", "Influenza A Virus", "pathogen", "D014780"),
    ("D008459", "Measles Virus", "pathogen", "D014780"),
    ("D011822", "Rabies Virus", "pathogen", "D014780"),
    ("D045909", "Monkeypox Virus", "pathogen", "D014780"),
    ("D014902", "West Nile Virus", "pathogen", "D014780"),
    ("D000071244", "Zika Virus", "pathogen", "D014780"),
    ("D014735", "Vibrio Cholerae", "pathogen", "D001419"),
    ("D001408", "Bacillus Anthracis", "pathogen", "D001419"),
    ("D009169", "Mycobacterium Tuberculosis", "pathogen", "D001419"),
    ("D015009", "Yersinia Pestis", "pathogen", "D001419"),
    ("D007918", "Leptospira", "pathogen", "D001419"),
    ("D002011", "Brucella", "pathogen", "D001419"),
    ("D012567", "Salmonella Enterica", "pathogen", "D001419"),
]

# Groundable terms of non-(disease|pathogen|geoloc) type: mentioned,
# but dropped from alert→entity edges by the type filter
# (kg/build.py:177) and/or the name stoplist (kg/build.py:174-175).
OTHERS = [
    ("D014612", "Vaccines", "other", None),       # name-stoplisted
    ("D002363", "Case Reports", "other", None),   # type-filtered only
    ("D006262", "Health", "other", None),         # name-stoplisted + ID-stoplisted
]

ONTOLOGY = ROOTS + CONTINENTS + COUNTRIES + DISEASES + PATHOGENS + OTHERS

# Injectable mention lexicon — FIXED ORDER, indexed by the synthesis
# formula. Excludes the four roots (never mentioned in page text).
MENTION_LEXICON = CONTINENTS + COUNTRIES + DISEASES + PATHOGENS + OTHERS
LEX_N = len(MENTION_LEXICON)

MESH_TYPES = {mid: mtype for mid, _, mtype, _ in ONTOLOGY}
MESH_NAMES = {mid: name for mid, name, _, _ in ONTOLOGY}
NAME_TO_ID = {name: mid for mid, name, _, _ in ONTOLOGY}

def _assert_invariants() -> None:
    names = [name for _, name, _, _ in ONTOLOGY]
    assert len(set(names)) == len(names), "ontology names must be unique"
    ids = [mid for mid, _, _, _ in ONTOLOGY]
    assert len(set(ids)) == len(ids), "ontology ids must be unique"

_assert_invariants()

# ---------------------------------------------------------------------------
# Scored-grounding fixture (Gilda analog, reference
# kg/client.py:323-378 create_custom_grounder/get_curie and the
# scored-groundings walk promed_ner.py:160-176).  The custom grounder
# indexes MeSH terms AND geoname terms; a surface form can therefore
# carry multiple candidate groundings ("United States" is both
# MESH:D014481 and geonames:6252001) which Gilda ranks by match
# quality and term status before the namespace-priority walk.  The
# engine's deterministic analog ranks by
# (match tier, status, namespace priority, curie) — see
# stages/grounding.py.
#
# GROUND_SYNONYMS: (ns, id, entry_name, synonym_text) — additional
# surface forms with status='synonym' (Gilda Term status,
# kg/client.py:359: fixture names carry status='name').  "Marburg" is
# deliberately ambiguous WITHIN MeSH (disease D008379 vs virus
# D029044) to exercise the curie tiebreak.
# ---------------------------------------------------------------------------

GROUND_SYNONYMS = [
    ("MESH", "D019142", "Ebola Hemorrhagic Fever", "Ebola"),
    ("MESH", "D008379", "Marburg Virus Disease", "Marburg"),
    ("MESH", "D029044", "Marburgvirus", "Marburg"),
    ("MESH", "D014376", "Tuberculosis", "TB"),
    ("MESH", "D007251", "Influenza", "Flu"),
    ("MESH", "D045908", "Monkeypox", "Mpox"),
    ("MESH", "D014481", "United States", "USA"),
    ("MESH", "D014481", "United States", "United States of America"),
    ("MESH", "D002771", "Cholera", "Asiatic Cholera"),
    ("MESH", "D000071244", "Zika Virus", "ZIKV"),
    ("geonames", "5128581", "New York City", "NYC"),
    ("geonames", "1566083", "Ho Chi Minh City", "Saigon"),
]

# Ungroundable decoy surfaces (get_curie → None, kg/client.py:375-376).
GROUND_DECOYS = ["Atlantis", "Wakanda", "Gotham City"]

# Curie-shaped queries (get_curie passthrough: ':' in name → returned
# as-is WITHOUT grounding, kg/client.py:373-374).
GROUND_CURIE_QUERIES = ["MESH:D003715", "doid:4325", "geonames:2988507"]


def _ground_query_pool() -> list[str]:
    """Deterministic ordered pool of grounding query surfaces: every
    lexicon name, every geoname name, every synonym surface, then the
    decoys — order-stable and duplicate-free (pool index is part of
    the oracle contract)."""
    seen: set[str] = set()
    pool: list[str] = []
    for s in (
        [name for _, name, _, _ in MENTION_LEXICON]
        + [name for _, name, _, _ in GEONAME_TERMS]
        + [syn for _, _, _, syn in GROUND_SYNONYMS]
        + GROUND_DECOYS
        + GROUND_CURIE_QUERIES
    ):
        if s not in seen:
            seen.add(s)
            pool.append(s)
    return pool


# ---------------------------------------------------------------------------
# Pathogen→disease relation fixture (reference input
# kg/pathogen_disease_rels.tsv, consumed at kg/build.py:189-213):
# rows in foreign namespaces; umls rows are dropped, the rest xref-map
# to MeSH or are dropped.
# ---------------------------------------------------------------------------

PATHOGEN_DISEASE_RELS = [
    # (START_ID, END_ID) — START is the disease side in the reference TSV
    ("doid:0050155", "ncbitaxon:666"),     # cholera ← Vibrio cholerae
    ("doid:8659", "ncbitaxon:1392"),       # anthrax ← Bacillus anthracis
    ("doid:2945", "ncbitaxon:1773"),       # TB ← M. tuberculosis
    ("doid:10886", "ncbitaxon:632"),       # plague ← Y. pestis
    ("umls:C0008354", "ncbitaxon:666"),    # dropped: umls start
    ("doid:12365", "umls:C0024530"),       # dropped: umls end
    ("doid:4325", "ncbitaxon:186538"),     # ebola ← Ebolavirus
    ("doid:9065", "ncbitaxon:3052505"),    # lassa (no xref → dropped)
    ("doid:12205", "ncbitaxon:11292"),     # rabies ← Rabies virus
    ("doid:8469", "ncbitaxon:11320"),      # influenza ← Influenza A
]

# xref maps (replace live mesh_client.ncbitaxon_to_mesh / pyobo.get_xref,
# kg/build.py:197-207). Unlisted keys are unmapped (row dropped).
NCBITAXON_TO_MESH = {
    "666": "D014735",      # Vibrio cholerae
    "1392": "D001408",     # Bacillus anthracis
    "1773": "D009169",     # M. tuberculosis
    "632": "D015009",      # Y. pestis
    "186538": "D029043",   # Ebolavirus
    "11292": "D011822",    # Rabies virus
    "11320": "D009980",    # Influenza A virus
}
DOID_TO_MESH = {
    "0050155": "D002771",  # cholera
    "8659": "D000881",     # anthrax
    "2945": "D014376",     # tuberculosis
    "10886": "D010930",    # plague
    "4325": "D019142",     # ebola hemorrhagic fever
    "12205": "D011818",    # rabies
    "8469": "D007251",     # influenza
    "12365": "D008288",    # malaria (end side is umls → row dropped anyway)
}

# ---------------------------------------------------------------------------
# Disease→phenotype relation fixture (reference input
# disease_phenotype_rels.tsv, consumed at kg/build.py:216-228):
# lowercase 'mesh:' curies kept and upper-cased; others dropped.
# ---------------------------------------------------------------------------

DISEASE_PHENOTYPE_RELS = [
    ("mesh:d002771", "mesh:d003967"),   # cholera → diarrhea
    ("mesh:d003715", "mesh:d005334"),   # dengue → fever
    ("mesh:d008288", "mesh:d005334"),   # malaria → fever
    ("mesh:d007251", "mesh:d003371"),   # influenza → cough
    ("mesh:d008457", "mesh:d005076"),   # measles → exanthema
    ("hp:0001945", "mesh:d005334"),     # dropped: non-mesh start
    ("mesh:d014376", "hp:0002099"),     # dropped: non-mesh end
    ("mesh:d019142", "mesh:d006470"),   # ebola → hemorrhage
    ("mesh:d010930", "mesh:d008199"),   # plague → lymphadenitis
]

# ---------------------------------------------------------------------------
# Geonames fixture (replaces mira get_geonames_terms(),
# kg/build.py:351-381): (curie, name, parent_curie). A term groundable
# to a MeSH geoloc name is suppressed as a node; parents groundable to
# MeSH are remapped to the MeSH curie.
# ---------------------------------------------------------------------------

GEONAME_TERMS = [
    # (curie, name, parent_curie, parent_name)
    ("geonames:5128581", "New York City", "geonames:6252001", "United States"),
    ("geonames:2988507", "Paris", "geonames:3017382", "France"),
    ("geonames:1850147", "Tokyo", "geonames:1861060", "Japan"),
    ("geonames:184745", "Nairobi", "geonames:192950", "Kenya"),
    ("geonames:2220957", "Douala", "geonames:2233387", "Cameroon"),
    ("geonames:6252001", "United States", None, None),    # suppressed (MeSH-groundable)
    ("geonames:3017382", "France", None, None),           # suppressed
    ("geonames:1861060", "Japan", None, None),            # suppressed
    ("geonames:192950", "Kenya", None, None),             # suppressed
    ("geonames:2233387", "Cameroon", None, None),         # kept (not in MeSH fixture)
    ("geonames:1566083", "Ho Chi Minh City", "geonames:1562822", "Viet Nam"),
    ("geonames:1562822", "Viet Nam", None, None),         # suppressed via LOCATION_MESH_MAPPING
]

# ---------------------------------------------------------------------------
# World-Bank-style indicator fixture (reference inputs
# world_{dev,health}_indicator_data.tsv, consumed at kg/build.py:231-348).
# Wide layout: Country Name, Series Code, Series Name, then one column
# per year. Values are deterministic; some cells are '..' (WB's NA).
# ---------------------------------------------------------------------------

INDICATOR_YEARS = ["2018", "2019", "2020", "2021", "2022"]
# column names in WB style, e.g. "2018 [YR2018]" — builder takes col[:4]
INDICATOR_YEAR_COLS = [f"{y} [YR{y}]" for y in INDICATOR_YEARS]

HEALTH_SERIES = [
    ("SH.XPD.CHEX.GD.ZS", "Current health expenditure (% of GDP)"),
    ("SH.MED.BEDS.ZS", "Hospital beds (per 1,000 people)"),
    ("SH.IMM.MEAS", "Immunization, measles (% of children)"),
    ("SP.DYN.LE00.IN", "Life expectancy at birth, total (years)"),
    ("SH.STA.MMRT", "Maternal mortality ratio"),
    ("NY.GDP.PCAP.CD", "GDP per capita (current US$)"),  # shared with dev → dropped from health
]
DEV_SERIES = [
    ("NY.GDP.PCAP.CD", "GDP per capita (current US$)"),
    ("SP.POP.TOTL", "Population, total"),
    ("SE.ADT.LITR.ZS", "Literacy rate, adult total"),
    ("EN.ATM.CO2E.PC", "CO2 emissions (metric tons per capita)"),
]

# Country names in WB spelling; some need LOCATION_MESH_MAPPING, some
# are not MeSH-groundable at all (inner join drops them).
INDICATOR_COUNTRIES = [
    "United States", "Brazil", "Viet Nam", "India", "China",
    "Nigeria", "Kenya", "Egypt, Arab Rep.", "France", "Germany",
    "Spain", "Bulgaria", "Congo, Rep.", "Atlantis",  # Atlantis: ungroundable
]


# Materialized at module end — GEONAME_TERMS is defined above by now.
GROUND_QUERY_POOL: list[str] = []


def indicator_value(country_idx: int, series_idx: int, year: int) -> str:
    """Deterministic WB-style cell: '..' for some cells, else a number
    with ≤3 decimals (so ``round(x, 3)`` is exact)."""
    if (country_idx + series_idx + year) % 5 == 0:
        return ".."
    v = ((country_idx * 37 + series_idx * 11 + year) % 1000) + (year % 7) / 8.0
    return str(round(v, 3))


GROUND_QUERY_POOL.extend(_ground_query_pool())
GROUND_POOL_N = len(GROUND_QUERY_POOL)
