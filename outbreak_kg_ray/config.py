"""Engine configuration: namespace priorities, stoplists, name mappings.

These mirror the reference's *semantic* configuration (reference file
and line cites in comments) so emitted triples match; they are plain
data, shipped to workers by closure capture / ``ray.put`` — never
re-read per batch.
"""

# Grounding namespace priority order (reference promed_ner.py:18).
GROUND_NS = ["MESH"]

# NER-level generic-term stoplist (reference promed_ner.py:19).
NER_EXCLUDE = {"J", "one", "news", "large", "go", "cut", "white", "Kelly"}

# KG-assembly generic-name stoplist (reference kg/build.py:39-43).
KG_EXCLUDE_NAMES = {
    "Disease", "Health", "Affected", "control", "Animals",
    "infection", "Viruses", "vaccination", "Vaccines",
    "Therapeutics", "Nature", "event", "Population",
    "Epidemiology", "Names", "submitted", "Laboratories",
    "Disease Outbreaks", "Central", "strain",
}

# MeSH-ID stoplist used by the literature / realism scorers
# (reference kg/mesh_csr.py:27-48 and kg/realism_score.py:14-35).
# NOTE: the reference list has a missing comma between 'D005190' and
# 'D012306', so Python concatenates them into the single string
# 'D005190D012306' — meaning neither ID is actually excluded. We
# replicate the *effective* set faithfully.
MESH_ID_EXCLUDE = {
    "D003142", "D004194", "D004196", "D005190D012306", "D011634",
    "D012816", "D042241", "D003141", "D003643", "D007239", "D004630",
    "D002947", "D012008", "D020478", "D006262", "D011153", "D019090",
    "D009272", "D003933",
}

# World-Bank country/region name → MeSH geographic-name normalization
# (reference kg/constants.py:3-44; public World Bank ↔ MeSH name data).
LOCATION_MESH_MAPPING = {
    "Czechia": "Czech Republic",
    "St. Lucia": "Saint Lucia",
    "Macao SAR, China": "Macau",
    "Macao": "Macau",
    "North Macedonia": "Republic of North Macedonia",
    "Venezuela, RB": "Venezuela",
    "Iran, Islamic Rep.": "Iran",
    "Congo, Rep.": "Congo",
    "Republic of the Congo": "Congo",
    "Korea, Rep.": "Republic of Korea",
    "South Korea": "Republic of Korea",
    "South Asia": "Asia, Southern",
    "Hong Kong SAR, China": "Hong Kong",
    "Gambia, The": "Gambia",
    "Sub-Saharan Africa": "Africa South of the Sahara",
    "Syrian Arab Republic": "Syria",
    "Slovak Republic": "Slovakia",
    "Viet Nam": "Vietnam",
    "Brunei Darussalam": "Brunei",
    "Yemen, Rep.": "Yemen",
    "St. Vincent and the Grenadines": "Saint Vincent and the Grenadines",
    "Virgin Islands (U.S.)": "United States Virgin Islands",
    "U.S. Virgin Islands": "United States Virgin Islands",
    "Congo, Dem. Rep.": "Democratic Republic of the Congo",
    "St. Kitts and Nevis": "Saint Kitts and Nevis",
    "Turkiye": "Turkey",
    "Belarus": "Republic of Belarus",
    "Egypt, Arab Rep.": "Egypt",
    "Micronesia, Fed. Sts.": "Micronesia",
    "Lao PDR": "Laos",
    "Kyrgyz Republic": "Kyrgyzstan",
    "Korea, Dem. People's Rep.": "Democratic People's Republic of Korea",
    "North Korea": "Democratic People's Republic of Korea",
    "Pacific island small states": "Pacific Islands",
    "Bahamas, The": "Bahamas",
    "The Netherlands": "Netherlands",
    "Vatican": "Vatican City",
    "Pitcairn": "Pitcairn Island",
    "Svalbard and Jan Mayen": "Svalbard",
    "Timor Leste": "Timor-Leste",
}

# Stage tuning lives with the stages: expansion/task stages use
# per-block batches (batch_size=None — see stages/fused.py for why a
# row-count batch size collapses task fan-out), and actor pools size
# to the cluster via stages.ner.default_concurrency().
