"""Grounder determinism + per-alert term-set tests (ST1/M15/A1)."""

import pyarrow.parquet as pq
import pytest

from outbreak_kg_ray.sources import pages as pg
from outbreak_kg_ray.stages import extract as ex
from outbreak_kg_ray.stages.ner import LexicalGrounder, NerStage, mentions_dataset
from .oracle import expected_terms


def test_longest_match_wins():
    g = LexicalGrounder()
    anns = g.annotate("Avian Influenza spreading; Influenza season.")
    names = [a[3] for a in anns]
    assert names == ["Avian Influenza", "Influenza"]


def test_case_insensitive_and_boundaries():
    g = LexicalGrounder()
    assert [a[3] for a in g.annotate("reports of CHOLERA cases")] == ["Cholera"]
    # no match inside a longer word
    assert g.annotate("decholeraization") == []


def test_overlapping_lexicon_names_non_overlapping_matches():
    g = LexicalGrounder()
    anns = g.annotate("Dengue Virus isolated from Dengue patients")
    assert [a[3] for a in anns] == ["Dengue Virus", "Dengue"]
    # spans must not overlap
    spans = [(a[4], a[5]) for a in anns]
    assert spans[0][1] <= spans[1][0]


def test_duplicate_lexicon_name_rejected():
    with pytest.raises(ValueError):
        LexicalGrounder([("MESH", "D1", "X"), ("MESH", "D2", "x")])


def test_terms_match_injection_formula(sf_dir):
    docs = ex.extract_docs(pg.pages_dataset(sf_dir))
    terms_ds = mentions_dataset(docs, mode="terms", concurrency=2)
    df = terms_ds.to_pandas()
    got = {}
    for r in df.itertuples():
        got.setdefault(r.doc_id, []).append((r.db, r.id, r.entry_name))
    src = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).to_pylist()
    for row in src:
        d = row["doc_id"]
        exp = expected_terms(d)
        assert sorted(got[pg.archive_number(d)]) == exp, f"doc {d}"


def test_ner_stage_mentions_mode_spans():
    stage = NerStage(mode="mentions")
    import pyarrow as pa

    batch = pa.table(
        {
            "doc_id": ["x"],
            "sections": [
                [{"title": "Cholera update", "content": "Cases in Kenya and Brazil."}]
            ],
        }
    )
    out = stage(batch).to_pylist()
    assert [(m["field"], m["entry_name"]) for m in out] == [
        ("title", "Cholera"),
        ("content", "Kenya"),
        ("content", "Brazil"),
    ]
    m = out[1]
    assert m["text"] == "Kenya" and m["start"] == 9 and m["end"] == 14


def test_normalization_chain_rules():
    """Each M12 rule in isolation (kg/client.py:345-350 chain)."""
    from outbreak_kg_ray.functions import normalize as nz

    assert nz.replace_dashes("a–b‑c-d") == "a b c d"
    assert nz.replace_greek_uni("α-synuclein") == "alpha-synuclein"
    assert nz.replace_greek_latin("Influenza Alpha Virus") == "Influenza a Virus"
    assert nz.replace_greek_latin("alphabet soup") == "alphabet soup"  # \b guard
    assert nz.replace_roman_arabic("Type II Fever") == "Type 2 Fever"
    assert nz.replace_roman_arabic("X marks") == "X marks"  # leading token kept
    assert nz.normalize("  A   B\tC ") == "a b c"
    # full chain
    assert nz.norm_key("Influenza‑Α  Virus") == "influenza a virus"


def test_ground_name_normalized_variants():
    from outbreak_kg_ray.stages.ner import LexicalGrounder

    g = LexicalGrounder()
    want = ("MESH", "D009980", "Influenza A Virus")
    assert g.ground_name("influenza a virus") == want
    assert g.ground_name("Influenza‐A Virus") == want       # unicode dash
    assert g.ground_name("Influenza Α Virus") == want       # greek unicode
    assert g.ground_name("Influenza Alpha Virus") == want        # spelled out
    assert g.ground_name("no such entity") is None
    # roman<->arabic needs a numbered name: custom lexicon row
    g2 = LexicalGrounder([("MESH", "D999999", "Type 2 Fever")])
    assert g2.ground_name("Type II Fever") == ("MESH", "D999999", "Type 2 Fever")


def test_resolve_curie_grounds_names_and_geonames():
    from outbreak_kg_ray.pipelines import serving as sv

    assert sv.resolve_curie("MESH:D007251") == "MESH:D007251"  # passthrough
    assert sv.resolve_curie("Influenza") == "MESH:D007251"
    assert sv.resolve_curie("influenza") == "MESH:D007251"
    assert sv.resolve_curie("Not A Place") is None
    # a geonames-only fixture name resolves to its geonames curie
    from outbreak_kg_ray.fixtures.lexicon import GEONAME_TERMS, NAME_TO_ID

    geo_only = next(
        (c, n) for c, n, _pc, _pn in GEONAME_TERMS if n not in NAME_TO_ID
    )
    assert sv.resolve_curie(geo_only[1]) == geo_only[0]


def test_ner_exclude_stoplist_is_a_noop_on_the_lexicon():
    """Pin the documented deviation (stages/ner.py:annotate): the
    engine APPLIES the NER_EXCLUDE stoplist case-insensitively while
    the reference only defines it (promed_ner.py:19). That deviation
    stays a semantic no-op exactly as long as no lexicon surface name
    is stoplisted — assert the intersection is empty so lexicon
    growth cannot silently change NER output."""
    from outbreak_kg_ray.config import NER_EXCLUDE
    from outbreak_kg_ray.fixtures.lexicon import MENTION_LEXICON

    lex_names = {row[1].lower() for row in MENTION_LEXICON}
    stoplisted = lex_names & {x.lower() for x in NER_EXCLUDE}
    assert stoplisted == set(), (
        f"NER_EXCLUDE now intersects the lexicon {stoplisted!r}: the "
        "engine-applied stoplist is no longer a no-op vs the reference"
    )


def _random_texts(names, rng, n_texts=60):
    noise = ["the", "of", "in", "zzz", "Qx9", "foo-bar", "a,b", "(x)",
             "cholera-like", "influenzas", "1918", "..."]
    texts = []
    for _ in range(n_texts):
        parts = []
        for _ in range(rng.randrange(0, 30)):
            if rng.random() < 0.45:
                nm = rng.choice(names)
                # random casing exercises the case-insensitive path
                nm = "".join(
                    c.upper() if rng.random() < 0.5 else c.lower()
                    for c in nm
                )
                parts.append(nm)
            else:
                parts.append(rng.choice(noise))
        sep = rng.choice([" ", " ", ", ", "; ", " - ", ". "])
        texts.append(sep.join(parts))
    return texts


def test_token_scan_equals_regex_reference():
    # The token-indexed scanner must reproduce the legacy alternation
    # semantics exactly (longest-match, non-overlap, boundaries, case).
    import random

    g = LexicalGrounder()
    assert g._token_scan_ok
    names = [name for _, _, name in
             __import__("outbreak_kg_ray.stages.ner",
                        fromlist=["DEFAULT_LEXICON"]).DEFAULT_LEXICON]
    rng = random.Random(42)
    for text in _random_texts(names, rng):
        assert g.annotate(text) == g._annotate_regex(text), text


def test_token_scan_equivalence_on_10x_lexicon():
    # 10x synthetic lexicon (the reference's lexicon is 31k surfaces,
    # SURVEY §6): the scan must stay exact as the lexicon grows.
    import random

    base = [(db, i, n) for db, i, n in
            __import__("outbreak_kg_ray.stages.ner",
                       fromlist=["DEFAULT_LEXICON"]).DEFAULT_LEXICON]
    syn = [("MESH", f"DX{k:04d}", f"synthitis {k:04d}") for k in range(500)]
    syn += [("MESH", f"DY{k:03d}", f"viropath-{k:03d} fever") for k in range(70)]
    g = LexicalGrounder(base + syn)
    assert g._token_scan_ok
    names = [n for _, _, n in base + syn]
    rng = random.Random(7)
    for text in _random_texts(names, rng, n_texts=40):
        assert g.annotate(text) == g._annotate_regex(text), text


def test_non_word_edge_name_falls_back_to_regex():
    g = LexicalGrounder([("MESH", "D1", "Cholera"), ("MESH", "D2", "+strand")])
    assert not g._token_scan_ok
    anns = g.annotate("a +strand virus with Cholera signs")
    assert [a[3] for a in anns] == ["+strand", "Cholera"]


def test_doc_terms_joined_scan_equals_per_field_scan():
    """The single-pass \\n-joined doc_terms fast path must produce the
    same term set as per-field annotation on every fixture doc
    (including multi-token names at field boundaries)."""
    import pyarrow.parquet as pq

    from outbreak_kg_ray.sources.pages import synthesize_pages_batch
    from outbreak_kg_ray.stages.extract import extract_pages_batch
    from outbreak_kg_ray.stages.ner import LexicalGrounder, doc_terms

    g = LexicalGrounder()
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    docs = extract_pages_batch(synthesize_pages_batch(t, repeat=1))
    checked = 0
    for sections in docs.column("sections").to_pylist():
        slow = set()
        for sec in sections or []:
            for field in ("title", "content"):
                for _t, db, id_, name, _s, _e in g.annotate(sec[field]):
                    slow.add((db, id_, name))
        assert doc_terms(g, sections) == sorted(slow)
        checked += 1
    assert checked == 500

    # adversarial boundary: title ends with the first token of a
    # multi-token name whose second token starts the content
    multi = [n for _, n, _, _ in __import__(
        "outbreak_kg_ray.fixtures.lexicon", fromlist=["MENTION_LEXICON"]
    ).MENTION_LEXICON if " " in n]
    assert multi, "fixture lexicon has multi-token names"
    w1, w2 = multi[0].split(" ", 1)
    secs = [{"title": f"alpha {w1}", "content": f"{w2} beta"}]
    slow = set()
    for field in ("title", "content"):
        for _t, db, id_, name, _s, _e in g.annotate(secs[0][field]):
            slow.add((db, id_, name))
    assert doc_terms(g, secs) == sorted(slow)
