"""Property tests (SURVEY.md §5(d)): extraction byte-contract
round-trips, segmenter edge cases, grounder matching rules."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from outbreak_kg_ray.sources.pages import (
    archive_number,
    page_html,
    raw_alert_text,
    subject_line,
)
from outbreak_kg_ray.stages.extract import (
    html_to_text,
    parse_contents,
    parse_header,
    render_extracted_text,
)
from outbreak_kg_ray.stages.ner import LexicalGrounder

# body lines that do NOT interact with the section state machine:
# no '---'/'******' openers, not the exact '--' closer, no '<' (html),
# no newlines
_safe_line = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"), max_codepoint=0x24F
    ),
    min_size=1,
    max_size=60,
).filter(lambda s: s.strip() not in ("", "--") and not s.startswith(("---", "******")))


@given(doc_id=st.integers(0, 10_000_000), lines=st.lists(_safe_line, min_size=1, max_size=5))
@settings(max_examples=60, deadline=None)
def test_extraction_roundtrip_bytes(doc_id, lines):
    """html → text → header+sections → rendering is byte-exact for
    any safe body: the extracted_text contract holds for arbitrary
    content, not just the fixture corpus."""
    body = "\n".join(lines)
    html = page_html(doc_id, body)
    text = html_to_text(html)
    header = parse_header(text)
    assert header is not None
    assert header["archive_number"] == archive_number(doc_id)
    assert header["subject"] == subject_line(doc_id)
    sections = parse_contents(text)
    assert len(sections) == 2  # Overview + Findings
    assert sections[0]["title"] == "Overview"
    # segmenter strips each line and space-joins
    expected_overview = " ".join(ln.strip() for ln in lines)
    assert sections[0]["content"] == expected_overview
    rendered = render_extracted_text(header["subject"], sections)
    assert rendered.startswith(subject_line(doc_id) + "\n\n")
    assert "Overview\n\n" + expected_overview + "\n\n" in rendered


@given(doc_id=st.integers(0, 10_000_000))
@settings(max_examples=30, deadline=None)
def test_raw_text_and_html_paths_agree(doc_id):
    """Extracting from the html column and from the flat text column
    yields the same sections (the pages table carries both)."""
    body = "some content here"
    raw = raw_alert_text(doc_id, body)
    via_html = parse_contents(html_to_text(page_html(doc_id, body)))
    via_text = parse_contents(raw)
    assert via_html == via_text


def test_segmenter_edge_cases():
    # unterminated section -> swallowed, partial list (promed_ner.py:44)
    assert parse_contents("title\n---\ncontent with no closer") == []
    # zero sections
    assert parse_contents("no markers at all\njust text") == []
    # ****** opener variant + title lookup at idx-1
    out = parse_contents("My Title\n******\nbody line\n--\n")
    assert out == [{"title": "My Title", "content": "body line"}]
    # marker at index 0: lines[-1] is the LAST line (python negative
    # indexing — faithful to the reference's lines[idx-1] behavior)
    out = parse_contents("---\nx\n--\n")
    assert out[0]["title"] == ""  # last line is '' after trailing \n
    # closer without opener is ignored
    assert parse_contents("--\n") == []


def test_grounder_longest_match_and_boundaries():
    g = LexicalGrounder(
        [("MESH", "D1", "ebola"), ("MESH", "D2", "ebola virus")]
    )
    # longest wins at the same position
    anns = g.annotate("an ebola virus outbreak")
    assert [(a[2], a[0]) for a in anns] == [("D2", "ebola virus")]
    # word boundary: no match inside a longer word
    assert g.annotate("the ebolavirus strain") == []
    # case-insensitive, reports matched surface form
    anns = g.annotate("EBOLA cases")
    assert anns[0][0] == "EBOLA" and anns[0][2] == "D1"
    # non-overlapping scan: two separate occurrences both reported
    assert len(g.annotate("ebola then ebola")) == 2


def test_grounder_deterministic_across_instances():
    rows = [("MESH", "D1", "alpha"), ("MESH", "D2", "alpha beta")]
    text = "alpha beta gamma alpha"
    a = LexicalGrounder(rows).annotate(text)
    b = LexicalGrounder(list(reversed(rows))).annotate(text)
    assert a == b
