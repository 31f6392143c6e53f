"""Extraction contract tests: the byte-identical invariant and the
reference parser edge cases (SURVEY.md §5 plan items a/c)."""

import pyarrow.parquet as pq
import pytest

from outbreak_kg_ray.sources import pages as pg
from outbreak_kg_ray.stages import extract as ex
from .oracle import expected_extracted_text


# ---- parse_contents edge cases (reference promed_ner.py:27-46) ----

def test_parse_contents_basic():
    body = "Title A\n---\nline one\n line two \n--\n"
    assert ex.parse_contents(body) == [
        {"title": "Title A", "content": "line one line two"}
    ]


def test_parse_contents_star_marker_and_multi():
    body = "T1\n******\nc1\n--\nT2\n---\nc2\nc3\n--\n"
    assert ex.parse_contents(body) == [
        {"title": "T1", "content": "c1"},
        {"title": "T2", "content": "c2 c3"},
    ]


def test_parse_contents_unterminated_section_dropped():
    # no terminating '--' → section never appended
    body = "T\n---\ncontent\n"
    assert ex.parse_contents(body) == []


def test_parse_contents_marker_first_line_wraps_title():
    # reference uses lines[idx-1]: marker at idx 0 grabs the LAST line
    body = "---\nc\n--\nlast"
    assert ex.parse_contents(body) == [{"title": "last", "content": "c"}]


def test_parse_contents_terminator_requires_exact_dashes():
    # '--' must be the whole stripped line; '-- x' is content
    body = "T\n---\na\n-- x\n--\n"
    assert ex.parse_contents(body) == [{"title": "T", "content": "a -- x"}]


# ---- header parsing (promed_ner.py:57-76) ----

def test_parse_header_fields():
    text = (
        "Published Date: 2016-04-28 16:59:45 EDT\n"
        "Subject: PRO/AH/EDR> Lumpy skin disease - Bulgaria (06)\n"
        "Archive Number: 20160428.4189378\n"
    )
    h = ex.parse_header(text)
    assert h["archive_number"] == "20160428.4189378"
    assert h["subject"] == "PRO/AH/EDR> Lumpy skin disease - Bulgaria (06)"
    assert h["date"].year == 2016 and h["date"].second == 45


def test_parse_header_missing_archive_is_none():
    text = "Published Date: 2016-04-28 16:59:45 EDT\nSubject: x\nArchive Number: \n"
    assert ex.parse_header(text)["archive_number"] is None


def test_parse_header_unparseable_returns_none():
    assert ex.parse_header("no header here\n") is None


# ---- byte-identical extracted_text over real sf0.001 pages ----

@pytest.fixture(scope="module")
def docs_df(sf_dir):
    ds = ex.extract_docs(pg.pages_dataset(sf_dir))
    return ds.to_pandas()


def test_extracted_text_byte_identical(sf_dir, docs_df):
    src = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    expected = {
        pg.archive_number(r["doc_id"]): expected_extracted_text(
            r["doc_id"], r["text"]
        )
        for r in src
    }
    got = dict(zip(docs_df["doc_id"], docs_df["extracted_text"]))
    assert set(got) == set(expected)
    mismatches = [k for k in expected if got[k] != expected[k]]
    assert mismatches == [], f"{len(mismatches)} mismatching docs, e.g. {mismatches[:3]}"


def test_extract_row_count_and_schema(docs_df, sf_dir):
    n_src = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    assert len(docs_df) == n_src
    assert list(docs_df.columns) == [
        "url", "doc_id", "published_ts", "subject", "sections",
        "extracted_text", "lang",
    ]


def test_sections_structure(docs_df):
    row = docs_df.iloc[0]
    titles = [s["title"] for s in row["sections"]]
    assert titles == ["Overview", "Findings"]
