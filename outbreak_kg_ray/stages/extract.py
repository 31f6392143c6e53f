"""Deterministic text extraction: html → header + body sections +
``extracted_text``.

This stage is the engine's *contract*: ``extracted_text`` must be
byte-identical, per url, to what the reference produces for the same
alert content (input_hint invariant). The parsing semantics are a
from-scratch reimplementation of:

- body section state machine  — reference promed_ner.py:27-46
- header field regexes/date   — reference promed_ner.py:57-76
- subject normalization       — reference promed_ner.py:79-90
- flat-text rendering         — reference promed_ner.py:93-100

Stateless ``map_batches`` stage, Arrow in / Arrow out. Rows whose
header cannot be parsed or that lack an archive number are dropped
(reference promed_ner.py:124-129).
"""

from __future__ import annotations

import datetime
import html as _htmllib
import re

import pyarrow as pa

_TAG_RE = re.compile(r"<[^>]*>")
_DATE_RE = re.compile(r"Published Date: (.+)\n")
_SUBJECT_RE = re.compile(r"Subject:(.+?)\n")
_ARCHIVE_RE = re.compile(r"Archive Number: (\d{8}\.\d+)?")

SECTION_TYPE = pa.list_(
    pa.struct([("title", pa.string()), ("content", pa.string())])
)


def html_to_text(html_bytes: bytes) -> str:
    """Deterministic HTML → flat text: drop tags, unescape entities.

    Line structure inside <pre>/text nodes is preserved, which is all
    the downstream line-oriented parser depends on.
    """
    return _htmllib.unescape(_TAG_RE.sub("", html_bytes.decode("utf-8", "replace")))


def parse_contents(body: str) -> list[dict]:
    """Marker-delimited section segmentation; exact reference
    semantics (promed_ner.py:27-46) including the swallowed-exception
    partial return and the ``lines[idx-1]`` title lookup."""
    lines = body.split("\n")
    start_alert = False
    contents: list[dict] = []
    try:
        for idx, line in enumerate(lines):
            if line.strip().startswith("---") or line.strip().startswith("******"):
                start_alert = True
                title = lines[idx - 1]
                content: list[str] = []
            elif line.strip() == "--":
                start_alert = False
                contents.append({"title": title, "content": " ".join(content)})
            elif start_alert:
                content.append(line.strip())
    except Exception:
        return contents
    return contents


def parse_header(text: str) -> dict | None:
    """Header field extraction (promed_ner.py:57-76): returns
    ``{date, subject, archive_number}`` or None when unparseable."""
    date_m = _DATE_RE.search(text)
    if date_m is None:
        return None
    subject_m = _SUBJECT_RE.search(text)
    archive_m = _ARCHIVE_RE.search(text)
    subject = subject_m.group(1).strip() if subject_m else None
    archive_number = archive_m.group(1) if archive_m else None
    try:
        # reference drops a 4-char TZ suffix: '2016-04-28 16:59:45 EDT'
        dt = datetime.datetime.strptime(
            date_m.group(1)[:-4], "%Y-%m-%d %H:%M:%S"
        )
    except ValueError:
        return None
    return {"date": dt, "subject": subject, "archive_number": archive_number}


def render_extracted_text(subject: str | None, sections: list[dict]) -> str:
    """Flat rendering (promed_ner.py:93-100) — THE byte-identical
    invariant: subject + blank line, then title/content blocks."""
    out = (subject or "") + "\n\n"
    for sec in sections:
        out += sec["title"] + "\n\n" + sec["content"] + "\n\n"
    return out


def extract_pages_batch(batch: pa.Table) -> pa.Table:
    """pages(url, warc_ts, html, lang) batch → docs batch with
    doc_id, published_ts, subject, sections, extracted_text."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    langs = (
        batch.column("lang").to_pylist()
        if "lang" in batch.column_names
        else [None] * len(urls)
    )
    out = {
        "url": [], "doc_id": [], "published_ts": [], "subject": [],
        "sections": [], "extracted_text": [], "lang": [],
    }
    for url, hb, lang in zip(urls, htmls, langs):
        text = html_to_text(hb)
        header = parse_header(text)
        if header is None or header["archive_number"] is None:
            continue  # promed_ner.py:124-129 row filters
        sections = parse_contents(text)
        out["url"].append(url)
        out["doc_id"].append(header["archive_number"])
        out["published_ts"].append(header["date"])
        out["subject"].append(header["subject"])
        out["sections"].append(sections)
        out["extracted_text"].append(
            render_extracted_text(header["subject"], sections)
        )
        out["lang"].append(lang)
    return pa.table(
        {
            "url": pa.array(out["url"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "published_ts": pa.array(out["published_ts"], pa.timestamp("us")),
            "subject": pa.array(out["subject"], pa.string()),
            "sections": pa.array(out["sections"], SECTION_TYPE),
            "extracted_text": pa.array(out["extracted_text"], pa.large_string()),
            "lang": pa.array(out["lang"], pa.string()),
        }
    )


def extract_docs(pages_ds, *, batch_size: int | None = None):
    """pages Dataset → docs Dataset (stateless task stage).

    batch_size=None processes each block as one batch — a row-count
    batch size would coalesce blocks and shrink task parallelism."""
    return pages_ds.map_batches(
        extract_pages_batch, batch_format="pyarrow", batch_size=batch_size
    )


def dedup_pages(pages_ds):
    """First-crawl winner per url (reference duplicate-alert
    tolerance, promed_ner.py:113-140 / D5): deterministic min-warc_ts
    win, as a vectorized hash aggregate — the winner KEY set
    (url, warc_ts). At scale the full winning rows come from a second
    pass filtering on these keys (broadcast or semi-join), keeping the
    shuffle payload to two columns instead of whole pages."""
    from ray.data.aggregate import Min

    keys = pages_ds.select_columns(["url", "warc_ts"])
    return keys.groupby("url").aggregate(Min("warc_ts", alias_name="warc_ts"))
