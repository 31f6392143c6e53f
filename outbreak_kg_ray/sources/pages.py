"""Synthesize the ``pages`` web-page table and read it as a Dataset.

Input-hint schema: ``pages(url:string, warc_ts:timestamp, html:binary,
text:string, lang:string)``. There is no pages table in the driver
testdata, so we derive one *deterministically* from
``documents.parquet`` (doc_id, text, lang): each document becomes one
ProMED-style alert web page (reference alert layout:
promed_ner.py:57-76 header, promed_ner.py:27-46 body sections),
with outbreak-entity mentions injected by a closed-form formula of
``doc_id`` — which is what lets the DuckDB oracle SQL in
``__ray_entry__`` compute the *expected* NER / triple output
analytically while the Ray pipeline does real text matching.

Synthesis formulas (mirrored in oracle SQL — keep in sync):

- ``archive  = printf('%08d.%d', 20200000 + doc_id % 10000, 1000000 + doc_id)``
- ``ts       = 2024-01-01 00:00:00 + doc_id minutes``
- ``n_ment   = 2 + doc_id % 4``
- ``names[k] = MENTION_LEXICON[(doc_id*17 + k*31) % LEX_N].name``  (k < n_ment)
"""

from __future__ import annotations

import datetime
import html as _html

import pyarrow as pa

from ..fixtures.lexicon import LEX_N, MENTION_LEXICON
from outbreak_kg_ray.sources.io import read_parquet_clean

_EPOCH = datetime.datetime(2024, 1, 1, 0, 0, 0)
_LEX_NAMES = [name for _, name, _, _ in MENTION_LEXICON]


def archive_number(doc_id: int) -> str:
    return f"{20200000 + doc_id % 10000:08d}.{1000000 + doc_id}"


def published_ts(doc_id: int) -> datetime.datetime:
    return _EPOCH + datetime.timedelta(minutes=doc_id)


def date_str(doc_id: int) -> str:
    return published_ts(doc_id).strftime("%Y-%m-%d %H:%M:%S")


def subject_line(doc_id: int) -> str:
    return f"PRO/AH/EDR> Outbreak alert {archive_number(doc_id)}"


def mention_names(doc_id: int) -> list[str]:
    n = 2 + doc_id % 4
    return [_LEX_NAMES[(doc_id * 17 + k * 31) % LEX_N] for k in range(n)]


def findings_sentence(doc_id: int) -> str:
    return "Cases involving " + ", ".join(mention_names(doc_id)) + " were reported."


def raw_alert_text(doc_id: int, text: str) -> str:
    """The alert as flat text (what a WARC/WET extraction would yield).

    Layout matches the reference's expected input: a header block
    (promed_ner.py:60-65 regexes) followed by marker-delimited body
    sections (promed_ner.py:27-46 state machine).
    """
    return (
        f"Published Date: {date_str(doc_id)} UTC\n"
        f"Subject: {subject_line(doc_id)}\n"
        f"Archive Number: {archive_number(doc_id)}\n"
        "\n"
        "Overview\n"
        "---\n"
        f"{text}\n"
        "--\n"
        "Findings\n"
        "******\n"
        f"{findings_sentence(doc_id)}\n"
        "--\n"
    )


def page_html(doc_id: int, text: str) -> bytes:
    raw = raw_alert_text(doc_id, text)
    return (
        "<!DOCTYPE html>\n"
        f"<html><head><title>ProMED {archive_number(doc_id)}</title>"
        '<meta charset="utf-8"/></head>\n'
        "<body>\n"
        f"<h1>{_html.escape(subject_line(doc_id))}</h1>\n"
        f"<pre>\n{_html.escape(raw)}</pre>\n"
        "</body></html>\n"
    ).encode("utf-8")


# doc_id offset between deterministic corpus replicas (bench scale-up)
REPEAT_STRIDE = 1_000_000


def synthesize_pages_batch(batch: pa.Table, repeat: int = 1) -> pa.Table:
    """documents(doc_id, text, lang) batch → pages batch. Vectorized
    Arrow in/out; the per-row string assembly is pure Python (string
    templating has no Arrow kernel) but touches each row exactly once.

    ``repeat > 1`` emits that many deterministic corpus replicas with
    doc_id shifted by ``k * REPEAT_STRIDE`` — the seeded scale-up knob
    for throughput/scaling benchmarks (no external data)."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = [t.strip() for t in batch.column("text").to_pylist()]
    langs = batch.column("lang").to_pylist()
    urls, tss, htmls, raws, out_langs = [], [], [], [], []
    for k in range(repeat):
        off = k * REPEAT_STRIDE
        for d0, t, lang in zip(doc_ids, texts, langs):
            d = d0 + off
            urls.append(f"https://promed.example.org/post/{archive_number(d)}")
            tss.append(published_ts(d))
            htmls.append(page_html(d, t))
            raws.append(raw_alert_text(d, t))
            out_langs.append(lang)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(raws, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def pages_dataset(
    sf_dir: str,
    *,
    override_num_blocks: int | None = None,
    doc_lo: int | None = None,
    doc_hi: int | None = None,
    repeat: int = 1,
    split_blocks: int | None = None,
):
    """documents.parquet → pages Dataset (column-pruned read).

    ``doc_lo``/``doc_hi`` apply a ``lo <= doc_id < hi`` Parquet row
    filter (pushed to the read — the checkpoint layer's partition
    unit); ``repeat`` scales the corpus deterministically.

    ``split_blocks``: repartition the (tiny) doc rows into this many
    blocks before synthesis. A range-filtered read of a single
    row-group yields ONE block, and Ray fuses the downstream map chain
    into the read task — one task per partition, serializing the whole
    extract/NER chain. The repartition barrier both splits the work
    and blocks that fusion; it shuffles only the pre-synthesis doc
    rows (at 100 TB the input files provide natural blocks instead).
    """
    import pyarrow.dataset as pads
    import ray.data as rd

    expr = None
    if doc_lo is not None:
        expr = pads.field("doc_id") >= doc_lo
    if doc_hi is not None:
        hi_expr = pads.field("doc_id") < doc_hi
        expr = hi_expr if expr is None else (expr & hi_expr)
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        override_num_blocks=override_num_blocks,
        filter=expr,
    )
    if split_blocks:
        ds = ds.repartition(split_blocks)
    # batch_size=None: one batch per input block. A row-count batch
    # size here makes Ray COALESCE small blocks into ~batch_size-row
    # bundles, collapsing the parallel task fan-out into 1-2 tasks.
    return ds.map_batches(
        synthesize_pages_batch,
        batch_format="pyarrow",
        batch_size=None,
        fn_kwargs={"repeat": repeat},
    )
