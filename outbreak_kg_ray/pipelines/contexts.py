"""Per-alert context extraction: time expressions + geolocations —
the engine's replacement for the reference's Eidos context pass
(process_eidos.py).

Reference semantics:
- per alert, sentence-level ``timexes`` [{'text', 'intervals'}] and
  ``geolocs`` [{'text', 'geoID'}] concatenated across sentences
  (process_eidos.py:33-45, M5-M7 projections);
- global frequency stats sorted by count desc (process_eidos.py:60-90,
  A6).

The Eidos JVM extractor (promed_ner.py:13,53-54 / ST3) is replaced by
deterministic taggers, as SURVEY.md §7 prescribes:
- timex: an ISO-datetime regex over the page flat text (each match is
  its own interval; the reference's interval list is JSON-stringified
  the same way its year maps are, kg/build.py:297);
- geoloc: the lexical grounder's geoloc-typed matches (same mention
  scope as NER — section titles + contents), with the MeSH id as the
  ``geo_id`` (documented deviation: the reference emits geonames ids
  resolved by Eidos; this engine's grounding authority is the MeSH
  lexicon).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..fixtures.lexicon import MESH_TYPES
from ..sources.pages import pages_dataset
from ..stages.extract import extract_docs, html_to_text, parse_header
from ..stages.ner import mentions_dataset

TIMEX_RE = re.compile(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}")

_TIMEX_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("text", pa.string()),
        ("interval_start", pa.string()),
        ("interval_end", pa.string()),
    ]
)


def timex_pages_batch(batch: pa.Table) -> pa.Table:
    """pages(url, html) batch → per-occurrence timex rows (stateless
    task stage; the regex is module-compiled once per process)."""
    cols: dict[str, list] = {name: [] for name in _TIMEX_SCHEMA.names}
    for hb in batch.column("html").to_pylist():
        text = html_to_text(hb)
        header = parse_header(text)
        if header is None or header["archive_number"] is None:
            continue
        for m in TIMEX_RE.finditer(text):
            cols["doc_id"].append(header["archive_number"])
            cols["text"].append(m.group(0))
            cols["interval_start"].append(m.group(0))
            cols["interval_end"].append(m.group(0))
    return pa.table(cols, schema=_TIMEX_SCHEMA)


def timex_contexts(sf_dir: str):
    """→ (doc_id, text, interval_start, interval_end) rows."""
    return pages_dataset(sf_dir).map_batches(
        timex_pages_batch, batch_format="pyarrow", batch_size=1024
    )


def geoloc_contexts(sf_dir: str):
    """→ (doc_id, text, geo_id) per geoloc mention occurrence —
    a typed projection of the NER mentions stream (M6/M7)."""
    geoloc_ids = pa.array(
        sorted(m for m, t in MESH_TYPES.items() if t == "geoloc")
    )
    raw = mentions_dataset(
        extract_docs(pages_dataset(sf_dir)), mode="mentions"
    )

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("id"), value_set=geoloc_ids))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": t.column("text"),
                "geo_id": t.column("id"),
            }
        )

    return raw.map_batches(project, batch_format="pyarrow")


def geoloc_stats(sf_dir: str):
    """A6: Counter((text, geoID)) frequency table
    (process_eidos.py:60-65,76-82)."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset({"text": pa.string(), "geo_id": pa.string(), "count": pa.int64()})
    return _counted(geoloc_contexts(sf_dir), ["text", "geo_id"])


def timex_stats(sf_dir: str):
    """A6: Counter(timex text) frequency table
    (process_eidos.py:83-90)."""
    from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows

    if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
        return empty_dataset({"text": pa.string(), "interval_start": pa.string(), "count": pa.int64()})
    return _counted(
        timex_contexts(sf_dir).select_columns(["text", "interval_start"]),
        ["text", "interval_start"],
    )


def _counted(ds, keys: list[str]):
    """A6 frequency stats via the skew-safe salted count (hub geolocs
    like "United States" ×1,424 are the reference's skew witness)."""
    from ..stages.shuffle import salted_count

    return salted_count(ds.select_columns(keys), keys)
