"""Pure-Python oracles reproducing reference semantics for tests.

These deliberately do NOT go through the engine's html parsing: the
expected ``extracted_text`` is rendered straight from the synthesis
inputs using the reference's rendering rule (promed_ner.py:93-100),
so an engine bug anywhere along html → text → header/body parse →
render shows up as a byte diff.
"""

from __future__ import annotations

from outbreak_kg_ray.sources import pages as pg


def expected_extracted_text(doc_id: int, text: str) -> str:
    """Reference rendering: subject + '\\n\\n' then per section
    title + '\\n\\n' + content + '\\n\\n' (promed_ner.py:93-100),
    applied to the known synthesized alert structure."""
    subject = pg.subject_line(doc_id)
    sections = [
        ("Overview", text.strip()),
        ("Findings", pg.findings_sentence(doc_id)),
    ]
    out = subject + "\n\n"
    for title, content in sections:
        out += title + "\n\n" + content + "\n\n"
    return out


def expected_terms(doc_id: int) -> list[tuple[str, str, str]]:
    """Per-alert distinct sorted (db, id, entry_name)
    (promed_ner.py:156-177), computed analytically from the mention
    injection formula — not by scanning text."""
    from outbreak_kg_ray.fixtures.lexicon import LEX_N, MENTION_LEXICON

    n = 2 + doc_id % 4
    terms = set()
    for k in range(n):
        mid, name, _t, _p = MENTION_LEXICON[(doc_id * 17 + k * 31) % LEX_N]
        terms.add(("MESH", mid, name))
    return sorted(terms)
