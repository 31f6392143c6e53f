"""Ray-Data-native outbreak knowledge-graph construction engine.

A from-scratch streaming engine with the query / data-processing
capabilities of the reference (gyorilab/outbreak_kg): deterministic
text extraction from web pages, lexical NER + grounding, triple
extraction, entity canonicalization and graph materialization —
expressed as ``ray.data.Dataset`` pipelines of ``map_batches`` stages
over zero-copy Arrow batches, with actor pools for stateful stages.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()``;
sessions are owned by the caller (tests, bench.py, the driver).
"""

__version__ = "0.1.0"
