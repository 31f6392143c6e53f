"""Parquet read helper.

The driver-synthesized testdata parquet carries a ``pandas`` schema
metadata blob whose presence makes ``pyarrow.Schema`` unhashable,
which trips Ray Data's schema-deduplication fast path on every read
("Failed to hash the schemas (for deduplication): unhashable type:
'dict'"). Passing an explicit metadata-free schema (pruned to the
selected columns) keeps blocks hashable end-to-end and costs one
footer read on the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def read_parquet_clean(path: str, *, columns: list[str] | None = None,
                       **kwargs):
    """ray.data.read_parquet with a metadata-stripped (and
    column-pruned) explicit schema."""
    import ray.data as rd

    full = pq.read_schema(path).remove_metadata()
    if columns is not None:
        schema = pa.schema([full.field(c) for c in columns])
    else:
        schema = full
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)


def parquet_rows(path: str) -> int:
    """Row count from parquet footer metadata — no data read.  Used
    by operators to short-circuit a fully-empty input (Ray Data's
    hash-shuffle join and empty aggregates lose block schemas on
    zero-row inputs; a metadata probe is cheaper than guarding every
    downstream stage)."""
    return pq.read_metadata(path).num_rows


def empty_dataset(schema: "pa.Schema | dict"):
    """A zero-row Dataset with a pinned schema (dict of name→type or
    a pyarrow.Schema) — the short-circuit return value for operators
    fed a fully-empty input."""
    import ray.data as rd

    if isinstance(schema, dict):
        schema = pa.schema(list(schema.items()))
    return rd.from_arrow(schema.empty_table())
