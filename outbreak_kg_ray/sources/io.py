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


def pinned_schema(ds, schema: "pa.Schema | dict"):
    """Normalize every block of ``ds`` to exactly ``schema`` — THE
    guard for the one-sided-empty join trap (round-3 VERDICT next #5).

    Ray's aggregate/shuffle operators emit zero-row blocks that have
    LOST their schema (zero-column Arrow tables); when such a block
    reaches a hash join partition, Acero rejects it ("No match for
    key field ...").  The trap only bites when exactly one side of a
    join is empty (an all-empty input short-circuits earlier via
    ``parquet_rows``), which is why it recurred in ad-hoc per-site
    pins — this helper is the single shared fix: schema-less or
    zero-row blocks become ``schema.empty_table()``, every other
    block is cast column-by-column so both join sides present one
    stable schema regardless of partition emptiness.

    Use on any aggregate/join OUTPUT that feeds another join, sort,
    or schema-sensitive map."""
    if isinstance(schema, dict):
        schema = pa.schema(list(schema.items()))

    def pin(t: pa.Table) -> pa.Table:
        if len(t) == 0 or any(
            f.name not in t.column_names for f in schema
        ):
            return schema.empty_table()
        return pa.Table.from_arrays(
            [t.column(f.name).cast(f.type).combine_chunks()
             for f in schema],
            schema=schema,
        )

    return ds.map_batches(pin, batch_format="pyarrow")
