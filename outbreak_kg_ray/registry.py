"""User-extension surface (SURVEY.md §2.10).

The reference's extension convention is "append a new
``assemble_*()`` call to the ``__main__`` list" (kg/build.py:409-416).
The engine equivalent promised by the survey is a declared
TableBuilder registry: ``name → (builder: sf_dir → Dataset,
column order, kind)``. ``build_tables`` drives any subset of
registered builders to a sink (partitioned Parquet for scale, the
reference's sorted golden TSV for byte parity), so adding a product
table to a deployment is one ``register_builder`` call — no engine
edits, exactly like appending an ``assemble_*`` in the reference.

Builders receive ``sf_dir`` and return a ``ray.data.Dataset`` (or a
small pandas/Arrow table for vocabulary-bounded outputs).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


@dataclass(frozen=True)
class TableBuilder:
    name: str
    fn: Callable[[str], Any]
    columns: tuple[str, ...] | None  # None → emit the builder's schema order
    kind: str  # "nodes" | "edges" | "table"


_REGISTRY: dict[str, TableBuilder] = {}


def register_builder(
    name: str,
    fn: Callable[[str], Any],
    *,
    columns: list[str] | None = None,
    kind: str = "table",
    replace: bool = False,
) -> TableBuilder:
    """Register a product-table builder. ``replace=False`` raises on
    duplicate names so two extensions cannot silently shadow each
    other (the reference's append-a-function convention has the same
    property: a redefined assemble_* is a merge conflict)."""
    if not replace and name in _REGISTRY:
        raise ValueError(f"builder {name!r} already registered")
    if kind not in ("nodes", "edges", "table"):
        raise ValueError(f"unknown builder kind {kind!r}")
    b = TableBuilder(
        name, fn, tuple(columns) if columns else None, kind
    )
    _REGISTRY[name] = b
    return b


def unregister_builder(name: str) -> None:
    _REGISTRY.pop(name, None)


def builders() -> dict[str, TableBuilder]:
    """Snapshot of the registry (defaults + user registrations)."""
    _ensure_defaults()
    return dict(_REGISTRY)


def build_tables(
    sf_dir: str,
    out_dir: str,
    *,
    names: list[str] | None = None,
    fmt: str = "parquet",
    resume: bool = True,
) -> dict[str, dict]:
    """Run registered builders and write each to ``out_dir/<name>``.

    ``fmt="parquet"`` streams through the partitioned Parquet sink
    (never materializes on the driver); ``fmt="tsv"`` uses the
    reference-parity sorted golden TSV (small, final tables only).
    Returns ``{name: {"rows": n, "path": p, "skipped": bool}}``.

    Resumability: each completed table gets a ``<name>.done.json``
    marker (rows + input fingerprint); a re-run of a killed export
    with ``resume=True`` skips tables whose marker matches the
    current inputs — the per-table analog of the KG pipeline's
    per-partition checkpoint (state/checkpoint.py)."""
    import json
    import os

    from .sources import writers
    from .state.checkpoint import file_fingerprint

    _ensure_defaults()
    chosen = names if names is not None else sorted(_REGISTRY)
    fps = ":".join(
        file_fingerprint(os.path.join(sf_dir, f))
        for f in sorted(os.listdir(sf_dir))
        if f.endswith(".parquet")
    ) if os.path.isdir(sf_dir) else sf_dir
    results: dict[str, dict] = {}
    os.makedirs(out_dir, exist_ok=True)
    for name in chosen:
        b = _REGISTRY[name]
        marker = os.path.join(out_dir, f"{name}.done.json")
        if resume and os.path.exists(marker):
            with open(marker) as fh:
                meta = json.load(fh)
            if meta.get("fingerprint") == fps and meta.get("fmt") == fmt:
                results[name] = {
                    "rows": meta["rows"], "path": meta["path"],
                    "skipped": True,
                }
                continue
        ds = b.fn(sf_dir)
        if fmt == "parquet":
            path = os.path.join(out_dir, name)
            # a killed run leaves partial part files with no marker;
            # clear them or the re-run would APPEND duplicate rows
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            writers.write_table_parquet(ds, path)
            import pyarrow.dataset as pads

            rows = pads.dataset(path).count_rows()
        elif fmt == "tsv":
            cols = list(b.columns) if b.columns else _schema_names(ds)
            path = os.path.join(out_dir, f"{name}.tsv")
            if os.path.exists(path):
                os.remove(path)
            rows = writers.write_sorted_tsv(ds, path, cols)
        else:
            raise ValueError(f"unknown fmt {fmt!r}")
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"rows": rows, "path": path, "fingerprint": fps,
                 "fmt": fmt}, fh,
            )
        os.replace(tmp, marker)  # atomic: marker exists ⇒ table complete
        results[name] = {"rows": rows, "path": path, "skipped": False}
    return results


def _schema_names(ds) -> list[str]:
    """Column order for Dataset (schema() is a method), pyarrow Table
    (schema is a property) or pandas DataFrame builders."""
    schema = getattr(ds, "schema", None)
    if callable(schema):
        return list(schema().names)
    if schema is not None and hasattr(schema, "names"):
        return list(schema.names)
    return list(ds.columns)


_DEFAULTS_LOADED = False


def _ensure_defaults() -> None:
    """Register the engine's stock product tables (the reference's
    assemble_* list, kg/build.py:409-416) on first use — lazy so
    importing the registry stays cheap and Ray-free."""
    global _DEFAULTS_LOADED
    if _DEFAULTS_LOADED:
        return
    _DEFAULTS_LOADED = True

    from .pipelines import kg

    stock: list[tuple[str, Callable[[str], Any], str]] = [
        ("alert_nodes", kg.alert_nodes, "nodes"),
        ("alert_mention_edges", kg.alert_mention_edges, "edges"),
        ("outbreak_nodes", kg.outbreak_nodes, "nodes"),
        ("alert_outbreak_edges", kg.alert_outbreak_edges, "edges"),
        ("cooccurrence_nodes", kg.cooccurrence_nodes, "nodes"),
        ("cooccurrence_edges", kg.cooccurrence_edges, "edges"),
        ("mesh_hierarchy_nodes", lambda sf: kg.mesh_hierarchy_nodes(), "nodes"),
        ("mesh_hierarchy_edges", lambda sf: kg.mesh_hierarchy_edges(), "edges"),
        ("pathogen_disease_edges", lambda sf: kg.pathogen_disease_edges(), "edges"),
        ("disease_phenotype_edges", lambda sf: kg.disease_phenotype_edges(), "edges"),
        ("geoname_nodes", lambda sf: kg.geoname_nodes(), "nodes"),
        ("geoname_edges", lambda sf: kg.geoname_edges(), "edges"),
        ("indicator_nodes_health", lambda sf: kg.indicator_nodes("health"), "nodes"),
        ("indicator_edges_health", lambda sf: kg.indicator_edges("health"), "edges"),
        ("canonical_nodes", kg.canonical_nodes, "nodes"),
        ("canonical_edges", kg.canonical_edges, "edges"),
    ]
    for name, fn, kind in stock:
        if name not in _REGISTRY:
            register_builder(name, fn, kind=kind)
