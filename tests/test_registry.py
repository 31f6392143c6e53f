"""Tests for the TableBuilder registry (SURVEY.md §2.10 extension
surface): stock builders present, custom registration round-trip,
duplicate protection, and both sink formats."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from outbreak_kg_ray import registry


def test_stock_builders_registered():
    b = registry.builders()
    # the reference's assemble_* list (kg/build.py:409-416) plus the
    # canonical merge outputs
    for name in (
        "alert_nodes", "alert_mention_edges", "outbreak_nodes",
        "alert_outbreak_edges", "cooccurrence_nodes",
        "cooccurrence_edges", "mesh_hierarchy_nodes",
        "mesh_hierarchy_edges", "pathogen_disease_edges",
        "disease_phenotype_edges", "geoname_nodes", "geoname_edges",
        "indicator_nodes_health", "indicator_edges_health",
        "canonical_nodes", "canonical_edges",
    ):
        assert name in b, name
    assert all(e.kind in ("nodes", "edges", "table") for e in b.values())


def test_custom_builder_roundtrip(ray_session, sf_dir, tmp_path):
    import ray.data as rd

    def my_builder(sf):
        return rd.from_arrow(
            pa.table(
                {
                    "curie": pa.array(["X:1", "X:2"], pa.string()),
                    "name": pa.array(["b", "a"], pa.string()),
                }
            )
        )

    registry.register_builder("custom_nodes", my_builder, kind="nodes",
                              columns=["curie", "name"])
    try:
        with pytest.raises(ValueError):
            registry.register_builder("custom_nodes", my_builder)
        out = registry.build_tables(
            sf_dir, str(tmp_path), names=["custom_nodes"], fmt="tsv"
        )
        assert out["custom_nodes"]["rows"] == 2
        text = open(out["custom_nodes"]["path"]).read().splitlines()
        # golden TSV: header + lexicographically sorted rows
        assert text[0].startswith("curie:ID")
        assert text[1].split("\t")[0] == "X:1"
    finally:
        registry.unregister_builder("custom_nodes")
    assert "custom_nodes" not in registry.builders()


def test_build_tables_parquet(ray_session, sf_dir, tmp_path):
    out = registry.build_tables(
        sf_dir, str(tmp_path),
        names=["mesh_hierarchy_nodes", "alert_nodes"], fmt="parquet",
    )
    assert out["mesh_hierarchy_nodes"]["rows"] == 58
    assert out["alert_nodes"]["rows"] == 500
    assert os.path.isdir(out["alert_nodes"]["path"])


def test_build_tables_resume_skips_completed(ray_session, sf_dir, tmp_path):
    """Re-running a finished export skips via the done-marker; a
    changed-input fingerprint invalidates the skip."""
    import json

    first = registry.build_tables(
        sf_dir, str(tmp_path), names=["mesh_hierarchy_nodes"],
        fmt="parquet",
    )
    assert first["mesh_hierarchy_nodes"]["skipped"] is False
    again = registry.build_tables(
        sf_dir, str(tmp_path), names=["mesh_hierarchy_nodes"],
        fmt="parquet",
    )
    assert again["mesh_hierarchy_nodes"]["skipped"] is True
    assert again["mesh_hierarchy_nodes"]["rows"] == 58
    # corrupt the fingerprint -> recompute
    marker = tmp_path / "mesh_hierarchy_nodes.done.json"
    meta = json.loads(marker.read_text())
    meta["fingerprint"] = "stale"
    marker.write_text(json.dumps(meta))
    third = registry.build_tables(
        sf_dir, str(tmp_path), names=["mesh_hierarchy_nodes"],
        fmt="parquet",
    )
    assert third["mesh_hierarchy_nodes"]["skipped"] is False


def test_interrupted_export_does_not_duplicate(ray_session, sf_dir, tmp_path):
    """A killed run (parquet files present, marker absent) must be
    recomputed cleanly, not appended to."""
    out = registry.build_tables(
        sf_dir, str(tmp_path), names=["mesh_hierarchy_nodes"],
        fmt="parquet",
    )
    assert out["mesh_hierarchy_nodes"]["rows"] == 58
    (tmp_path / "mesh_hierarchy_nodes.done.json").unlink()  # simulate kill
    again = registry.build_tables(
        sf_dir, str(tmp_path), names=["mesh_hierarchy_nodes"],
        fmt="parquet",
    )
    assert again["mesh_hierarchy_nodes"]["rows"] == 58  # not 116


def test_tsv_export_accepts_arrow_table_builder(ray_session, sf_dir, tmp_path):
    registry.register_builder(
        "tiny_arrow", lambda sf: pa.table({"x": [2, 1]}), kind="table"
    )
    try:
        out = registry.build_tables(
            sf_dir, str(tmp_path), names=["tiny_arrow"], fmt="tsv"
        )
        assert out["tiny_arrow"]["rows"] == 2
    finally:
        registry.unregister_builder("tiny_arrow")
