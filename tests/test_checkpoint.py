"""Checkpoint/resume layer tests (SURVEY.md §7 step 7).

Covers: per-partition completion + skip-on-resume, kill-mid-run
resume equivalence (resumed output == cold run), fingerprint
invalidation, and lineage/metrics manifests.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pytest

from outbreak_kg_ray.state import Checkpointer, doc_range_partitions

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


def _build(part):
    import ray.data as rd

    from outbreak_kg_ray.sources.pages import pages_dataset

    return pages_dataset(SF, doc_lo=part["lo"], doc_hi=part["hi"]).select_columns(
        ["url", "lang"]
    )


def test_doc_range_partitions_cover_all_rows(tmp_path):
    parts = doc_range_partitions(DOCS, part_rows=150)
    assert len(parts) == 4
    assert parts[0]["lo"] == 0
    assert parts[-1]["hi"] is None
    # contiguous, non-overlapping
    for a, b in zip(parts, parts[1:]):
        assert a["hi"] == b["lo"]


def test_partitioned_stage_and_read(ray_session, tmp_path):
    ckpt = Checkpointer(str(tmp_path))
    parts = doc_range_partitions(DOCS, part_rows=150)
    ckpt.partitioned_stage("pages", parts, _build)
    got = ckpt.read("pages")
    assert got.count() == 500
    metas = ckpt.partition_metas("pages")
    assert len(metas) == 4
    assert sum(m["rows"] for m in metas) == 500
    for m in metas:
        assert m["fingerprint"]
        assert m["wall_s"] >= 0
        assert "lineage" in m
    with open(os.path.join(str(tmp_path), "pages", "manifest.json")) as f:
        man = json.load(f)
    assert man["computed"] == 4 and man["resumed"] == 0


def test_resume_skips_completed_and_matches_cold_run(ray_session, tmp_path):
    parts = doc_range_partitions(DOCS, part_rows=150)

    # cold run for the golden answer
    cold = Checkpointer(str(tmp_path / "cold"))
    cold.partitioned_stage("pages", parts, _build)
    want = sorted(cold.read("pages").to_pandas()["url"])

    # killed run: crash after 2 partitions
    killed = Checkpointer(str(tmp_path / "killed"))
    calls = {"n": 0}

    def flaky(part):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated kill")
        return _build(part)

    with pytest.raises(RuntimeError):
        killed.partitioned_stage("pages", parts, flaky, max_concurrent=1)
    assert len(killed.partition_metas("pages")) == 2

    # resume: only the remaining partitions are computed
    built = []

    def counting(part):
        built.append(part["id"])
        return _build(part)

    killed.partitioned_stage("pages", parts, counting, max_concurrent=1)
    assert built == [p["id"] for p in parts[2:]]
    got = sorted(killed.read("pages").to_pandas()["url"])
    assert got == want
    with open(str(tmp_path / "killed" / "pages" / "manifest.json")) as f:
        man = json.load(f)
    assert man["computed"] == 2 and man["resumed"] == 2


def test_fingerprint_change_forces_recompute(ray_session, tmp_path):
    ckpt = Checkpointer(str(tmp_path))
    parts = doc_range_partitions(DOCS, part_rows=300)
    ckpt.partitioned_stage("pages", parts, _build)

    stale = [dict(p, fingerprint=p["fingerprint"] + ":v2") for p in parts]
    built = []

    def counting(part):
        built.append(part["id"])
        return _build(part)

    ckpt.partitioned_stage("pages", stale, counting, max_concurrent=1)
    assert built == [p["id"] for p in parts]
    assert ckpt.read("pages").count() == 500


def test_layout_change_cleans_stale_partitions(ray_session, tmp_path):
    """Re-running with a different part_rows must not leave the old
    layout's partitions on disk (they would be read alongside the new
    output, double-counting rows)."""
    ckpt = Checkpointer(str(tmp_path))
    ckpt.partitioned_stage(
        "pages", doc_range_partitions(DOCS, part_rows=150), _build
    )
    assert ckpt.read("pages").count() == 500
    # coarser layout: 2 partitions replace the previous 4
    ckpt.partitioned_stage(
        "pages", doc_range_partitions(DOCS, part_rows=250), _build
    )
    assert ckpt.read("pages").count() == 500
    assert len(ckpt.partition_metas("pages")) == 2


def test_fused_products_match_independent_builders(ray_session, tmp_path):
    """canonical_edges via the fused checkpointed path == the union of
    independently-computed builders (the oracle-validated path)."""
    import pandas as pd

    from outbreak_kg_ray.pipelines import kg

    products = kg.kg_products_dataset(SF, ckpt_root=str(tmp_path / "ckpt"),
                                      part_rows=200)

    def norm(ds) -> pd.DataFrame:
        df = ds.to_pandas()
        return (
            df.sort_values(list(df.columns))
            .reset_index(drop=True)
            .fillna("∅")
        )

    fused_mentions = norm(kg.alert_mention_edges(SF, products))
    indep_mentions = norm(kg.alert_mention_edges(SF))
    pd.testing.assert_frame_equal(fused_mentions, indep_mentions)

    fused_cooc = norm(kg.cooccurrence_edges(SF, products))
    indep_cooc = norm(kg.cooccurrence_edges(SF))
    pd.testing.assert_frame_equal(fused_cooc, indep_cooc)


def test_repeat_param_invalidates_partitions(ray_session, tmp_path):
    """Resuming the same ckpt_root with a different --repeat must
    recompute, not reuse, completed partitions (round-1 ADVICE: the
    fingerprint previously omitted synthesis parameters)."""
    from outbreak_kg_ray.pipelines.kg import kg_products_dataset

    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "ckpt")
    n1 = kg_products_dataset(sf, ckpt_root=root, repeat=1).count()
    n2 = kg_products_dataset(sf, ckpt_root=root, repeat=2).count()
    assert n2 > n1  # recomputed with doubled corpus, not stale reuse
    # and back again: repeat=1 must not see repeat=2's partitions
    n1b = kg_products_dataset(sf, ckpt_root=root, repeat=1).count()
    assert n1b == n1


def test_kg_partition_lineage_artifact(ray_session):
    """The lineage query proves the north-rule artifact end-to-end:
    4 id-range partitions with recorded rows + metrics, and a re-run
    that RESUMES every partition instead of recomputing."""
    from outbreak_kg_ray.pipelines.kg import kg_partition_lineage

    t = kg_partition_lineage("/root/testdata/sf0.001")
    assert t.num_rows == 4
    assert all(t.column("has_metrics").to_pylist())
    assert all(t.column("resumed").to_pylist())
    assert sum(t.column("rows").to_pylist()) > 0
    los = t.column("lo").to_pylist()
    assert los == sorted(los)
