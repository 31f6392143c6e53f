"""Empty-input robustness: every operator added for the webtext
pipeline must stream an EMPTY corpus to an empty (or trivially
degenerate) result, never crash — Ray's hash aggregate emits
columnless batches on empty input, the classic schema-loss trap."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }),
        os.path.join(d, "documents.parquet"),
    )
    pq.write_table(
        pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float64())),
            "label": pa.array([], pa.int64()),
        }),
        os.path.join(d, "embeddings.parquet"),
    )
    return str(d)


def _rows(r):
    import ray.data

    return r.count() if isinstance(r, ray.data.Dataset) else len(r)


def test_docops_on_empty_corpus(ray_session, empty_sf):
    from outbreak_kg_ray.pipelines import docops
    from outbreak_kg_ray.stages import kmeans, pack, sketch

    for fn in (
        docops.dedup_spans, docops.redact_pii,
        docops.mixture_downsample, docops.domain_quality_filter,
        docops.normalize_text, docops.bigram_pmi, docops.char_entropy,
        sketch.token_freq_spectrum, pack.shard_manifest,
        kmeans.embedding_outliers,
    ):
        assert _rows(fn(empty_sf)) == 0, fn.__name__


def test_curation_funnel_on_empty_corpus(ray_session, empty_sf):
    from outbreak_kg_ray.pipelines import docops

    funnel = docops.curation_funnel(empty_sf)
    assert (funnel["n_docs"] == 0).all()
    assert len(funnel) == 5


def test_full_query_surface_on_empty_tables(ray_session, tmp_path_factory):
    """EVERY queries() entry must survive a fully-empty corpus (all
    ten tables present, zero rows) — exercised for a representative
    member of each previously-crashing family; the exhaustive sweep
    lives in tools/ (probe takes minutes)."""
    import os
    import sys

    import ray.data

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("empty_all")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        pq.write_table(
            pq.read_table(f"{src}/{t}.parquet").slice(0, 0),
            os.path.join(d, f"{t}.parquet"),
        )
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs = e.queries()
    for name in ("mention_stats", "realism_scores", "timex_stats",
                 "alerts_by_facet", "parts_with_large_orders",
                 "value_quantiles_exact", "kll_value_quantiles",
                 "revenue_by_nation", "customers_without_orders",
                 "ann_topk", "minhash_near_dups", "kmeans_clusters",
                 "snapshot_delta", "heavy_hitter_terms", "dict_encode",
                 "literature_overlap", "near_dup_keep"):
        r = qs[name](str(d))
        n = r.count() if isinstance(r, ray.data.Dataset) else len(r)
        assert n == 0, name
