"""Driver contract for the Ray-Data KG engine.

``queries()`` exposes one callable per implemented operator/pipeline
from SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL.
The KG-pipeline oracles are *analytic*: the pages table is synthesized
from ``documents`` by closed-form formulas (see
outbreak_kg_ray/sources/pages.py), so the SQL recomputes the expected
output of real text extraction / NER / triple emission without
re-running them — any parsing or matching bug surfaces as a mismatch.

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init`` / ``ray.shutdown`` anywhere down this import tree.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from outbreak_kg_ray.config import KG_EXCLUDE_NAMES, LOCATION_MESH_MAPPING
from outbreak_kg_ray.fixtures import lexicon as lex

# ---------------------------------------------------------------------------
# shared SQL fragments (kept in lockstep with the synthesis formulas)
# ---------------------------------------------------------------------------

def _q(s: str) -> str:
    return s.replace("'", "''")


def _lex_cte() -> str:
    rows = ", ".join(
        f"({i}, '{m}', '{_q(n)}', '{t}')"
        for i, (m, n, t, _p) in enumerate(lex.MENTION_LEXICON)
    )
    return f"lex(idx, mesh_id, name, mtype) AS (VALUES {rows})"


def _ont_cte() -> str:
    rows = ", ".join(
        f"('{m}', '{_q(n)}', '{t}', "
        + (f"'{p}'" if p else "NULL")
        + ")"
        for m, n, t, p in lex.ONTOLOGY
    )
    return f"ont(mesh_id, name, mtype, parent_id) AS (VALUES {rows})"


def _excl_list() -> str:
    return ", ".join(f"'{_q(n)}'" for n in sorted(KG_EXCLUDE_NAMES))


_BASE_CTE = (
    "base AS (SELECT doc_id, printf('%08d.%d', 20200000 + doc_id % 10000, "
    "1000000 + doc_id) AS archive, trim(text) AS body_text FROM documents)"
)

_MENT_CTE = (
    "ment AS (SELECT b.doc_id, b.archive, r.range AS k, l.mesh_id, l.name, "
    "l.mtype FROM base b CROSS JOIN range(6) r JOIN lex l "
    f"ON l.idx = (b.doc_id * 17 + r.range * 31) % {lex.LEX_N} "
    "WHERE r.range < 2 + b.doc_id % 4)"
)

_DMENT_CTE = (
    "dment AS (SELECT DISTINCT doc_id, archive, mesh_id, name, mtype FROM ment)"
)

_TS_EXPR = (
    "strftime(TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE, "
    "'%Y-%m-%d %H:%M:%S')"
)


def _kg_prefix() -> str:
    return f"WITH {_lex_cte()}, {_BASE_CTE}, {_MENT_CTE}, {_DMENT_CTE}"


def _ground_ctes() -> str:
    """CTEs for the scored-grounding family (stages/grounding.py):
    candidate terms, query pool, the per-document query stream, and
    the scored match set ``gm``."""
    from outbreak_kg_ray.stages.grounding import ground_terms

    cand_rows = ", ".join(
        f"('{ns}', '{tid}', '{_q(en)}', '{_q(tx)}', '{st}')"
        for ns, tid, en, tx, st in ground_terms()
    )
    pool_rows = ", ".join(
        f"({i}, '{_q(s)}')" for i, s in enumerate(lex.GROUND_QUERY_POOL)
    )
    return (
        f"cand(ns, id, entry_name, text, status) AS (VALUES {cand_rows}),\n"
        f"pool(idx, surface) AS (VALUES {pool_rows}),\n"
        "q AS (SELECT doc_id AS qid, CASE doc_id % 3 "
        "WHEN 1 THEN lower(p.surface) WHEN 2 THEN upper(p.surface) "
        "ELSE p.surface END AS query FROM documents d JOIN pool p "
        f"ON p.idx = (d.doc_id * 13 + 7) % {lex.GROUND_POOL_N}),\n"
        "gm AS (SELECT q.qid, q.query, c.ns, c.id, c.entry_name, c.status, "
        "CASE WHEN q.query = c.text THEN 0 ELSE 1 END AS match_tier, "
        "100 - 20 * (CASE WHEN q.query = c.text THEN 0 ELSE 1 END) "
        "- 10 * (CASE WHEN c.status = 'name' THEN 0 ELSE 1 END) "
        "- (CASE WHEN c.ns = 'MESH' THEN 0 ELSE 1 END) AS score "
        "FROM q JOIN cand c ON lower(q.query) = lower(c.text) "
        "WHERE q.query NOT LIKE '%:%')"
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship: full KG materialization (canonical edge table) on
    sf0.001."""
    from outbreak_kg_ray.pipelines import kg

    return kg.canonical_edges("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from outbreak_kg_ray.pipelines import (
        bpe,
        contexts,
        docops,
        encode,
        graph,
        kg,
        linkpred,
        lmdata,
        mlstats,
        realism,
        relational,
        relations,
        serving,
        temporal,
        webcrawl,
    )
    from outbreak_kg_ray.stages import multimodal as mm
    from outbreak_kg_ray.stages import kmeans
    from outbreak_kg_ray.stages import pack
    from outbreak_kg_ray.stages import bloom
    from outbreak_kg_ray.stages import invindex
    from outbreak_kg_ray.stages import sketch
    from outbreak_kg_ray.stages import grounding
    from outbreak_kg_ray.stages import dsp
    from outbreak_kg_ray.stages import logreg
    from outbreak_kg_ray.stages.extract import extract_docs
    from outbreak_kg_ray.sources.pages import pages_dataset
    from outbreak_kg_ray.stages.ner import mentions_dataset

    def extract_text(sf_dir):
        return (
            extract_docs(pages_dataset(sf_dir))
            .select_columns(["doc_id", "extracted_text"])
        )

    def dedup_pages_q(sf_dir):
        from outbreak_kg_ray.stages.extract import dedup_pages

        return dedup_pages(pages_dataset(sf_dir))

    def alert_text(sf_dir, doc_id: int = 42):
        """/v1/alerts/<id> analog (kg/api.py:43-49): one alert's
        rendered text, served by a doc-range PRUNED read
        (lo <= doc_id < hi pushed to the Parquet scan) — the engine
        never synthesizes or extracts the rest of the corpus."""
        return (
            extract_docs(
                pages_dataset(sf_dir, doc_lo=doc_id, doc_hi=doc_id + 1)
            )
            .select_columns(["doc_id", "extracted_text"])
        )

    def docs_table(sf_dir):
        """Parsed-docs table (reference per-alert JSON dump, S2)."""
        return extract_docs(pages_dataset(sf_dir)).select_columns(
            ["doc_id", "url", "published_ts", "subject", "lang"]
        )

    def terms_by_alert(sf_dir):
        """Per-alert sorted distinct term list (S5 / A1 —
        promed_ner_terms_by_alert.json): groupby(doc_id) collect."""
        import pyarrow as pa
        from ray.data.aggregate import Unique

        terms = mentions_dataset(
            extract_docs(pages_dataset(sf_dir)), mode="terms"
        )

        def key(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "term": pa.array(
                        [
                            f"{d}:{i}:{n}"
                            for d, i, n in zip(
                                t.column("db").to_pylist(),
                                t.column("id").to_pylist(),
                                t.column("entry_name").to_pylist(),
                            )
                        ],
                        pa.string(),
                    ),
                }
            )

        grouped = (
            terms.map_batches(key, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Unique("term", alias_name="_terms"))
        )

        def finish(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "terms": pa.array(
                        [
                            ";".join(sorted(set(ts)))
                            for ts in t.column("_terms").to_pylist()
                        ],
                        pa.string(),
                    ),
                }
            )

        return grouped.map_batches(finish, batch_format="pyarrow")

    def mentions(sf_dir):
        return mentions_dataset(
            extract_docs(pages_dataset(sf_dir)), mode="terms"
        )

    def mention_stats(sf_dir):
        import pyarrow as pa

        from outbreak_kg_ray.sources.io import empty_dataset, parquet_rows
        from outbreak_kg_ray.stages.shuffle import salted_count

        if parquet_rows(f"{sf_dir}/documents.parquet") == 0:
            return empty_dataset({
                "text": pa.string(), "term_db": pa.string(),
                "term_id": pa.string(), "term_name": pa.string(),
                "count": pa.int64(),
            })

        raw = mentions_dataset(
            extract_docs(pages_dataset(sf_dir)), mode="mentions"
        )
        # the A2 global mention count is the reference's skew witness
        # ("disease" ×80k) — salted two-stage exchange
        out = salted_count(
            raw.select_columns(["text", "db", "id", "entry_name"]),
            ["text", "db", "id", "entry_name"],
        )

        def rename(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                ["text", "term_db", "term_id", "term_name", "count"]
            )

        return out.map_batches(rename, batch_format="pyarrow")

    def dict_encode(sf_dir):
        return encode.dict_encoded_triples(sf_dir)

    def literature_rank(sf_dir):
        return encode.literature_pvalues(sf_dir, ["click", "error", "purchase"])

    def realism_scores(sf_dir):
        return realism.realism_table(sf_dir)

    return {
        # --- KG construction pipeline (pages → triples) ---
        "extract_text": extract_text,
        "docs_table": docs_table,
        "mentions": mentions,
        "terms_by_alert": terms_by_alert,
        "mention_stats": mention_stats,
        "alert_nodes": kg.alert_nodes,
        "alert_mention_edges": kg.alert_mention_edges,
        "outbreak_nodes": kg.outbreak_nodes,
        "alert_outbreak_edges": kg.alert_outbreak_edges,
        "cooccurrence_edges": kg.cooccurrence_edges,
        "cooccurrence_nodes": kg.cooccurrence_nodes,
        "pagerank": graph.pagerank,
        "hits_scores": graph.hits_scores,
        "deepwalk_corpus": graph.deepwalk_corpus,
        "connected_components": graph.connected_components,
        "lpa_communities": graph.lpa_communities,
        "join_skew_report": relational.join_skew_report,
        "daily_value_drift": relational.daily_value_drift,
        "mutual_nn_pairs": docops.mutual_nn_pairs,
        "mesh_hierarchy_nodes": lambda sf: kg.mesh_hierarchy_nodes(),
        "mesh_hierarchy_edges": lambda sf: kg.mesh_hierarchy_edges(),
        "pathogen_disease_edges": lambda sf: kg.pathogen_disease_edges(),
        "disease_phenotype_edges": lambda sf: kg.disease_phenotype_edges(),
        "indicator_year_values_health": lambda sf: kg.indicator_year_values("health"),
        "indicator_year_values_dev": lambda sf: kg.indicator_year_values("dev"),
        "indicator_edges_health": lambda sf: kg.indicator_edges("health"),
        "indicator_nodes_health": lambda sf: kg.indicator_nodes("health"),
        "geoname_nodes": lambda sf: kg.geoname_nodes(),
        "geoname_edges": lambda sf: kg.geoname_edges(),
        "canonical_nodes": kg.canonical_nodes,
        "canonical_edges": kg.canonical_edges,
        "kg_partition_lineage": lambda sf: kg.kg_partition_lineage(sf),
        "realism_scores": realism_scores,
        # --- Eidos-equivalent context extraction (process_eidos.py) ---
        "timex_contexts": contexts.timex_contexts,
        # round 4: Eidos TimeNorm analog — relative expressions
        # resolved to absolute intervals against the alert DCT
        "timex_normalized": contexts.timex_normalized,
        "geoloc_contexts": contexts.geoloc_contexts,
        "geoloc_stats": contexts.geoloc_stats,
        "timex_stats": contexts.timex_stats,
        # --- serving-side graph queries (kg/client.py / kg/api.py) ---
        "direct_relations": serving.direct_relations,
        "comention_alerts": serving.comention_alerts,
        "text_relations_direct": serving.text_relations_direct,
        "text_relations_alerts": serving.text_relations_alerts,
        "isa_closure": serving.isa_closure,
        "alerts_by_facet": lambda sf: serving.alerts_by_facet(
            sf, disease="Influenza", geolocation="Asia"
        ),
        "alerts_by_symptom": lambda sf: serving.alerts_by_facet(
            sf, symptom="MESH:D003371"
        ),
        "indicators_by_country": lambda sf: serving.indicators_by_country(
            sf, geolocation="Asia", indicator_filter="total"
        ),
        "autocomplete_terms": serving.autocomplete_terms,
        "dedup_pages": dedup_pages_q,
        "alert_text": alert_text,
        # --- multimodal binary-column stages ---
        "image_features": mm.image_features,
        "audio_frames": mm.audio_frames,
        "video_frame_samples": mm.video_frame_samples,
        "image_thumbnails": mm.image_thumbnails,
        # real codecs: spec-valid PNG (pure-stdlib zlib decoder, all
        # 5 scanline filters) and RIFF/WAVE PCM-16 (stdlib encoder ×
        # hand-written decoder cross-check)
        "png_image_features": mm.png_image_features,
        "wav_audio_frames": mm.wav_audio_frames,
        "png_thumbnails": mm.png_thumbnails,
        # --- literature matrix (dict encode + fisher ranking) ---
        "dict_encode": dict_encode,
        "literature_rank": literature_rank,
        # --- training-data ops: dedup / text analysis / similarity ---
        "dedup_exact": docops.dedup_exact,
        "token_stats": docops.token_stats,
        "heavy_hitter_terms": sketch.heavy_hitter_terms,
        "hll_distinct_tokens": sketch.hll_distinct_tokens,
        "distinct_token_count": sketch.distinct_token_count,
        # grouped distinct: exact pair-collapse (SQL-checked) + the
        # per-group HLL whose exchange is |types|x#blocks registers,
        # independent of user cardinality (rows-only, e-bounded test)
        # fuzzy self-join: edit-distance-1 name pairs via deletion-
        # neighborhood blocking (no O(N^2) cross join)
        "fuzzy_name_pairs": docops.fuzzy_name_pairs,
        # A-priori market-basket rules over per-doc token sets
        "association_rules": docops.association_rules,
        # entity-resolution clusters over the fuzzy pairs (CC reuse)
        "name_clusters": docops.name_clusters,
        # hybrid sparse+dense retrieval via reciprocal-rank fusion
        "hybrid_rrf_topk": docops.hybrid_rrf_topk,
        # diversified ranking: global top-k with a per-lang quota
        "diversified_topk": docops.diversified_topk,
        # conjunctive boolean retrieval + length concentration audit
        "boolean_and_search": docops.boolean_and_search,
        "length_lorenz_deciles": docops.length_lorenz_deciles,
        # corpus-comparison: smoothed log-odds distinctive terms
        "distinctive_terms_per_lang": (
            docops.distinctive_terms_per_lang),
        # Efraimidis-Spirakis weighted sampling (deterministic u)
        "weighted_sample": docops.weighted_sample,
        "distinct_users_per_type": sketch.distinct_users_per_type,
        "hll_users_per_type": sketch.hll_users_per_type,
        # grouped KLL quantiles (rows-only; exact twin pins e-bounds)
        "kll_value_quantiles_by_type": (
            sketch.kll_value_quantiles_by_type),
        # histogram-derived PERCENT_RANK window (distinct-value grain)
        "events_value_percent_rank": relational.events_value_percent_rank,
        "quality_scores": docops.quality_scores,
        "readability_scores": docops.readability_scores,
        "lang_id": docops.lang_id,
        "fingerprints": docops.fingerprints,
        "minhash_near_dups": docops.minhash_near_dups,
        "simhash_near_dups": docops.simhash_near_dups,
        "ngram_jaccard_near_dups": docops.ngram_jaccard_near_dups,
        "ann_topk": docops.ann_topk,
        "hard_negatives_topk": docops.hard_negatives_topk,
        "ann_topk_ivf": docops.ann_topk_ivf,
        "ann_topk_lsh": docops.ann_topk_lsh,
        "ann_topk_pq": docops.ann_topk_pq,
        "embedding_near_dups": docops.embedding_near_dups,
        "near_dup_keep": docops.near_dup_keep,
        "quality_filter_sample": docops.quality_filter_sample,
        "decontaminate": docops.decontaminate,
        "unigram_logprob": docops.unigram_logprob,
        "oov_rate": docops.oov_rate,
        "bpe_merge_pairs": docops.bpe_merge_pairs,
        "bpe_learned_merges": bpe.bpe_learn_merges,
        "perplexity_buckets": docops.perplexity_buckets,
        "bpe_token_counts": bpe.bpe_token_counts,
        "source_kl_divergence": docops.source_kl_divergence,
        "quality_percentile": docops.quality_percentile,
        "source_lang_chi2": docops.source_lang_chi2,
        "length_buckets": docops.length_buckets,
        "preference_pairs": docops.preference_pairs,
        "near_dup_keep_best": docops.near_dup_keep_best,
        "oversample_balanced": docops.oversample_balanced,
        "curriculum_rank": docops.curriculum_rank,
        "corpus_datacard": docops.corpus_datacard,
        "heldout_perplexity": docops.heldout_perplexity,
        "source_dedup_matrix": docops.source_dedup_matrix,
        "quality_lift_report": docops.quality_lift_report,
        "png_image_augments": mm.png_image_augments,
        "wav_audio_augments": mm.wav_audio_augments,
        # absolute min_df=2 pinned for the audit query (the library
        # default is corpus-relative, which is correct at scale but
        # empties on the testdata's sf0.1 dup density)
        "repeated_span_report": (
            lambda sf_dir: docops.repeated_span_report(
                sf_dir, min_df=2
            )
        ),
        "bigram_nll": docops.bigram_nll,
        "user_type_entropy": relational.user_type_entropy,
        "boilerplate_ratio": docops.boilerplate_ratio,
        "parts_with_large_orders": relational.parts_with_large_orders,
        "top_terms_per_doc": docops.top_terms_per_doc,
        "lang_median_filter": docops.lang_median_filter,
        "label_centroids": kmeans.label_centroids,
        "embedding_outliers": kmeans.embedding_outliers,
        "kmeans_clusters": kmeans.kmeans_clusters,
        # rows-only (iterative k-means isn't SQL-expressible); the
        # numpy whole-corpus reference is pinned in tests/test_kmeans.py
        "semantic_dedup": kmeans.semantic_dedup,
        "pack_sequences": pack.pack_sequences,
        "padded_batch_plan": pack.padded_batch_plan,
        "repetition_scores": docops.repetition_scores,
        "dedup_spans": docops.dedup_spans,
        "redact_pii": docops.redact_pii,
        "mixture_downsample": docops.mixture_downsample,
        "domain_quality_filter": docops.domain_quality_filter,
        "normalize_text": docops.normalize_text,
        "curated_docs": docops.curate_corpus,
        "curation_funnel": docops.curation_funnel,
        "bigram_pmi": docops.bigram_pmi,
        "char_entropy": docops.char_entropy,
        "phrase_blocklist": docops.phrase_blocklist,
        "value_quantiles_exact": sketch.value_quantiles_exact,
        "kll_value_quantiles": sketch.kll_value_quantiles,
        "token_freq_spectrum": sketch.token_freq_spectrum,
        "snapshot_delta": bloom.snapshot_delta,
        "shuffle_positions": pack.shuffle_positions,
        "shard_manifest": pack.shard_manifest,
        "inverted_index": invindex.inverted_index,
        # --- generic relational surface ---
        "pricing_summary": relational.pricing_summary,
        "top_customers": relational.top_customers,
        "events_hourly": relational.events_hourly,
        "events_sliding_window": relational.events_sliding_window,
        "order_lineitem_join": relational.order_lineitem_join,
        "order_priority_return_rate": relational.order_priority_return_rate,
        "revenue_by_nation": relational.revenue_by_nation,
        "cumulative_order_revenue": relational.cumulative_order_revenue,
        "triangle_counts": graph.triangle_counts,
        "top_customers_by_nation": relational.top_customers_by_nation,
        "token_count_quantiles": relational.token_count_quantiles,
        "events_props_stats": relational.events_props_stats,
        "customers_without_orders": relational.customers_without_orders,
        "pricing_rollup": relational.pricing_rollup,
        "pricing_cube": relational.pricing_cube,
        "stratified_sample": docops.stratified_sample,
        # --- temporal joins / sessionization ---
        "events_orders_asof": temporal.asof_join_events_orders,
        "order_ship_window": temporal.order_ship_window,
        "events_sessionize": temporal.sessionize_events,
        "event_transitions": temporal.event_transitions,
        "user_gap_stats": temporal.user_gap_stats,
        "late_event_report": temporal.late_event_report,
        "leave_last_out_split": temporal.leave_last_out_split,
        "bpr_triples": temporal.bpr_triples,
        "watermark_window_counts": temporal.watermark_window_counts,
        "revenue_yoy": relational.revenue_yoy,
        "langid_confusion": docops.langid_confusion,
        "export_by_lang": docops.export_by_lang,
        "profile_documents": docops.profile_documents,
        "top_cooccurring_partners": serving.top_cooccurring_partners,
        # --- SQL-checkable members of the literature / near-dup families ---
        "literature_overlap": lambda sf: encode.literature_overlap(
            sf, ["click", "error", "purchase"]
        ),
        "prefix_block_jaccard": docops.prefix_block_jaccard,
        # --- round-2 continuation: webtext gates / retrieval / graph ---
        "gopher_quality": docops.gopher_quality,
        "chunk_documents": docops.chunk_documents,
        "bm25_topk": docops.bm25_topk,
        "bfs_distances": graph.bfs_distances,
        "retention_cohorts": relational.retention_cohorts,
        "kcore": graph.kcore,
        "two_hop_neighbors": graph.two_hop_neighbors,
        "degree_assortativity": graph.degree_assortativity,
        "degree_histogram": graph.degree_histogram,
        "funnel_stages": temporal.funnel_stages,
        "dsir_weights": docops.dsir_weights,
        "holdout_split": docops.holdout_split,
        "token_budget_cap": docops.token_budget_cap,
        # rows-only (MinHash permutations aren't SQL-expressible);
        # invariants pinned in tests/test_docops.py
        "near_dup_clusters": docops.near_dup_clusters,
        "events_gap_fill": relational.events_gap_fill,
        "events_hourly_anomalies": relational.events_hourly_anomalies,
        "ann_range_search": docops.ann_range_search,
        "source_vocab_jaccard": docops.source_vocab_jaccard,
        "events_value_histogram": relational.events_value_histogram,
        "user_top_event_type": relational.user_top_event_type,
        "events_type_value_quantiles": relational.events_type_value_quantiles,
        "events_winsorized_mean": relational.events_winsorized_mean,
        "lineitem_qty_price_corr": relational.lineitem_qty_price_corr,
        "autocomplete_search": serving.autocomplete_search,
        "trending_terms_daily": serving.trending_terms_daily,
        "alert_hourly_timeline": serving.alert_hourly_timeline,
        "mesh_subtree_sizes": serving.mesh_subtree_sizes,
        "entity_timeline": serving.entity_timeline,
        "customer_rfm": relational.customer_rfm,
        "part_supplier_coverage": relational.part_supplier_coverage,
        "shipping_priority": relational.shipping_priority,
        "promo_revenue_share": relational.promo_revenue_share,
        "url_dedup": webcrawl.url_dedup,
        "host_stats": webcrawl.host_stats,
        "url_blocklist_filter": webcrawl.url_blocklist_filter,
        "host_cap_sample": webcrawl.host_cap_sample,
        "lineitem_quantity_mad": relational.lineitem_quantity_mad,
        # schema-wide referential-integrity audit (anti-join family)
        "fk_integrity_audit": relational.fk_integrity_audit,
        # windowed COUNT(DISTINCT): trailing-3h active users
        "rolling_active_users": relational.rolling_active_users,
        # CDC last-writer-wins compaction + two-pass feature scaling
        "latest_event_per_user": relational.latest_event_per_user,
        "zscore_features": relational.zscore_features,
        # gaps-and-islands session rollup + grouped OLS trend
        "session_summaries": temporal.session_summaries,
        "errors_after_purchase": temporal.errors_after_purchase,
        "purchase_attribution": temporal.purchase_attribution,
        # AS-OF backlog snapshots (open orders per month start)
        "open_orders_snapshot": temporal.open_orders_snapshot,
        "events_value_trend": relational.events_value_trend,
        # audience (user-set) Jaccard between event types
        "audience_overlap": relational.audience_overlap,
        # fulfillment-latency percentiles per priority
        "ship_lag_quantiles": relational.ship_lag_quantiles,
        # 7x24 weekly seasonality heatmap
        "events_seasonality": relational.events_seasonality,
        # revenue concentration Pareto deciles (sort-path rank)
        "revenue_pareto_deciles": relational.revenue_pareto_deciles,
        "nation_account_reconciliation":
            relational.nation_account_reconciliation,
        # --- round 4: scored ambiguity-aware grounding (Gilda analog,
        # kg/client.py:323-378 + promed_ner.py:160-176) ---
        "scored_groundings": grounding.scored_groundings,
        "grounding_curies": grounding.grounding_curies,
        "ambiguous_groundings": grounding.ambiguous_groundings,
        # round 4: incremental KG maintenance — base-snapshot products
        # + delta batch, oracle proves rebuild-equivalence
        "kg_incremental_edges": kg.canonical_edges_incremental,
        "kg_incremental_nodes": kg.canonical_nodes_incremental,
        # round 4: case-count phrase extraction → has_case_count
        # triples (north-star relation vocabulary)
        "case_counts": contexts.case_counts,
        "case_count_edges": contexts.case_count_edges,
        "disease_case_totals": contexts.disease_case_totals,
        # round 4: typed relation-pattern extraction — causes /
        # transmitted_by / located_in (north-star relation vocabulary,
        # pattern classify → ground → type-gate → canonicalize)
        "relation_sentences": relations.relation_sentences,
        "pattern_relations": relations.pattern_relations,
        "typed_relation_edges": relations.typed_relation_edges,
        "relation_evidence": relations.relation_evidence,
        "relation_type_counts": relations.relation_type_counts,
        "disease_causers": relations.disease_causers,
        # round 4: classical-ML corpus statistics — Zipf power-law
        # fit, NB source classifier (fastText-style corpus scorer),
        # covariance/PCA over the embedding column
        "zipf_slope": mlstats.zipf_slope,
        "nb_source_scores": mlstats.nb_source_scores,
        "nb_source_pred": mlstats.nb_source_pred,
        "embedding_covariance": mlstats.embedding_covariance,
        # rows-only (eigendecomposition isn't SQL-expressible);
        # anchored by embedding_covariance + tests/test_mlstats.py
        "pca_projection": mlstats.pca_projection,
        # round 4: per-host language-mix entropy (CCNet-style drift
        # signal over the canonical crawl hosts)
        "host_lang_entropy": webcrawl.host_lang_entropy,
        # round 4: sufficient-statistics ML — one-pass OLS fit and
        # Welch A/B readout (9/4 floats per batch are the exchange)
        "ols_price_model": mlstats.ols_price_model,
        "ab_test_stats": mlstats.ab_test_stats,
        # rows-only (matrix inverse isn't SQL-expressible); anchored
        # by embedding_covariance + tests/test_mlstats.py
        "mahalanobis_outliers": mlstats.mahalanobis_outliers,
        # round 4: link prediction — common-neighbor / Jaccard
        # proposals for missing KG edges (Liben-Nowell & Kleinberg)
        "common_neighbors_topk": linkpred.common_neighbors_topk,
        # round 4: T5-style span-corruption example construction
        "span_corruption_pairs": lmdata.span_corruption_pairs,
        "next_event_examples": lmdata.next_event_examples,
        "negative_sampling_table": lmdata.negative_sampling_table,
        "skipgram_pairs": lmdata.skipgram_pairs,
        "char_coverage_table": lmdata.char_coverage_table,
        "token_dropout_augment": lmdata.token_dropout_augment,
        "glove_cooccurrence": lmdata.glove_cooccurrence,
        # round 4: SCD-Type-2 dimension build from the CDC stream
        "user_type_scd2": relational.user_type_scd2,
        # round 4: audio DSP feature extraction (rows-only — FFT
        # isn't SQL; numpy reference in tests/test_multimodal.py)
        "wav_spectrogram": dsp.wav_spectrogram,
        # round 4: distributed logistic-regression probe (rows-only —
        # iterative GD isn't SQL; numpy reference + monotone-loss
        # invariants in tests/test_mlstats.py)
        "logreg_scores": logreg.logreg_scores,
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    nl = "chr(10)"
    blank = f"{nl} || {nl}"

    sql: dict[str, str] = {}

    sql["extract_text"] = f"""
{_kg_prefix()},
sent AS (
  SELECT doc_id,
         'Cases involving ' || string_agg(name, ', ' ORDER BY k)
           || ' were reported.' AS findings
  FROM ment GROUP BY doc_id
)
SELECT b.archive AS doc_id,
       'PRO/AH/EDR> Outbreak alert ' || b.archive || {blank} ||
       'Overview' || {blank} || b.body_text || {blank} ||
       'Findings' || {blank} || s.findings || {blank} AS extracted_text
FROM base b JOIN sent s USING (doc_id)
"""

    sql["docs_table"] = f"""
SELECT printf('%08d.%d', 20200000 + doc_id % 10000, 1000000 + doc_id)
         AS doc_id,
       'https://promed.example.org/post/' ||
         printf('%08d.%d', 20200000 + doc_id % 10000, 1000000 + doc_id)
         AS url,
       TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE
         AS published_ts,
       'PRO/AH/EDR> Outbreak alert ' ||
         printf('%08d.%d', 20200000 + doc_id % 10000, 1000000 + doc_id)
         AS subject,
       lang
FROM documents
"""

    sql["terms_by_alert"] = f"""
{_kg_prefix()}
SELECT archive AS doc_id,
       string_agg(DISTINCT 'MESH:' || mesh_id || ':' || name,
                  ';' ORDER BY 'MESH:' || mesh_id || ':' || name)
         AS terms
FROM dment GROUP BY archive
"""

    sql["mentions"] = f"""
{_kg_prefix()}
SELECT archive AS doc_id, 'MESH' AS db, mesh_id AS id, name AS entry_name
FROM dment
"""

    sql["mention_stats"] = f"""
{_kg_prefix()}
SELECT name AS text, 'MESH' AS term_db, mesh_id AS term_id,
       name AS term_name, COUNT(*) AS "count"
FROM ment GROUP BY mesh_id, name
"""

    sql["alert_nodes"] = f"""
SELECT 'promed:' || printf('%08d.%d', 20200000 + doc_id % 10000,
                           1000000 + doc_id) AS curie,
       printf('%08d.%d', 20200000 + doc_id % 10000, 1000000 + doc_id) AS name,
       CASE WHEN doc_id % 3 = 2 THEN '' ELSE {_TS_EXPR} END AS timestamp,
       'alert' AS labels
FROM documents
"""

    sql["alert_mention_edges"] = f"""
{_kg_prefix()}
SELECT DISTINCT 'promed:' || archive AS start_id,
       'mentions' AS rel_type,
       'MESH:' || mesh_id AS end_id
FROM dment
WHERE mtype IN ('disease', 'pathogen', 'geoloc')
  AND name NOT IN ({_excl_list()})
"""

    sql["outbreak_nodes"] = """
SELECT DISTINCT 'outbreak:' || (doc_id % 20) AS curie,
       printf('Outbreak %03d', doc_id % 20) AS name,
       'outbreak' AS labels
FROM documents WHERE doc_id % 3 != 2
"""

    sql["alert_outbreak_edges"] = """
SELECT DISTINCT
       'promed:' || printf('%08d.%d', 20200000 + doc_id % 10000,
                           1000000 + doc_id) AS start_id,
       'has_outbreak' AS rel_type,
       'outbreak:' || (doc_id % 20) AS end_id
FROM documents WHERE doc_id % 3 != 2
"""

    cooc_cond = """(
     (a.mtype = 'geoloc' AND b.mtype = 'pathogen')
  OR (a.mtype = 'disease' AND b.mtype = 'pathogen')
  OR (a.mtype = 'geoloc' AND b.mtype = 'disease')
  OR (b.mtype = 'geoloc' AND a.mtype = 'pathogen')
  OR (b.mtype = 'disease' AND a.mtype = 'pathogen')
  OR (b.mtype = 'geoloc' AND a.mtype = 'disease')
)"""

    sql["cooccurrence_edges"] = f"""
{_kg_prefix()}
SELECT 'MESH:' || a.mesh_id AS start_id,
       'occurs_with' AS rel_type,
       'MESH:' || b.mesh_id AS end_id,
       COUNT(*) AS "count"
FROM dment a JOIN dment b
  ON a.doc_id = b.doc_id AND a.name < b.name
WHERE a.name NOT IN ({_excl_list()})
  AND b.name NOT IN ({_excl_list()})
  AND {cooc_cond}
GROUP BY a.mesh_id, b.mesh_id
"""

    sql["cooccurrence_nodes"] = f"""
{_kg_prefix()},
pairs AS (
  SELECT a.mesh_id AS am, a.name AS an, a.mtype AS at,
         b.mesh_id AS bm, b.name AS bn, b.mtype AS bt
  FROM dment a JOIN dment b
    ON a.doc_id = b.doc_id AND a.name < b.name
  WHERE a.name NOT IN ({_excl_list()})
    AND b.name NOT IN ({_excl_list()})
    AND {cooc_cond.replace('a.mtype', 'a.mtype').replace('b.mtype', 'b.mtype')}
),
endpoints AS (
  SELECT am AS mesh_id, an AS name, at AS mtype FROM pairs
  UNION
  SELECT bm, bn, bt FROM pairs
)
SELECT DISTINCT 'MESH:' || mesh_id AS curie, name,
       CASE WHEN mtype = 'pathogen' THEN 'pathogen'
            WHEN mtype = 'geoloc' THEN 'geoloc'
            ELSE 'disease' END || ';entity' AS labels
FROM endpoints
"""

    sql["mesh_hierarchy_nodes"] = f"""
WITH {_ont_cte()}
SELECT 'MESH:' || mesh_id AS curie, name, mtype || ';entity' AS labels
FROM ont WHERE mtype IN ('disease', 'pathogen', 'geoloc')
"""

    sql["mesh_hierarchy_edges"] = f"""
WITH {_ont_cte()}
SELECT 'MESH:' || c.mesh_id AS start_id, 'isa' AS rel_type,
       'MESH:' || c.parent_id AS end_id
FROM ont c JOIN ont p ON c.parent_id = p.mesh_id
WHERE c.mtype IN ('disease', 'pathogen', 'geoloc')
  AND p.mtype = c.mtype
"""

    pd_rels = ", ".join(
        f"('{s}', '{e}')" for s, e in lex.PATHOGEN_DISEASE_RELS
    )
    xref_rows = ", ".join(
        [f"('ncbitaxon', '{k}', '{v}')" for k, v in lex.NCBITAXON_TO_MESH.items()]
        + [f"('doid', '{k}', '{v}')" for k, v in lex.DOID_TO_MESH.items()]
    )
    sql["pathogen_disease_edges"] = f"""
WITH rels(s, e) AS (VALUES {pd_rels}),
xref(ns, id, mesh) AS (VALUES {xref_rows})
SELECT DISTINCT 'MESH:' || xs.mesh AS start_id,
       'has_pathogen' AS rel_type,
       'MESH:' || xe.mesh AS end_id
FROM rels
JOIN xref xs ON xs.ns = split_part(rels.s, ':', 1)
            AND xs.id = split_part(rels.s, ':', 2)
JOIN xref xe ON xe.ns = split_part(rels.e, ':', 1)
            AND xe.id = split_part(rels.e, ':', 2)
WHERE NOT starts_with(rels.s, 'umls') AND NOT starts_with(rels.e, 'umls')
"""

    dp_rels = ", ".join(
        f"('{s}', '{e}')" for s, e in lex.DISEASE_PHENOTYPE_RELS
    )
    sql["disease_phenotype_edges"] = f"""
WITH rels(s, e) AS (VALUES {dp_rels})
SELECT DISTINCT upper(s) AS start_id, 'has_phenotype' AS rel_type,
       upper(e) AS end_id
FROM rels
WHERE starts_with(s, 'mesh') AND starts_with(e, 'mesh')
"""

    # indicators: countries resolved to curies at SQL-generation time
    # for J2 visibility the Atlantis row carries NULL and is filtered
    geoloc_names = {
        n for _m, n, t, _p in lex.ONTOLOGY if t == "geoloc"
    }
    name_to_curie = {
        n: f"MESH:{m}" for m, n, t, _p in lex.ONTOLOGY
        if t in ("disease", "pathogen", "geoloc")
    }
    country_rows = []
    for ci, c in enumerate(lex.INDICATOR_COUNTRIES):
        mapped = LOCATION_MESH_MAPPING.get(c, c)
        curie = name_to_curie.get(mapped) if mapped in geoloc_names else None
        country_rows.append(
            f"({ci}, '{_q(c)}', " + (f"'{curie}'" if curie else "NULL") + ")"
        )
    countries_cte = "countries(ci, wb_name, curie) AS (VALUES " + ", ".join(country_rows) + ")"

    def _series_cte(kind: str) -> str:
        series = lex.HEALTH_SERIES if kind == "health" else lex.DEV_SERIES
        dev_codes = {c for c, _n in lex.DEV_SERIES}
        rows = ", ".join(
            f"({si}, '{_q(code)}', '{_q(nm)}', "
            + ("TRUE" if (kind == "health" and code in dev_codes) else "FALSE")
            + ")"
            for si, (code, nm) in enumerate(series)
        )
        return f"series(si, code, sname, shared) AS (VALUES {rows})"

    def _indicator_sql(kind: str) -> str:
        return f"""
WITH {countries_cte}, {_series_cte(kind)},
years(y) AS (SELECT range FROM range(2018, 2023))
SELECT c.curie AS country_curie, s.code AS series_code,
       CAST(y AS VARCHAR) AS year,
       ((c.ci * 37 + s.si * 11 + y) % 1000) + (y % 7) / 8.0 AS value
FROM countries c CROSS JOIN series s CROSS JOIN years
WHERE c.curie IS NOT NULL AND NOT s.shared
  AND (c.ci + s.si + y) % 5 != 0
"""

    sql["indicator_year_values_health"] = _indicator_sql("health")
    sql["indicator_year_values_dev"] = _indicator_sql("dev")

    # years_data JSON map built to match python json.dumps formatting:
    # {"2018": 123.25, ...} with ", " separators and repr floats
    def _indicator_edges_sql(kind: str) -> str:
        return f"""
SELECT start_id,
       '{{' || string_agg('"' || year || '": ' ||
                          CAST(round(value, 3) AS VARCHAR),
                          ', ' ORDER BY year) || '}}' AS years_data,
       'has_indicator' AS rel_type,
       'wdi:' || series_code AS end_id
FROM (SELECT country_curie AS start_id, series_code, year, value
      FROM ({_indicator_sql(kind)}))
GROUP BY start_id, series_code
"""

    sql["indicator_edges_health"] = _indicator_edges_sql("health")

    sql["indicator_nodes_health"] = f"""
WITH {_series_cte("health")}
SELECT DISTINCT 'wdi:' || code AS curie, sname AS name,
       'indicator' AS labels
FROM series WHERE NOT shared
"""

    # geonames: grounding resolved in SQL via ontology + WB-name map
    wb_rows = ", ".join(
        f"('{_q(k)}', '{_q(v)}')" for k, v in LOCATION_MESH_MAPPING.items()
    )
    geon_rows = ", ".join(
        f"('{c}', '{_q(n)}', "
        + (f"'{p}'" if p else "NULL") + ", "
        + (f"'{_q(pn)}'" if pn else "NULL") + ")"
        for c, n, p, pn in lex.GEONAME_TERMS
    )
    geo_prefix = f"""
WITH {_ont_cte()},
wbmap(wb, mesh_name) AS (VALUES {wb_rows}),
geon(curie, name, parent_curie, parent_name) AS (VALUES {geon_rows}),
typed AS (SELECT mesh_id, name FROM ont
          WHERE mtype IN ('disease', 'pathogen', 'geoloc')),
grounded AS (
  SELECT g.*, t.mesh_id AS g_mesh, tp.mesh_id AS p_mesh
  FROM geon g
  LEFT JOIN wbmap w ON w.wb = g.name
  LEFT JOIN typed t ON lower(coalesce(w.mesh_name, g.name)) = lower(t.name)
  LEFT JOIN wbmap wp ON wp.wb = g.parent_name
  LEFT JOIN typed tp ON lower(coalesce(wp.mesh_name, g.parent_name)) = lower(tp.name)
)"""

    sql["geoname_nodes"] = f"""{geo_prefix}
SELECT curie, name, 'geoloc' AS labels FROM grounded WHERE g_mesh IS NULL
"""

    sql["geoname_edges"] = f"""{geo_prefix}
SELECT curie AS start_id, 'isa' AS rel_type,
       coalesce('MESH:' || p_mesh, parent_curie) AS end_id
FROM grounded
WHERE g_mesh IS NULL AND parent_curie IS NOT NULL
"""

    # ---- canonical tables: composed from the per-builder oracles ----
    _dev_nodes_sql = f"""
WITH {_series_cte("dev")}
SELECT DISTINCT 'wdi:' || code AS curie, sname AS name,
       'indicator' AS labels
FROM series WHERE NOT shared
"""
    node_parts = [
        f"SELECT curie, name, labels, timestamp FROM ({sql['alert_nodes']})",
        f"SELECT curie, name, labels, NULL AS timestamp FROM ({sql['outbreak_nodes']})",
        f"SELECT curie, name, labels, NULL AS timestamp FROM ({sql['cooccurrence_nodes']})",
        f"SELECT curie, name, labels, NULL AS timestamp FROM ({sql['mesh_hierarchy_nodes']})",
        f"SELECT curie, name, labels, NULL AS timestamp FROM ({sql['indicator_nodes_health']})",
        f"SELECT curie, name, labels, NULL AS timestamp FROM ({_dev_nodes_sql})",
        f"SELECT curie, name, labels, NULL AS timestamp FROM ({sql['geoname_nodes']})",
    ]
    all_nodes = " UNION ALL ".join(node_parts)
    sql["canonical_nodes"] = f"""
WITH all_nodes AS ({all_nodes}),
merged AS (
  SELECT curie, min(name) AS name, max(timestamp) AS timestamp
  FROM all_nodes GROUP BY curie
),
lbls AS (
  SELECT curie, string_agg(DISTINCT part, ';' ORDER BY part) AS labels
  FROM (SELECT curie, unnest(string_split(labels, ';')) AS part
        FROM all_nodes)
  GROUP BY curie
)
SELECT m.curie, m.name, l.labels, m.timestamp
FROM merged m JOIN lbls l USING (curie)
"""

    edge_parts = [
        "SELECT start_id, rel_type, end_id, NULL::BIGINT AS \"count\", "
        f"NULL::VARCHAR AS years_data FROM ({sql['alert_mention_edges']})",
        "SELECT start_id, rel_type, end_id, NULL, NULL "
        f"FROM ({sql['alert_outbreak_edges']})",
        "SELECT start_id, rel_type, end_id, \"count\", NULL "
        f"FROM ({sql['cooccurrence_edges']})",
        "SELECT start_id, rel_type, end_id, NULL, NULL "
        f"FROM ({sql['mesh_hierarchy_edges']})",
        "SELECT start_id, rel_type, end_id, NULL, NULL "
        f"FROM ({sql['pathogen_disease_edges']})",
        "SELECT start_id, rel_type, end_id, NULL, NULL "
        f"FROM ({sql['disease_phenotype_edges']})",
        "SELECT start_id, rel_type, end_id, NULL, years_data "
        f"FROM ({_indicator_edges_sql('health')})",
        "SELECT start_id, rel_type, end_id, NULL, years_data "
        f"FROM ({_indicator_edges_sql('dev')})",
        "SELECT start_id, rel_type, end_id, NULL, NULL "
        f"FROM ({sql['geoname_edges']})",
    ]
    sql["canonical_edges"] = " UNION ALL ".join(edge_parts)

    sql["realism_scores"] = f"""
{_kg_prefix()},
filtered AS (
  SELECT DISTINCT archive, mesh_id FROM dment
  WHERE mtype IN ('disease', 'pathogen', 'geoloc')
    AND name NOT IN ({_excl_list()})
),
pairs AS (
  SELECT a.mesh_id AS mesh_a, b.mesh_id AS mesh_b, COUNT(*) AS "count"
  FROM filtered a JOIN filtered b
    ON a.archive = b.archive AND a.mesh_id < b.mesh_id
  GROUP BY a.mesh_id, b.mesh_id
),
total AS (SELECT COUNT(DISTINCT archive) AS n FROM filtered)
SELECT mesh_a, mesh_b, "count",
       round(ln("count") - ln(total.n), 6) AS score
FROM pairs, total
"""

    sql["dict_encode"] = """
SELECT DENSE_RANK() OVER (ORDER BY CAST(user_id AS VARCHAR)) - 1 AS pmid_idx,
       DENSE_RANK() OVER (ORDER BY event_type) - 1 AS mesh_idx,
       (event_id % 2) + 1 AS value
FROM events
"""

    sql["dedup_exact"] = """
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id
FROM documents GROUP BY md5(text)
"""

    sql["token_stats"] = r"""
SELECT doc_id,
       length(text) AS n_chars,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpeish_tokens,
       len(list_filter(string_split(text, ' '),
                       x -> x IN ('the', 'a'))) AS n_stopwords,
       len(regexp_extract_all(text, '[^\w\s]')) AS n_punct
FROM documents
"""

    sql["quality_scores"] = r"""
WITH s AS (
  SELECT doc_id,
         length(text) AS nc,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nt,
         len(list_filter(string_split(text, ' '),
                         x -> x IN ('the', 'a'))) AS ns
  FROM documents
)
SELECT doc_id, nt AS n_tokens,
       round(CASE WHEN nt = 0 THEN 0.0 ELSE ns / CAST(nt AS DOUBLE) END, 6)
         AS stop_ratio,
       round(CASE WHEN nt = 0 THEN 0.0
             ELSE (nc - (nt - 1)) / CAST(nt AS DOUBLE) END, 6)
         AS avg_token_len,
       round(least(nt / 100.0, 1.0) * 0.5
             + CASE WHEN nt = 0 THEN 0.0 ELSE ns / CAST(nt AS DOUBLE) END * 0.3
             + least((CASE WHEN nt = 0 THEN 0.0
                      ELSE (nc - (nt - 1)) / CAST(nt AS DOUBLE) END) / 8.0,
                     1.0) * 0.2, 6) AS quality
FROM s
"""

    # DPO-style preference pairs: i-th best vs i-th worst quality per
    # (lang, source) group — mirrors docops.py:preference_pairs
    sql["preference_pairs"] = r"""
WITH s AS (
  SELECT doc_id, lang, source,
         length(text) AS nc,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nt,
         len(list_filter(string_split(text, ' '),
                         x -> x IN ('the', 'a'))) AS ns
  FROM documents
), q AS (
  SELECT doc_id, lang, source,
         round(least(nt / 100.0, 1.0) * 0.5
               + CASE WHEN nt = 0 THEN 0.0
                      ELSE ns / CAST(nt AS DOUBLE) END * 0.3
               + least((CASE WHEN nt = 0 THEN 0.0
                        ELSE (nc - (nt - 1)) / CAST(nt AS DOUBLE) END)
                       / 8.0, 1.0) * 0.2, 6) AS quality
  FROM s
), r AS (
  SELECT doc_id, lang, source, quality,
         row_number() OVER (PARTITION BY lang, source
                            ORDER BY quality DESC, doc_id ASC) AS rt,
         row_number() OVER (PARTITION BY lang, source
                            ORDER BY quality ASC, doc_id DESC) AS rb,
         count(*) OVER (PARTITION BY lang, source) AS n
  FROM q
)
SELECT a.lang, a.source,
       a.doc_id AS chosen_id, b.doc_id AS rejected_id,
       a.quality AS chosen_quality, b.quality AS rejected_quality,
       round(a.quality - b.quality, 6) AS margin
FROM r a
JOIN r b ON a.lang = b.lang AND a.source = b.source AND b.rb = a.rt
WHERE a.rt <= a.n // 2 AND a.quality > b.quality
"""

    # class-balanced oversampling — mirrors
    # docops.py:oversample_balanced (replicate floor(max/n) per class)
    sql["oversample_balanced"] = """
WITH pool AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label
  FROM embeddings WHERE vec_id % (label + 1) = 0
),
c AS (SELECT label, COUNT(*) AS n FROM pool GROUP BY label),
f AS (
  SELECT label, CAST((SELECT MAX(n) FROM c) // n AS BIGINT) AS k
  FROM c
)
SELECT e.vec_id, e.label, unnest(range(f.k)) AS copy_idx
FROM pool e JOIN f ON f.label = e.label
"""

    # cross-source duplication matrix — mirrors
    # docops.py:source_dedup_matrix
    sql["source_dedup_matrix"] = """
WITH hs AS (
  SELECT DISTINCT md5(substr(text, 1, 32)) AS h, source
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       COUNT(*) AS n_shared_texts
FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2
"""

    # held-out unigram perplexity — mirrors
    # docops.py:heldout_perplexity (train = md5 gate >= 6553,
    # add-1 smoothing, OOV = 1/(N+V+1); ppl = exp of the ROUNDED
    # mean so exp amplifies no sub-6dp drift)
    sql["heldout_perplexity"] = r"""
WITH tr AS (
  SELECT text FROM documents
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
             AS INT) >= 6553
),
te AS (
  SELECT doc_id, text FROM documents
  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
             AS INT) < 6553
),
trtok AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
    AS w
  FROM tr
),
cnt AS (SELECT w, COUNT(*) AS c FROM trtok GROUP BY w),
scal AS (
  SELECT (SELECT COUNT(*) FROM trtok)
         + (SELECT COUNT(*) FROM cnt) + 1 AS denom
),
tetok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS w
  FROM te
),
sc AS (
  SELECT t.doc_id,
         -ln((COALESCE(c.c, 0) + 1)
             / CAST((SELECT denom FROM scal) AS DOUBLE)) AS nll
  FROM tetok t LEFT JOIN cnt c USING (w)
)
SELECT doc_id, COUNT(*) AS n_tokens,
       round(SUM(nll) / COUNT(*), 6) AS nll_mean,
       round(exp(round(SUM(nll) / COUNT(*), 6)), 6) AS ppl
FROM sc GROUP BY doc_id
"""

    # dataset-card summary row — mirrors docops.py:corpus_datacard
    sql["corpus_datacard"] = r"""
WITH s AS (
  SELECT doc_id, text,
         length(text) AS nc,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nt,
         len(list_filter(string_split(text, ' '),
                         x -> x IN ('the', 'a'))) AS ns
  FROM documents
), q AS (
  SELECT round(least(nt / 100.0, 1.0) * 0.5
               + CASE WHEN nt = 0 THEN 0.0
                      ELSE ns / CAST(nt AS DOUBLE) END * 0.3
               + least((CASE WHEN nt = 0 THEN 0.0
                        ELSE (nc - (nt - 1)) / CAST(nt AS DOUBLE) END)
                       / 8.0, 1.0) * 0.2, 6) AS quality
  FROM s
)
SELECT
  (SELECT COUNT(*) FROM documents) AS n_docs,
  (SELECT CAST(SUM(nt) AS BIGINT) FROM s) AS n_tokens,
  (SELECT COUNT(DISTINCT lang) FROM documents) AS n_langs,
  (SELECT COUNT(DISTINCT source) FROM documents) AS n_sources,
  round(1.0 - (SELECT COUNT(DISTINCT md5(text)) FROM documents)
            * 1.0 / (SELECT COUNT(*) FROM documents), 6) AS dup_rate,
  (SELECT round(SUM(quality) / COUNT(*), 6) FROM q) AS mean_quality
"""

    # curriculum ordering — mirrors docops.py:curriculum_rank
    sql["curriculum_rank"] = r"""
WITH s AS (
  SELECT doc_id,
         length(text) AS nc,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS nt,
         len(list_filter(string_split(text, ' '),
                         x -> x IN ('the', 'a'))) AS ns
  FROM documents
), q AS (
  SELECT doc_id,
         round(least(nt / 100.0, 1.0) * 0.5
               + CASE WHEN nt = 0 THEN 0.0
                      ELSE ns / CAST(nt AS DOUBLE) END * 0.3
               + least((CASE WHEN nt = 0 THEN 0.0
                        ELSE (nc - (nt - 1)) / CAST(nt AS DOUBLE) END)
                       / 8.0, 1.0) * 0.2, 6) AS quality
  FROM s
)
SELECT doc_id, quality,
       row_number() OVER (ORDER BY quality DESC, doc_id ASC)
         AS "rank",
       (row_number() OVER (ORDER BY quality DESC, doc_id ASC) - 1)
         // 64 AS shard
FROM q
"""

    # sliding-window repeated-span report — mirrors
    # docops.py:repeated_span_report (8-token windows at every
    # offset, corpus-relative df cut, merged coverage islands)
    sql["repeated_span_report"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
win AS (
  SELECT doc_id, CAST(t.p AS BIGINT) AS p,
         array_to_string(ws[CAST(t.p AS INT):CAST(t.p + 7 AS INT)],
                         ' ') AS w8
  FROM toks, LATERAL unnest(range(1, len(ws) - 6)) AS t(p)
  WHERE len(ws) >= 8
),
hot AS (
  SELECT w8 FROM win GROUP BY w8
  HAVING COUNT(DISTINCT doc_id) >= 2
),
cov AS (
  SELECT DISTINCT f.doc_id, f.p + z.o AS pos
  FROM (SELECT DISTINCT doc_id, p FROM win JOIN hot USING (w8)) f,
       LATERAL unnest(range(0, 8)) AS z(o)
),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id
                                  ORDER BY pos) AS grp
  FROM cov
)
SELECT doc_id, MIN(pos) AS span_start, MAX(pos) AS span_end,
       MAX(pos) - MIN(pos) + 1 AS span_len
FROM isl GROUP BY doc_id, grp
"""

    # mirrors pipelines/docops.py:diversified_topk (k=10, quota 2)
    sql["diversified_topk"] = f"""
WITH q AS (
  SELECT qs.doc_id, d.lang, qs.quality,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY qs.quality DESC, qs.doc_id) AS rn
  FROM ({sql["quality_scores"]}) qs
  JOIN documents d ON d.doc_id = qs.doc_id
)
SELECT doc_id, lang, quality,
       row_number() OVER (ORDER BY quality DESC, doc_id) AS rank
FROM q WHERE rn <= 2
ORDER BY quality DESC, doc_id LIMIT 10
"""

    sql["readability_scores"] = r"""
WITH s AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+')) AS n_words,
         len(regexp_extract_all(text, '[.!?]+')) AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words = 0 THEN 0.0
            ELSE round(206.835
                       - 1.015 * (n_words
                                  / CAST(greatest(n_sentences, 1) AS DOUBLE))
                       - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)), 6)
       END AS flesch
FROM s
"""

    # ---- serving queries over the composed canonical tables ---------
    _q_curies = []
    for m, _n, t, _p in lex.ONTOLOGY:
        if t in ("disease", "pathogen", "geoloc"):
            _q_curies.append(f"MESH:{m}")
        if len(_q_curies) == 12:
            break
    _q_list = ", ".join(f"'{c}'" for c in _q_curies)

    sql["direct_relations"] = f"""
SELECT * FROM ({sql["canonical_edges"]})
WHERE start_id IN ({_q_list}) AND end_id IN ({_q_list})
"""

    sql["comention_alerts"] = f"""
WITH edges AS ({sql["alert_mention_edges"]}),
grouped AS (
  SELECT start_id AS alert_id,
         count(DISTINCT end_id) AS n_entities,
         string_agg(DISTINCT end_id, ';' ORDER BY end_id) AS entities
  FROM edges WHERE end_id IN ({_q_list})
  GROUP BY start_id
  HAVING count(DISTINCT end_id) >= 2
)
SELECT alert_id, n_entities, entities FROM grouped
ORDER BY n_entities DESC, alert_id LIMIT 500
"""

    # /v1/text_relations components: the annotation curie set is a
    # deterministic function of the fixed demo text (grounder over the
    # fixture lexicon), so it is computed here and inlined.
    from outbreak_kg_ray.pipelines.serving import text_relations_curies

    _tr_list = ", ".join(f"'{c}'" for c in text_relations_curies())

    sql["text_relations_direct"] = f"""
SELECT * FROM ({sql["canonical_edges"]})
WHERE start_id IN ({_tr_list}) AND end_id IN ({_tr_list})
"""

    sql["text_relations_alerts"] = f"""
WITH edges AS ({sql["alert_mention_edges"]}),
grouped AS (
  SELECT start_id AS alert_id,
         count(DISTINCT end_id) AS n_entities,
         string_agg(DISTINCT end_id, ';' ORDER BY end_id) AS entities
  FROM edges WHERE end_id IN ({_tr_list})
  GROUP BY start_id
  HAVING count(DISTINCT end_id) >= 2
)
SELECT alert_id, n_entities, entities FROM grouped
ORDER BY n_entities DESC, alert_id LIMIT 500
"""

    sql["isa_closure"] = f"""
WITH RECURSIVE isa(s, e) AS (
  SELECT start_id, end_id FROM ({sql["mesh_hierarchy_edges"]})
  UNION ALL
  SELECT start_id, end_id FROM ({sql["geoname_edges"]})
),
closure(start_id, end_id, depth) AS (
  SELECT s, e, 1 FROM isa
  UNION ALL
  SELECT c.start_id, i.e, c.depth + 1
  FROM closure c JOIN isa i ON c.end_id = i.s
)
SELECT start_id, 'isa_closure' AS rel_type, end_id, depth FROM closure
"""

    sql["alerts_by_facet"] = f"""
WITH RECURSIVE isa(s, e) AS (
  SELECT start_id, end_id FROM ({sql["mesh_hierarchy_edges"]})
  UNION ALL
  SELECT start_id, end_id FROM ({sql["geoname_edges"]})
),
closure(s, e) AS (
  SELECT s, e FROM isa
  UNION ALL
  SELECT c.s, i.e FROM closure c JOIN isa i ON c.e = i.s
),
ddis(c) AS (
  SELECT 'MESH:D007251'
  UNION SELECT s FROM closure WHERE e = 'MESH:D007251'
),
dgeo(c) AS (
  SELECT 'MESH:D001104'
  UNION SELECT s FROM closure WHERE e = 'MESH:D001104'
),
ments AS (
  {_kg_prefix()}
  SELECT DISTINCT 'promed:' || archive AS alert_id,
         'MESH:' || mesh_id AS curie, mtype
  FROM dment WHERE name NOT IN ({_excl_list()})
),
alerts AS ({sql["alert_nodes"]})
SELECT d.alert_id, a.timestamp, d.curie AS disease_curie,
       g.curie AS geolocation_curie
FROM (SELECT alert_id, curie FROM ments
      WHERE mtype = 'disease' AND curie IN (SELECT c FROM ddis)) d
JOIN (SELECT alert_id, curie FROM ments
      WHERE mtype = 'geoloc' AND curie IN (SELECT c FROM dgeo)) g
  USING (alert_id)
JOIN alerts a ON a.curie = d.alert_id
"""

    sql["alerts_by_symptom"] = f"""
WITH RECURSIVE rel(s, e) AS (
  SELECT start_id, end_id FROM ({sql["mesh_hierarchy_edges"]})
  UNION ALL
  SELECT start_id, end_id FROM ({sql["geoname_edges"]})
  UNION ALL
  SELECT start_id, end_id FROM ({sql["disease_phenotype_edges"]})
),
closure(s, e) AS (
  SELECT s, e FROM rel
  UNION ALL
  SELECT c.s, r.e FROM closure c JOIN rel r ON c.e = r.s
),
dsym(c) AS (
  SELECT 'MESH:D003371'
  UNION SELECT s FROM closure WHERE e = 'MESH:D003371'
),
ments AS (
  {_kg_prefix()}
  SELECT DISTINCT 'promed:' || archive AS alert_id,
         'MESH:' || mesh_id AS curie, mtype
  FROM dment WHERE name NOT IN ({_excl_list()})
),
alerts AS ({sql["alert_nodes"]})
SELECT s.alert_id, a.timestamp, s.curie AS symptom_curie
FROM (SELECT alert_id, curie FROM ments
      WHERE mtype = 'disease' AND curie IN (SELECT c FROM dsym)) s
JOIN alerts a ON a.curie = s.alert_id
"""

    sql["autocomplete_terms"] = f"""
WITH nodes AS ({sql["canonical_nodes"]}),
ranked AS (
  SELECT lower(name) AS base, curie, labels,
         row_number() OVER (PARTITION BY lower(name) ORDER BY curie) - 1
           AS rk
  FROM nodes
)
SELECT CASE WHEN rk = 0 THEN base ELSE base || '_' || rk END AS key,
       curie, labels
FROM ranked
"""

    sql["dedup_pages"] = f"""
SELECT 'https://promed.example.org/post/' ||
         printf('%08d.%d', 20200000 + doc_id % 10000, 1000000 + doc_id)
         AS url,
       TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE
         AS warc_ts
FROM documents
"""

    sql["timex_contexts"] = f"""
SELECT printf('%08d.%d', 20200000 + doc_id % 10000, 1000000 + doc_id)
         AS doc_id,
       {_TS_EXPR} AS text,
       {_TS_EXPR} AS interval_start,
       {_TS_EXPR} AS interval_end
FROM documents
"""

    sql["geoloc_contexts"] = f"""
{_kg_prefix()}
SELECT archive AS doc_id, name AS text, mesh_id AS geo_id
FROM ment WHERE mtype = 'geoloc'
"""

    sql["geoloc_stats"] = f"""
{_kg_prefix()}
SELECT name AS text, mesh_id AS geo_id, COUNT(*) AS "count"
FROM ment WHERE mtype = 'geoloc' GROUP BY name, mesh_id
"""

    sql["timex_stats"] = f"""
SELECT {_TS_EXPR} AS text, {_TS_EXPR} AS interval_start,
       COUNT(*) AS "count"
FROM documents GROUP BY 1, 2
"""

    # fake-container decode recomputed analytically (payload formulas
    # in outbreak_kg_ray/stages/multimodal.py — byte parsing on the
    # Ray side, closed-form on the oracle side)
    sql["image_features"] = """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 48 AS w, 16 + (doc_id * 7) % 48 AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h, (doc_id * 131 + r.range * 29) % 256 AS pv, r.range AS i
  FROM dims CROSS JOIN range(0, 4096) r
  WHERE r.range < w * h
)
SELECT doc_id * 2 AS media_id, w AS width, h AS height,
       8 + w * h AS n_bytes,
       CAST((doc_id * 131) % 256 AS DOUBLE) AS f_first,
       CAST((doc_id * 131 + (w * h - 1) * 29) % 256 AS DOUBLE) AS f_last,
       round(avg(pv), 6) AS f_mean
FROM px GROUP BY doc_id, w, h
"""

    # analytic oracle for the FVID container (stride-2 frame sample):
    # pixel[f][i] = (doc*17 + f*53 + i*29) % 256 over sampled frames
    sql["video_frame_samples"] = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id * 3) % 8 AS h,
         4 + doc_id % 12 AS nf
  FROM documents
),
px AS (
  SELECT doc_id, w, h, nf,
         (doc_id * 17 + f.range * 2 * 53 + i.range * 29) % 256 AS pv
  FROM dims CROSS JOIN range(0, 8) f CROSS JOIN range(0, 225) i
  WHERE f.range * 2 < nf AND i.range < w * h
)
SELECT doc_id AS media_id, w AS width, h AS height, nf AS n_frames,
       CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
       round(avg(pv), 6) AS sampled_mean
FROM px GROUP BY doc_id, w, h, nf
"""

    # analytic oracle for the 8x8 nearest-neighbor thumbnail:
    # src index = (r*h//8)*w + (c*w//8), pv = (doc*131 + idx*29) % 256
    sql["image_thumbnails"] = """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 48 AS w, 16 + (doc_id * 7) % 48 AS h
  FROM documents
),
cells AS (
  SELECT doc_id,
         (doc_id * 131 +
          (((r.range // 8) * h // 8) * w + ((r.range % 8) * w // 8)) * 29
         ) % 256 AS pv
  FROM dims CROSS JOIN range(0, 64) r
)
SELECT doc_id * 2 AS media_id,
       CAST(8 AS BIGINT) AS thumb_w, CAST(8 AS BIGINT) AS thumb_h,
       round(avg(pv), 6) AS thumb_mean,
       CAST((doc_id * 131) % 256 AS DOUBLE) AS top_left
FROM cells GROUP BY doc_id
"""

    sql["audio_frames"] = """
WITH params AS (
  SELECT doc_id, 8000 + (doc_id % 3) * 4000 AS sr,
         256 + (doc_id * 13) % 768 AS n
  FROM documents
),
fr AS (
  SELECT doc_id, sr, n, (doc_id * 37 + r.range * 4 * 11) % 256 AS fv
  FROM params CROSS JOIN range(0, 256) r
  WHERE r.range < (n + 3) // 4
)
SELECT doc_id * 2 + 1 AS media_id, sr AS sample_rate,
       (n + 3) // 4 AS n_frames, round(avg(fv), 6) AS frame_mean
FROM fr GROUP BY doc_id, sr, n
"""

    # analytic oracle for the REAL-PNG decode path: the payload is a
    # spec-valid PNG but the pixels follow the same closed-form
    # formula as FIMG, so the decoded statistics are computable in SQL
    # deterministic shift+invert augmentation over the REAL WAV
    # decode path — mirrors stages/multimodal.py:wav_audio_augments
    # (sample16[i] = ((doc*37 + i*11) % 65536) - 32768)
    sql["wav_audio_augments"] = """
WITH p AS (
  SELECT doc_id, 8000 + (doc_id % 3) * 4000 AS sr,
         256 + (doc_id * 13) % 768 AS n,
         (doc_id * 19) % (256 + (doc_id * 13) % 768) AS shift,
         doc_id % 2 = 1 AS inverted,
         CASE WHEN doc_id % 2 = 1 THEN -1 ELSE 1 END AS sgn
  FROM documents
),
m AS (
  SELECT p.doc_id,
         round(avg(((p.doc_id * 37 + r.range * 11) % 65536) - 32768)
               * ANY_VALUE(p.sgn), 6) AS a_mean
  FROM p CROSS JOIN range(0, 1024) r
  WHERE r.range < p.n
  GROUP BY p.doc_id
)
SELECT p.doc_id AS media_id, p.sr AS sample_rate, p.n AS n_samples,
       p.shift, p.inverted,
       CAST(p.sgn * (((p.doc_id * 37 + p.shift * 11) % 65536)
                     - 32768) AS DOUBLE) AS a_first,
       CAST(p.sgn * (((p.doc_id * 37
                       + ((p.shift + p.n - 1) % p.n) * 11) % 65536)
                     - 32768) AS DOUBLE) AS a_last,
       m.a_mean
FROM p JOIN m USING (doc_id)
"""

    # deterministic crop+flip augmentation over the REAL PNG decode
    # path — mirrors stages/multimodal.py:png_image_augments
    # (analytic pixel formula (doc*131 + (y*w+x)*29) % 256)
    sql["png_image_augments"] = """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 48 AS w, 16 + (doc_id * 7) % 48 AS h
  FROM documents
),
aug AS (
  SELECT doc_id, w, h,
         GREATEST(8, w // 2) AS cw, GREATEST(8, h // 2) AS ch,
         (doc_id * 13) % (w - GREATEST(8, w // 2) + 1) AS x0,
         (doc_id * 17) % (h - GREATEST(8, h // 2) + 1) AS y0,
         doc_id % 2 = 1 AS flipped
  FROM dims
),
cells AS (
  SELECT a.doc_id, a.w, a.y0 + r.range AS yy, a.x0 + c.range AS xx
  FROM aug a
  CROSS JOIN range(0, 64) r CROSS JOIN range(0, 64) c
  WHERE r.range < a.ch AND c.range < a.cw
),
m AS (
  SELECT doc_id,
         round(avg((doc_id * 131 + (yy * w + xx) * 29) % 256), 6)
           AS c_mean
  FROM cells GROUP BY doc_id
)
SELECT a.doc_id AS media_id, a.x0, a.y0,
       a.cw AS crop_w, a.ch AS crop_h, a.flipped,
       CAST((a.doc_id * 131 + (a.y0 * a.w
             + CASE WHEN a.flipped THEN a.x0 + a.cw - 1
                    ELSE a.x0 END) * 29) % 256 AS DOUBLE) AS c_first,
       CAST((a.doc_id * 131 + ((a.y0 + a.ch - 1) * a.w
             + CASE WHEN a.flipped THEN a.x0
                    ELSE a.x0 + a.cw - 1 END) * 29) % 256 AS DOUBLE)
         AS c_last,
       m.c_mean
FROM aug a JOIN m USING (doc_id)
"""

    sql["png_image_features"] = """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 48 AS w, 16 + (doc_id * 7) % 48 AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h, (doc_id * 131 + r.range * 29) % 256 AS pv
  FROM dims CROSS JOIN range(0, 4096) r
  WHERE r.range < w * h
)
SELECT doc_id AS media_id, w AS width, h AS height,
       CAST((doc_id * 131) % 256 AS DOUBLE) AS f_first,
       CAST((doc_id * 131 + (w * h - 1) * 29) % 256 AS DOUBLE) AS f_last,
       round(avg(pv), 6) AS f_mean
FROM px GROUP BY doc_id, w, h
"""

    # analytic oracle for the REAL-WAV decode path (PCM-16, stride 4):
    # sample16[i] = ((doc*37 + i*11) % 65536) - 32768
    # real-PNG thumbnail path: same analytic cell formula as the
    # FIMG thumbnails, media_id = doc_id
    sql["png_thumbnails"] = """
WITH dims AS (
  SELECT doc_id, 16 + doc_id % 48 AS w, 16 + (doc_id * 7) % 48 AS h
  FROM documents
),
cells AS (
  SELECT doc_id,
         (doc_id * 131 +
          (((r.range // 8) * h // 8) * w + ((r.range % 8) * w // 8)) * 29
         ) % 256 AS pv
  FROM dims CROSS JOIN range(0, 64) r
)
SELECT doc_id AS media_id,
       CAST(8 AS BIGINT) AS thumb_w, CAST(8 AS BIGINT) AS thumb_h,
       round(avg(pv), 6) AS thumb_mean,
       CAST((doc_id * 131) % 256 AS DOUBLE) AS top_left
FROM cells GROUP BY doc_id
"""

    sql["wav_audio_frames"] = """
WITH params AS (
  SELECT doc_id, 8000 + (doc_id % 3) * 4000 AS sr,
         256 + (doc_id * 13) % 768 AS n
  FROM documents
),
fr AS (
  SELECT doc_id, sr, n,
         ((doc_id * 37 + r.range * 4 * 11) % 65536) - 32768 AS fv
  FROM params CROSS JOIN range(0, 256) r
  WHERE r.range < (n + 3) // 4
)
SELECT doc_id AS media_id, sr AS sample_rate,
       (n + 3) // 4 AS n_frames, round(avg(fv), 6) AS frame_mean
FROM fr GROUP BY doc_id, sr, n
"""

    # mirrors pipelines/docops.py:distinctive_terms_per_lang
    sql["distinctive_terms_per_lang"] = """
WITH lw AS (
  SELECT lang, w, count(*) AS c FROM (
    SELECT lang,
           unnest(list_filter(string_split(trim(text), ' '),
                              x -> x <> '')) AS w
    FROM documents
  ) GROUP BY 1, 2
),
tw AS (SELECT w, sum(c) AS cw FROM lw GROUP BY w),
tl AS (SELECT lang, sum(c) AS cl FROM lw GROUP BY lang),
n AS (SELECT sum(c) AS n FROM lw),
scored AS (
  SELECT lw.lang, lw.w AS token,
         round(ln((lw.c + 0.5) / (tl.cl - lw.c + 0.5))
               - ln(((tw.cw - lw.c) + 0.5)
                    / ((n.n - tl.cl) - (tw.cw - lw.c) + 0.5)),
               6) AS log_odds
  FROM lw JOIN tw ON tw.w = lw.w JOIN tl ON tl.lang = lw.lang, n
),
ranked AS (
  SELECT lang, token, log_odds,
         row_number() OVER (PARTITION BY lang
                            ORDER BY log_odds DESC, token) AS rank
  FROM scored
)
SELECT lang, token, log_odds, rank FROM ranked WHERE rank <= 3
"""

    # mirrors pipelines/docops.py:boolean_and_search
    sql["boolean_and_search"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS ws
  FROM documents
)
SELECT doc_id, CAST(3 AS BIGINT) AS n_terms_hit FROM toks
WHERE list_contains(ws, 'spark') AND list_contains(ws, 'join')
  AND list_contains(ws, 'window')
"""

    # mirrors pipelines/docops.py:length_lorenz_deciles (ntile(10))
    sql["length_lorenz_deciles"] = """
WITH r AS (
  SELECT n_chars, ntile(10) OVER (ORDER BY n_chars) AS decile
  FROM documents
)
SELECT decile, count(*) AS n_docs,
       round(sum(n_chars)
             / (SELECT CAST(sum(n_chars) AS DOUBLE) FROM documents),
             6) AS chars_share
FROM r GROUP BY decile
"""

    sql["lang_id"] = r"""
WITH profiles(cand, stops) AS (VALUES
  ('de', ['der', 'die', 'und', 'das', 'ein']),
  ('en', ['the', 'and', 'of', 'to', 'a']),
  ('es', ['el', 'la', 'los', 'y', 'de']),
  ('fr', ['le', 'la', 'et', 'les', 'de'])
),
base AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> x != '') AS toks
  FROM documents
),
scored AS (
  SELECT b.doc_id, b.lang, p.cand,
         len(list_filter(b.toks, x -> list_contains(p.stops, x)))
           / CAST(greatest(1, len(b.toks)) AS DOUBLE) AS score
  FROM base b CROSS JOIN profiles p
),
best AS (
  SELECT doc_id, lang, cand, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, cand ASC) AS rn
  FROM scored
)
SELECT doc_id, lang,
       CASE WHEN score > 0 THEN cand ELSE 'unknown' END AS pred_lang,
       round(score, 6) AS confidence
FROM best WHERE rn = 1
"""

    sql["ann_topk"] = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings ORDER BY vec_id LIMIT 8
),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS raw,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe)
                    DESC, e.vec_id
         ) AS rn
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, round(raw, 6) AS score FROM scored WHERE rn <= 10
"""

    # contrastive hard-negative mining: ann_topk's 8-query set, but
    # only OTHER-label rows compete (stages/simsearch.hard_negatives)
    sql["hard_negatives_topk"] = """
WITH q AS (
  SELECT vec_id AS query_id, label AS qlabel,
         CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings ORDER BY vec_id LIMIT 8
),
scored AS (
  SELECT q.query_id, e.vec_id, CAST(e.label AS BIGINT) AS label,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS raw,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe)
                    DESC, e.vec_id
         ) AS rn
  FROM embeddings e CROSS JOIN q
  WHERE e.label <> q.qlabel
)
SELECT query_id, vec_id, label, round(raw, 6) AS score
FROM scored WHERE rn <= 10
"""

    # cosine radius search for the same 8-query set (threshold 0.3,
    # self-matches included).  Mirrors docops.py:ann_range_search
    sql["ann_range_search"] = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings ORDER BY vec_id LIMIT 8
)
SELECT q.query_id, e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    q.qe), 6) AS score
FROM embeddings e CROSS JOIN q
WHERE list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe)
      >= 0.3
"""

    sql["embedding_near_dups"] = """
SELECT e.vec_id AS a, s.vec_id AS b,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(s.embedding AS DOUBLE[])), 6) AS score
FROM embeddings e
JOIN embeddings s
  ON s.label = 0 AND e.vec_id < s.vec_id
WHERE list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                             CAST(s.embedding AS DOUBLE[])) >= 0.35
"""

    sql["near_dup_keep"] = f"""
WITH RECURSIVE nd_pairs AS ({sql["embedding_near_dups"]}),
edges(s, d) AS (
  SELECT a, b FROM nd_pairs UNION SELECT b, a FROM nd_pairs
),
reach(n, m) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s
)
SELECT n AS vec_id, min(m) AS keep_id FROM reach GROUP BY n
"""

    sql["quality_filter_sample"] = f"""
SELECT doc_id, quality FROM ({sql["quality_scores"]})
WHERE quality >= 0.5
  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
"""

    # word-4-gram overlap vs the deterministic benchmark subset
    # (doc_id % 50 == 0); mirrors pipelines/docops.py:decontaminate
    sql["decontaminate"] = """
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
), grams AS (
  SELECT doc_id, unnest(list_transform(
      range(1, len(ws) - 2),
      i -> array_to_string(list_slice(ws, i, i + 3), ' '))) AS g
  FROM toks WHERE len(ws) >= 4
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0
), overlap AS (
  SELECT g2.doc_id, count(DISTINCT g2.g) AS n_overlap_grams
  FROM (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 50 <> 0) g2
  JOIN bench USING (g)
  GROUP BY g2.doc_id
)
SELECT d.doc_id,
       coalesce(o.n_overlap_grams, 0) AS n_overlap_grams,
       coalesce(o.n_overlap_grams, 0) > 0 AS contaminated
FROM documents d LEFT JOIN overlap o USING (doc_id)
WHERE d.doc_id % 50 <> 0
"""

    # word-3-grams with document frequency >= 5 are "boilerplate";
    # per-doc fraction of distinct grams that are hot.  Mirrors
    # pipelines/docops.py:boilerplate_ratio
    sql["boilerplate_ratio"] = """
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
), grams AS (
  SELECT DISTINCT doc_id, unnest(list_transform(
      range(1, len(ws) - 1),
      i -> array_to_string(list_slice(ws, i, i + 2), ' '))) AS g
  FROM toks WHERE len(ws) >= 3
), df AS (
  SELECT g, count(*) AS df FROM grams GROUP BY g
), hot AS (
  -- corpus-relative threshold: max(5, ceil(0.01 * n_docs)) —
  -- mirrors docops.relative_min_df(floor=5, frac=0.01)
  SELECT g FROM df
  WHERE df >= greatest(5, ceil(0.01 * (SELECT count(*) FROM documents)))
)
SELECT gr.doc_id, count(*) AS n_grams,
       count(h.g) AS n_hot_grams,
       round(count(h.g) / CAST(count(*) AS DOUBLE), 6)
         AS boilerplate_ratio
FROM grams gr LEFT JOIN hot h USING (g)
GROUP BY gr.doc_id
"""

    sql["parts_with_large_orders"] = """
SELECT p_partkey, p_name FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
"""

    # mirrors pipelines/docops.py:spelling_variants — the oracle is
    # the brute-force levenshtein cross join over the same top-V set
    # mirrors pipelines/docops.py:association_rules (min_support 0.05)
    # mirrors pipelines/docops.py:weighted_sample — A-ES key with
    # the same md5-derived deterministic uniform
    sql["weighted_sample"] = """
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
             ::UBIGINT) / power(16, 12)) / n_chars AS pri
  FROM documents WHERE n_chars > 0
  UNION ALL
  SELECT doc_id, n_chars, '-infinity'::DOUBLE AS pri
  FROM documents WHERE n_chars <= 0
)
ORDER BY pri DESC, doc_id LIMIT 100
"""

    sql["association_rules"] = """
WITH dt AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(string_split(trim(text), ' '),
                            x -> x <> '')) AS w
  FROM documents
),
n AS (SELECT count(*) AS n FROM documents),
df AS (SELECT w, count(*) AS c FROM dt GROUP BY w),
freq AS (SELECT w, c FROM df, n WHERE c >= ceil(0.05 * n.n)),
pairs AS (
  SELECT a.w AS wa, b.w AS wb, count(*) AS pc
  FROM dt a
  JOIN dt b ON a.doc_id = b.doc_id AND a.w < b.w
  JOIN freq fa ON fa.w = a.w
  JOIN freq fb ON fb.w = b.w
  GROUP BY 1, 2
),
fp AS (SELECT wa, wb, pc FROM pairs, n WHERE pc >= ceil(0.05 * n.n)),
dirs AS (
  SELECT wa AS ant, wb AS cons, pc FROM fp
  UNION ALL
  SELECT wb AS ant, wa AS cons, pc FROM fp
)
SELECT d.ant, d.cons,
       round(d.pc / n.n, 6) AS support,
       round(d.pc / fa.c, 6) AS confidence,
       round((d.pc * n.n) / (fa.c * fc.c), 6) AS lift
FROM dirs d, n
JOIN freq fa ON fa.w = d.ant
JOIN freq fc ON fc.w = d.cons
"""

    # mirrors pipelines/relational.py:fk_integrity_audit
    parts_sql = []
    for name, child, fk, parent, pk in (
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ):
        parts_sql.append(f"""
SELECT '{name}' AS relation,
       (SELECT count(*) FROM {child}) AS n_rows,
       (SELECT count(*) FROM {child} c
        WHERE NOT EXISTS (
            SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}
        )) AS n_orphans""")
    sql["fk_integrity_audit"] = " UNION ALL ".join(parts_sql)

    # mirrors pipelines/relational.py:revenue_pareto_deciles —
    # exact int64-cents revenue so ntile boundaries can't float-drift
    sql["revenue_pareto_deciles"] = """
WITH pc_ AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
r AS (
  SELECT cents,
         ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
  FROM pc_
)
SELECT decile, count(*) AS n_customers,
       round(sum(cents)
             / (SELECT CAST(sum(cents) AS DOUBLE) FROM pc_),
             6) AS revenue_share
FROM r GROUP BY 1
"""

    # mirrors pipelines/relational.py:events_seasonality
    sql["events_seasonality"] = """
SELECT CAST(isodow(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hour,
       count(*) AS n_events,
       round(sum(value) / count(*), 6) AS mean_value
FROM events GROUP BY 1, 2
"""

    # mirrors pipelines/relational.py:ship_lag_quantiles
    sql["ship_lag_quantiles"] = """
WITH lag AS (
  SELECT o.o_orderpriority,
         datediff('day', o.o_orderdate, l.l_shipdate) AS d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       round(quantile_cont(d, 0.5), 6) AS q50,
       round(quantile_cont(d, 0.9), 6) AS q90,
       round(quantile_cont(d, 0.99), 6) AS q99
FROM lag GROUP BY 1
"""

    # mirrors pipelines/relational.py:audience_overlap
    sql["audience_overlap"] = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
aud AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
pairs2 AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT b.type_a, b.type_b, b.n_both,
       round(b.n_both
             / CAST(na.n + nb.n - b.n_both AS DOUBLE), 6) AS jaccard
FROM pairs2 b
JOIN aud na ON na.event_type = b.type_a
JOIN aud nb ON nb.event_type = b.type_b
"""

    # mirrors pipelines/relational.py:latest_event_per_user
    sql["latest_event_per_user"] = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""

    # mirrors pipelines/relational.py:zscore_features (stddev_pop)
    sql["zscore_features"] = """
WITH st AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sd
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       round(CASE WHEN st.sd > 0 THEN (e.value - st.mu) / st.sd
                  ELSE 0 END, 6) AS zscore
FROM events e JOIN st ON st.event_type = e.event_type
"""

    # mirrors pipelines/temporal.py:open_orders_snapshot
    sql["open_orders_snapshot"] = """
WITH fs AS (
  SELECT l_orderkey, min(l_shipdate) AS first_ship
  FROM lineitem GROUP BY 1
),
rng AS (
  SELECT date_trunc('month', min(o_orderdate)) AS lo,
         date_trunc('month', max(o_orderdate)) AS hi
  FROM orders
),
probes AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS snapshot
  FROM rng
)
SELECT p.snapshot, count(*) FILTER (
         o.o_orderdate <= p.snapshot
         AND (f.first_ship IS NULL OR f.first_ship > p.snapshot)
       ) AS n_open
FROM probes p
CROSS JOIN orders o
LEFT JOIN fs f ON f.l_orderkey = o.o_orderkey
GROUP BY 1
"""

    # mirrors pipelines/temporal.py:errors_after_purchase (24h window)
    sql["errors_after_purchase"] = """
SELECT p.event_id, p.user_id, p.ts,
       CAST(count(e.event_id) AS BIGINT) AS n_errors_24h
FROM events p LEFT JOIN events e
  ON e.user_id = p.user_id AND e.event_type = 'error'
 AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 24 HOUR
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id, p.ts
"""

    # mirrors stages/simsearch.py:mutual_nn_pairs — exact mutual-NN
    # (rank on RAW cosine, tie -> smallest vec_id, like ann_topk)
    sql["mutual_nn_pairs"] = """
WITH scored AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])) AS raw,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[]))
                    DESC, b.vec_id
         ) AS rn
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
nn AS (SELECT va, vb, raw FROM scored WHERE rn = 1)
SELECT x.va AS a, x.vb AS b, round(x.raw, 6) AS score
FROM nn x JOIN nn y ON x.vb = y.va AND y.vb = x.va
WHERE x.va < x.vb
"""

    # mirrors pipelines/relational.py:daily_value_drift (per-type
    # daily median + day-over-day drift of the 6dp-rounded medians)
    sql["daily_value_drift"] = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         round(quantile_cont(value, 0.5), 6) AS q50
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, q50,
       round(abs(q50 - lag(q50) OVER (PARTITION BY event_type
                                      ORDER BY day)), 6) AS drift
FROM daily
"""

    # mirrors pipelines/relational.py:join_skew_report (top-10 hot
    # keys per join column, ranked count DESC then key-string ASC)
    sql["join_skew_report"] = """
WITH o AS (
  SELECT 'orders.o_custkey' AS join_col, CAST(o_custkey AS VARCHAR) AS key,
         CAST(count(*) AS BIGINT) AS n_rows,
         round(count(*) / (SELECT count(*) FROM orders), 6) AS share,
         row_number() OVER (ORDER BY count(*) DESC,
                            CAST(o_custkey AS VARCHAR)) AS rn
  FROM orders GROUP BY o_custkey
), l AS (
  SELECT 'lineitem.l_orderkey', CAST(l_orderkey AS VARCHAR),
         CAST(count(*) AS BIGINT),
         round(count(*) / (SELECT count(*) FROM lineitem), 6),
         row_number() OVER (ORDER BY count(*) DESC,
                            CAST(l_orderkey AS VARCHAR))
  FROM lineitem GROUP BY l_orderkey
), e AS (
  SELECT 'events.user_id', CAST(user_id AS VARCHAR),
         CAST(count(*) AS BIGINT),
         round(count(*) / (SELECT count(*) FROM events), 6),
         row_number() OVER (ORDER BY count(*) DESC,
                            CAST(user_id AS VARCHAR))
  FROM events GROUP BY user_id
)
SELECT join_col, key, n_rows, share FROM (
  SELECT * FROM o UNION ALL SELECT * FROM l UNION ALL SELECT * FROM e
) WHERE rn <= 10
"""

    # mirrors pipelines/temporal.py:purchase_attribution (last touch
    # within 24h; ties -> smallest event_id; int64-cent exact sums)
    sql["purchase_attribution"] = """
WITH cand AS (
  SELECT p.event_id AS pid, e.event_type AS ctype,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY e.ts DESC, e.event_id) AS rn
  FROM events p JOIN events e
    ON e.user_id = p.user_id AND e.event_type <> 'purchase'
   AND e.ts < p.ts AND e.ts >= p.ts - INTERVAL 24 HOUR
  WHERE p.event_type = 'purchase'
),
best AS (SELECT pid, ctype FROM cand WHERE rn = 1),
allp AS (
  SELECT p.event_id, coalesce(b.ctype, '(direct)') AS event_type,
         CAST(round(p.value * 100) AS BIGINT) AS cents
  FROM events p LEFT JOIN best b ON b.pid = p.event_id
  WHERE p.event_type = 'purchase'
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_purchases,
       round(CAST(sum(cents) AS BIGINT) / 100.0, 2) AS attributed_value
FROM allp GROUP BY event_type
"""

    # mirrors pipelines/temporal.py:session_summaries (30-min gap)
    sql["session_summaries"] = """
WITH s AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sid AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS session_id
  FROM s
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       min(ts) AS t_start, max(ts) AS t_end,
       count(*) AS n_events,
       epoch(max(ts) - min(ts)) AS duration_s
FROM sid GROUP BY 1, 2
"""

    # mirrors pipelines/relational.py:events_value_trend — grouped
    # OLS from the same centered-epoch moments (t0 = 2024-01-01)
    sql["events_value_trend"] = """
SELECT event_type, count(*) AS n,
       round(regr_slope(value, epoch(ts) - 1704067200) * 1e6, 6)
         AS slope_e6,
       round(regr_intercept(value, epoch(ts) - 1704067200), 2)
         AS intercept
FROM events GROUP BY 1
"""

    # mirrors pipelines/relational.py:rolling_active_users
    sql["rolling_active_users"] = """
WITH hrs AS (SELECT DISTINCT date_trunc('hour', ts) AS h FROM events),
pairs AS (SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
          FROM events)
SELECT hrs.h AS hour, count(DISTINCT p.user_id) AS active_users
FROM hrs JOIN pairs p
  ON p.h <= hrs.h AND p.h > hrs.h - INTERVAL 3 HOUR
GROUP BY 1
"""

    sql["fuzzy_name_pairs"] = """
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM (SELECT DISTINCT c_name FROM customer) a
JOIN (SELECT DISTINCT c_name FROM customer) b
  ON a.c_name < b.c_name
WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
  AND levenshtein(a.c_name, b.c_name) = 1
"""

    # mirrors pipelines/docops.py:name_clusters — min-label closure
    # over the fuzzy_name_pairs edge set
    sql["name_clusters"] = f"""
WITH RECURSIVE fz AS ({sql["fuzzy_name_pairs"]}),
edges(s, d) AS (
  SELECT name_a, name_b FROM fz UNION SELECT name_b, name_a FROM fz
),
reach(n, m) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s
)
SELECT n AS name, min(m) AS cluster FROM reach GROUP BY n
"""


    sql["distinct_users_per_type"] = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""

    # mirrors pipelines/relational.py:events_value_percent_rank —
    # distinct-(type,value) grain of the PERCENT_RANK window
    sql["events_value_percent_rank"] = """
SELECT DISTINCT event_type, value,
       round(percent_rank() OVER (
           PARTITION BY event_type ORDER BY value), 6) AS pr
FROM events
"""

    sql["distinct_token_count"] = """
SELECT count(DISTINCT w) AS n_distinct_tokens
FROM (SELECT unnest(string_split(trim(text), ' ')) AS w
      FROM documents WHERE trim(text) <> '')
"""

    # TF-IDF shape with a pure-integer rank key (tf DESC, df ASC,
    # term ASC) — mirrors pipelines/docops.py:top_terms_per_doc
    sql["top_terms_per_doc"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
  FROM documents WHERE trim(text) <> ''
), tf AS (
  SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w
), df AS (
  SELECT w, count(DISTINCT doc_id) AS df FROM toks GROUP BY w
), ranked AS (
  SELECT tf.doc_id, tf.w, tf.tf, df.df,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, df.df ASC, tf.w ASC)
           AS rnk
  FROM tf JOIN df USING (w)
)
SELECT doc_id, rnk AS rank, w AS term, tf, df
FROM ranked WHERE rnk <= 3
"""

    # grouped vector aggregate; kmeans_clusters itself is rows-only
    # (float-order-sensitive iterative assignment has no stable
    # cross-engine oracle; invariants pinned in tests/test_kmeans.py)
    sql["label_centroids"] = """
SELECT label, i - 1 AS dim, round(avg(v), 6) AS mean_value
FROM (SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings)
GROUP BY label, i
"""

    # canonical text normalization rewrite (lower → collapse ws →
    # trim → NFC).  Mirrors pipelines/docops.py:normalize_text
    sql["normalize_text"] = r"""
SELECT doc_id,
       nfc_normalize(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
         AS norm_text
FROM documents
"""

    # token frequency spectrum (counts-of-counts / Zipf table).
    # Mirrors stages/sketch.py:token_freq_spectrum
    sql["token_freq_spectrum"] = """
WITH tf AS (
  SELECT w, count(*) AS freq
  FROM (SELECT unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS w
        FROM documents)
  GROUP BY w
)
SELECT freq, CAST(count(*) AS BIGINT) AS n_terms
FROM tf GROUP BY freq
"""

    # domain-level quality gate: drop whole sources whose 6-dp mean
    # quality is below the median source mean.  Mirrors
    # pipelines/docops.py:domain_quality_filter
    sql["domain_quality_filter"] = f"""
WITH q AS ({sql["quality_scores"]}),
d AS (SELECT doc_id, source FROM documents),
sm AS (
  SELECT source, round(avg(quality), 6) AS mq
  FROM q JOIN d USING (doc_id) GROUP BY source
), med AS (SELECT median(mq) AS m FROM sm)
SELECT d.doc_id, d.source, sm.mq AS source_mean_quality, q.quality
FROM d JOIN q USING (doc_id) JOIN sm USING (source), med
WHERE sm.mq >= med.m
"""

    # declared-mixture downsampling: per-source keep rate (md5 digit
    # % 4 → 25/50/75/100 %), per-doc md5-prefix Bernoulli.  Mirrors
    # pipelines/docops.py:mixture_downsample
    sql["mixture_downsample"] = """
WITH rates AS (
  SELECT source,
         (CAST('0x' || substr(md5(source), 1, 1) AS INT) % 4 + 1)
           / 4.0 AS rate
  FROM (SELECT DISTINCT source FROM documents)
)
SELECT d.doc_id, d.source, r.rate
FROM documents d JOIN rates r USING (source)
WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
           AS INT)
      < CAST(floor(r.rate * 65536) AS INT)
"""

    # phrase blocklist via Aho-Corasick: distinct corpus-derived
    # blocklist phrases (md5-gated bigrams) present per doc as raw
    # substrings.  Mirrors pipelines/docops.py:phrase_blocklist
    sql["phrase_blocklist"] = """
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
), pats AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(range(1, len(ws)),
                                 i -> ws[i] || ' ' || ws[i+1])) AS g
    FROM toks WHERE len(ws) >= 2)
  WHERE substr(md5(g), 1, 1) = '0'
), hits AS (
  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_blocked_phrases
  FROM documents d JOIN pats p ON position(p.g IN d.text) > 0
  GROUP BY d.doc_id
)
SELECT d.doc_id,
       coalesce(h.n_blocked_phrases, 0) AS n_blocked_phrases,
       coalesce(h.n_blocked_phrases, 0) > 0 AS blocked
FROM documents d LEFT JOIN hits h USING (doc_id)
"""

    # exact float quantiles of events.value (global-sort path; the
    # SQL anchor for the KLL sketch member, which is rows-only).
    # Mirrors stages/sketch.py:value_quantiles_exact
    sql["value_quantiles_exact"] = """
SELECT 0.5 AS p, round(quantile_cont(value, 0.5), 6)
         AS value_quantile FROM events
UNION ALL
SELECT 0.9, round(quantile_cont(value, 0.9), 6) FROM events
UNION ALL
SELECT 0.99, round(quantile_cont(value, 0.99), 6) FROM events
"""

    # per-doc character Shannon entropy (degenerate-text detector).
    # Mirrors pipelines/docops.py:char_entropy
    sql["char_entropy"] = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch
  FROM documents WHERE len(text) > 0
), cc AS (
  SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
  FROM chars GROUP BY doc_id, ch
), n AS (SELECT doc_id, sum(c) AS n FROM cc GROUP BY doc_id)
SELECT cc.doc_id,
       round(-sum((c / n.n) * ln(c / n.n)), 6) AS char_entropy
FROM cc JOIN n USING (doc_id) GROUP BY cc.doc_id
"""

    # adjacent-pair PMI collocations (count >= 5).  Mirrors
    # pipelines/docops.py:bigram_pmi
    sql["bigram_pmi"] = """
WITH toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
), uni AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w
), tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni),
bigs AS (
  SELECT unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i+1])) AS g
  FROM toks WHERE len(ws) >= 2
), bc AS (
  SELECT g, CAST(count(*) AS BIGINT) AS c_ab
  FROM bigs GROUP BY g HAVING count(*) >= 5
), btot AS (
  SELECT CAST(sum(greatest(len(ws) - 1, 0)) AS DOUBLE) AS b FROM toks
)
SELECT g AS bigram, c_ab,
       round(ln((c_ab / b) / ((ua.c / n) * (ub.c / n))), 6) AS pmi
FROM bc, tot, btot
JOIN uni ua ON ua.w = string_split(bc.g, ' ')[1]
JOIN uni ub ON ub.w = string_split(bc.g, ' ')[2]
"""

    # composed webtext curation DAG: normalize → exact dedup →
    # quality ≥ 0.5 → decontaminate → mixture downsample.  Mirrors
    # pipelines/docops.py:curate_corpus / curation_funnel
    _curation_ctes = rf"""
WITH norm AS (
  SELECT doc_id,
         nfc_normalize(trim(regexp_replace(lower(text), '\s+', ' ',
                                           'g'))) AS nt
  FROM documents
), d1 AS (SELECT min(doc_id) AS doc_id FROM norm GROUP BY nt),
q AS ({sql["quality_scores"]}),
dec AS ({sql["decontaminate"]}),
mix AS ({sql["mixture_downsample"]}),
s1 AS (SELECT d.doc_id, d.source FROM documents d JOIN d1 USING (doc_id)),
s2 AS (SELECT s1.* FROM s1 JOIN q USING (doc_id) WHERE q.quality >= 0.5),
s3 AS (SELECT s2.* FROM s2 JOIN dec USING (doc_id)
       WHERE NOT dec.contaminated),
s4 AS (SELECT s3.* FROM s3 JOIN mix USING (doc_id))
"""
    sql["curated_docs"] = _curation_ctes + """
SELECT doc_id, source FROM s4
"""

    # per-gate filter-bias audit — mirrors
    # docops.py:quality_lift_report (each gate evaluated
    # independently on the full corpus; MATERIALIZED per the
    # CTE-re-inlining lesson)
    sql["quality_lift_report"] = f"""
WITH q AS MATERIALIZED ({sql["quality_scores"]}),
dec AS MATERIALIZED ({sql["decontaminate"]}),
mix AS MATERIALIZED ({sql["mixture_downsample"]}),
flags AS (
  SELECT q.doc_id, q.quality,
         q.quality >= 0.5 AS gq,
         COALESCE(NOT dec.contaminated, FALSE) AS gd,
         mix.doc_id IS NOT NULL AS gm
  FROM q
  LEFT JOIN dec ON dec.doc_id = q.doc_id
  LEFT JOIN mix ON mix.doc_id = q.doc_id
),
sel AS (
  SELECT 'quality_gate' AS stage, gq AS keep, quality FROM flags
  UNION ALL SELECT 'decontaminate', gd, quality FROM flags
  UNION ALL SELECT 'mixture_downsample', gm, quality FROM flags
)
SELECT stage,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
         AS n_dropped,
       round(SUM(CASE WHEN keep THEN quality ELSE 0 END)
             / GREATEST(SUM(CASE WHEN keep THEN 1 ELSE 0 END), 1), 6)
         AS kept_mean_quality,
       round(SUM(CASE WHEN keep THEN 0 ELSE quality END)
             / GREATEST(SUM(CASE WHEN keep THEN 0 ELSE 1 END), 1), 6)
         AS dropped_mean_quality
FROM sel GROUP BY stage
"""
    sql["curation_funnel"] = _curation_ctes + """
SELECT 0 AS stage_idx, 'input' AS stage,
       (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs
UNION ALL SELECT 1, 'exact_dedup', count(*) FROM s1
UNION ALL SELECT 2, 'quality_gate', count(*) FROM s2
UNION ALL SELECT 3, 'decontaminate', count(*) FROM s3
UNION ALL SELECT 4, 'mixture_downsample', count(*) FROM s4
"""

    # PII redaction over deterministically planted contact strings
    # (both sides synthesize the same suffix, then redact with RE2 —
    # the regex engine DuckDB and pyarrow share).  Mirrors
    # pipelines/docops.py:redact_pii
    sql["redact_pii"] = r"""
WITH aug AS (
  SELECT doc_id,
         text || repeat(' user' || doc_id || '@example.com',
                        doc_id % 3)
              || repeat(' from 10.' || (doc_id % 200) || '.0.'
                        || (doc_id % 250), doc_id % 2)
              || ' call +1-555-' || (1000 + doc_id % 1000) AS full_text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(full_text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
         AS n_emails,
       len(regexp_extract_all(full_text,
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
       len(regexp_extract_all(full_text, '\+1-555-\d{4}')) AS n_phones,
       regexp_replace(regexp_replace(regexp_replace(full_text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           '<EMAIL>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
           '\+1-555-\d{4}', '<PHONE>', 'g') AS redacted_text
FROM aug
"""

    # per-vector cosine to its own label's mean embedding + outlier
    # flag (compared on the 6-dp rounded value both sides).  Mirrors
    # stages/kmeans.py:embedding_outliers
    sql["embedding_outliers"] = """
WITH dims AS (
  -- v cast to DOUBLE: embeddings are float32 and DuckDB computes
  -- v*v in FLOAT when both operands are FLOAT (4.6e-9-level noise
  -- vs the engine's float64 products — flipped 6-dp boundaries)
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS d,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
), cent AS (
  SELECT label, d, round(avg(v), 6) AS c FROM dims GROUP BY label, d
), agg AS (
  SELECT vec_id, any_value(dims.label) AS label,
         sum(v*c) AS dot, sum(v*v) AS nv, sum(c*c) AS nc
  FROM dims JOIN cent USING (label, d)
  GROUP BY vec_id
)
SELECT vec_id, label, round(dot / sqrt(nv*nc), 6) AS centroid_cos,
       round(dot / sqrt(nv*nc), 6) < 0.0 AS is_outlier
FROM agg
"""

    # global ordered prefix sum -> fixed-size training-window packing
    # group-by-length batch planning — mirrors
    # stages/pack.py:padded_batch_plan (rank by n_tokens DESC,
    # doc_id ASC; batch = rank // 8; padded to the batch max)
    sql["padded_batch_plan"] = """
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '),
                         x -> x <> '')) AS n_tokens
  FROM documents
), r AS (
  SELECT doc_id, n_tokens,
         row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) - 1
           AS rk
  FROM t
)
SELECT doc_id, n_tokens, rk // 8 AS batch_id,
       max(n_tokens) OVER (PARTITION BY rk // 8) AS batch_max_tokens,
       max(n_tokens) OVER (PARTITION BY rk // 8) - n_tokens
         AS pad_waste
FROM r
"""

    sql["pack_sequences"] = """
WITH t AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '),
                         x -> x <> '')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, n_tokens, cum_before,
       cum_before // 2048 AS window_id
FROM c
"""

    # Gopher-style repetition hygiene (top-token + duplicate-bigram)
    sql["repetition_scores"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
), tf AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(ws) AS w FROM toks)
  GROUP BY doc_id, w
), top AS (
  SELECT doc_id,
         round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6)
           AS top_token_frac
  FROM tf GROUP BY doc_id
), bg AS (
  SELECT doc_id, len(ws) - 1 AS nb,
         len(list_distinct(list_transform(
             range(1, len(ws)),
             i -> ws[i] || ' ' || ws[i + 1]))) AS nd
  FROM toks
)
SELECT top.doc_id, top.top_token_frac,
       CASE WHEN bg.nb <= 0 THEN 0.0
            ELSE round(CAST(bg.nb - bg.nd AS DOUBLE) / bg.nb, 6)
       END AS dup_bigram_frac
FROM top JOIN bg USING (doc_id)
"""

    # C4-style duplicate-span removal: complete 8-word spans with
    # document frequency >= 2 are deleted; the doc text is REBUILT
    # from the surviving spans + trailing partial span.  Mirrors
    # pipelines/docops.py:dedup_spans
    sql["dedup_spans"] = """
WITH toks AS (
  SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents
), chunklists AS (
  SELECT doc_id, ws, len(ws) // 8 AS n_chunks,
         list_transform(range(0, len(ws) // 8),
           i -> array_to_string(list_slice(ws, i*8 + 1, i*8 + 8), ' '))
           AS cl
  FROM toks
), chunks AS (
  SELECT doc_id, unnest(cl) AS chunk, generate_subscripts(cl, 1) AS ci
  FROM chunklists
), df AS (
  SELECT chunk, count(DISTINCT doc_id) AS df FROM chunks GROUP BY chunk
), hot AS (
  -- corpus-relative threshold: max(2, ceil(0.004 * n_docs)) —
  -- mirrors docops.relative_min_df(floor=2, frac=0.004)
  SELECT chunk FROM df
  WHERE df >= greatest(2, ceil(0.004 * (SELECT count(*) FROM documents)))
), kept AS (
  SELECT c.doc_id, c.ci, c.chunk
  FROM chunks c LEFT JOIN hot h USING (chunk)
  WHERE h.chunk IS NULL
), rebuilt AS (
  SELECT doc_id, string_agg(chunk, ' ' ORDER BY ci) AS kept_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT cl.doc_id, cl.n_chunks,
       cl.n_chunks - coalesce(r.n_kept, 0) AS n_removed_chunks,
       trim(concat_ws(' ', coalesce(r.kept_text, ''),
            array_to_string(
              list_slice(cl.ws, cl.n_chunks*8 + 1, len(cl.ws)), ' ')))
         AS clean_text
FROM chunklists cl LEFT JOIN rebuilt r USING (doc_id)
"""

    # cross-snapshot content-signature dedup (bloom prefilter is an
    # implementation detail; the result is exact, hence SQL-checkable)
    sql["snapshot_delta"] = """
WITH sig AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
             list_filter(string_split(text, ' '), x -> x <> ''))),
             ' ')) AS sig
  FROM documents
), b AS (SELECT max(doc_id) // 2 AS half FROM documents)
SELECT s.doc_id, s.sig
FROM sig s, b
WHERE s.doc_id >= b.half
  AND NOT EXISTS (SELECT 1 FROM sig o, b b2
                  WHERE o.doc_id < b2.half AND o.sig = s.sig)
"""

    # seeded global permutation rank (pre-shard training shuffle)
    sql["shuffle_positions"] = """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
         AS BIGINT) AS pos
FROM documents
"""

    # per-shard manifest of the md5-shuffle training permutation
    # (shard = 128-rank range).  Mirrors stages/pack.py:shard_manifest
    sql["shard_manifest"] = """
WITH r AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '),
                         x -> x <> '')) AS n_tokens,
         CAST(ROW_NUMBER() OVER (
              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS BIGINT) AS pos
  FROM documents
)
SELECT (pos - 1) // 128 AS shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       min(pos) AS min_pos, max(pos) AS max_pos
FROM r GROUP BY 1
"""

    # inverted index with combiner-bounded posting lists (cap 64)
    sql["inverted_index"] = """
WITH pairs AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(
             string_split(text, ' '), x -> x <> ''))) AS term
  FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       array_to_string(
           list_slice(list_sort(list(doc_id)), 1, 64), ',') AS postings,
       count(*) > 64 AS truncated
FROM pairs GROUP BY term
"""

    sql["lang_median_filter"] = """
WITH counted AS (
  SELECT doc_id, lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(string_split(trim(text), ' ')) END AS n_tokens
  FROM documents
), med AS (
  SELECT lang, median(n_tokens) AS med FROM counted GROUP BY lang
)
SELECT c.doc_id, c.lang, c.n_tokens
FROM counted c JOIN med USING (lang)
WHERE c.n_tokens >= med.med
"""

    # capped-vocabulary MLE (top-65536 + OOV mass bucket) — matches
    # docops.unigram_logprob(vocab_size=1<<16); below the cap (all
    # testdata scales) it degenerates to the uncapped model.
    sql["unigram_logprob"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
  FROM documents WHERE trim(text) <> ''
), cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
tot AS (SELECT sum(c) AS t FROM cnt),
vocab AS (
  SELECT w, c FROM (
    SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rn FROM cnt
  ) WHERE rn <= 65536
),
oov AS (
  SELECT (SELECT t FROM tot) - coalesce(sum(c), 0) AS m FROM vocab
)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(CASE WHEN v.w IS NOT NULL THEN -ln(v.c / tot.t)
                      ELSE -ln(oov.m / tot.t) END), 6) AS nll_mean
FROM toks LEFT JOIN vocab v USING (w) CROSS JOIN tot CROSS JOIN oov
GROUP BY doc_id
"""

    sql["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

    sql["top_customers"] = """
SELECT o.o_custkey AS c_custkey, c.c_name,
       round(sum(o.o_totalprice), 6) AS revenue,
       count(*) AS n_orders
FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
GROUP BY o.o_custkey, c.c_name
ORDER BY revenue DESC, c_custkey LIMIT 10
"""

    sql["events_hourly"] = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""

    sql["order_lineitem_join"] = """
SELECT o.o_orderpriority, count(*) AS n_items,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""

    sql["order_priority_return_rate"] = """
WITH f AS (
  SELECT l_orderkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(coalesce(f.ret, 0)) AS BIGINT) AS n_returned,
       round(sum(coalesce(f.ret, 0)) / CAST(count(*) AS DOUBLE), 6)
         AS return_rate
FROM orders o LEFT JOIN f ON o.o_orderkey = f.l_orderkey
GROUP BY o.o_orderpriority
"""

    sql["events_sliding_window"] = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events, sum(value) AS sv
  FROM events GROUP BY 1, 2
)
SELECT hour, event_type, n_events,
       CAST(SUM(n_events) OVER w AS BIGINT) AS window_events,
       round(SUM(sv) OVER w, 6) AS window_value
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour
             RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW)
"""

    # as-of join: orders first reduced to one row per (custkey, date)
    # keeping max orderkey — same deterministic tie-break as the Ray
    # side (pipelines/temporal.py)
    sql["events_orders_asof"] = """
WITH o1 AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
),
od AS (
  SELECT o1.o_custkey, o1.o_orderdate, o1.o_orderkey, o.o_totalprice
  FROM o1 JOIN orders o USING (o_orderkey)
),
cand AS (
  SELECT e.event_id, e.user_id, od.o_orderkey, od.o_orderdate,
         od.o_totalprice,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY od.o_orderdate DESC) AS rn
  FROM events e JOIN od
    ON e.user_id = od.o_custkey AND od.o_orderdate <= e.ts
)
SELECT event_id, user_id, o_orderkey, o_orderdate, o_totalprice
FROM cand WHERE rn = 1
"""

    sql["order_ship_window"] = """
SELECT o.o_orderkey, o.o_orderdate,
       count(l.l_orderkey) AS n_shipped,
       round(coalesce(sum(l.l_quantity), 0), 6) AS qty_shipped
FROM orders o LEFT JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
GROUP BY 1, 2
"""

    sql["revenue_by_nation"] = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1
"""

    # /v1/alerts/<id> analog: the extract pipeline filtered to one doc
    sql["alert_text"] = f"""
SELECT * FROM ({sql["extract_text"]}) t
WHERE t.doc_id = printf('%08d.%d', 20200000 + 42 % 10000, 1000000 + 42)
"""

    # /v1/indicators analog: geolocation isa*0.. closure in BOTH
    # directions (the reference's Cypher UNION, kg/client.py:84-92),
    # name CONTAINS filter; 'Asia' resolves via exact ontology name
    # match, mirroring resolve_curie for unambiguous plain names
    sql["indicators_by_country"] = f"""
WITH RECURSIVE {_ont_cte()},
isa(s, e) AS (
  SELECT start_id, end_id FROM ({sql["mesh_hierarchy_edges"]})
  UNION ALL
  SELECT start_id, end_id FROM ({sql["geoname_edges"]})
),
target(c) AS (
  SELECT 'MESH:' || mesh_id FROM ont WHERE lower(name) = 'asia'
),
down(c) AS (
  SELECT c FROM target
  UNION
  SELECT i.s FROM isa i JOIN down d ON i.e = d.c
),
up(c) AS (
  SELECT c FROM target
  UNION
  SELECT i.e FROM isa i JOIN up u ON i.s = u.c
),
members(c) AS (SELECT c FROM down UNION SELECT c FROM up),
edges AS (
  SELECT start_id, years_data, end_id
  FROM ({_indicator_edges_sql("health")})
  UNION ALL
  SELECT start_id, years_data, end_id
  FROM ({_indicator_edges_sql("dev")})
),
nodes AS (
  SELECT DISTINCT 'wdi:' || code AS curie, sname AS name
  FROM (WITH {_series_cte("health")} SELECT code, sname FROM series
        WHERE NOT shared)
  UNION
  SELECT DISTINCT 'wdi:' || code AS curie, sname AS name
  FROM (WITH {_series_cte("dev")} SELECT code, sname FROM series
        WHERE NOT shared)
)
SELECT DISTINCT e.start_id AS country_curie, e.end_id AS indicator_curie,
       n.name AS indicator_name, e.years_data
FROM edges e
JOIN nodes n ON n.curie = e.end_id
JOIN members m ON m.c = e.start_id
WHERE n.name LIKE '%total%'
"""

    # gap-based sessionization: lag → gap flag → running sum, ordered
    # (ts, event_id) per user — same tie-break as the Ray side
    sql["events_sessionize"] = """
WITH o AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT event_id, user_id, ts,
       CAST(sum(CASE WHEN prev_ts IS NULL
                      OR ts - prev_ts > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id
                  ORDER BY ts, event_id) AS BIGINT) AS session_id
FROM o
"""

    # ROLLUP as union-of-levels over ONE detail pass; coarser levels
    # re-aggregate the (rounded) detail, matching the Ray semantics
    sql["pricing_rollup"] = """
WITH detail AS (
  SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         count(*) AS count_order
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, sum_qty, count_order FROM detail
UNION ALL
SELECT l_returnflag, 'ALL', round(sum(sum_qty), 2),
       CAST(sum(count_order) AS BIGINT)
FROM detail GROUP BY 1
UNION ALL
SELECT 'ALL', 'ALL', round(sum(sum_qty), 2),
       CAST(sum(count_order) AS BIGINT)
FROM detail
"""

    sql["pricing_cube"] = """
WITH detail AS (
  SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         count(*) AS count_order
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, sum_qty, count_order FROM detail
UNION ALL
SELECT l_returnflag, 'ALL', round(sum(sum_qty), 2),
       CAST(sum(count_order) AS BIGINT)
FROM detail GROUP BY 1
UNION ALL
SELECT 'ALL', l_linestatus, round(sum(sum_qty), 2),
       CAST(sum(count_order) AS BIGINT)
FROM detail GROUP BY 2
UNION ALL
SELECT 'ALL', 'ALL', round(sum(sum_qty), 2),
       CAST(sum(count_order) AS BIGINT)
FROM detail
"""

    # deterministic stratified sample: ascending md5(doc_id) per lang
    sql["stratified_sample"] = """
WITH ranked AS (
  SELECT lang, doc_id, len(text) AS n_chars,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM documents
)
SELECT lang, doc_id, n_chars FROM ranked WHERE rn <= 3
"""

    sql["events_props_stats"] = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1
"""

    sql["customers_without_orders"] = """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2000-01-01'
)
"""

    sql["top_customers_by_nation"] = """
WITH rev AS (
  SELECT o_custkey, sum(o_totalprice) AS revenue
  FROM orders GROUP BY 1
),
j AS (
  SELECT c.c_nationkey, r.o_custkey AS c_custkey,
         round(r.revenue, 6) AS revenue,
         row_number() OVER (PARTITION BY c.c_nationkey
                            ORDER BY r.revenue DESC, r.o_custkey) AS rank
  FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
)
SELECT c_nationkey, c_custkey, revenue, rank FROM j WHERE rank <= 3
"""

    sql["token_count_quantiles"] = """
WITH t AS (
  SELECT len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
)
SELECT round(quantile_cont(n_tokens, 0.5), 6) AS q50,
       round(quantile_cont(n_tokens, 0.9), 6) AS q90,
       round(quantile_cont(n_tokens, 0.99), 6) AS q99
FROM t
"""

    # the SQL-checkable slice of the Fisher literature ranking:
    # q=3 in-vocab query terms {click,error,purchase} → threshold 2
    # (mesh_csr.py:118 semantics; see pipelines/encode.py)
    sql["literature_overlap"] = """
WITH t AS (
  SELECT event_type AS mesh_id, CAST(user_id AS VARCHAR) AS pmid,
         (event_id % 2) + 1 AS value
  FROM events
),
cells AS (
  SELECT pmid, mesh_id, sum(value) AS v FROM t GROUP BY 1, 2
),
f AS (
  SELECT pmid,
         CASE WHEN mesh_id IN ('click','error','purchase')
              THEN v ELSE 0 END AS v_in_q,
         CASE WHEN mesh_id IN ('click','error','purchase')
              THEN 1 ELSE 0 END AS in_q
  FROM cells
),
p AS (
  SELECT pmid, CAST(sum(v_in_q) AS BIGINT) AS pub_count,
         CAST(sum(in_q) AS BIGINT) AS overlap_n,
         count(*) AS n_target
  FROM f GROUP BY 1
)
SELECT pmid, pub_count, overlap_n,
       round(overlap_n / 3.0, 6) AS coverage
FROM p WHERE pub_count >= 2
"""

    # Full Fisher-exact literature ranking (mesh_csr.py:102-166): the
    # hypergeometric tail P(X >= overlap) is expressed with lgamma-based
    # log-binomials summed over generate_series, replicating
    # functions/stats.py:fisher_exact_greater operation-for-operation
    # (same parenthesization, same max-shift exp trick) so the doubles
    # match bitwise before the round(., 9).
    # Margins: M=total_terms (distinct mesh vocab), n=q (in-vocab query
    # terms), N=n_target (per-PMID distinct mesh count), a=overlap_n.
    sql["literature_rank"] = """
WITH t AS (
  SELECT event_type AS mesh_id, CAST(user_id AS VARCHAR) AS pmid,
         (event_id % 2) + 1 AS value
  FROM events
),
params AS (
  SELECT (SELECT count(DISTINCT mesh_id) FROM t) AS total_terms,
         (SELECT count(DISTINCT mesh_id) FROM t
            WHERE mesh_id IN ('click','error','purchase')) AS q
),
cells AS (
  SELECT pmid, mesh_id, sum(value) AS v FROM t GROUP BY 1, 2
),
p AS (
  SELECT pmid,
         CAST(sum(CASE WHEN mesh_id IN ('click','error','purchase')
                       THEN v ELSE 0 END) AS BIGINT) AS pub_count,
         CAST(sum(CASE WHEN mesh_id IN ('click','error','purchase')
                       THEN 1 ELSE 0 END) AS BIGINT) AS overlap_n,
         count(*) AS n_target
  FROM cells GROUP BY 1
),
kept AS (
  SELECT p.pmid, p.overlap_n, p.n_target, params.q, params.total_terms
  FROM p, params
  WHERE p.pub_count >= CASE WHEN params.q <= 4 THEN params.q - 1 ELSE 3 END
),
series AS (
  SELECT pmid, overlap_n, q, n_target, total_terms,
         unnest(generate_series(overlap_n, least(q, n_target))) AS kk
  FROM kept
),
lp AS (
  SELECT pmid, overlap_n, q,
         ((lgamma(q + 1) - lgamma(kk + 1) - lgamma(q - kk + 1))
          + (lgamma(total_terms - q + 1) - lgamma(n_target - kk + 1)
             - lgamma(total_terms - q - (n_target - kk) + 1))
          - (lgamma(total_terms + 1) - lgamma(n_target + 1)
             - lgamma(total_terms - n_target + 1))) AS logpmf
  FROM series
  WHERE kk <= q AND n_target - kk >= 0
    AND n_target - kk <= total_terms - q
),
mx AS (SELECT pmid, max(logpmf) AS m FROM lp GROUP BY 1),
pv AS (
  SELECT lp.pmid,
         any_value(lp.overlap_n) AS overlap_n,
         any_value(lp.q) AS q,
         exp(any_value(mx.m)) * sum(exp(lp.logpmf - mx.m)) AS praw
  FROM lp JOIN mx USING (pmid)
  GROUP BY lp.pmid
)
SELECT pmid, overlap_n,
       round(overlap_n / q, 6) AS coverage,
       round(least(praw, 1.0), 9) AS pval
FROM pv
"""

    # exact char-5-gram Jaccard under 32-char prefix blocking; the
    # threshold test is integer math (2*inter >= union) on both sides
    sql["prefix_block_jaccard"] = """
WITH d AS (
  SELECT doc_id, substr(text, 1, 32) AS pfx, text FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, pfx, substr(text, CAST(p AS INT), 5) AS g
  FROM d, LATERAL unnest(range(1, len(text) - 3)) AS t(p)
  WHERE len(text) >= 5
),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
pair AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b
    ON a.pfx = b.pfx AND a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT p.doc_a, p.doc_b,
       round(inter * 1.0 / (ca.n + cb.n - inter), 6) AS jaccard
FROM pair p
JOIN cnt ca ON ca.doc_id = p.doc_a
JOIN cnt cb ON cb.doc_id = p.doc_b
WHERE 2 * inter >= ca.n + cb.n - inter
"""

    # quality-aware canonical selection over the exact Jaccard pair
    # graph — mirrors docops.py:near_dup_keep_best (CC min-label =
    # cluster_id; keep = max quality, doc_id tie-break)
    sql["near_dup_keep_best"] = f"""
WITH RECURSIVE nd AS ({sql["prefix_block_jaccard"]}),
edges(s, d) AS (
  SELECT doc_a, doc_b FROM nd UNION SELECT doc_b, doc_a FROM nd
),
reach(n, m) AS (
  SELECT s, s FROM edges
  UNION
  SELECT r.n, e.d FROM reach r JOIN edges e ON r.m = e.s
),
lab AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
qs AS (
  SELECT doc_id,
         length(text) AS nc,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nt,
         len(list_filter(string_split(text, ' '),
                         x -> x IN ('the', 'a'))) AS ns
  FROM documents
),
q AS (
  SELECT doc_id,
         round(least(nt / 100.0, 1.0) * 0.5
               + CASE WHEN nt = 0 THEN 0.0
                      ELSE ns / CAST(nt AS DOUBLE) END * 0.3
               + least((CASE WHEN nt = 0 THEN 0.0
                        ELSE (nc - (nt - 1)) / CAST(nt AS DOUBLE) END)
                       / 8.0, 1.0) * 0.2, 6) AS quality
  FROM qs
),
best AS (
  SELECT l.cluster_id, l.doc_id AS keep_id,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY q.quality DESC, l.doc_id ASC) AS rn
  FROM lab l JOIN q ON q.doc_id = l.doc_id
)
SELECT l.doc_id, l.cluster_id, b.keep_id, l.doc_id = b.keep_id AS is_keep
FROM lab l JOIN best b ON b.cluster_id = l.cluster_id AND b.rn = 1
"""

    # polynomial rolling hash h = (h*1000003 + byte) mod 2^61-1 over
    # the utf-8 bytes, shifted into signed int64 range; the corpus is
    # ASCII so unicode(char) == the utf-8 byte (stages/textstats.py)
    sql["fingerprints"] = """
WITH RECURSIVE fp AS (
  SELECT doc_id, CAST(0 AS HUGEINT) AS h, 0 AS pos, len(text) AS n
  FROM documents
  UNION ALL
  SELECT f.doc_id,
         (f.h * 1000003 + unicode(substr(d.text, f.pos + 1, 1)))
           % CAST(2305843009213693951 AS HUGEINT),
         f.pos + 1, f.n
  FROM fp f JOIN documents d USING (doc_id)
  WHERE f.pos < f.n
)
SELECT doc_id,
       CAST(h AS BIGINT) - 1152921504606846976 AS fingerprint
FROM fp WHERE pos = n
"""

    # --- iterative graph algorithms (pipelines/graph.py) ---
    # fixed-round functions of the edge list, so the unrolled CTEs
    # compute the identical value the Ray iteration does
    graph_edges = f"""
WITH cooc AS ({sql["cooccurrence_edges"]}),
e AS (SELECT start_id AS u, end_id AS v FROM cooc
      UNION ALL SELECT end_id, start_id FROM cooc),
nd AS (SELECT DISTINCT u AS v FROM e)"""

    pr_iters = "".join(
        f""",
r{i} AS (
  SELECT cur.v,
         0.15 / (SELECT c FROM nn)
         + 0.85 * COALESCE(SUM(p."rank" / deg.outdeg), 0) AS "rank"
  FROM nd cur
  LEFT JOIN e ON e.v = cur.v
  LEFT JOIN r{i - 1} p ON p.v = e.u
  LEFT JOIN deg ON deg.u = e.u
  GROUP BY cur.v
)"""
        for i in range(1, 11)
    )
    sql["pagerank"] = (
        graph_edges
        + """,
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM nd),
deg AS (SELECT u, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM e GROUP BY u),
r0 AS (SELECT v, 1.0 / (SELECT c FROM nn) AS "rank" FROM nd)"""
        + pr_iters
        + """
SELECT v AS curie, ROUND("rank", 6) AS "rank" FROM r10"""
    )

    # weighted HITS over the bipartite user→event_type graph —
    # mirrors pipelines/graph.py:hits_scores (5 unrolled
    # power-iteration rounds, L2 normalization per half-step,
    # h0 = 1/sqrt(|hubs|), w = interaction count).  MATERIALIZED is
    # load-bearing: without it DuckDB re-inlines each CTE at every
    # reference and the 20-CTE chain re-evaluates exponentially.
    hits_iters = ""
    _prev_h = "h0"
    for _i in range(1, 6):
        hits_iters += f""",
a{_i}r AS MATERIALIZED (SELECT e.v, SUM(e.w * x.h) AS a
           FROM he e JOIN {_prev_h} x ON x.u = e.u GROUP BY e.v),
a{_i} AS MATERIALIZED (SELECT v,
           a / sqrt((SELECT SUM(a*a) FROM a{_i}r)) AS a FROM a{_i}r),
h{_i}r AS MATERIALIZED (SELECT e.u, SUM(e.w * y.a) AS h
           FROM he e JOIN a{_i} y ON y.v = e.v GROUP BY e.u),
h{_i} AS MATERIALIZED (SELECT u,
           h / sqrt((SELECT SUM(h*h) FROM h{_i}r)) AS h FROM h{_i}r)"""
        _prev_h = f"h{_i}"
    sql["hits_scores"] = f"""
WITH he AS MATERIALIZED (
  SELECT user_id AS u, event_type AS v, CAST(COUNT(*) AS DOUBLE) AS w
  FROM events GROUP BY 1, 2
),
hu AS (SELECT DISTINCT u FROM he),
h0 AS MATERIALIZED (
  SELECT u, 1.0 / sqrt((SELECT COUNT(*) FROM hu)) AS h FROM hu
){hits_iters}
SELECT CAST(u AS VARCHAR) AS node, 'hub' AS kind, ROUND(h, 6) AS score
FROM h5
UNION ALL
SELECT v AS node, 'authority' AS kind, ROUND(a, 6) AS score FROM a5
"""

    # DeepWalk corpus — mirrors pipelines/graph.py:deepwalk_corpus
    # (2 walks × 4 steps per node; transition = sorted-neighbor index
    # md5("start|walk|step|cur")[:6] % degree)
    dw_steps = ""
    _prev_s = "s0"
    for _s in range(1, 5):
        dw_steps += f""",
s{_s} AS MATERIALIZED (
  SELECT f.start, f.w, a.nb AS cur
  FROM {_prev_s} f
  JOIN dwdeg d ON d.node = f.cur
  JOIN dwadj a ON a.node = f.cur
   AND a.idx = CAST('0x' || substr(md5(f.start || '|' ||
         CAST(f.w AS VARCHAR) || '|{_s}|' || f.cur), 1, 6) AS BIGINT)
         % d.deg
)"""
        _prev_s = f"s{_s}"
    sql["deepwalk_corpus"] = (
        graph_edges
        + f""",
de AS (SELECT DISTINCT u, v FROM e),
dwadj AS MATERIALIZED (
  SELECT u AS node, v AS nb,
         row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS idx
  FROM de
),
dwdeg AS MATERIALIZED (
  SELECT node, COUNT(*) AS deg FROM dwadj GROUP BY node
),
s0 AS MATERIALIZED (
  SELECT d.node AS start, t.w, d.node AS cur
  FROM dwdeg d, (VALUES (0), (1)) t(w)
){dw_steps}
SELECT start, w AS walk, 0 AS step, cur AS node FROM s0
UNION ALL SELECT start, w, 1, cur FROM s1
UNION ALL SELECT start, w, 2, cur FROM s2
UNION ALL SELECT start, w, 3, cur FROM s3
UNION ALL SELECT start, w, 4, cur FROM s4
"""
    )

    sql["triangle_counts"] = (
        graph_edges.replace(
            "e AS (SELECT start_id AS u, end_id AS v FROM cooc\n"
            "      UNION ALL SELECT end_id, start_id FROM cooc),\n"
            "nd AS (SELECT DISTINCT u AS v FROM e)",
            "ce AS (SELECT LEAST(start_id, end_id) AS lo,\n"
            "              GREATEST(start_id, end_id) AS hi\n"
            "       FROM cooc GROUP BY 1, 2),\n"
            "tri AS (\n"
            "  SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c\n"
            "  FROM ce e1\n"
            "  JOIN ce e2 ON e2.lo = e1.lo AND e2.hi > e1.hi\n"
            "  JOIN ce e3 ON e3.lo = e1.hi AND e3.hi = e2.hi\n"
            ")",
        )
        + """
SELECT v AS curie, COUNT(*) AS n_triangles
FROM (SELECT a AS v FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
GROUP BY v"""
    )

    # mirrors pipelines/graph.py:two_hop_neighbors — adjacency square
    sql["two_hop_neighbors"] = (
        graph_edges
        + """
SELECT u AS curie, count(*) AS n_two_hop FROM (
  SELECT DISTINCT e1.u, e2.v AS w
  FROM e e1 JOIN e e2 ON e1.v = e2.u
  WHERE e2.v <> e1.u
) GROUP BY u"""
    )

    # mirrors pipelines/graph.py:degree_assortativity — Pearson corr
    # of endpoint degrees over the symmetric edges, same moment form
    sql["degree_assortativity"] = (
        graph_edges
        + """,
deg AS (SELECT u, count(*) AS d FROM e GROUP BY u),
xy AS (
  SELECT du.d AS x, dv.d AS y
  FROM e JOIN deg du ON du.u = e.u JOIN deg dv ON dv.u = e.v
),
m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM xy
)
SELECT n AS n_edges,
       round((sxy / n - (sx / n) * (sy / n))
             / sqrt((sxx / n - (sx / n) * (sx / n))
                    * (syy / n - (sy / n) * (sy / n))), 6)
         AS assortativity
FROM m"""
    )

    # degree distribution of the co-occurrence graph.
    # Mirrors pipelines/graph.py:degree_histogram
    sql["degree_histogram"] = (
        graph_edges
        + """,
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS degree FROM e GROUP BY u)
SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree"""
    )

    # heavy hitters: exact top-20 tokens; the engine's candidate-bounded
    # two-pass sketch provably equals this exact query (stages/sketch.py)
    sql["heavy_hitter_terms"] = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(text, '\s+')) AS token FROM documents
), counts AS (
  SELECT token, COUNT(*) AS n_occurrences
  FROM toks WHERE token != '' GROUP BY token
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS BIGINT)
         AS rank,
       token, n_occurrences
FROM counts
ORDER BY n_occurrences DESC, token
LIMIT 20
"""

    sql["cumulative_order_revenue"] = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS order_seq,
       ROUND(SUM(o_totalprice) OVER w, 2) AS cum_revenue
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

    # exact components via recursive reachability closure (the engine
    # iterates min-label propagation to FIXPOINT, so the oracle must
    # be exact for any diameter — round-4 convergence guards)
    sql["connected_components"] = (
        graph_edges.replace("WITH cooc", "WITH RECURSIVE cooc")
        + """,
reach(v, r) AS (
  SELECT v, v FROM nd
  UNION
  SELECT e.v, reach.r FROM e JOIN reach ON reach.v = e.u
)
SELECT v AS curie, MIN(r) AS component FROM reach GROUP BY v"""
    )

    # 4 sync label-propagation rounds (majority vote, ties -> min
    # label); mirrors pipelines/graph.py:lpa_communities
    lpa_iters = "".join(
        f""",
votes{i} AS (
  SELECT curie, label, count(*) AS c FROM (
    SELECT e.v AS curie, l.label
    FROM e JOIN lab{i - 1} l ON l.curie = e.u
    UNION ALL
    SELECT curie, label FROM lab{i - 1}
  ) GROUP BY 1, 2
),
pick{i} AS (
  SELECT curie, label FROM (
    SELECT curie, label,
           row_number() OVER (PARTITION BY curie
                              ORDER BY c DESC, label) AS rn
    FROM votes{i}
  ) WHERE rn = 1
),
lab{i} AS (
  SELECT l.curie, coalesce(p.label, l.label) AS label
  FROM lab{i - 1} l LEFT JOIN pick{i} p USING (curie)
)"""
        for i in range(1, 5)
    )
    sql["lpa_communities"] = (
        graph_edges
        + """,
lab0 AS (SELECT v AS curie, v AS label FROM nd)"""
        + lpa_iters
        + """
SELECT curie, label AS community FROM lab4"""
    )

    # bounded-round BFS from the min-curie seed; unrolled min-plus
    # iterations mirror pipelines/graph.py:bfs_distances
    bfs_iters = "".join(
        f""",
d{i} AS (
  SELECT cur.v,
         LEAST(cur.dist,
               COALESCE(MIN(p.dist), 1000000000) + 1) AS dist
  FROM d{i - 1} cur
  LEFT JOIN e ON e.v = cur.v
  LEFT JOIN d{i - 1} p ON p.v = e.u
  GROUP BY cur.v, cur.dist
)"""
        for i in range(1, 5)
    )
    sql["bfs_distances"] = (
        graph_edges
        + """,
d0 AS (SELECT v,
              CASE WHEN v = (SELECT MIN(v) FROM nd)
                   THEN 0 ELSE 1000000000 END AS dist
       FROM nd)"""
        + bfs_iters
        + """
SELECT v AS curie, CAST(dist AS BIGINT) AS dist
FROM d4 WHERE dist < 1000000000"""
    )

    # Gopher-rule quality gate (word-count / word-length / alpha-frac
    # / stopword rules).  Pass flag computed on UNROUNDED ratios, like
    # the engine.  Mirrors pipelines/docops.py:gopher_quality
    sql["gopher_quality"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
), base AS (
  SELECT doc_id, len(ws) AS n_words,
         list_sum(list_transform(ws, x -> len(x))) AS sum_len,
         len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
           AS n_alpha,
         len(list_filter(['the','be','to','of','and','that','have','with'],
                         s -> list_contains(ws, s))) AS stop_hits
  FROM toks WHERE len(ws) >= 1
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       round(sum_len / CAST(n_words AS DOUBLE), 6) AS mean_word_len,
       round(n_alpha / CAST(n_words AS DOUBLE), 6) AS alpha_word_frac,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       (n_words BETWEEN 50 AND 100000)
         AND sum_len / CAST(n_words AS DOUBLE) BETWEEN 3 AND 10
         AND n_alpha / CAST(n_words AS DOUBLE) > 0.8
         AND stop_hits >= 2 AS gopher_pass
FROM base
"""

    # sliding-window char chunking: starts at every 160-char offset
    # strictly below len(text).  Mirrors docops.py:chunk_documents
    sql["chunk_documents"] = """
WITH c AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(ceil(len(text) / 160.0) AS BIGINT))) AS i
  FROM documents WHERE len(text) > 0
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       CAST(i * 160 AS BIGINT) AS chunk_start,
       substr(text, CAST(i * 160 + 1 AS BIGINT), 200) AS chunk_text
FROM c
"""

    # BM25 top-10 for the fixed query {spark, join, window}; the three
    # per-term scores are added in FIXED textual order so the float sum
    # is bit-identical to the engine's fixed-order accumulation.
    # Mirrors pipelines/docops.py:bm25_topk (k1=1.2, b=0.75)
    sql["bm25_topk"] = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
), dl AS (
  SELECT doc_id, len(ws) AS dl FROM toks
), st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) / count(*)
           AS avgdl FROM dl
), tf AS (
  SELECT doc_id,
         CAST(len(list_filter(ws, x -> x = 'spark')) AS DOUBLE) AS tf0,
         CAST(len(list_filter(ws, x -> x = 'join')) AS DOUBLE) AS tf1,
         CAST(len(list_filter(ws, x -> x = 'window')) AS DOUBLE) AS tf2
  FROM toks
), df AS (
  SELECT CAST(count(*) FILTER (tf0 > 0) AS DOUBLE) AS df0,
         CAST(count(*) FILTER (tf1 > 0) AS DOUBLE) AS df1,
         CAST(count(*) FILTER (tf2 > 0) AS DOUBLE) AS df2
  FROM tf
), scored AS (
  SELECT t.doc_id,
      (CASE WHEN tf0 > 0 THEN ln((st.n - d.df0 + 0.5) / (d.df0 + 0.5) + 1.0)
            * (tf0 * (1.2 + 1.0))
            / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / st.avgdl))
            ELSE 0.0 END)
    + (CASE WHEN tf1 > 0 THEN ln((st.n - d.df1 + 0.5) / (d.df1 + 0.5) + 1.0)
            * (tf1 * (1.2 + 1.0))
            / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / st.avgdl))
            ELSE 0.0 END)
    + (CASE WHEN tf2 > 0 THEN ln((st.n - d.df2 + 0.5) / (d.df2 + 0.5) + 1.0)
            * (tf2 * (1.2 + 1.0))
            / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / st.avgdl))
            ELSE 0.0 END) AS score
  FROM tf t JOIN dl l USING (doc_id), st, df d
)
SELECT doc_id, round(score, 6) AS score
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT 10
"""

    # mirrors pipelines/docops.py:hybrid_rrf_topk (c = 60, k = 10):
    # RRF over the bm25_topk ranking and ANN query 0's ranking
    sql["hybrid_rrf_topk"] = f"""
WITH bm AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM ({sql["bm25_topk"]})
),
an AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY score DESC, vec_id) AS r
  FROM ({sql["ann_topk"]})
  WHERE query_id = 0
),
fused AS (
  SELECT doc_id, 1.0 / (60 + r) AS s, 1 AS src FROM bm
  UNION ALL
  SELECT doc_id, 1.0 / (60 + r) AS s, 2 AS src FROM an
)
SELECT doc_id, round(sum(s), 6) AS rrf_score,
       bool_or(src = 1) AS in_bm25, bool_or(src = 2) AS in_ann
FROM fused GROUP BY doc_id
"""


    # fixed-round 2-core peeling; unrolled degree/keep/prune rounds
    # mirror pipelines/graph.py:kcore
    # each round references the previous edge set three times, so the
    # CTEs are MATERIALIZED — inlining would expand 3^8 scans of the
    # base table
    kc_iters = "".join(
        f""",
dg{i} AS MATERIALIZED (SELECT u, count(*) AS d FROM ke{i - 1} GROUP BY u),
kp{i} AS MATERIALIZED (SELECT u AS v FROM dg{i} WHERE d >= 2),
ke{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM ke{i - 1} e
  JOIN kp{i} a ON a.v = e.u
  JOIN kp{i} b ON b.v = e.v
)"""
        for i in range(1, 9)
    )
    sql["kcore"] = (
        graph_edges
        + """,
ke0 AS MATERIALIZED (SELECT u, v FROM e)"""
        + kc_iters
        + """
SELECT u AS curie, count(*) AS core_degree
FROM ke8 GROUP BY u HAVING count(*) >= 2"""
    )

    # ordered conversion funnel with strict first-touch chaining.
    # Mirrors pipelines/temporal.py:funnel_stages
    sql["funnel_stages"] = """
WITH v AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
       count(*) AS n_users FROM v
UNION ALL SELECT 2, 'click', count(*) FROM c
UNION ALL SELECT 3, 'purchase', count(*) FROM p
"""

    # DSIR importance weights: mean unigram log-likelihood ratio,
    # target = lang 'en', add-one smoothing over the corpus vocab.
    # Mirrors pipelines/docops.py:dsir_weights
    # capped-vocabulary DSIR (top-65536 by corpus count + OOV mass
    # bucket under the same add-one smoothing; smoothing denominator
    # keeps the FULL vocab size) — matches
    # docops.dsir_weights(vocab_size=1<<16); below the cap it
    # degenerates to the uncapped model.
    sql["dsir_weights"] = """
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS w
  FROM documents WHERE trim(text) <> ''
), cnt AS (
  SELECT w, count(*) AS c_all,
         count(*) FILTER (lang = 'en') AS c_t
  FROM toks GROUP BY w
), k AS (
  SELECT CAST(sum(c_all) AS DOUBLE) AS t_all,
         CAST(sum(c_t) AS DOUBLE) AS t_t,
         CAST(count(*) AS DOUBLE) AS v
  FROM cnt
),
vocab AS (
  SELECT w, c_all, c_t FROM (
    SELECT w, c_all, c_t,
           row_number() OVER (ORDER BY c_all DESC, w) AS rn FROM cnt
  ) WHERE rn <= 65536
),
oov AS (
  SELECT (SELECT t_all FROM k) - coalesce(sum(c_all), 0) AS m_all,
         (SELECT t_t FROM k) - coalesce(sum(c_t), 0) AS m_t
  FROM vocab
)
SELECT t.doc_id, count(*) AS n_tokens,
       round(avg(CASE WHEN c.w IS NOT NULL
                      THEN ln((c.c_t + 1) / (k.t_t + k.v))
                           - ln((c.c_all + 1) / (k.t_all + k.v))
                      ELSE ln((oov.m_t + 1) / (k.t_t + k.v))
                           - ln((oov.m_all + 1) / (k.t_all + k.v))
                 END), 6)
         AS dsir_weight
FROM toks t LEFT JOIN vocab c USING (w) CROSS JOIN k CROSS JOIN oov
GROUP BY t.doc_id
"""

    # deterministic md5-gated train/holdout split (~10 % holdout).
    # Mirrors pipelines/docops.py:holdout_split
    sql["holdout_split"] = """
SELECT doc_id,
       CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      AS INT) < 6553
            THEN 'holdout' ELSE 'train' END AS split
FROM documents
"""

    # per-source token-budget quota in deterministic md5 order; the
    # window cumulative sum replays the engine's per-group cumsum.
    # Mirrors pipelines/docops.py:token_budget_cap (budget=800)
    sql["token_budget_cap"] = """
WITH tok AS (
  SELECT doc_id, source,
         len(list_filter(string_split(text, ' '), x -> x <> ''))
           AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), w AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM tok
)
SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
FROM w WHERE cum - n_tokens = 0 OR cum <= 800
"""

    # zero-filled hourly grid between first and last event.  Mirrors
    # relational.py:events_gap_fill
    sql["events_gap_fill"] = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
), bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour,
         t.event_type
  FROM bounds
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT grid.hour, grid.event_type,
       coalesce(h.n_events, 0) AS n_events
FROM grid LEFT JOIN h USING (hour, event_type)
"""

    # per-type z-scores over the gap-filled hourly grid; counts are
    # integer-valued so the Σx/Σx² moments are order-independent and
    # the float chain (mean, var, std, z) is bit-identical.  Mirrors
    # relational.py:events_hourly_anomalies (threshold 3.0)
    sql["events_hourly_anomalies"] = f"""
WITH gf AS ({sql["events_gap_fill"]}),
m AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(n_events AS DOUBLE)) AS sx,
         sum(CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE)) AS sxx
  FROM gf GROUP BY event_type
), st AS (
  SELECT event_type, sx / n AS mean,
         sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0)) AS std
  FROM m
)
SELECT gf.hour, gf.event_type, gf.n_events,
       round((gf.n_events - st.mean) / st.std, 6) AS zscore,
       abs((gf.n_events - st.mean) / st.std) > 3.0 AS anomalous
FROM gf JOIN st USING (event_type)
"""

    # pairwise source-vocabulary Jaccard (intersecting pairs only).
    # Mirrors pipelines/docops.py:source_vocab_jaccard
    sql["source_vocab_jaccard"] = """
WITH st AS (
  SELECT DISTINCT source,
         unnest(list_filter(string_split(trim(text), ' '),
                            x -> x <> '')) AS w
  FROM documents WHERE trim(text) <> ''
), sz AS (SELECT source, count(*) AS n FROM st GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
  FROM st a JOIN st b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b,
       round(i.inter / CAST(sa.n + sb.n - i.inter AS DOUBLE), 6)
         AS jaccard
FROM inter i
JOIN sz sa ON sa.source = i.src_a
JOIN sz sb ON sb.source = i.src_b
"""

    # fixed-width value histogram (bin id is integer, drift-free; the
    # mean is sum/count like the engine's Sum/Count pair).  Mirrors
    # relational.py:events_value_histogram (bin_width=25)
    sql["events_value_histogram"] = """
SELECT CAST(floor(value / 25.0) AS BIGINT) AS bin,
       floor(value / 25.0) * 25.0 AS bin_lo,
       count(*) AS n_events,
       round(sum(value) / count(*), 6) AS mean_value
FROM events GROUP BY 1, 2
"""

    # per-user modal event type, ties by type name ascending.  Mirrors
    # relational.py:user_top_event_type
    sql["user_top_event_type"] = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS top_event_type, n
FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY n DESC, event_type) AS rn
      FROM c)
WHERE rn = 1
"""

    # per-type exact value quantiles.  Mirrors
    # relational.py:events_type_value_quantiles
    sql["events_type_value_quantiles"] = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS q50,
       round(quantile_cont(value, 0.9), 6) AS q90,
       round(quantile_cont(value, 0.99), 6) AS q99
FROM events GROUP BY event_type
"""

    # grouped Pearson correlation from explicit moments (same formula
    # as the engine, NOT corr()).  Mirrors
    # relational.py:lineitem_qty_price_corr
    sql["lineitem_qty_price_corr"] = """
WITH m AS (
  SELECT l_returnflag,
         CAST(count(*) AS DOUBLE) AS n,
         count(*) AS n_int,
         sum(CAST(l_quantity AS DOUBLE)) AS sx,
         sum(l_extendedprice) AS sy,
         sum(CAST(l_quantity AS DOUBLE) * l_extendedprice) AS sxy,
         sum(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE))
           AS sxx,
         sum(l_extendedprice * l_extendedprice) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n_int AS n,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
         AS corr_qty_price
FROM m
"""

    # /v1/autocomplete point query over the trie rows (prefix "in",
    # cap 100; keys are unique so the cap set is deterministic).
    # Mirrors pipelines/serving.py:autocomplete_search
    sql["autocomplete_search"] = (
        "WITH ac AS ("
        + sql["autocomplete_terms"]
        + """)
SELECT key, curie, labels FROM ac
WHERE key LIKE 'in%' ORDER BY key LIMIT 100
"""
    )

    # top-3 mentioned terms per published day.  Mirrors
    # pipelines/serving.py:trending_terms_daily
    sql["trending_terms_daily"] = f"""
WITH m AS ({sql["mentions"]}),
d AS ({sql["docs_table"]}),
c AS (
  SELECT date_trunc('day', d.published_ts) AS day,
         m.entry_name AS term, count(*) AS n
  FROM m JOIN d USING (doc_id) GROUP BY 1, 2
)
SELECT day, term, n
FROM (SELECT *, row_number() OVER (PARTITION BY day
                                   ORDER BY n DESC, term) AS rn
      FROM c)
WHERE rn <= 3
"""

    # per-entity activity span over the NER output.
    # Mirrors pipelines/serving.py:entity_timeline
    sql["entity_timeline"] = f"""
WITH m AS ({sql["mentions"]}),
d AS ({sql["docs_table"]})
SELECT m.entry_name,
       count(*) AS n_alerts,
       min(d.published_ts) AS first_seen,
       max(d.published_ts) AS last_seen
FROM m JOIN d USING (doc_id)
GROUP BY m.entry_name
"""

    # zero-filled hourly alert timeline with a trailing 3-hour moving
    # average.  Mirrors pipelines/serving.py:alert_hourly_timeline
    sql["alert_hourly_timeline"] = f"""
WITH d AS ({sql["docs_table"]}),
h AS (
  SELECT date_trunc('hour', published_ts) AS hour, count(*) AS n_alerts
  FROM d GROUP BY 1
), b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b
), f AS (
  SELECT grid.hour, coalesce(h.n_alerts, 0) AS n_alerts
  FROM grid LEFT JOIN h USING (hour)
)
SELECT hour, n_alerts,
       round(avg(n_alerts) OVER (ORDER BY hour ROWS 2 PRECEDING), 6)
         AS moving_avg
FROM f
"""

    # ontology subtree sizes over the isa* closure.  Mirrors
    # pipelines/serving.py:mesh_subtree_sizes
    sql["mesh_subtree_sizes"] = f"""
WITH c AS ({sql["isa_closure"]})
SELECT end_id AS curie, count(*) AS n_descendants
FROM c GROUP BY end_id
"""

    # per-customer RFM features anchored at the latest order date.
    # Mirrors relational.py:customer_rfm
    sql["customer_rfm"] = """
WITH a AS (SELECT max(o_orderdate) AS anchor FROM orders)
SELECT o_custkey AS c_custkey,
       CAST(date_diff('day', CAST(max(o_orderdate) AS TIMESTAMP),
                      CAST(a.anchor AS TIMESTAMP)) AS BIGINT)
         AS recency_days,
       count(*) AS frequency,
       round(sum(o_totalprice), 2) AS monetary
FROM orders, a
GROUP BY o_custkey, a.anchor
"""

    # distinct suppliers per part (two-level distinct aggregate).
    # Mirrors relational.py:part_supplier_coverage
    sql["part_supplier_coverage"] = """
SELECT l_partkey, count(DISTINCT l_suppkey) AS n_suppliers
FROM lineitem GROUP BY l_partkey
"""

    # TPC-H Q3-style shipping priority (predicates pushed to the scan,
    # rounded-revenue ranking so ties at the k boundary agree).
    # Mirrors relational.py:shipping_priority
    sql["shipping_priority"] = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""

    # TPC-H Q14-style promotion effect per ship month.  Revenue is an
    # exact 4-decimal quantity (2-dp price × 2-dp discount): both
    # engines sum int64 1e-4 units so the monthly totals are
    # drift-free, then round half-away in integer math.
    # Mirrors relational.py:promo_revenue_share
    sql["promo_revenue_share"] = """
WITH e AS (
  SELECT date_trunc('month', l_shipdate) AS month,
         CAST(round(l_extendedprice * (1 - l_discount) * 10000)
              AS BIGINT) AS rev_e4,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
), m AS (
  SELECT month,
         sum(CASE WHEN p_type = 'ECONOMY' THEN rev_e4 ELSE 0 END)
           AS promo_e4,
         sum(rev_e4) AS total_e4
  FROM e GROUP BY month
)
SELECT month,
       round(100 * CAST(promo_e4 AS DOUBLE)
             / CAST(total_e4 AS DOUBLE), 6) AS promo_share,
       CAST((total_e4 + 50) // 100 AS DOUBLE) / 100 AS revenue
FROM m
"""

    # per-type winsorized mean of events.value.
    # Mirrors relational.py:events_winsorized_mean
    sql["events_winsorized_mean"] = """
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS qlo,
         quantile_cont(value, 0.95) AS qhi
  FROM events GROUP BY 1
)
SELECT e.event_type,
       round(avg(least(greatest(e.value, q.qlo), q.qhi)), 6)
         AS wins_mean,
       round(q.qlo, 6) AS qlo,
       round(q.qhi, 6) AS qhi,
       count(*) AS n_events
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type, q.qlo, q.qhi
"""

    # per-user inter-event gap statistics (exact microsecond gaps).
    # Mirrors pipelines/temporal.py:user_gap_stats
    # watermark tumbling windows — mirrors
    # pipelines/temporal.py:watermark_window_counts (same block-4
    # delivery shuffle lateness rule as late_event_report)
    sql["watermark_window_counts"] = """
WITH o AS (
  SELECT event_type, ts,
         max(ts) OVER (PARTITION BY user_id
                       ORDER BY event_id - event_id % 4
                                + (3 - event_id % 4)
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prior_max
  FROM events
)
SELECT date_trunc('hour', ts) AS hour, event_type,
       CAST(SUM(CASE WHEN prior_max IS NULL OR ts >= prior_max
                THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
       CAST(SUM(CASE WHEN ts < prior_max THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late
FROM o GROUP BY 1, 2
"""

    # BPR implicit-feedback triples — mirrors
    # pipelines/temporal.py:bpr_triples
    sql["bpr_triples"] = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT a.user_id, a.event_type AS pos_type, b.event_type AS neg_type,
       a.n AS pos_count, b.n AS neg_count
FROM c a JOIN c b ON a.user_id = b.user_id AND a.n > b.n
"""

    # recsys leave-last-out split — mirrors
    # pipelines/temporal.py:leave_last_out_split
    sql["leave_last_out_split"] = """
WITH r AS (
  SELECT event_id, user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT event_id, user_id, event_type,
       CASE WHEN rn = 1 THEN 'test' ELSE 'train' END AS split
FROM r
"""

    # out-of-order arrival audit — mirrors
    # pipelines/temporal.py:late_event_report (arrival = block-4
    # delivery shuffle of event_id; late iff ts < running max ts of
    # earlier arrivals)
    sql["late_event_report"] = """
WITH o AS (
  SELECT user_id, ts,
         max(ts) OVER (PARTITION BY user_id
                       ORDER BY event_id - event_id % 4
                                + (3 - event_id % 4)
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS prior_max
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN ts < prior_max THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(COALESCE(MAX(CASE WHEN ts < prior_max
                     THEN epoch_us(prior_max) - epoch_us(ts) END), 0)
            AS BIGINT) AS max_lateness_us
FROM o GROUP BY user_id
"""

    sql["user_gap_stats"] = """
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id),
                   ts) AS gap
  FROM events
)
SELECT user_id, count(*) AS n_gaps,
       round(avg(CAST(gap AS DOUBLE)) / 1000000, 6) AS mean_gap_s,
       CAST(max(gap) AS BIGINT) AS max_gap_us
FROM g WHERE gap IS NOT NULL
GROUP BY user_id
"""

    # year-over-year monthly revenue growth (exact cent sums,
    # integer month key).  Mirrors relational.py:revenue_yoy
    sql["revenue_yoy"] = """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         date_part('year', o_orderdate) * 12
           + date_part('month', o_orderdate) - 1 AS ym,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2
)
SELECT cur.month,
       CAST(cur.cents AS DOUBLE) / 100 AS revenue,
       CAST(prev.cents AS DOUBLE) / 100 AS prev_revenue,
       round(CAST(cur.cents - prev.cents AS DOUBLE)
             / CAST(prev.cents AS DOUBLE), 6) AS yoy_growth
FROM m cur JOIN m prev ON cur.ym = prev.ym + 12
"""

    # column data-quality profile of the documents table.
    # Mirrors pipelines/docops.py:profile_documents
    sql["profile_documents"] = """
SELECT 'doc_id' AS col_name,
       CAST(count(*) FILTER (doc_id IS NULL) AS BIGINT) AS n_null,
       CAST(count(*) FILTER (doc_id = 0) AS BIGINT) AS n_empty
FROM documents
UNION ALL
SELECT 'text',
       CAST(count(*) FILTER (text IS NULL) AS BIGINT),
       CAST(count(*) FILTER (text = '') AS BIGINT)
FROM documents
UNION ALL
SELECT 'lang',
       CAST(count(*) FILTER (lang IS NULL) AS BIGINT),
       CAST(count(*) FILTER (lang = '') AS BIGINT)
FROM documents
UNION ALL
SELECT 'source',
       CAST(count(*) FILTER (source IS NULL) AS BIGINT),
       CAST(count(*) FILTER (source = '') AS BIGINT)
FROM documents
UNION ALL
SELECT 'n_chars',
       CAST(count(*) FILTER (n_chars IS NULL) AS BIGINT),
       CAST(count(*) FILTER (n_chars = 0) AS BIGINT)
FROM documents
"""

    # per-entity top-k co-occurrence partners.
    # Mirrors pipelines/serving.py:top_cooccurring_partners
    sql["top_cooccurring_partners"] = f"""
WITH cooc AS ({sql["cooccurrence_edges"]}),
e AS (
  SELECT start_id AS entity, end_id AS partner, "count" AS n FROM cooc
  UNION ALL
  SELECT end_id, start_id, "count" FROM cooc
)
SELECT entity, partner, n, rank FROM (
  SELECT entity, partner, n,
         CAST(row_number() OVER (PARTITION BY entity
                                 ORDER BY n DESC, partner)
              AS BIGINT) AS rank
  FROM e
) WHERE rank <= 3
"""

    # hive-partitioned export manifest (row routing per lang; the
    # manifest is read back from disk).  Mirrors
    # pipelines/docops.py:export_by_lang
    sql["export_by_lang"] = """
SELECT lang, count(*) AS n_rows FROM documents GROUP BY lang
"""

    # lang-ID confusion matrix over the labeled corpus.
    # Mirrors pipelines/docops.py:langid_confusion
    sql["langid_confusion"] = f"""
SELECT lang, pred_lang, count(*) AS n_docs
FROM ({sql["lang_id"]})
GROUP BY 1, 2
"""

    # per-doc mean bigram NLL under the corpus MLE bigram model.
    # Mirrors pipelines/docops.py:bigram_nll
    sql["bigram_nll"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
), db AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ws)),
                               i -> ws[i] || ' ' || ws[i + 1])) AS b
  FROM toks WHERE len(ws) >= 2
), bc AS (SELECT b, count(*) AS c FROM db GROUP BY b),
ctx AS (
  SELECT string_split(b, ' ')[1] AS w1, sum(c) AS n
  FROM bc GROUP BY 1
)
SELECT db.doc_id,
       count(*) AS n_bigrams,
       round(avg(-ln(CAST(bc.c AS DOUBLE) / ctx.n)), 6) AS bigram_nll
FROM db
JOIN bc USING (b)
JOIN ctx ON string_split(db.b, ' ')[1] = ctx.w1
GROUP BY db.doc_id
"""

    # curriculum length binning (ntile semantics).
    # Mirrors pipelines/docops.py:length_buckets
    sql["length_buckets"] = """
SELECT doc_id, n_chars,
       CAST(ntile(8) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
         AS bucket
FROM documents
"""

    # chi-square independence of source × lang (full cross product
    # incl. zero cells).  Mirrors pipelines/docops.py:source_lang_chi2
    sql["source_lang_chi2"] = """
WITH c AS (
  SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2
), r AS (SELECT source, sum(o) AS ro FROM c GROUP BY 1),
l AS (SELECT lang, sum(o) AS co FROM c GROUP BY 1),
n AS (SELECT sum(o) AS n FROM c),
grid AS (
  SELECT r.source, l.lang, r.ro, l.co, coalesce(c.o, 0) AS o
  FROM r CROSS JOIN l LEFT JOIN c USING (source, lang)
)
SELECT round(sum((o - ro * co / n.n) * (o - ro * co / n.n)
                 / (ro * co / n.n)), 6) AS chi2,
       CAST(((SELECT count(*) FROM r) - 1)
            * ((SELECT count(*) FROM l) - 1) AS BIGINT) AS dof,
       CAST(n.n AS BIGINT) AS n_docs
FROM grid, n GROUP BY n.n
"""

    # per-user Shannon entropy over event types.
    # Mirrors relational.py:user_type_entropy
    sql["user_type_entropy"] = """
WITH ut AS (
  SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
), u AS (SELECT user_id, sum(c) AS n FROM ut GROUP BY 1)
SELECT ut.user_id,
       CAST(u.n AS BIGINT) AS n_events,
       round(-sum((c / u.n) * ln(c / u.n)), 6) AS type_entropy
FROM ut JOIN u USING (user_id) GROUP BY ut.user_id, u.n
"""

    # percent-rank normalization of the quality score.
    # Mirrors pipelines/docops.py:quality_percentile
    sql["quality_percentile"] = f"""
SELECT doc_id, quality,
       round(percent_rank() OVER (ORDER BY quality), 6) AS quality_pct
FROM ({sql["quality_scores"]})
"""

    # first-order Markov transition counts between consecutive
    # per-user events.  Mirrors pipelines/temporal.py:event_transitions
    sql["event_transitions"] = """
WITH o AS (
  SELECT event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       count(*) AS n_transitions
FROM o WHERE next_type IS NOT NULL
GROUP BY 1, 2
"""

    # KL(source ‖ corpus) over unigram distributions.
    # Mirrors pipelines/docops.py:source_kl_divergence
    sql["source_kl_divergence"] = """
WITH toks AS (
  SELECT source, unnest(string_split(trim(text), ' ')) AS w
  FROM documents WHERE trim(text) != ''
), sw AS (
  SELECT source, w, count(*) AS c FROM toks GROUP BY 1, 2
), s AS (
  SELECT source, sum(c) AS n FROM sw GROUP BY 1
), tot AS (
  SELECT w, sum(c) AS cw FROM sw GROUP BY 1
), nn AS (SELECT sum(c) AS n FROM sw)
SELECT sw.source,
       CAST(s.n AS BIGINT) AS n_tokens,
       round(sum((CAST(sw.c AS DOUBLE) / s.n)
                 * ln((CAST(sw.c AS DOUBLE) / s.n)
                      / (CAST(tot.cw AS DOUBLE) / nn.n))), 6) AS kl
FROM sw JOIN s USING (source) JOIN tot USING (w), nn
GROUP BY sw.source, s.n
"""

    # top-k BPE merge-candidate char pairs within words.
    # Mirrors pipelines/docops.py:bpe_merge_pairs
    sql["bpe_merge_pairs"] = """
WITH words AS (
  SELECT unnest(string_split(trim(text), ' ')) AS w
  FROM documents WHERE trim(text) != ''
), idx AS (
  SELECT w, unnest(generate_series(1, length(w) - 1)) AS i
  FROM words WHERE length(w) >= 2
), counts AS (
  SELECT substr(w, i, 2) AS pair, count(*) AS n_occurrences
  FROM idx GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair)
            AS BIGINT) AS rank,
       pair, n_occurrences
FROM counts
ORDER BY n_occurrences DESC, pair
LIMIT 20
"""

    # per-doc OOV rate vs the capped top-20 corpus vocabulary.
    # Mirrors pipelines/docops.py:oov_rate
    sql["oov_rate"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
  FROM documents WHERE trim(text) != ''
), counts AS (
  SELECT w, count(*) AS c FROM toks GROUP BY w
), vocab AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY c DESC, w) AS rn FROM counts
  ) WHERE rn <= 20
)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS oov_rate
FROM toks LEFT JOIN vocab v USING (w)
GROUP BY doc_id
"""

    # Crawl-URL synthesis + canonicalization (formulas and regex chain
    # mirror pipelines/webcrawl.py — same RE2 on both engines).
    _crawl_canon = """
raw AS (
  SELECT doc_id, n_chars,
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END)
    || '://'
    || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
    || '.example.com/item-' || CAST(doc_id % 56 AS VARCHAR)
    || (CASE WHEN doc_id % 11 = 0 THEN '/' ELSE '' END)
    || (CASE WHEN doc_id % 2 = 0
             THEN '?utm_source=feed&utm_campaign=c'
                  || CAST(doc_id % 5 AS VARCHAR)
             ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0
             THEN (CASE WHEN doc_id % 2 = 0 THEN '&' ELSE '?' END)
                  || 'page=' || CAST(doc_id % 4 AS VARCHAR)
             ELSE '' END)
    || (CASE WHEN doc_id % 3 = 0
             THEN '#sec' || CAST(doc_id % 7 AS VARCHAR)
             ELSE '' END)
    AS url
  FROM documents
),
canon AS (
  SELECT doc_id, n_chars,
    lower(regexp_extract(u, '^([^/]+//[^/]+)', 1))
      || regexp_extract(u, '^[^/]+//[^/]+(.*)$', 1) AS canon_url
  FROM (
    SELECT doc_id, n_chars,
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(url, '#.*$', '', 'g'),
            '(utm_[a-z]+|ref)=[^&]*&?', '', 'g'),
          '[?&]$', '', 'g'),
        '([^/])/$', '\\1', 'g') AS u
    FROM raw)
)
"""

    # crawl dedup by canonical URL (D5 generalized; min-key keep).
    # Mirrors pipelines/webcrawl.py:url_dedup
    sql["url_dedup"] = f"""
WITH {_crawl_canon}
SELECT canon_url, min(doc_id) AS keep_doc_id, count(*) AS n_docs
FROM canon GROUP BY canon_url
"""

    # per-host crawl rollup.  Mirrors pipelines/webcrawl.py:host_stats
    sql["host_stats"] = f"""
WITH {_crawl_canon}
SELECT regexp_extract(canon_url, '^[^/]+//([^/]+)', 1) AS host,
       count(*) AS n_docs,
       count(DISTINCT canon_url) AS n_pages,
       round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
FROM canon GROUP BY 1
"""

    # crawl deny-list gate over canonical URLs.
    # Mirrors pipelines/webcrawl.py:url_blocklist_filter
    sql["url_blocklist_filter"] = f"""
WITH {_crawl_canon}
SELECT doc_id, canon_url
FROM canon
WHERE NOT (canon_url LIKE 'https://src3.example.com/%'
           OR canon_url LIKE 'https://src7.example.com/item-1%')
"""

    # FineWeb-style per-host document quota.
    # Mirrors pipelines/webcrawl.py:host_cap_sample
    sql["host_cap_sample"] = f"""
WITH {_crawl_canon},
hosted AS (
  SELECT regexp_extract(canon_url, '^[^/]+//([^/]+)', 1) AS host,
         doc_id, n_chars
  FROM canon
),
ranked AS (
  SELECT host, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY host ORDER BY n_chars DESC, doc_id
         ) AS rank
  FROM hosted
)
SELECT host, doc_id, n_chars, rank FROM ranked WHERE rank <= 5
"""

    # full-outer per-nation account reconciliation.
    # Mirrors relational.py:nation_account_reconciliation
    sql["nation_account_reconciliation"] = """
WITH s AS (
  SELECT s_nationkey, count(*) AS n_suppliers,
         round(sum(s_acctbal), 2) AS supp_acctbal
  FROM supplier GROUP BY 1
), c AS (
  SELECT c_nationkey, count(*) AS n_customers,
         round(sum(c_acctbal), 2) AS cust_acctbal
  FROM customer GROUP BY 1
)
SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
       coalesce(n_suppliers, 0) AS n_suppliers,
       coalesce(supp_acctbal, 0.0) AS supp_acctbal,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(cust_acctbal, 0.0) AS cust_acctbal,
       CASE WHEN s_nationkey IS NOT NULL AND c_nationkey IS NOT NULL
              THEN 'both'
            WHEN s_nationkey IS NOT NULL THEN 'supplier_only'
            ELSE 'customer_only' END AS category
FROM s FULL OUTER JOIN c ON s_nationkey = c_nationkey
"""

    # per-returnflag median + MAD of l_quantity (quantile_cont rank
    # semantics).  Mirrors relational.py:lineitem_quantity_mad
    sql["lineitem_quantity_mad"] = """
WITH m AS (
  SELECT l_returnflag, median(CAST(l_quantity AS DOUBLE)) AS med
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       round(m.med, 6) AS med,
       round(median(abs(CAST(l.l_quantity AS DOUBLE) - m.med)), 6)
         AS mad,
       count(*) AS n_items
FROM lineitem l JOIN m USING (l_returnflag)
GROUP BY l.l_returnflag, m.med
"""

    # weekly retention cohorts.  Mirrors relational.py:retention_cohorts
    sql["retention_cohorts"] = """
WITH uw AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
), cohort AS (
  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT c.cohort_week,
       CAST(date_diff('day', c.cohort_week, u.week) / 7 AS BIGINT)
         AS week_offset,
       count(*) AS n_users
FROM uw u JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""

    # --- round 4: scored ambiguity-aware grounding (Gilda analog).
    # Mirrors stages/grounding.py: candidate table + query pool as
    # VALUES, deterministic score 100 - 20*tier - 10*status - ns.
    # Eidos TimeNorm analog (process_eidos.py:11-45 interval payloads):
    # calendar arithmetic mirrored from pipelines/contexts.py
    # normalize_timex — day / Monday-start-week / calendar-month
    # offsets against the per-alert DCT; hedges stay NULL.
    from outbreak_kg_ray.pipelines.contexts import TIMEX_POOL

    tp_rows = ", ".join(
        f"({i}, '{_q(p)}', '{k}', {n}, "
        + (f"'{a}'" if a else "NULL") + ", "
        + (f"'{b}'" if b else "NULL") + ")"
        for i, (p, k, n, a, b) in enumerate(TIMEX_POOL)
    )
    fmt = "'%Y-%m-%d %H:%M:%S'"
    sql["timex_normalized"] = f"""
WITH tp(idx, phrase, kind, n, a_start, a_end) AS (VALUES {tp_rows}),
d AS (
  SELECT doc_id,
         TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS dct,
         (doc_id * 7 + 3) % {len(TIMEX_POOL)} AS pidx
  FROM documents
)
SELECT d.doc_id, t.phrase, strftime(d.dct, {fmt}) AS anchor_ts,
  CASE t.kind
    WHEN 'abs' THEN t.a_start
    WHEN 'day' THEN strftime(date_trunc('day', d.dct)
                             + t.n * INTERVAL 1 DAY, {fmt})
    WHEN 'week' THEN strftime(date_trunc('week', d.dct)
                              + t.n * INTERVAL 7 DAY, {fmt})
    WHEN 'month' THEN strftime(date_trunc('month', d.dct)
                               + t.n * INTERVAL 1 MONTH, {fmt})
  END AS interval_start,
  CASE t.kind
    WHEN 'abs' THEN t.a_end
    WHEN 'day' THEN strftime(date_trunc('day', d.dct)
                             + (t.n + 1) * INTERVAL 1 DAY
                             - INTERVAL 1 SECOND, {fmt})
    WHEN 'week' THEN strftime(date_trunc('week', d.dct)
                              + (t.n + 1) * INTERVAL 7 DAY
                              - INTERVAL 1 SECOND, {fmt})
    WHEN 'month' THEN strftime(date_trunc('month', d.dct)
                               + (t.n + 1) * INTERVAL 1 MONTH
                               - INTERVAL 1 SECOND, {fmt})
  END AS interval_end
FROM d JOIN tp t ON t.idx = d.pidx
"""

    sql["scored_groundings"] = f"""
WITH {_ground_ctes()}
SELECT qid, query, ns, id, entry_name, status, match_tier, score,
       row_number() OVER (PARTITION BY qid ORDER BY score DESC, ns, id)
         AS "rank"
FROM gm
"""

    sql["grounding_curies"] = f"""
WITH {_ground_ctes()},
best AS (
  SELECT qid, ns || ':' || id AS bcurie,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, ns, id)
           AS rn
  FROM gm
)
SELECT q.qid, q.query,
       CASE WHEN q.query LIKE '%:%' THEN q.query ELSE b.bcurie END AS curie
FROM q LEFT JOIN (SELECT qid, bcurie FROM best WHERE rn = 1) b USING (qid)
"""

    sql["ambiguous_groundings"] = f"""
WITH {_ground_ctes()},
r AS (
  SELECT query, ns, id,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, ns, id)
           AS rnk,
         count(*) OVER (PARTITION BY qid) AS n_candidates
  FROM gm
)
SELECT DISTINCT query, n_candidates, ns || ':' || id AS best_curie
FROM r WHERE rnk = 1 AND n_candidates > 1
"""

    # incremental KG maintenance: the oracle IS the full rebuild —
    # the correctness contract is rebuild-equivalence.
    sql["kg_incremental_edges"] = sql["canonical_edges"]
    sql["kg_incremental_nodes"] = sql["canonical_nodes"]

    # case-count phrase extraction (pipelines/contexts.py
    # parse_case_count mirrored: digit groups with comma strip win,
    # then word-numbers/negation; kind plural-normalized).
    from outbreak_kg_ray.pipelines.contexts import CASE_PHRASES

    cp_rows = ", ".join(
        f"({i}, '{_q(p)}')" for i, p in enumerate(CASE_PHRASES)
    )
    _cc_cte = f"""
cp(idx, phrase) AS (VALUES {cp_rows}),
cc AS (
  SELECT d.doc_id, p.phrase,
    CASE WHEN regexp_extract(p.phrase,
              '\\b(cases?|deaths?|infections?)\\b', 1) LIKE '%s'
         THEN regexp_extract(p.phrase,
              '\\b(cases?|deaths?|infections?)\\b', 1)
         ELSE regexp_extract(p.phrase,
              '\\b(cases?|deaths?|infections?)\\b', 1) || 's'
    END AS kind,
    CASE
      WHEN regexp_matches(p.phrase, '\\d')
        THEN CAST(replace(regexp_extract(p.phrase, '(\\d[\\d,]*)', 1),
                          ',', '') AS BIGINT)
      WHEN regexp_matches(p.phrase, '\\bno\\b') THEN 0
      WHEN regexp_matches(p.phrase, '\\bone\\b') THEN 1
      WHEN regexp_matches(p.phrase, '\\btwo\\b') THEN 2
      WHEN regexp_matches(p.phrase, '\\bthree\\b') THEN 3
      ELSE NULL
    END AS n
  FROM documents d JOIN cp p ON p.idx = (d.doc_id * 11 + 5) % {len(CASE_PHRASES)}
)"""

    sql["case_counts"] = f"""
WITH {_cc_cte}
SELECT doc_id, phrase, kind, n FROM cc
"""

    sql["case_count_edges"] = f"""
WITH {_cc_cte}
SELECT 'promed:' || printf('%08d.%d', 20200000 + doc_id % 10000,
                           1000000 + doc_id) AS start_id,
       'has_case_count' AS rel_type,
       'outbreak_kind:' || kind AS end_id,
       n AS "count"
FROM cc WHERE n IS NOT NULL
"""

    # composed: per-disease case totals (disease-typed distinct
    # mentions ⋈ parsed case counts on doc_id)
    sql["disease_case_totals"] = f"""
{_kg_prefix()},
{_cc_cte}
SELECT m.mesh_id, m.name, CAST(SUM(c.n) AS BIGINT) AS total_cases,
       COUNT(*) AS n_alerts
FROM dment m JOIN cc c USING (doc_id)
WHERE m.mtype = 'disease' AND c.n IS NOT NULL
GROUP BY m.mesh_id, m.name
"""

    # typed relation-pattern extraction (pipelines/relations.py):
    # the oracle replays the sentence-synthesis formula and
    # independently re-derives predicate + inverse-swap + type gates
    # (the engine side does real regex classification + grounding).
    from outbreak_kg_ray.pipelines.relations import NT, REL_TEMPLATES

    sent_case = "CASE tid " + " ".join(
        "WHEN {i} THEN {e}".format(
            i=i,
            e="'"
            + _q(t)
            .replace("{a}", "' || a_name || '")
            .replace("{b}", "' || b_name || '")
            + "'",
        )
        for i, t in enumerate(REL_TEMPLATES)
    ) + " END"

    _rel_ctes = f"""
relbase AS (
  SELECT d.doc_id, (d.doc_id * 7 + 3) % {NT} AS tid,
         a.name AS a_name, a.mesh_id AS a_id, a.mtype AS a_type,
         b.name AS b_name, b.mesh_id AS b_id, b.mtype AS b_type
  FROM documents d
  JOIN lex a ON a.idx = (d.doc_id * 17) % {lex.LEX_N}
  JOIN lex b ON b.idx = (d.doc_id * 17 + 31) % {lex.LEX_N}
),
relc AS (
  SELECT doc_id, tid,
    CASE WHEN tid IN (0, 1, 9) THEN 'causes'
         WHEN tid IN (2, 8) THEN 'transmitted_by'
         WHEN tid IN (3, 4, 7) THEN 'located_in' END AS rel_type,
    CASE WHEN tid IN (1, 9) THEN b_name ELSE a_name END AS subj_text,
    CASE WHEN tid IN (1, 9) THEN a_name ELSE b_name END AS obj_text,
    CASE WHEN tid IN (1, 9) THEN b_id ELSE a_id END AS subj_id,
    CASE WHEN tid IN (1, 9) THEN a_id ELSE b_id END AS obj_id,
    CASE WHEN tid IN (1, 9) THEN b_type ELSE a_type END AS subj_type,
    CASE WHEN tid IN (1, 9) THEN a_type ELSE b_type END AS obj_type
  FROM relbase
),
gated AS (
  SELECT doc_id, rel_type,
         'MESH:' || subj_id AS start_id, 'MESH:' || obj_id AS end_id
  FROM relc
  WHERE subj_id <> obj_id AND (
    (rel_type = 'causes' AND subj_type = 'pathogen'
       AND obj_type = 'disease') OR
    (rel_type = 'transmitted_by'
       AND subj_type IN ('disease', 'pathogen')
       AND obj_type = 'pathogen') OR
    (rel_type = 'located_in'
       AND subj_type IN ('disease', 'pathogen')
       AND obj_type = 'geoloc'))
)"""

    sql["relation_sentences"] = f"""
WITH {_lex_cte()},
{_rel_ctes}
SELECT doc_id, {sent_case} AS sentence FROM relbase
"""

    sql["pattern_relations"] = f"""
WITH {_lex_cte()},
{_rel_ctes}
SELECT doc_id, rel_type, subj_text, obj_text
FROM relc WHERE rel_type IS NOT NULL
"""

    sql["typed_relation_edges"] = f"""
WITH {_lex_cte()},
{_rel_ctes}
SELECT DISTINCT start_id, rel_type, end_id FROM gated
"""

    sql["relation_evidence"] = f"""
WITH {_lex_cte()},
{_rel_ctes}
SELECT start_id, rel_type, end_id, COUNT(*) AS n_alerts
FROM gated GROUP BY start_id, rel_type, end_id
"""

    sql["relation_type_counts"] = f"""
WITH {_lex_cte()},
{_rel_ctes},
ev AS (SELECT start_id, rel_type, end_id, COUNT(*) AS n_alerts
       FROM gated GROUP BY start_id, rel_type, end_id)
SELECT rel_type, COUNT(*) AS n_edges,
       CAST(SUM(n_alerts) AS BIGINT) AS n_alerts
FROM ev GROUP BY rel_type
"""

    sql["disease_causers"] = f"""
WITH {_lex_cte()},
{_rel_ctes},
ev AS (SELECT start_id, rel_type, end_id, COUNT(*) AS n_alerts
       FROM gated WHERE rel_type = 'causes'
       GROUP BY start_id, rel_type, end_id)
SELECT e.end_id AS disease_id, l.name AS disease_name,
       COUNT(*) AS n_pathogens, CAST(SUM(e.n_alerts) AS BIGINT) AS n_alerts
FROM ev e JOIN lex l ON ('MESH:' || l.mesh_id) = e.end_id
GROUP BY e.end_id, l.name
"""

    # Mirrors pipelines/docops.py:perplexity_buckets — the unigram
    # model CTE is unigram_logprob's, plus lang passthrough and the
    # per-lang value-deterministic tercile thresholds.
    sql["perplexity_buckets"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
  FROM documents WHERE trim(text) <> ''
), cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
tot AS (SELECT sum(c) AS t FROM cnt),
vocab AS (
  SELECT w, c FROM (
    SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rn FROM cnt
  ) WHERE rn <= 65536
),
oov AS (
  SELECT (SELECT t FROM tot) - coalesce(sum(c), 0) AS m FROM vocab
),
scored AS (
  SELECT t.doc_id, d.lang,
         round(avg(CASE WHEN v.w IS NOT NULL THEN -ln(v.c / tot.t)
                        ELSE -ln(oov.m / tot.t) END), 6) AS nll_mean
  FROM toks t JOIN documents d USING (doc_id)
       LEFT JOIN vocab v USING (w) CROSS JOIN tot CROSS JOIN oov
  GROUP BY t.doc_id, d.lang
),
hist AS (SELECT lang, nll_mean, count(*) AS c FROM scored GROUP BY 1, 2),
tot_l AS (SELECT lang, count(*) AS n FROM scored GROUP BY lang),
cum AS (
  SELECT lang, nll_mean,
         sum(c) OVER (PARTITION BY lang ORDER BY nll_mean) AS cc
  FROM hist
),
thr AS (
  SELECT c.lang,
         min(CASE WHEN cc >= (n + 2) // 3 THEN nll_mean END) AS h,
         min(CASE WHEN cc >= (2 * n + 2) // 3 THEN nll_mean END) AS m
  FROM cum c JOIN tot_l USING (lang) GROUP BY c.lang
)
SELECT s.doc_id, s.lang, s.nll_mean,
       CASE WHEN s.nll_mean <= t.h THEN 'head'
            WHEN s.nll_mean <= t.m THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s JOIN thr t USING (lang)
"""

    # Mirrors pipelines/bpe.py — iterative BPE merge learning, 10
    # unrolled rounds (same unrolled-CTE pattern as pagerank ×10).
    # Greedy left-to-right merge application is reproduced with the
    # double-space replace trick: doubling every separator means
    # adjacent matches can't share a delimiter character, so leftmost
    # non-overlapping replace == the trainer's greedy merge (pinned
    # equivalent to pipelines/bpe.py:merge_word by the cross-check in
    # tests/test_bpe.py).
    def _bpe_cte_chain(m: int, v: int) -> str:
        parts = ["""WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
  FROM documents WHERE trim(text) != ''
), cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
vocab AS (
  SELECT w, c FROM (
    SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rn FROM cnt
  ) WHERE rn <= %d
),
seg0 AS (
  SELECT w, c, array_to_string(regexp_extract_all(w, '(?s).'), ' ') AS s
  FROM vocab
)""" % v]
        for i in range(1, m + 1):
            parts.append("""p%d AS (
  SELECT l[j] AS lft, l[j+1] AS rgt, CAST(sum(c) AS BIGINT) AS n
  FROM (SELECT string_split(s, ' ') AS l, c FROM seg%d) sp,
       unnest(generate_series(1, len(l) - 1)) AS u(j)
  GROUP BY 1, 2
),
best%d AS (SELECT lft, rgt, n FROM p%d ORDER BY n DESC, lft, rgt LIMIT 1),
seg%d AS (
  SELECT w, c,
         CASE WHEN b.lft IS NULL THEN s
              ELSE trim(replace(replace(
                     ' ' || replace(s, ' ', '  ') || ' ',
                     ' ' || b.lft || '  ' || b.rgt || ' ',
                     ' ' || b.lft || b.rgt || ' '), '  ', ' '))
         END AS s
  FROM seg%d LEFT JOIN best%d b ON TRUE
)""" % (i, i - 1, i, i, i, i - 1, i))
        return ",\n".join(parts)

    _bpe_m, _bpe_v = 10, 1 << 15
    sql["bpe_learned_merges"] = _bpe_cte_chain(_bpe_m, _bpe_v) + """
SELECT * FROM (
""" + "\nUNION ALL\n".join(
        "  SELECT CAST(%d AS BIGINT) AS rank, lft AS left_sym,"
        " rgt AS right_sym, lft || rgt AS merged,"
        " n AS n_occurrences FROM best%d" % (i, i)
        for i in range(1, _bpe_m + 1)
    ) + """
) ORDER BY rank
"""

    # Exact at testdata scales because the top-V cut covers the whole
    # vocabulary (31 distinct words); the engine's on-the-fly OOV
    # segmentation path is pinned by the tiny-cap unit test instead.
    sql["bpe_token_counts"] = _bpe_cte_chain(_bpe_m, _bpe_v) + """
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(len(string_split(g.s, ' '))) AS BIGINT) AS n_bpe_tokens
FROM toks t JOIN seg%d g ON t.w = g.w
GROUP BY t.doc_id
""" % _bpe_m

    # --- classical-ML corpus statistics (pipelines/mlstats.py) ---

    # OLS of ln(count) on ln(rank) over the top-65536 tokens by
    # (count DESC, token ASC) — mirrors mlstats.zipf_slope (below the
    # cap at all testdata scales, so the fit covers the full vocab)
    sql["zipf_slope"] = """
WITH toks AS (
  SELECT unnest(string_split(trim(text), ' ')) AS w
  FROM documents WHERE trim(text) <> ''
), cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rn FROM cnt
)
SELECT count(*) AS n_vocab,
       round(regr_slope(ln(c), ln(rn)), 6) AS slope,
       round(regr_intercept(ln(c), ln(rn)), 6) AS intercept
FROM ranked WHERE rn <= 65536
HAVING count(*) >= 2
"""

    # multinomial Laplace-1 NB over source labels; capped vocab is
    # the full vocab below 65536 (all testdata scales).  Mirrors
    # mlstats.nb_source_scores: score(d, c) = ln prior(c) +
    # Σ_tokens ln((count(c,w)+1) / (n_tok(c) + V))
    _nb_cte = """
toks AS (
  SELECT doc_id, source, unnest(string_split(trim(text), ' ')) AS w
  FROM documents WHERE trim(text) <> ''
),
cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
vocab AS (
  SELECT w FROM (
    SELECT w, row_number() OVER (ORDER BY c DESC, w) AS rn FROM cnt
  ) WHERE rn <= 65536
),
vs AS (SELECT count(*) AS v FROM vocab),
ft AS (SELECT t.* FROM toks t JOIN vocab USING (w)),
cls AS (SELECT source AS cls_source, count(*) AS n_tok
        FROM ft GROUP BY source),
cw AS (SELECT source AS cls_source, w, count(*) AS c
       FROM ft GROUP BY source, w),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
prior AS (
  SELECT source AS cls_source,
         ln(count(DISTINCT doc_id) / CAST(nd.n AS DOUBLE)) AS lp
  FROM toks CROSS JOIN nd GROUP BY source, nd.n
),
scores AS (
  SELECT f.doc_id, c.cls_source,
         p.lp + sum(ln((coalesce(x.c, 0) + 1.0)
                       / (c.n_tok + 1.0 * vs.v))) AS logprob
  FROM ft f
  CROSS JOIN cls c
  CROSS JOIN vs
  JOIN prior p ON p.cls_source = c.cls_source
  LEFT JOIN cw x ON x.cls_source = c.cls_source AND x.w = f.w
  GROUP BY f.doc_id, c.cls_source, p.lp
)
"""
    sql["nb_source_scores"] = f"""
WITH {_nb_cte}
SELECT doc_id, cls_source, round(logprob, 6) AS logprob FROM scores
"""

    # argmax by (ROUNDED logprob DESC, class ASC) — rounding before
    # ranking makes the argmax reproducible across summation orders
    sql["nb_source_pred"] = f"""
WITH {_nb_cte}
SELECT doc_id, cls_source AS pred_source, logprob FROM (
  SELECT doc_id, cls_source, round(logprob, 6) AS logprob,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY round(logprob, 6) DESC, cls_source
         ) AS rn
  FROM scores
) WHERE rn = 1
"""

    # population covariance of the embedding column, long
    # upper-triangle format, 0-based dims — mirrors
    # mlstats.embedding_covariance's moment-pass formula
    sql["embedding_covariance"] = """
WITH vals AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
)
SELECT a.i AS i, b.i AS j, round(covar_pop(a.x, b.x), 6) AS cov
FROM vals a JOIN vals b USING (vec_id)
WHERE a.i <= b.i
GROUP BY a.i, b.i
"""

    # SCD-Type-2 validity intervals from the event change log —
    # mirrors relational.user_type_scd2 (run collapse over
    # (ts, event_id) order; open interval's valid_to is NULL)
    sql["user_type_scd2"] = """
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CASE WHEN prev_type IS NULL
                   OR prev_type <> event_type THEN 1 ELSE 0 END
              AS is_start
  FROM o
), g AS (
  SELECT *, sum(is_start)
              OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS grp
  FROM s
), iv AS (
  SELECT user_id, event_type, grp, min(ts) AS valid_from,
         count(*) AS n_events
  FROM g GROUP BY user_id, event_type, grp
)
SELECT user_id, event_type, valid_from,
       lead(valid_from)
         OVER (PARTITION BY user_id ORDER BY grp) AS valid_to,
       n_events
FROM iv
"""

    # T5 span corruption with the deterministic mask
    # (doc_id + p) % 7 < 2 — mirrors pipelines/lmdata.py: contiguous
    # masked runs collapse to one numbered sentinel in the input and
    # enumerate after their sentinel in the target
    sql["span_corruption_pairs"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w,
         generate_subscripts(string_split(trim(text), ' '), 1) AS p
  FROM documents WHERE trim(text) <> ''
), m AS (
  SELECT doc_id, w, p,
         ((doc_id + p) % 7) < 2 AS msk
  FROM toks
), sp AS (
  SELECT *,
         msk AND NOT coalesce(
           lag(msk) OVER (PARTITION BY doc_id ORDER BY p), FALSE
         ) AS strt
  FROM m
), kk AS (
  SELECT *,
         CAST(sum(CASE WHEN strt THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY p) AS BIGINT) - 1
           AS k
  FROM sp
)
SELECT doc_id,
       coalesce(string_agg(
         CASE WHEN NOT msk THEN w
              WHEN strt THEN '<extra_id_' || k || '>' END,
         ' ' ORDER BY p), '') AS input_text,
       coalesce(string_agg(
         CASE WHEN msk AND strt
                THEN '<extra_id_' || k || '> ' || w
              WHEN msk THEN w END,
         ' ' ORDER BY p), '') AS target_text,
       CAST(sum(CASE WHEN msk THEN 1 ELSE 0 END) AS BIGINT)
         AS n_masked
FROM kk GROUP BY doc_id
"""

    # word2vec negative-sampling table — mirrors
    # pipelines/lmdata.py:negative_sampling_table (integer
    # microweights round(freq^0.75 * 1e6) make the cumulative slot
    # boundaries exact in both engines; 2^16 slots)
    sql["negative_sampling_table"] = r"""
WITH tf AS (
  SELECT w, COUNT(*) AS freq FROM (
    SELECT unnest(list_filter(string_split(text, ' '),
                              x -> x <> '')) AS w
    FROM documents
  ) GROUP BY w
),
mw AS (
  SELECT w, freq,
         CAST(round(pow(freq, 0.75) * 1000000) AS BIGINT) AS m
  FROM tf
),
c AS (
  SELECT w, freq, m,
         COALESCE(SUM(m) OVER (
             ORDER BY freq DESC, w ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS lo,
         SUM(m) OVER () AS tot
  FROM mw
)
SELECT w AS token, freq,
       CAST((65536 * (lo + m)) // tot - (65536 * lo) // tot
            AS BIGINT) AS n_slots
FROM c
"""

    # deterministic token-dropout augmentation — mirrors
    # pipelines/lmdata.py:token_dropout_augment
    sql["token_dropout_augment"] = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
fan AS (
  SELECT t.doc_id, a.aug_id, t.ws
  FROM toks t, (VALUES (0), (1)) a(aug_id)
),
pos AS (
  SELECT doc_id, aug_id, ws[CAST(p AS INT)] AS w, p
  FROM fan, LATERAL unnest(range(1, len(ws) + 1)) AS z(p)
  WHERE (doc_id + aug_id + p) % 7 <> 0
)
SELECT f.doc_id, CAST(f.aug_id AS BIGINT) AS aug_id,
       COALESCE(p.txt, '') AS text
FROM fan f
LEFT JOIN (
  SELECT doc_id, aug_id, string_agg(w, ' ' ORDER BY p) AS txt
  FROM pos GROUP BY doc_id, aug_id
) p ON p.doc_id = f.doc_id AND p.aug_id = f.aug_id
"""

    # SentencePiece-style character coverage — mirrors
    # pipelines/lmdata.py:char_coverage_table (integer in_vocab cut)
    sql["char_coverage_table"] = """
WITH chars AS (
  SELECT substr(text, CAST(t.i AS INT), 1) AS ch
  FROM documents, LATERAL unnest(range(1, len(text) + 1)) AS t(i)
),
f AS (SELECT ch, COUNT(*) AS freq FROM chars GROUP BY ch),
r AS (
  SELECT ch, freq,
         COALESCE(SUM(freq) OVER (
             ORDER BY freq DESC, ch ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS cumb,
         SUM(freq) OVER (ORDER BY freq DESC, ch ASC) AS cum,
         SUM(freq) OVER () AS tot
  FROM f
)
SELECT ch, freq,
       round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
         AS coverage,
       cumb * 10000 < tot * 9995 AS in_vocab
FROM r
"""

    # GloVe distance-weighted co-occurrence — mirrors
    # pipelines/lmdata.py:glove_cooccurrence (integer-twelfth
    # accumulation: 12/d is exact for d <= 4)
    sql["glove_cooccurrence"] = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS w,
         generate_subscripts(
           list_filter(string_split(text, ' '), x -> x <> ''), 1) AS p
  FROM documents
),
s AS (
  SELECT a.w AS center, b.w AS context,
         SUM(12 // abs(a.p - b.p)) AS w12
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND a.p <> b.p AND abs(a.p - b.p) <= 4
  GROUP BY 1, 2
)
SELECT center, context,
       round(CAST(w12 AS DOUBLE) / 12.0, 6) AS x
FROM s WHERE w12 >= 12
"""

    # skip-gram pair counts (±2 window, min_count 2) — mirrors
    # pipelines/lmdata.py:skipgram_pairs
    sql["skipgram_pairs"] = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS w,
         generate_subscripts(
           list_filter(string_split(text, ' '), x -> x <> ''), 1) AS p
  FROM documents
)
SELECT a.w AS center, b.w AS context, COUNT(*) AS n
FROM toks a JOIN toks b
  ON a.doc_id = b.doc_id AND a.p <> b.p AND abs(a.p - b.p) <= 2
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""

    # GPT-style next-event examples: per-user lag-window contexts —
    # mirrors pipelines/lmdata.py:next_event_examples (concat_ws
    # skips NULL lags, so the context is the available prefix)
    sql["next_event_examples"] = """
WITH seq AS (
  SELECT user_id, event_id, event_type,
         lag(event_type, 1) OVER w AS p1,
         lag(event_type, 2) OVER w AS p2,
         lag(event_type, 3) OVER w AS p3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       concat_ws(' ', p3, p2, p1) AS context,
       event_type AS target
FROM seq WHERE p1 IS NOT NULL
"""

    # link prediction: top-k non-adjacent pairs by common-neighbor
    # count (+ Jaccard) over the co-occurrence graph — mirrors
    # pipelines/linkpred.py (wedge apex self-join, NOT EXISTS
    # anti-join, deterministic (n DESC, u, w) cut)
    sql["common_neighbors_topk"] = (
        graph_edges.replace(
            "e AS (SELECT start_id AS u, end_id AS v FROM cooc\n"
            "      UNION ALL SELECT end_id, start_id FROM cooc),\n"
            "nd AS (SELECT DISTINCT u AS v FROM e)",
            "ce AS (SELECT LEAST(start_id, end_id) AS lo,\n"
            "              GREATEST(start_id, end_id) AS hi\n"
            "       FROM cooc WHERE start_id <> end_id GROUP BY 1, 2),\n"
            "e AS (SELECT lo AS u, hi AS v FROM ce\n"
            "      UNION ALL SELECT hi, lo FROM ce),\n"
            "deg AS (SELECT u, count(*) AS d FROM e GROUP BY u),\n"
            "wed AS (SELECT e1.v AS u, e2.v AS w, count(*) AS n_common\n"
            "        FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v\n"
            "        GROUP BY 1, 2),\n"
            "cand AS (SELECT * FROM wed\n"
            "         WHERE NOT EXISTS (SELECT 1 FROM ce\n"
            "                WHERE ce.lo = wed.u AND ce.hi = wed.w))",
        )
        + """
SELECT c.u, c.w, c.n_common,
       round(c.n_common
             / CAST(du.d + dw.d - c.n_common AS DOUBLE), 6) AS jaccard
FROM cand c
JOIN deg du ON du.u = c.u
JOIN deg dw ON dw.u = c.w
ORDER BY c.n_common DESC, c.u, c.w LIMIT 50
"""
    )

    # one-pass OLS via sufficient statistics — the centered 2×2
    # normal-equation closed form, same covariance algebra as
    # mlstats.ols_price_model
    sql["ols_price_model"] = """
WITH s AS (
  SELECT count(*) AS n,
         avg(l_quantity) AS mq, avg(l_discount) AS md,
         avg(l_extendedprice) AS my,
         covar_pop(l_quantity, l_quantity) AS var_q,
         covar_pop(l_discount, l_discount) AS var_d,
         covar_pop(l_quantity, l_discount) AS cov_qd,
         covar_pop(l_quantity, l_extendedprice) AS cov_qy,
         covar_pop(l_discount, l_extendedprice) AS cov_dy,
         covar_pop(l_extendedprice, l_extendedprice) AS var_y
  FROM lineitem
), b AS (
  SELECT n, mq, md, my, cov_qy, cov_dy, var_y,
         (cov_qy * var_d - cov_dy * cov_qd)
           / (var_q * var_d - cov_qd * cov_qd) AS b1,
         (cov_dy * var_q - cov_qy * cov_qd)
           / (var_q * var_d - cov_qd * cov_qd) AS b2
  FROM s
)
SELECT n, round(my - b1 * mq - b2 * md, 6) AS beta0,
       round(b1, 6) AS beta_quantity, round(b2, 6) AS beta_discount,
       round((b1 * cov_qy + b2 * cov_dy) / var_y, 6) AS r2
FROM b WHERE n > 0
"""

    # Welch two-sample t of each event_type vs all other events,
    # Welch–Satterthwaite dof — mirrors mlstats.ab_test_stats
    sql["ab_test_stats"] = """
WITH g AS (
  SELECT event_type, count(*) AS n, sum(value) AS sv,
         sum(value * value) AS svv
  FROM events GROUP BY event_type
), tot AS (SELECT sum(n) AS n, sum(sv) AS sv, sum(svv) AS svv FROM g),
w AS (
  SELECT g.event_type, g.n AS n1, g.sv / g.n AS m1,
         (tot.n - g.n) AS n2, (tot.sv - g.sv) / (tot.n - g.n) AS m2,
         (g.svv - g.sv * g.sv / g.n) / (g.n - 1.0) AS s1,
         ((tot.svv - g.svv)
          - (tot.sv - g.sv) * (tot.sv - g.sv) / (tot.n - g.n))
           / (tot.n - g.n - 1.0) AS s2
  FROM g CROSS JOIN tot
)
SELECT event_type, CAST(n1 AS BIGINT) AS n, round(m1, 6) AS mean_value,
       round((m1 - m2) / sqrt(s1 / n1 + s2 / n2), 6) AS t_stat,
       round(pow(s1 / n1 + s2 / n2, 2)
             / (pow(s1 / n1, 2) / (n1 - 1.0)
                + pow(s2 / n2, 2) / (n2 - 1.0)), 6) AS dof
FROM w
"""

    # per-host language entropy over the canonical crawl hosts.  The
    # canonicalization chain lowercases the authority, so the host
    # closed-form is lower(source-with-case-noise) || '.example.com'
    # (same identity the full regex chain yields; asserted equal in
    # tests/test_mlstats.py)
    sql["host_lang_entropy"] = """
WITH hl AS (
  SELECT lower(CASE WHEN doc_id % 3 = 0 THEN upper(source)
               ELSE source END) || '.example.com' AS host,
         lang, count(*) AS c
  FROM documents GROUP BY 1, 2
), h AS (SELECT host, sum(c) AS n FROM hl GROUP BY host)
SELECT h.host, CAST(h.n AS BIGINT) AS n_docs,
       count(*) AS n_langs,
       round(ln(h.n) - sum(hl.c * ln(hl.c)) / h.n, 6) AS lang_entropy
FROM hl JOIN h USING (host) GROUP BY h.host, h.n
"""

    return sql
