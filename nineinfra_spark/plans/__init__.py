"""Query plan library: every SURVEY.md §2 operator as a named query.

Each module registers queries into the shared registry; importing
this package loads them all. ``registry.queries()`` /
``registry.oracles()`` back ``__spark_entry__.py``.
"""

from nineinfra_spark.plans import registry


def _load_all() -> None:
    # Import for side effect: each module registers its queries.
    from nineinfra_spark.plans import (  # noqa: F401
        aggregates,
        curate,
        dq,
        ext_dedup,
        ext_hybrid,
        ext_multimodal,
        ext_similarity,
        ext_text,
        functions_scalar,
        graph,
        joins,
        setops,
        sortlimit,
        sources_sinks,
        streaming_queries,
        tpch,
        tpch_sql,
        udfs,
        windows,
    )


_load_all()

#: Verification-priority prefix: the driver's CORRECTNESS gate checks
#: a bounded window (exactly 50) of queries in export order, so the
#: queries that most need a fresh driver-green differential row are
#: pinned first — r10 composition: (a) all 43 queries whose latest
#: driver stamp is r5 (the artifact-derived rotation debt, cleared in
#: full), (b) the one query NEW in r10, (c) the first 2 of the
#: 42-query r6-latest cohort, (d) the queries whose PLAN changed in
#: r10 (two of them r5/r6 rotation rows anyway) — every plan- or
#: oracle-changed query re-stamps the round it changed. After this
#: round no latest stamp is older than r6; the 39 remaining r6 rows
#: (listed at the bottom) lead the r11 window.
_VERIFY_FIRST = [
    # (a) the full r5-latest cohort — the artifact-derived 43-row
    # rotation debt the r9 verdict enumerated (union of
    # CORRECTNESS_r01..r09 latest stamps; recounted from the
    # artifacts, not session notes)
    "agg_approx_sketches",
    "ann_cosine_topk",
    "ann_cosine_topk_pandas",
    "ann_ivf_refined_topk",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "catalog_bucketed_join",
    "catalog_compact_small_files",
    "dedup_by_subset",
    "dedup_keep_canonical",
    "dedup_simhash",
    "distinct_projection",
    "fn_bitwise",
    "join_inner_equi",
    "mm_decode_features",
    "mm_frame_sample",
    "mm_metadata_extract",
    "project_compute",
    "project_rename_drop",
    "q13_customer_distribution",
    "q15_top_supplier",
    "sample_bernoulli",
    "sample_hash_bucket",
    "sample_stratified_hash",
    "setop_except_all",
    "setop_union_by_name",
    "sim_join_exact_oracle",
    "sink_partitioned_pruning",
    "sort_multi_key",
    "sort_within_partitions",
    "src_csv_roundtrip",
    "src_json_roundtrip",
    "src_orc_roundtrip",
    "src_text_scan",
    "stream_sliding_window",
    "stream_tumbling_window",
    "text_decontaminate",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_stats",
    "text_quality_topk_per_lang",
    "text_token_topk",
    "topk_global",
    # (b) new in round 10 — must be stamped the round it lands
    "mm_phash_neardup_64",  # 64-bit pHash, 16-bit bands, exact at ham<=3
    # (c) the r6-latest cohort, first 2 of 42 (alphabetical)
    "agg_anomaly_mad",
    "agg_bloom_membership",
    # (d) plan-changed in r10 — re-stamped the round the plan changed,
    # same as the r9 precedent: the two ranked_prefix rewrites, the
    # zero-token-guarded curation gate (also an r6 rotation row), and
    # the zero-wedge-guarded triangle stats;
    # text_quality_stats / text_quality_topk_per_lang (same guard) are
    # already in (a)
    "agg_gini_concentration",
    "part_revenue_abc",
    "pipeline_curate_corpus",
    "graph_triangle_count",
    # deferred to r11 (latest stamp r6 — the 39 remaining rows of the
    # r6 cohort; after this round's window lands, no registered
    # query's latest stamp is older than r6):
    # agg_cms_heavy_hitters, agg_mode_deterministic, ann_pq_adc_topk,
    # ann_pq_rerank_topk,
    # ann_rp_rerank_topk, catalog_analyze_stats, catalog_masked_view,
    # catalog_rollup_incremental, catalog_rollup_routing,
    # catalog_view_lifecycle, dedup_incremental_batch,
    # dedup_minhash_df_capped, dedup_paragraph_exact,
    # dedup_semantic_cells, dq_expectations, emb_random_projection,
    # events_rolling_active_users, events_transition_matrix,
    # fn_zorder_values, hybrid_search_rrf, join_asof_forward,
    # join_interval_bucketed,
    # q11_important_stock, q16_supplier_cnt, q20_potential_promotion,
    # q2_min_cost_supplier, q7_volume_shipping, q9_product_type_profit,
    # sample_mixture_lang, scd2_intervals, text_bigram_familiarity,
    # text_boilerplate_ngrams, text_corpus_datasheet,
    # text_length_buckets, text_pack_sequences, text_pii_redact,
    # text_repetition_filter, udf_python_udtf, window_distribution_ranks
]

registry.set_order(_VERIFY_FIRST)

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
