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
        introspect,
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
#: pinned first — r15 composition: the FULL 50-row r10-latest cohort
#: (the artifact-derived rotation debt deferred from r14 — union of
#: CORRECTNESS_r01..r14 latest stamps; the set
#: tests/test_window_rotation.py pins). ZERO new registrations this
#: round: the registry is at rotation steady state (250 = 5 windows
#: x 50), so every new query would permanently stretch
#: re-verification past 5 rounds. The one retired name
#: `sim_join_threshold` still carries its old r2 stamp unexported.
#: Plan-changed-in-r15 queries (`bloom_skipping_read` via the
#: ADVICE probe word-pushdown, `stream_zorder_maintenance` via the
#: null-safe key_cols upsert) take the FIRST slots of the r16 window
#: per the standing rule — this round's window is verbatim the
#: verdict-pinned r10 cohort, and both plan changes were re-proven by
#: check_query at three SFs plus the full driver-contract sim.
_VERIFY_FIRST = [
    # the full r10-latest cohort — 50 rows, artifact-derived
    "agg_anomaly_mad",
    "agg_approx_sketches",
    "agg_bloom_membership",
    "agg_gini_concentration",
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
    "graph_triangle_count",
    "join_inner_equi",
    "mm_decode_features",
    "mm_frame_sample",
    "mm_metadata_extract",
    "mm_phash_neardup_64",
    "part_revenue_abc",
    "pipeline_curate_corpus",
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
    # deferred to r16 (latest stamp r11 — 50 rows, derived from the
    # CORRECTNESS artifacts by tests/test_window_rotation.py; the
    # r16 window = plan-changed-in-r15 rows first, then these):
    # agg_cms_heavy_hitters
    # agg_mode_deterministic
    # agg_weighted_median
    # ann_pq_adc_topk
    # ann_pq_rerank_topk
    # ann_rp_rerank_topk
    # catalog_analyze_stats
    # catalog_masked_view
    # catalog_rollup_incremental
    # catalog_rollup_routing
    # catalog_view_lifecycle
    # dedup_incremental_batch
    # dedup_minhash_df_capped
    # dedup_paragraph_exact
    # dedup_semantic_cells
    # doctor_scale_witness
    # dq_expectations
    # emb_norm_outliers
    # emb_random_projection
    # events_attribution_lastclick
    # events_funnel_conversion
    # events_funnel_windowed
    # events_path_3gram
    # events_rolling_active_users
    # events_transition_matrix
    # fn_zorder_values
    # graph_pagerank_fixed
    # hybrid_search_rrf
    # join_asof_forward
    # join_interval_bucketed
    # q11_important_stock
    # q16_supplier_cnt
    # q20_potential_promotion
    # q2_min_cost_supplier
    # q7_volume_shipping
    # q9_product_type_profit
    # sample_mixture_lang
    # scd2_intervals
    # split_leakage_guard
    # split_train_valid_test
    # text_bigram_familiarity
    # text_boilerplate_ngrams
    # text_bpe_apply
    # text_corpus_datasheet
    # text_length_buckets
    # text_pack_sequences
    # text_pii_redact
    # text_repetition_filter
    # udf_python_udtf
    # window_distribution_ranks
]


registry.set_order(_VERIFY_FIRST)

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
