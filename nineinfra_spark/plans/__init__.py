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
#: pinned first — r11 composition: (a) the FULL 39-row r6-latest
#: cohort (the artifact-derived rotation debt deferred from r10 —
#: union of CORRECTNESS_r01..r10 latest stamps, recounted from the
#: artifacts), (b) the one r10-stamped query whose PLAN+ORACLE changed
#: in r11 (the funnel empty-input guard — plan-changed queries
#: re-stamp the round they change), (c) the 8 queries NEW in r11 —
#: brand-new queries must take a window slot or they carry no stamp,
#: (d) the two rows whose executed plans the r11 review fixes changed
#: (same re-stamp rule: the split-expression dedup refactor and the
#: pagerank degree checkpoint). 39+1+8+2 = 50. After this round the
#: oldest latest-stamp is r7 (48 rows; they plus 2 slots for
#: r12-new/changed queries are the r12 window), and the one retired
#: name `sim_join_threshold` still carries its old r2 stamp
#: unexported.
_VERIFY_FIRST = [
    # (a) the full r6-latest cohort — 39 rows, artifact-derived
    "agg_cms_heavy_hitters",
    "agg_mode_deterministic",
    "ann_pq_adc_topk",
    "ann_pq_rerank_topk",
    "ann_rp_rerank_topk",
    "catalog_analyze_stats",
    "catalog_masked_view",
    "catalog_rollup_incremental",
    "catalog_rollup_routing",
    "catalog_view_lifecycle",
    "dedup_incremental_batch",
    "dedup_minhash_df_capped",
    "dedup_paragraph_exact",
    "dedup_semantic_cells",
    "dq_expectations",
    "emb_random_projection",
    "events_rolling_active_users",
    "events_transition_matrix",
    "fn_zorder_values",
    "hybrid_search_rrf",
    "join_asof_forward",
    "join_interval_bucketed",
    "q11_important_stock",
    "q16_supplier_cnt",
    "q20_potential_promotion",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q9_product_type_profit",
    "sample_mixture_lang",
    "scd2_intervals",
    "text_bigram_familiarity",
    "text_boilerplate_ngrams",
    "text_corpus_datasheet",
    "text_length_buckets",
    "text_pack_sequences",
    "text_pii_redact",
    "text_repetition_filter",
    "udf_python_udtf",
    "window_distribution_ranks",
    # (b) plan+oracle changed in r11: empty-input division guard
    # (stage ratios CASE->NULL when the prior stage count is 0)
    "events_funnel_conversion",
    # (c) new in round 11 — stamped the round they land
    "text_bpe_apply",            # frozen-merge BPE encode, in-row
    "emb_norm_outliers",         # p1/p99 norm gate, integer-exact
    "doctor_scale_witness",      # the plan doctor pinned by an oracle
    "events_funnel_windowed",    # funnel with conversion deadline
    "events_attribution_lastclick",  # last-touch revenue attribution
    "split_leakage_guard",       # dedup-cluster-aware split, leak proof
    "agg_weighted_median",       # quantity-weighted median, integer-exact
    "events_path_3gram",         # top-10 three-step user journeys
    # (d) r7 rows whose plans changed in r11 (review findings): the
    # split expression is now the shared _split_of/_SPLIT_CASE_SQL
    # pair (the guarded and plain splits could drift), and pagerank's
    # degree table is checkpointed once instead of re-aggregated every
    # power-iteration round
    "split_train_valid_test",
    "graph_pagerank_fixed",
    # deferred to r12 (latest stamp r7 — the 48 remaining rows of the
    # r7 cohort; after this round's window lands, no registered
    # query's latest stamp is older than r7):
    # agg_histogram_bins
    # agg_hll_union_rollup
    # catalog_delete_update
    # catalog_merge_timetravel
    # catalog_merge_upsert
    # catalog_partsupp_bucketed
    # dedup_connected_clusters
    # dedup_embedding_clusters
    # emb_dim_stats
    # events_retention_cohorts
    # fn_explode_outer
    # fn_url_normalize
    # fn_variant_json
    # mm_ppm_decode_stats
    # pair_contrastive_negatives
    # q10_returned_items
    # q18_large_volume_customers
    # q1_pricing_summary
    # q3_shipping_priority
    # q5_local_supplier_volume
    # q6_forecast_revenue
    # q8_market_share
    # sample_cap_per_group
    # sql_lateral_topn
    # src_binaryfile_scan
    # src_csv_malformed_modes
    # src_jdbc_roundtrip
    # src_parquet_schema_merge
    # src_python_datasource
    # stream_dedup_index
    # stream_dedup_watermark
    # stream_python_datasource
    # stream_rollup_maintenance
    # stream_session_window
    # stream_stateful_counts
    # stream_static_join
    # stream_stream_join
    # stream_upsert_snapshot
    # text_blocklist_filter
    # text_chunk_windows
    # text_idf_keywords
    # udf_scalar_python
    # window_first_last_nth
    # window_lag_lead
    # window_moving_frame
    # window_range_frame
    # window_ranking
    # window_running_agg
]

registry.set_order(_VERIFY_FIRST)

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
