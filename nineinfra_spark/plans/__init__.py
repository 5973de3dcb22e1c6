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
#: pinned first — r14 composition: (a) the FULL 46-row r9-latest
#: cohort (the artifact-derived rotation debt deferred from r13 —
#: union of CORRECTNESS_r01..r13 latest stamps; the set
#: tests/test_window_rotation.py pins), (b) the 4 queries NEW in r14
#: — brand-new queries must take a window slot or they carry no
#: stamp. 46+4 = 50. After this round the oldest latest-stamp is r10
#: (50 rows — exactly the r15 window, zero free slots), and the one
#: retired name `sim_join_threshold` still carries its old r2 stamp
#: unexported.
_VERIFY_FIRST = [
    # (a) the full r9-latest cohort — 46 rows, artifact-derived
    "agg_ab_ttest",
    "agg_bitmap_distinct_rollup",
    "agg_boolean_family",
    "agg_collect_list_sorted",
    "agg_corr_moments",
    "agg_first_last_by",
    "agg_grouping_sets",
    "agg_multi_distinct",
    "agg_skew_kurt",
    "agg_unpivot_melt",
    "agg_winsorized_stats",
    "ann_prefix_rerank_topk",
    "catalog_insert_overwrite_dynamic",
    "catalog_rls_view",
    "catalog_table_lifecycle",
    "dedup_duplicate_spans",
    "dedup_exact_content",
    "dq_volume_freshness",
    "emb_centroid_drift",
    "events_funnel_latency",
    "events_rfm_segments",
    "filter_predicates",
    "fn_null_misc",
    "fn_try_safe",
    "graph_link_prediction",
    "join_asof_nearest",
    "join_right_outer",
    "mm_phash_neardup",
    "q21_waiting_suppliers",
    "sample_balanced_classes",
    "search_bm25_topk",
    "setop_except",
    "setop_intersect",
    "setop_intersect_all",
    "setop_union_all",
    "setop_union_distinct",
    "sink_python_datasource",
    "src_avro_roundtrip",
    "src_xml_roundtrip",
    "stream_bitmap_distinct",
    "stream_topics_rate_capped",
    "text_bpe_pair_counts",
    "text_hash_classifier",
    "text_vocab_stats",
    "ts_gap_fill_interpolate",
    "window_range_frame_bucketed",
    # (b) new in round 14 — stamped the round they land
    "bloom_skipping_read",  # per-file Bloom point-lookup skipping
    "curate_rejection_ledger",  # curation audit ledger
    "stream_zorder_maintenance",  # streaming layout maintainer
    "dq_bloom_fill_audit",  # bloom index-health dq gate
    # deferred to r15 (latest stamp r10 — 50 rows, derived from the
    # CORRECTNESS artifacts by tests/test_window_rotation.py; they
    # are the whole r15 window, no free slots):
    # agg_anomaly_mad
    # agg_approx_sketches
    # agg_bloom_membership
    # agg_gini_concentration
    # ann_cosine_topk
    # ann_cosine_topk_pandas
    # ann_ivf_refined_topk
    # ann_ivf_topk
    # ann_lsh_buckets
    # catalog_bucketed_join
    # catalog_compact_small_files
    # dedup_by_subset
    # dedup_keep_canonical
    # dedup_simhash
    # distinct_projection
    # fn_bitwise
    # graph_triangle_count
    # join_inner_equi
    # mm_decode_features
    # mm_frame_sample
    # mm_metadata_extract
    # mm_phash_neardup_64
    # part_revenue_abc
    # pipeline_curate_corpus
    # project_compute
    # project_rename_drop
    # q13_customer_distribution
    # q15_top_supplier
    # sample_bernoulli
    # sample_hash_bucket
    # sample_stratified_hash
    # setop_except_all
    # setop_union_by_name
    # sim_join_exact_oracle
    # sink_partitioned_pruning
    # sort_multi_key
    # sort_within_partitions
    # src_csv_roundtrip
    # src_json_roundtrip
    # src_orc_roundtrip
    # src_text_scan
    # stream_sliding_window
    # stream_tumbling_window
    # text_decontaminate
    # text_fingerprint
    # text_lang_id
    # text_quality_stats
    # text_quality_topk_per_lang
    # text_token_topk
    # topk_global
]

registry.set_order(_VERIFY_FIRST)

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
