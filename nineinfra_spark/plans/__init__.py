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
#: pinned first — r13 composition: (a) the FULL 49-row r8-latest
#: cohort (the artifact-derived rotation debt deferred from r12 —
#: union of CORRECTNESS_r01..r12 latest stamps; the set
#: tests/test_window_rotation.py pins), (b) the 1 query NEW in r13
#: — brand-new queries must take a window slot or they carry no
#: stamp. 49+1 = 50. After this round the oldest latest-stamp is r9
#: (46 rows; they plus 4 slots for r14-new/changed queries are the
#: r14 window), and the one retired name `sim_join_threshold` still
#: carries its old r2 stamp unexported.
_VERIFY_FIRST = [
    # (a) the full r8-latest cohort — 49 rows, artifact-derived
    "agg_collect_sorted",
    "agg_cube",
    "agg_global",
    "agg_kll_merge_rollup",
    "agg_percentile_exact",
    "agg_pivot",
    "agg_rollup",
    "agg_stats_moments",
    "agg_theta_set_ops",
    "catalog_delete_partition_scoped",
    "dedup_containment_pairs",
    "dedup_minhash_pairs",
    "dedup_shingle_jaccard",
    "events_funnel",
    "events_sessionize",
    "fn_array",
    "fn_datetime",
    "fn_json",
    "fn_map",
    "fn_math",
    "fn_string",
    "fn_string_distance",
    "join_asof_backward",
    "join_asof_tolerance",
    "join_cross",
    "join_full_outer",
    "join_left_anti",
    "join_left_outer",
    "join_left_semi",
    "join_range_theta",
    "join_skew_hotkey",
    "mm_wav_decode_stats",
    "q12_priority_lines",
    "q14_promo_effect",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q22_inactive_customers",
    "q2_above_partition_avg",
    "q4_order_priority",
    "sample_temperature_mixture",
    "sql_pipe_syntax",
    "sql_recursive_cte",
    "sql_scripting_block",
    "text_token_classes",
    "text_trigram_lm_score",
    "udf_apply_in_pandas",
    "udf_grouped_agg_pandas",
    "udf_pandas_vectorized",
    "udf_sql_registered",
    # (b) new in round 13 — stamped the round they land
    "catalog_snapshot_diff",  # versioned-table CDC audit diff
    # deferred to r14 (latest stamp r9 — 46 rows, derived from the
    # CORRECTNESS artifacts by tests/test_window_rotation.py; they
    # plus 4 slots for r14-new/changed queries are the r14 window):
    # agg_ab_ttest
    # agg_bitmap_distinct_rollup
    # agg_boolean_family
    # agg_collect_list_sorted
    # agg_corr_moments
    # agg_first_last_by
    # agg_grouping_sets
    # agg_multi_distinct
    # agg_skew_kurt
    # agg_unpivot_melt
    # agg_winsorized_stats
    # ann_prefix_rerank_topk
    # catalog_insert_overwrite_dynamic
    # catalog_rls_view
    # catalog_table_lifecycle
    # dedup_duplicate_spans
    # dedup_exact_content
    # dq_volume_freshness
    # emb_centroid_drift
    # events_funnel_latency
    # events_rfm_segments
    # filter_predicates
    # fn_null_misc
    # fn_try_safe
    # graph_link_prediction
    # join_asof_nearest
    # join_right_outer
    # mm_phash_neardup
    # q21_waiting_suppliers
    # sample_balanced_classes
    # search_bm25_topk
    # setop_except
    # setop_intersect
    # setop_intersect_all
    # setop_union_all
    # setop_union_distinct
    # sink_python_datasource
    # src_avro_roundtrip
    # src_xml_roundtrip
    # stream_bitmap_distinct
    # stream_topics_rate_capped
    # text_bpe_pair_counts
    # text_hash_classifier
    # text_vocab_stats
    # ts_gap_fill_interpolate
    # window_range_frame_bucketed
]

registry.set_order(_VERIFY_FIRST)

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
