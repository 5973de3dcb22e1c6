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
#: pinned first — r9 composition: (a) the 15-query cohort whose
#: latest driver stamp is r4 (deferred from r8 — the stalest rows in
#: the registry), (b) queries NEW or plan-changed in r9, (c) 31 of
#: the 47-query r5-latest cohort. The 16 remaining r5 rows (listed at
#: the bottom — the lightest variants, each shadowed by a sibling in
#: this window) lead the r10 rotation.
_VERIFY_FIRST = [
    # (a) the r4-latest cohort — stalest stamps in the registry
    "setop_union_all",
    "setop_union_distinct",
    "setop_intersect",
    "setop_intersect_all",
    "setop_except",
    "fn_null_misc",
    "agg_boolean_family",
    "agg_collect_list_sorted",
    "agg_skew_kurt",
    "agg_corr_moments",
    "agg_grouping_sets",
    "join_right_outer",
    "agg_first_last_by",
    "dedup_exact_content",
    "agg_multi_distinct",
    # (b) new / plan-changed in round 9
    "window_range_frame_bucketed",  # fact-scale RANGE frame, no WindowExec
    "text_bpe_pair_counts",  # TakeOrdered-before-window rewrite (r9)
    "src_avro_roundtrip",  # pure-stdlib Avro OCF sink+source (r9)
    "stream_topics_rate_capped",  # Kafka-semantics connector contract (r9)
    # (c) the r5-latest cohort, 31 of 47
    "agg_approx_sketches",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_buckets",
    "catalog_bucketed_join",
    "catalog_compact_small_files",
    "catalog_insert_overwrite_dynamic",
    "catalog_table_lifecycle",
    "dedup_by_subset",
    "dedup_keep_canonical",
    "dedup_simhash",
    "filter_predicates",
    "join_inner_equi",
    "mm_decode_features",
    "project_compute",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q21_waiting_suppliers",
    "sample_bernoulli",
    "setop_except_all",
    "setop_union_by_name",
    "sink_partitioned_pruning",
    "sort_multi_key",
    "src_csv_roundtrip",
    "src_orc_roundtrip",
    "stream_tumbling_window",
    "text_decontaminate",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_stats",
    "topk_global",
    # deferred to r10 (latest stamp r5; every one shadowed by a
    # sibling above): stream_sliding_window, ann_cosine_topk_pandas, ann_ivf_refined_topk,
    # sample_stratified_hash, sample_hash_bucket, sim_join_exact_oracle,
    # mm_frame_sample, mm_metadata_extract, src_text_scan,
    # src_json_roundtrip, sort_within_partitions, distinct_projection,
    # project_rename_drop, text_quality_topk_per_lang,
    # text_token_topk, fn_bitwise
]

registry.set_order(_VERIFY_FIRST)

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
