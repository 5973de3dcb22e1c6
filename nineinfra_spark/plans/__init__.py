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
#: pinned first — r12 composition: (a) the FULL 48-row r7-latest
#: cohort (the artifact-derived rotation debt deferred from r11 —
#: union of CORRECTNESS_r01..r11 latest stamps; the set
#: tests/test_window_rotation.py pins), (b) the 2 queries NEW in r12
#: — brand-new queries must take a window slot or they carry no
#: stamp. 48+2 = 50. After this round the oldest latest-stamp is r8
#: (49 rows; they plus 1 slot for r13-new/changed queries are the r13
#: window), and the one retired name `sim_join_threshold` still
#: carries its old r2 stamp unexported.
_VERIFY_FIRST = [
    # (a) the full r7-latest cohort — 48 rows, artifact-derived
    "agg_histogram_bins",
    "agg_hll_union_rollup",
    "catalog_delete_update",
    "catalog_merge_timetravel",
    "catalog_merge_upsert",
    "catalog_partsupp_bucketed",
    "dedup_connected_clusters",
    "dedup_embedding_clusters",
    "emb_dim_stats",
    "events_retention_cohorts",
    "fn_explode_outer",
    "fn_url_normalize",
    "fn_variant_json",
    "mm_ppm_decode_stats",
    "pair_contrastive_negatives",
    "q10_returned_items",
    "q18_large_volume_customers",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q8_market_share",
    "sample_cap_per_group",
    "sql_lateral_topn",
    "src_binaryfile_scan",
    "src_csv_malformed_modes",
    "src_jdbc_roundtrip",
    "src_parquet_schema_merge",
    "src_python_datasource",
    "stream_dedup_index",
    "stream_dedup_watermark",
    "stream_python_datasource",
    "stream_rollup_maintenance",
    "stream_session_window",
    "stream_stateful_counts",
    "stream_static_join",
    "stream_stream_join",
    "stream_upsert_snapshot",
    "text_blocklist_filter",
    "text_chunk_windows",
    "text_idf_keywords",
    "udf_scalar_python",
    "window_first_last_nth",
    "window_lag_lead",
    "window_moving_frame",
    "window_range_frame",
    "window_ranking",
    "window_running_agg",
    # (b) new in round 12 — stamped the round they land
    "zorder_skipping_read",   # z-layout file-skipping READ proof
    "text_snapshot_drift",    # corpus mixture drift monitor
    # deferred to r13 (latest stamp r8 — 49 rows, derived from the
    # CORRECTNESS artifacts by tests/test_window_rotation.py; they
    # plus 1 slot for r13-new/changed queries are the r13 window):
    # agg_collect_sorted
    # agg_cube
    # agg_global
    # agg_kll_merge_rollup
    # agg_percentile_exact
    # agg_pivot
    # agg_rollup
    # agg_stats_moments
    # agg_theta_set_ops
    # catalog_delete_partition_scoped
    # dedup_containment_pairs
    # dedup_minhash_pairs
    # dedup_shingle_jaccard
    # events_funnel
    # events_sessionize
    # fn_array
    # fn_datetime
    # fn_json
    # fn_map
    # fn_math
    # fn_string
    # fn_string_distance
    # join_asof_backward
    # join_asof_tolerance
    # join_cross
    # join_full_outer
    # join_left_anti
    # join_left_outer
    # join_left_semi
    # join_range_theta
    # join_skew_hotkey
    # mm_wav_decode_stats
    # q12_priority_lines
    # q14_promo_effect
    # q17_small_qty_revenue
    # q19_disjunctive_revenue
    # q22_inactive_customers
    # q2_above_partition_avg
    # q4_order_priority
    # sample_temperature_mixture
    # sql_pipe_syntax
    # sql_recursive_cte
    # sql_scripting_block
    # text_token_classes
    # text_trigram_lm_score
    # udf_apply_in_pandas
    # udf_grouped_agg_pandas
    # udf_pandas_vectorized
    # udf_sql_registered
]

registry.set_order(_VERIFY_FIRST)

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
