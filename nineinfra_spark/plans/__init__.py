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
        ext_dedup,
        ext_multimodal,
        ext_similarity,
        ext_text,
        functions_scalar,
        joins,
        setops,
        sortlimit,
        sources_sinks,
        streaming_queries,
        tpch,
        udfs,
        windows,
    )


_load_all()

#: Verification-priority prefix: the driver's CORRECTNESS gate checks
#: a bounded window (~50) of queries in export order, so the queries
#: that most need a fresh driver-green differential row are pinned
#: first — (a) surface that has never had a driver row (sources/sinks,
#: catalog, all streaming, all UDFs, SORT BY, rename/drop), (b)
#: queries whose shape changed this round, (c) families last verified
#: in round 1. Families with current green rows (aggregates, scalar
#: functions, joins, setops, ext dedup/text/similarity) follow in
#: registration order.
_VERIFY_FIRST = [
    # (a) never driver-verified
    "src_csv_roundtrip",
    "src_json_roundtrip",
    "src_orc_roundtrip",
    "src_text_scan",
    "sink_partitioned_pruning",
    "catalog_table_lifecycle",
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_static_join",
    "stream_stream_join",
    "stream_stateful_counts",
    "udf_scalar_python",
    "udf_sql_registered",
    "udf_pandas_vectorized",
    "udf_grouped_agg_pandas",
    "udf_apply_in_pandas",
    "sort_within_partitions",
    "project_rename_drop",
    # (b) shape changed this round
    "mm_decode_features",
    "agg_approx_sketches",
    "sample_bernoulli",
    "sample_hash_bucket",
    "sim_join_exact_oracle",
    "join_inner_equi",
    "ann_ivf_topk",  # new in round 3
    "fn_bitwise",  # new in round 3
    "catalog_bucketed_join",  # new in round 3
    "events_sessionize",  # new in round 3 (fills the 50-slot window)
    # (c) last verified in round 1
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_customers",
    "window_ranking",
    "window_lag_lead",
    "window_running_agg",
    "window_moving_frame",
    "window_range_frame",
    "window_first_last_nth",
    "topk_global",
    "project_compute",
    "filter_predicates",
    "distinct_projection",
    "dedup_by_subset",
    "sort_multi_key",
    "setop_except_all",
    "setop_union_by_name",
]

registry.set_order(_VERIFY_FIRST)

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
