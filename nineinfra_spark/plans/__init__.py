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
        tpch_sql,
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
    # (a) never driver-verified (registered in round 3, outside its window)
    "q4_order_priority",
    "q12_priority_lines",
    "q14_promo_effect",
    "q19_disjunctive_revenue",
    "events_funnel",
    "dedup_connected_clusters",
    "agg_boolean_family",
    "fn_string_distance",
    "text_token_classes",
    # (b) new in round 4
    "q17_small_qty_revenue",
    "q2_above_partition_avg",
    "q22_inactive_customers",
    "join_skew_hotkey",
    "catalog_table_lifecycle",  # lifecycle extended (ALTER/INSERT OVERWRITE)
    # (c) last verified in round 2 — oldest rows, refreshed oldest-first
    "agg_global",
    "agg_multi_distinct",
    "agg_stats_moments",
    "agg_corr_moments",
    "agg_skew_kurt",
    "agg_first_last_by",
    "agg_collect_sorted",
    "agg_collect_list_sorted",
    "agg_percentile_exact",
    "agg_cube",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_pivot",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_cross",
    "join_range_theta",
    "join_asof_backward",
    "setop_union_all",
    "setop_union_distinct",
    "setop_except",
    "setop_intersect",
    "setop_intersect_all",
    "fn_string",
    "fn_datetime",
    "fn_math",
    "fn_array",
    "fn_map",
    "fn_json",
    "fn_null_misc",
    "dedup_exact_content",
    "dedup_shingle_jaccard",
    "dedup_minhash_pairs",
    "dedup_simhash",
    # r2 rows past the ~50-slot window (text_*, ann_*, mm_*) roll to the
    # next rotation; everything above here has an older or missing row.
]

registry.set_order(_VERIFY_FIRST)

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
