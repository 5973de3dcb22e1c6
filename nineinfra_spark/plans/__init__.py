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
#: pinned first — r8 composition: (a) the 12 queries NEW this round,
#: (b) the 5-query cohort whose latest green row was r3 (the stalest
#: in the registry: the UDF family + events_sessionize), (c) 40 of
#: the 48-query r4-latest cohort (33 after later r8 additions) — the whole relational core (aggs,
#: joins, TPC-H spine, fn_* families) that has ridden on local
#: regression tests since round 4. The 15 deferred r4 rows (the
#: set-operation family + fn_null_misc — the lightest, most
#: regression-resistant plans) plus everything newly displaced lead
#: the r9 rotation.
_VERIFY_FIRST = [
    # (a) new in round 8
    "catalog_delete_partition_scoped",  # partition-scoped DELETE/UPDATE
    "text_trigram_lm_score",  # corpus-trained char-trigram LM quality gate
    "graph_pagerank_fixed",  # integer-exact power iteration (see plans/graph.py)
    "join_asof_tolerance",  # as-of with max-gap tolerance (merge_asof semantic)
    "dedup_containment_pairs",  # overlap-coefficient doc-inside-doc lens
    "mm_wav_decode_stats",  # REAL RIFF/WAVE PCM decode through mapInPandas
    "agg_kll_merge_rollup",  # KLL quantile-sketch mergeability rollup
    "agg_theta_set_ops",  # theta-sketch set algebra (intersection)
    "sql_recursive_cte",  # ANSI WITH RECURSIVE gap-fill spine
    "sql_pipe_syntax",  # |> dataflow dialect vs classical-SQL oracle
    "sql_scripting_block",  # BEGIN/DECLARE/SET parameterized report
    "sample_temperature_mixture",  # n^0.5 source re-balancing quotas
    # (b) the r3-latest cohort — stalest driver stamps in the registry
    "udf_sql_registered",
    "udf_pandas_vectorized",
    "udf_grouped_agg_pandas",
    "udf_apply_in_pandas",
    "events_sessionize",
    # (c) the r4-latest relational core, 42 of 48
    "agg_global",
    "agg_stats_moments",
    "agg_collect_sorted",
    "agg_percentile_exact",
    "agg_cube",
    "agg_rollup",
    "agg_pivot",
    "join_cross",
    "join_left_outer",
    "join_full_outer",
    "join_left_semi",
    "join_left_anti",
    "join_range_theta",
    "join_asof_backward",
    "join_skew_hotkey",
    "fn_string",
    "fn_datetime",
    "fn_math",
    "fn_array",
    "fn_map",
    "fn_json",
    "fn_string_distance",
    "dedup_shingle_jaccard",
    "dedup_minhash_pairs",
    "events_funnel",
    "text_token_classes",
    "q2_above_partition_avg",
    "q4_order_priority",
    "q12_priority_lines",
    "q14_promo_effect",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q22_inactive_customers",
    # deferred to r9 (latest stamp r4, lightest / most redundant plans):
    # setop_union_all, setop_union_distinct, setop_intersect,
    # setop_intersect_all, setop_except, fn_null_misc,
    # agg_boolean_family, agg_collect_list_sorted, agg_skew_kurt,
    # agg_corr_moments, agg_grouping_sets, join_right_outer,
    # agg_first_last_by, dedup_exact_content, agg_multi_distinct
]

registry.set_order(_VERIFY_FIRST)

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
