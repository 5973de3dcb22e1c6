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
#: a bounded window (exactly 50) of queries in export order, so the
#: queries that most need a fresh driver-green differential row are
#: pinned first — (a) the queries whose latest green row is OLDEST
#: (the r2 stragglers that rolled out of the r4 window), (b) queries
#: new or shape-changed this round, (c) backfill from the r3-latest
#: cohort to exactly 50. Rows refreshed in r4 (aggregates, scalar fns,
#: outer joins, setops, ext dedup) follow in registration order and
#: rotate back in next round.
_VERIFY_FIRST = [
    # (a) latest row is r2 — the oldest verification in the registry
    "ann_cosine_topk",
    "ann_cosine_topk_pandas",
    "ann_lsh_buckets",
    "dedup_simhash",
    "mm_frame_sample",
    "mm_metadata_extract",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_stats",
    "text_token_topk",
    # (b) new or shape-changed in round 5
    "catalog_table_lifecycle",  # now exercises ALTER TABLE + INSERT OVERWRITE
    "catalog_insert_overwrite_dynamic",  # new: dynamic-partition overwrite
    "ann_ivf_refined_topk",  # new: IVF + one Lloyd refinement pass
    "dedup_embedding_clusters",  # new: embedding near-dup -> clusters
    "dedup_keep_canonical",  # new: clusters -> deduplicated corpus
    "sample_stratified_hash",  # new: per-stratum deterministic rates
    "text_quality_topk_per_lang",  # new: keep best-N per language
    "q7_volume_shipping",  # new: two-role nation dim, per-year rollup
    "q13_customer_distribution",  # new: outer join + double aggregation
    "q21_waiting_suppliers",  # new: correlated EXISTS + NOT EXISTS pair
    "q8_market_share",  # new: two-role nation + bit-stable ratio
    "q15_top_supplier",  # new: CTE + uncorrelated MAX scalar subquery
    "text_decontaminate",  # new: eval-set n-gram overlap removal
    "catalog_compact_small_files",  # new: small-files compaction
    # (c) backfill: latest row is r3 (the 11 left over — windows,
    # events_sessionize, non-scalar UDFs — head the r6 rotation)
    "agg_approx_sketches",
    "mm_decode_features",
    "sim_join_exact_oracle",
    "ann_ivf_topk",
    "fn_bitwise",
    "join_inner_equi",
    "setop_except_all",
    "setop_union_by_name",
    "topk_global",
    "project_compute",
    "filter_predicates",
    "distinct_projection",
    "dedup_by_subset",
    "sample_bernoulli",
    "sample_hash_bucket",
    "sort_multi_key",
    "sort_within_partitions",
    "project_rename_drop",
    "src_csv_roundtrip",
    "src_json_roundtrip",
    "src_orc_roundtrip",
    "src_text_scan",
    "sink_partitioned_pruning",
    "catalog_bucketed_join",
    "stream_tumbling_window",
    "stream_sliding_window",
]

registry.set_order(_VERIFY_FIRST)

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
