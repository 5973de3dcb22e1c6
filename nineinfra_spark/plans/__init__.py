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

queries = registry.queries
oracles = registry.oracles

__all__ = ["registry", "queries", "oracles"]
