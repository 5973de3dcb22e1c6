"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
for the driver's DuckDB differential gate at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from nineinfra_spark.plans import registry

    return registry.get("q1_pricing_summary").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nineinfra_spark.plans import queries as plan_queries

    return plan_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each query (omitted → rows-only)."""
    from nineinfra_spark.plans import oracles

    return oracles()
