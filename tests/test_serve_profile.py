"""Serve profile (the reference's Doris accelerated-OLAP role):
pinned hot tables must actually serve from the in-memory columnar
cache, and unpinning must return plans to the parquet scan."""

from __future__ import annotations

from nineinfra_spark.engine import Engine, register_testdata

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def test_pin_serves_from_memory_cache(spark):
    register_testdata(spark, SF, ("nation", "region"))
    eng = Engine()
    eng._spark = spark  # reuse the shared test session

    q = lambda: spark.sql(  # noqa: E731
        "SELECT r_name, COUNT(*) AS n FROM nation "
        "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
    )
    assert "InMemoryRelation" not in _plan(q())

    eng.pin_hot_tables(["nation", "region"])
    try:
        cached_plan = _plan(q())
        assert "InMemoryRelation" in cached_plan
        assert q().count() == 5  # same results from the cache
    finally:
        eng.unpin_tables(["nation", "region"])
    assert "InMemoryRelation" not in _plan(q())
