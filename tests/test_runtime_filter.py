"""Runtime bloom-filter join reduction — the 100 TB semi-join
strategy: when a selective dimension filter can't broadcast (fact⋈fact
or an over-threshold dim), Spark can still build a bloom filter on the
build side's join keys at runtime and push it into the probe side's
scan, cutting the shuffle to ~matching rows. This test pins that the
engine configuration actually produces the injected filter, so the
capability claim in SURVEY §4 is plan-verified, not aspirational."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nineinfra_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"

_CONFS = {
    # force the shuffle-join regime (no broadcast) and make the tiny
    # test tables eligible: production defaults gate creation on a
    # 10 MB build side / 10 GB probe scan, which sf0.01 never reaches
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


@pytest.fixture()
def bloom_conf(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONFS}
    for k, v in _CONFS.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_into_fact_scan(bloom_conf):
    spark = bloom_conf
    li = read_table(spark, SF, "lineitem")
    od = read_table(spark, SF, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = li.join(od, li["l_orderkey"] == od["o_orderkey"]).select(
        "l_orderkey", "o_totalprice"
    )
    optimized = j._jdf.queryExecution().optimizedPlan().toString()
    # build side: a bloom_filter_agg over the filtered orders keys;
    # probe side: a might_contain filter injected above lineitem
    assert "bloom_filter_agg" in optimized
    assert "might_contain" in optimized
    # the probe filter must key on the fact join column
    assert "might_contain(scalar-subquery" in optimized
    assert "xxhash64(l_orderkey" in optimized


def test_bloom_filter_absent_without_selective_filter(bloom_conf):
    """No dim-side predicate → no semi-join reduction to exploit; the
    optimizer must not tax the join with a useless filter build."""
    spark = bloom_conf
    li = read_table(spark, SF, "lineitem")
    od = read_table(spark, SF, "orders")
    j = li.join(od, li["l_orderkey"] == od["o_orderkey"]).select(
        "l_orderkey", "o_totalprice"
    )
    optimized = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" not in optimized
