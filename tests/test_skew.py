"""Skew machinery: the AQE skew-split witness + the salting rewrite.

Two scale guarantees promised by plans/joins.py:join_skew_hotkey and
operators/skew.py:salted_join:

1. When the hot-key join is forced onto the shuffle path (broadcast
   disabled), AQE's OptimizeSkewedJoin detects the fat partition and
   splits it — ``skew=true`` appears on the join node of the executed
   adaptive plan. At 100 TB this is what keeps one whale key from
   pinning the stage on a single task.
2. ``salted_join`` is semantically IDENTICAL to a plain join (inner /
   left, hot keys, NULL keys) — the deterministic rewrite for cases
   AQE can't reach.

Skew thresholds are runtime confs, so the shared session is borrowed
and every conf restored afterward; sf0.001's hot partition is only
tens of KB, hence the tiny advisory/threshold sizes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nineinfra_spark.operators.skew import salted_join
from nineinfra_spark.plans.registry import get

SF = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"

#: (conf, value-for-test) — saved/restored around the skew-plan test.
_SKEW_CONFS = {
    # Forbid broadcast in both the static planner and AQE's runtime
    # re-plan: the whole point is to observe the shuffle path.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # sf0.001 partitions are tiny — shrink the skew thresholds so the
    # hot partition (~80% of events) registers as skewed.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "4KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
    # The query aggregates on the join key right after the join, so a
    # split would add an exchange; without force, AQE skips the split
    # to preserve the reusable partitioning. Forcing is exactly what a
    # 100 TB operator does when one task OOMs beat an extra shuffle.
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    # Coalescing can merge the evidence away on toy data.
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def skew_session(spark):
    saved = {}
    for k, v in _SKEW_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@pytest.fixture(scope="module")
def skew_sf(spark, tmp_path_factory):
    """A testdata dir whose events table is MULTI-FILE (8 parquet
    files). AQE splits a skewed reduce partition at mapper-block
    granularity — with the testdata's single-file events there is one
    map task, every reduce partition is one atomic block, and no split
    is possible no matter how skewed. At 100 TB a fact table is always
    multi-file; this stages that reality at sf0.01."""
    from nineinfra_spark.plans._util import t

    root = str(tmp_path_factory.mktemp("skew_sf"))
    t(spark, SF_MID, "events").repartition(8).write.parquet(
        os.path.join(root, "events.parquet")
    )
    os.symlink(
        os.path.join(SF_MID, "customer.parquet"),
        os.path.join(root, "customer.parquet"),
    )
    return root


def test_join_skew_hotkey_aqe_splits_fat_partition(skew_session, skew_sf):
    """The promise in plans/joins.py: forced onto the shuffle path,
    the hot-key join's executed adaptive plan shows ``skew=true``."""
    df = get("join_skew_hotkey").fn(skew_session, skew_sf)
    # collect() executes THIS DataFrame's queryExecution (a write
    # action would plan a separate one), making the AQE plan final.
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "isFinalPlan=true" in plan, plan[:500]
    assert "skew=true" in plan, (
        "AQE did not mark the hot-key join partition as skewed:\n" + plan[:3000]
    )


def _fact_dim(spark):
    """A fact side with one hot key (80% of rows), a NULL key, and a
    key with no dim match; a dim side with an extra unmatched row."""
    fact = spark.createDataFrame(
        [Row(k=1, ev=i, v=float(i)) for i in range(80)]
        + [Row(k=2, ev=100 + i, v=10.0 + i) for i in range(10)]
        + [Row(k=9, ev=200, v=-1.0)]  # no dim match
        + [Row(k=None, ev=201, v=0.5)]  # NULL key: joins nothing, kept by LEFT
    )
    dim = spark.createDataFrame(
        [Row(dk=1, name="hot"), Row(dk=2, name="warm"), Row(dk=3, name="unused")]
    )
    return fact, dim


def _rows(df):
    # repr-key sort: rows may contain NULLs, which don't compare to ints
    return sorted((tuple(r) for r in df.collect()), key=repr)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equivalence(spark, how):
    fact, dim = _fact_dim(spark)
    cond = fact.k == dim.dk
    plain = fact.join(dim, cond, how)
    salted = salted_join(fact, dim, fact.k == dim.dk, n_salts=4, how=how)
    assert salted.columns == plain.columns
    assert _rows(salted) == _rows(plain)


def test_salted_join_spreads_hot_key(spark):
    """The rewrite's reason to exist: the hot key's rows land on more
    than one salt (the fact rows differ in ev/v, so the content hash
    spreads them)."""
    fact, _ = _fact_dim(spark)
    n = (
        fact.filter(F.col("k") == 1)
        .select(F.pmod(F.hash("k", "ev", "v"), F.lit(4)).alias("salt"))
        .distinct()
        .count()
    )
    assert n > 1


def test_salted_join_salt_cols_subset(spark):
    """salt_cols: the documented escape hatch for ambiguous schemas
    and duplicate-content rows — same results, caller-chosen hash."""
    fact, dim = _fact_dim(spark)
    plain = fact.join(dim, fact.k == dim.dk, "inner")
    salted = salted_join(
        fact, dim, fact.k == dim.dk, n_salts=4, how="inner", salt_cols=["ev"]
    )
    assert _rows(salted) == _rows(plain)


def test_salted_join_rejects_semi_anti(spark):
    fact, dim = _fact_dim(spark)
    with pytest.raises(ValueError, match="unsupported join type"):
        salted_join(fact, dim, fact.k == dim.dk, how="left_semi")
