"""catalog_rollup_incremental: the differential oracle proves the
rollup CONVERGES to the full recompute; these tests pin the property
that makes it *incremental* — the refresh touches only the arrived
months' partitions and prunes its fact read to them."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nineinfra_spark.plans.sources_sinks import WAREHOUSE, catalog_rollup_incremental

SF = "/root/testdata/sf0.001"


def test_refresh_leaves_history_partitions_untouched(spark):
    catalog_rollup_incremental(spark, SF)
    db = f"nine_wh_{os.path.basename(SF).replace('.', '_')}"
    rollup_root = f"{WAREHOUSE}/{db}/sales_rollup"

    # v1 (history) partitions were written BEFORE the fact append and
    # the dynamic-partition refresh; arrived (2001) partitions after.
    # If the refresh had recomputed everything, every partition dir's
    # files would carry post-refresh mtimes.
    def newest_mtime(month_dir: str) -> float:
        return max(
            os.path.getmtime(os.path.join(month_dir, f))
            for f in os.listdir(month_dir)
            if f.endswith(".parquet")
        )

    hist, arrived = [], []
    for d in sorted(os.listdir(rollup_root)):
        if not d.startswith("m="):
            continue
        (arrived if d >= "m=2001" else hist).append(
            newest_mtime(os.path.join(rollup_root, d))
        )
    assert hist and arrived, "expected both history and arrived partitions"
    # every arrived partition is newer than every history partition
    assert min(arrived) > max(hist)


def test_refresh_fact_read_is_partition_pruned(spark):
    """The month filter must reach the fact scan as a partition
    filter (scan cost ∝ arrived months, not history)."""
    catalog_rollup_incremental(spark, SF)
    db = f"nine_wh_{os.path.basename(SF).replace('.', '_')}"
    pruned = spark.table(f"{db}.sales_fact").filter(
        F.col("m").isin(["2001-01", "2001-02"])
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "m#" in plan
    # the pruned scan must not list every month partition
    n_parts = pruned.select("m").distinct().count()
    assert n_parts == 2
