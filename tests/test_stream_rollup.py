"""stream_rollup_maintenance: additive MV maintenance must be
independent of micro-batch boundaries — every batch of the adversarial
split carries rows for EVERY month, so each rollup cell is assembled
across all three batches."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from nineinfra_spark.plans.streaming_queries import stream_rollup_maintenance
from nineinfra_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"
STAGED_SF = "/tmp/nineinfra_rollup_multifile_sf"


@pytest.fixture(scope="module")
def multifile_sf(spark):
    shutil.rmtree(STAGED_SF, ignore_errors=True)
    os.makedirs(STAGED_SF)
    orders = read_table(spark, SF, "orders")
    from pyspark.sql import Window

    w = Window.orderBy("o_orderkey")
    slotted = orders.withColumn("_slot", F.row_number().over(w) % 3)
    for s in range(3):
        (
            slotted.filter(F.col("_slot") == s)
            .drop("_slot")
            .coalesce(1)
            .write.mode("append")
            .parquet(os.path.join(STAGED_SF, "orders.parquet"))
        )
    yield STAGED_SF
    shutil.rmtree(STAGED_SF, ignore_errors=True)
    shutil.rmtree(
        "/tmp/nineinfra_stream_src/nineinfra_rollup_multifile_sf",
        ignore_errors=True,
    )


def test_rollup_converges_across_batches(spark, multifile_sf):
    got = {
        (r["m"], r["o_orderstatus"]): (r["n_orders"], r["total_price"])
        for r in stream_rollup_maintenance(spark, multifile_sf).collect()
    }
    want = {
        (r["m"], r["o_orderstatus"]): (r["n_orders"], r["total_price"])
        for r in (
            read_table(spark, SF, "orders")
            .select(
                F.date_format("o_orderdate", "yyyy-MM").alias("m"),
                "o_orderstatus",
                F.round("o_totalprice", 2).cast("decimal(18,2)").alias("p"),
            )
            .groupBy("m", "o_orderstatus")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum("p").cast("double").alias("total_price"),
            )
            .collect()
        )
    }
    assert got == want
    staged = "/tmp/nineinfra_stream_src/nineinfra_rollup_multifile_sf/orders"
    assert len([f for f in os.listdir(staged) if f.endswith(".parquet")]) == 3
