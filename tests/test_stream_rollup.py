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


def test_replay_marker_prevents_double_count(spark):
    """Persistent-checkpoint deployment semantics: foreachBatch
    re-delivers the last committed batch after a restart; the
    ``nine.last_batch_id`` marker (committed ATOMICALLY with each
    publish via stage-table TBLPROPERTIES riding the rename swap)
    must skip the re-fold, or every restart double-counts one batch."""
    from nineinfra_spark.operators.merge import read_table_property
    from nineinfra_spark.plans.streaming_queries import (
        LAST_BATCH_PROP,
        apply_rollup_batch,
    )

    tbl = "rollup_replay_t"
    for n in (tbl, f"{tbl}__merge_stage", f"{tbl}__merge_old"):
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    spark.createDataFrame(
        [],
        "m string, o_orderstatus string, n_orders long, "
        "total_price decimal(18,2)",
    ).write.saveAsTable(tbl)
    try:
        b0 = spark.createDataFrame(
            [("1995-03-05", "O", 100.0), ("1995-03-07", "F", 50.0)],
            "o_orderdate string, o_orderstatus string, o_totalprice double",
        ).withColumn("o_orderdate", F.to_date("o_orderdate"))
        b1 = spark.createDataFrame(
            [("1995-03-09", "O", 25.0)],
            "o_orderdate string, o_orderstatus string, o_totalprice double",
        ).withColumn("o_orderdate", F.to_date("o_orderdate"))

        def state():
            return {
                (r["m"], r["o_orderstatus"]): (
                    r["n_orders"],
                    float(r["total_price"]),
                )
                for r in spark.table(tbl).collect()
            }

        assert apply_rollup_batch(spark, tbl, b0, batch_id=0) is True
        after_b0 = state()
        assert after_b0 == {
            ("1995-03", "O"): (1, 100.0),
            ("1995-03", "F"): (1, 50.0),
        }
        # marker committed atomically with the publish
        assert read_table_property(spark, tbl, LAST_BATCH_PROP) == "0"
        # restart: batch 0 re-delivered → skipped, state unchanged
        assert apply_rollup_batch(spark, tbl, b0, batch_id=0) is False
        assert state() == after_b0
        # fresh batch folds normally and advances the marker
        assert apply_rollup_batch(spark, tbl, b1, batch_id=1) is True
        assert state() == {
            ("1995-03", "O"): (2, 125.0),
            ("1995-03", "F"): (1, 50.0),
        }
        assert read_table_property(spark, tbl, LAST_BATCH_PROP) == "1"
        # stale id below the marker is also skipped (checkpoint can
        # only re-deliver the LAST batch, but the guard is monotone)
        assert apply_rollup_batch(spark, tbl, b0, batch_id=0) is False
        # batch_id=None (direct batch use) bypasses the guard
        assert apply_rollup_batch(spark, tbl, b1, batch_id=None) is True
        assert state()[("1995-03", "O")] == (3, 150.0)
    finally:
        for n in (tbl, f"{tbl}__merge_stage", f"{tbl}__merge_old"):
            spark.sql(f"DROP TABLE IF EXISTS {n}")


@pytest.mark.slow
def test_real_checkpoint_redelivery_is_skipped(spark, tmp_path):
    """End-to-end replay through Spark's own recovery path for the
    ADDITIVE rollup (the maintainer where a double-fold is most
    visible: counts inflate): delete the last commits/ entry (+ .crc)
    and restart — the re-delivered batch must be skipped by the
    nine.last_batch_id marker."""
    from nineinfra_spark.plans.streaming_queries import apply_rollup_batch

    src = tmp_path / "src"
    src.mkdir()
    orders = spark.createDataFrame(
        [(f"1995-0{1 + i % 3}-15", "O" if i % 2 else "F", float(i))
         for i in range(30)],
        "o_orderdate string, o_orderstatus string, o_totalprice double",
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))
    for s in range(3):
        (
            orders.filter(F.col("o_totalprice").cast("long") % 3 == s)
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )
    tbl = "rollup_ckpt_replay_t"
    for n in (tbl, f"{tbl}__merge_stage", f"{tbl}__merge_old"):
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    spark.createDataFrame(
        [],
        "m string, o_orderstatus string, n_orders long, "
        "total_price decimal(18,2)",
    ).write.saveAsTable(tbl)
    ckpt = str(tmp_path / "ckpt")

    def run():
        schema = spark.read.parquet(str(src)).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda b, bid: apply_rollup_batch(spark, tbl, b, batch_id=bid)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        run()
        state = {
            (r["m"], r["o_orderstatus"]): (r["n_orders"], r["total_price"])
            for r in spark.table(tbl).collect()
        }
        assert sum(n for n, _ in state.values()) == 30
        import os as _os

        commits = sorted(
            f
            for f in _os.listdir(_os.path.join(ckpt, "commits"))
            if f.isdigit()
        )
        assert len(commits) >= 2
        _os.remove(_os.path.join(ckpt, "commits", commits[-1]))
        crc = _os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
        if _os.path.exists(crc):
            _os.remove(crc)
        run()
        state2 = {
            (r["m"], r["o_orderstatus"]): (r["n_orders"], r["total_price"])
            for r in spark.table(tbl).collect()
        }
        assert state2 == state, "re-delivered batch double-counted"
    finally:
        for n in (tbl, f"{tbl}__merge_stage", f"{tbl}__merge_old"):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
