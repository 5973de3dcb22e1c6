"""stream_upsert_snapshot: the latest-wins CDC merge must be
independent of micro-batch boundaries and file ARRIVAL order.

The registered query's differential oracle runs on the single-file
testdata (one micro-batch); this test stages a 3-file copy of events
whose files interleave timestamps ADVERSARIALLY (round-robin split, so
every batch contains both old and new rows for the same users) and
asserts the incrementally-maintained snapshot still equals the batch
"newest row per user" — i.e. the recency guard, not batch order, is
what decides."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from nineinfra_spark.plans.streaming_queries import stream_upsert_snapshot
from nineinfra_spark.sources.readers import read_table

SF = "/root/testdata/sf0.001"
STAGED_SF = "/tmp/nineinfra_upsert_multifile_sf"


@pytest.fixture(scope="module")
def multifile_sf(spark):
    """A copy of sf0.001 whose events table is 3 part-files with
    timestamps interleaved round-robin across them."""
    shutil.rmtree(STAGED_SF, ignore_errors=True)
    os.makedirs(STAGED_SF)
    ev = read_table(spark, SF, "events")
    # round-robin on a row's rank in ts order → each file spans the
    # whole time range and users repeat across files
    from pyspark.sql import Window

    w = Window.orderBy("ts", "event_id")
    slotted = ev.withColumn("_slot", F.row_number().over(w) % 3)
    for s in range(3):
        (
            slotted.filter(F.col("_slot") == s)
            .drop("_slot")
            .coalesce(1)
            .write.mode("append")
            .parquet(os.path.join(STAGED_SF, "events.parquet"))
        )
    # the query only reads events; other tables are unused
    yield STAGED_SF
    shutil.rmtree(STAGED_SF, ignore_errors=True)
    shutil.rmtree(
        "/tmp/nineinfra_stream_src/nineinfra_upsert_multifile_sf",
        ignore_errors=True,
    )


def test_snapshot_matches_batch_latest_across_batches(spark, multifile_sf):
    snap = stream_upsert_snapshot(spark, multifile_sf)
    got = {
        r["user_id"]: (r["ts"], r["event_id"], r["event_type"], r["value"])
        for r in snap.collect()
    }

    ev = read_table(spark, SF, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        r["user_id"]: (r["ts"], r["event_id"], r["event_type"], r["value"])
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert got == want


def test_multifile_staging_really_made_batches(spark, multifile_sf):
    """Guard the premise: the staged events table is ≥3 leaf files, so
    maxFilesPerTrigger=1 produced ≥3 micro-batches."""
    staged = os.path.join(multifile_sf, "events.parquet")
    leaves = [f for f in os.listdir(staged) if f.endswith(".parquet")]
    assert len(leaves) >= 3
