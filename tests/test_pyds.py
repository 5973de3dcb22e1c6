"""Custom Python DataSource connector (sources/pyds.py): batch/stream
agreement, partition ranges, and the offset-recovery path
(readBetweenOffsets) that only executes on checkpoint restart.
"""

from __future__ import annotations

import os
import shutil
import time

from nineinfra_spark.sources import pyds

OUT = "/tmp/nineinfra_pyds_test"


def test_batch_rows_match_generator(spark):
    """The batch read reproduces synth_row exactly over the keyspace,
    with the requested task parallelism."""
    pyds.register(spark)
    df = (
        spark.read.format("nine_synth")
        .option("n", "100")
        .option("numPartitions", "5")
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(pyds.synth_row(k) for k in range(100))
    assert got == want


def test_stream_equals_batch(spark):
    """Draining the stream leg yields the identical relation the batch
    leg produces — connector determinism across both read paths."""
    pyds.register(spark)
    name = "mem_pyds_eq"
    q = (
        spark.readStream.format("nine_synth")
        .option("n", "120")
        .option("step", "50")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(name).count() < 120:
            time.sleep(0.2)
    finally:
        q.stop()
        q.awaitTermination()
    stream_rows = sorted(tuple(r) for r in spark.table(name).collect())
    batch_rows = sorted(
        tuple(r)
        for r in spark.read.format("nine_synth").option("n", "120").load().collect()
    )
    assert stream_rows == batch_rows


def test_stream_restart_replays_committed_offsets_exactly_once(spark):
    """Kill the streaming connector mid-run and restart from the same
    checkpoint: recovery goes through readBetweenOffsets (replay of
    the committed-but-unfinished range) — the path a normal run never
    executes — and the final sink must hold every key exactly once."""
    pyds.register(spark)
    sink = os.path.join(OUT, "restart_sink")
    ckpt = os.path.join(OUT, "restart_ckpt")
    for d in (sink, ckpt):
        shutil.rmtree(d, ignore_errors=True)

    def start(trigger):
        return (
            spark.readStream.format("nine_synth")
            .option("n", "200")
            .option("step", "40")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger)
            .start()
        )

    # phase 1: slow trigger; stop after the first committed batch
    q = start({"processingTime": "2 seconds"})
    deadline = time.time() + 60
    while time.time() < deadline:
        if any(p["batchId"] >= 1 for p in q.recentProgress):
            break
        time.sleep(0.1)
    q.stop()
    q.awaitTermination()
    partial = spark.read.parquet(sink).count()
    assert 0 < partial < 200, partial

    # phase 2: restart → offset log replays the in-flight range via
    # readBetweenOffsets, then continues to the end of the keyspace
    q2 = start({"processingTime": "100 milliseconds"})
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.read.parquet(sink).count() >= 200:
                break
            time.sleep(0.3)
    finally:
        q2.stop()
        q2.awaitTermination()
    keys = [r["event_id"] for r in spark.read.parquet(sink).collect()]
    assert len(keys) == 200, len(keys)      # nothing lost
    assert len(set(keys)) == 200            # nothing duplicated
    assert set(keys) == set(range(200))
