"""Streaming coverage the oracle rows can't express: the checkpointed
file sink (the production sink shape), the rate source, and the
processingTime trigger path."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
OUT = "/tmp/nineinfra_stream_test"


def test_file_sink_with_checkpoint(spark):
    """availableNow → parquet sink + checkpoint: the executor-parallel
    production sink. Re-reading the sink must reproduce the full
    event count (exactly-once via the checkpoint/commit log)."""
    from nineinfra_spark.streaming.ops import read_events_stream

    sink = os.path.join(OUT, "events_copy")
    ckpt = os.path.join(OUT, "ckpt")
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    ev = read_events_stream(spark, SF).select("event_id", "user_id", "ts", "event_type")
    q = (
        ev.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(sink).count()
    want = spark.read.parquet(os.path.join(SF, "events.parquet")).count()
    assert got == want


def test_rate_source_produces_rows(spark):
    """Rate source (synthetic benchmark stream) through a short
    processingTime-triggered run."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
    q = (
        rate.select("timestamp", "value")
        .writeStream.format("memory")
        .queryName("mem_rate_test")
        .outputMode("append")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 20
        while time.time() < deadline and spark.table("mem_rate_test").count() == 0:
            time.sleep(0.5)
        assert spark.table("mem_rate_test").count() > 0
    finally:
        q.stop()


def test_streaming_batch_equivalence_tumbling(spark):
    """The §2.9 acceptance shape from SURVEY.md §5: a streaming replay
    result equals the identical batch computation, row for row."""
    from nineinfra_spark.plans.streaming_queries import stream_tumbling_window
    from nineinfra_spark.sources.readers import read_table

    streamed = sorted(map(tuple, stream_tumbling_window(spark, SF).collect()))
    ev = read_table(spark, SF, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    batch = sorted(
        map(
            tuple,
            ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type",
                "n",
                "sum_value",
            )
            .collect(),
        )
    )
    assert streamed == batch


def test_foreach_batch_sink(spark):
    """foreachBatch: the escape-hatch sink for targets without a
    native streaming writer (JDBC upserts, custom formats). Each
    micro-batch arrives as a BATCH DataFrame with its epoch id —
    verify exactly-once-shaped delivery by aggregating into an
    idempotent per-epoch parquet write and re-reading the union."""
    from nineinfra_spark.streaming.ops import read_events_stream

    sink = os.path.join(OUT, "fb_sink")
    ckpt = os.path.join(OUT, "fb_ckpt")
    shutil.rmtree(sink, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    def handle(batch_df, epoch_id: int) -> None:
        # per-epoch subdir => idempotent under retries (same epoch
        # overwrites itself, never double-appends)
        (
            batch_df.groupBy("event_type")
            .count()
            .write.mode("overwrite")
            .parquet(os.path.join(sink, f"epoch={epoch_id}"))
        )

    ev = read_events_stream(spark, SF).select("event_id", "event_type")
    q = (
        ev.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = (
        spark.read.option("basePath", sink).parquet(sink + "/epoch=*")
        .groupBy("event_type")
        .agg(F.sum("count").alias("n"))
    )
    want = (
        spark.read.parquet(os.path.join(SF, "events.parquet"))
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_watermark_drops_late_rows_provably(spark):
    """Adversarial late data: a row arriving in a LATER micro-batch
    with event time older than (max event time seen - watermark delay)
    must be dropped from the windowed aggregate — asserted both on the
    emitted counts (late row absent) and on the state operator's
    numRowsDroppedByWatermark metric (exactly the one row)."""
    import json

    src = os.path.join(OUT, "late_src")
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)

    # batch 0: three rows in the 10:00 window + a clock-advancer at
    # 11:00 (watermark after the batch = 11:00 - 10min = 10:50).
    # batch 1: another clock tick — needed because the late-row filter
    # takes effect one batch AFTER the progress log first shows the
    # advanced watermark (verified empirically on this Spark: a late
    # row in the very next batch is still merged, not dropped).
    # batch 2: one late row back in the long-closed 10:00 window.
    batches = [
        [
            {"event_id": 1, "ts": "2024-03-01 10:00:30"},
            {"event_id": 2, "ts": "2024-03-01 10:01:30"},
            {"event_id": 3, "ts": "2024-03-01 10:02:30"},
            {"event_id": 4, "ts": "2024-03-01 11:00:00"},
        ],
        [{"event_id": 5, "ts": "2024-03-01 11:00:01"}],
        [{"event_id": 6, "ts": "2024-03-01 10:03:00"}],
    ]
    now = time.time()
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"f{i}.json")
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (now - 300 + i * 100, now - 300 + i * 100))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("string").alias("w_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("mem_late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1, dropped

    got = {r["w_start"]: r["n"] for r in spark.table("mem_late_test").collect()}
    # the 10:00 window closed with ONLY the three on-time rows: the
    # late 10:03 row did not reopen or increment it
    assert got.get("2024-03-01 10:00:00") == 3, got


def test_checkpoint_restart_is_exactly_once(spark):
    """Kill-and-restart recovery: a checkpointed file-sink query is
    stopped after its first micro-batch, then restarted with the SAME
    checkpoint — the sink must end up with every input row exactly
    once (no loss, no duplicates), because the commit log replays only
    unfinished batches."""
    import json

    src = os.path.join(OUT, "restart_src")
    sink = os.path.join(OUT, "restart_sink")
    ckpt = os.path.join(OUT, "restart_ckpt")
    for d in (src, sink, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(src)
    now = time.time()
    for i in range(4):  # 4 files à 25 rows, one per micro-batch
        p = os.path.join(src, f"f{i}.json")
        with open(p, "w") as f:
            f.write(
                "\n".join(
                    json.dumps({"k": i * 25 + j, "b": i}) for j in range(25)
                )
            )
        os.utime(p, (now - 400 + i * 100, now - 400 + i * 100))

    def start(trigger):
        return (
            spark.readStream.schema("k long, b long")
            .option("maxFilesPerTrigger", "1")
            .json(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger)
            .start()
        )

    # phase 1: slow trigger (one file per 2 s) so the stop() provably
    # lands mid-stream — availableNow would race through all 4 batches
    # before the poll loop could observe the first commit
    q = start({"processingTime": "2 seconds"})
    deadline = time.time() + 60
    while time.time() < deadline:
        if any(p["batchId"] >= 1 for p in q.recentProgress):
            break
        time.sleep(0.1)
    q.stop()
    q.awaitTermination()
    partial = spark.read.parquet(sink).count()
    assert 0 < partial < 100, partial  # genuinely interrupted mid-input

    # phase 2: restart from the same checkpoint and drain
    q2 = start({"availableNow": True})
    q2.awaitTermination()
    rows = [r["k"] for r in spark.read.parquet(sink).collect()]
    assert len(rows) == 100, len(rows)          # nothing lost...
    assert len(set(rows)) == 100                # ...nothing duplicated
    assert set(rows) == set(range(100))


def test_stream_stream_join_state_cleanup(spark):
    """Watermarked stream-stream join state is EVICTED once the
    watermark passes the join range — asserted on the state operator's
    numRowsRemoved metric. Without eviction a 100 TB join's state
    grows without bound; this pins that the range condition actually
    bounds it."""
    import json

    src_a = os.path.join(OUT, "ssj_a")
    src_b = os.path.join(OUT, "ssj_b")
    for d in (src_a, src_b):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
    now = time.time()

    def stage(d, name, rows, age):
        p = os.path.join(d, name)
        with open(p, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        os.utime(p, (now - age, now - age))

    # batch 0: joinable rows at 10:00 on both sides
    stage(src_a, "a0.json", [{"k": 1, "ts": "2024-03-01 10:00:00"}], 300)
    stage(src_b, "b0.json", [{"k": 1, "ts": "2024-03-01 10:00:10"}], 300)
    # batches 1-2: clock advances far past the join range on both sides
    stage(src_a, "a1.json", [{"k": 2, "ts": "2024-03-01 12:00:00"}], 200)
    stage(src_b, "b1.json", [{"k": 2, "ts": "2024-03-01 12:00:10"}], 200)
    stage(src_a, "a2.json", [{"k": 3, "ts": "2024-03-01 14:00:00"}], 100)
    stage(src_b, "b2.json", [{"k": 3, "ts": "2024-03-01 14:00:10"}], 100)

    left = (
        spark.readStream.schema("k long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(src_a)
        .withWatermark("ts", "10 seconds")
        .selectExpr("k", "ts AS ts_a")
    )
    right = (
        spark.readStream.schema("k long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(src_b)
        .withWatermark("ts", "10 seconds")
        .selectExpr("k AS k_b", "ts AS ts_b")
    )
    joined = left.join(
        right,
        F.expr(
            "k = k_b AND ts_b BETWEEN ts_a AND ts_a + INTERVAL 1 MINUTE"
        ),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("mem_ssj_cleanup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    removed = sum(
        op.get("numRowsRemoved", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert removed > 0, [p["stateOperators"] for p in q.recentProgress]
    # the joins themselves all landed before eviction
    ks = sorted(r["k"] for r in spark.table("mem_ssj_cleanup").collect())
    assert ks == [1, 2, 3], ks


def test_staged_dir_heals_dangling_and_stale_links(tmp_path, monkeypatch):
    """r12 review finding: the stream-source stager created links only
    when ``os.path.exists(link)`` was False — but exists() is False on
    a DANGLING symlink too, so a regenerated source (the sf1 tiling is
    rewritten in place) crashed staging with FileExistsError; a source
    that SHRANK left extra stale links poisoning every later replay."""
    from nineinfra_spark.streaming import ops

    monkeypatch.setattr(ops, "STREAM_SRC_ROOT", str(tmp_path / "staged"))
    sf = tmp_path / "sfx"
    src = sf / "events.parquet"
    src.mkdir(parents=True)
    for i in range(3):
        (src / f"part-{i}.parquet").write_bytes(b"p%d" % i)

    staged = ops._staged_table_dir(str(sf), "events")
    assert sorted(os.listdir(staged)) == [
        "events-000.parquet", "events-001.parquet", "events-002.parquet"
    ]

    # regenerate the source: fewer, differently-named leaves
    shutil.rmtree(src)
    src.mkdir()
    (src / "part-new.parquet").write_bytes(b"new")

    staged2 = ops._staged_table_dir(str(sf), "events")
    assert staged2 == staged
    assert sorted(os.listdir(staged)) == ["events-000.parquet"]
    link = os.path.join(staged, "events-000.parquet")
    assert os.readlink(link) == str(src / "part-new.parquet")
    with open(link, "rb") as f:
        assert f.read() == b"new"
    # idempotent when nothing changed
    assert ops._staged_table_dir(str(sf), "events") == staged
    assert sorted(os.listdir(staged)) == ["events-000.parquet"]


def _stage_worker(root, sf, barrier, out):
    from nineinfra_spark.streaming import ops

    ops.STREAM_SRC_ROOT = root
    barrier.wait(timeout=60)
    try:
        for _ in range(20):
            ops._staged_table_dir(sf, "events")
        out.put(("ok", None))
    except BaseException as exc:  # surfaced by the parent
        out.put(("fail", repr(exc)))


def test_staged_dir_concurrent_stagers_no_crash(tmp_path):
    """r16 post-stamp hardening: two PROCESSES staging the same sf_dir
    at once (driver sim racing a bench run) must both succeed — the
    lexists-check → symlink window is closed by tolerating a
    same-target FileExistsError, and cleanup tolerates the concurrent
    remove. Ends with a correct staged dir."""
    import multiprocessing as mp

    from nineinfra_spark.streaming import ops

    root = str(tmp_path / "staged")
    sf = tmp_path / "sfy"
    src = sf / "events.parquet"
    src.mkdir(parents=True)
    for i in range(8):
        (src / f"part-{i}.parquet").write_bytes(b"p%d" % i)

    out = mp.Queue()
    barrier = mp.Barrier(3)
    procs = [
        mp.Process(
            target=_stage_worker, args=(root, str(sf), barrier, out)
        )
        for _ in range(3)
    ]
    for p in procs:
        p.start()
    results = [out.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=30)
    assert all(r[0] == "ok" for r in results), results
    old_root, ops.STREAM_SRC_ROOT = ops.STREAM_SRC_ROOT, root
    try:
        staged = ops._staged_table_dir(str(sf), "events")
    finally:
        ops.STREAM_SRC_ROOT = old_root
    assert sorted(os.listdir(staged)) == [
        f"events-{i:03d}.parquet" for i in range(8)
    ]
