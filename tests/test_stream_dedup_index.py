"""stream_dedup_index: the monotone (min, +) signature-index merge
must be independent of micro-batch boundaries and file arrival order.

The registered query's differential oracle runs on the single-file
testdata (one micro-batch); this test stages a 3-file copy of
documents split ADVERSARIALLY — duplicate-content docs are forced
into DIFFERENT files (round-robin on doc_id rank), so the canonical
min-id and the copy count must be assembled ACROSS batches — and
asserts the incrementally-built index equals the batch GROUP BY."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from nineinfra_spark.plans.ext_text import TOKS_SPARK
from nineinfra_spark.plans.streaming_queries import stream_dedup_index
from nineinfra_spark.sources.readers import read_table

SF = "/root/testdata/sf0.01"
STAGED_SF = "/tmp/nineinfra_dedupidx_multifile_sf"


@pytest.fixture(scope="module")
def multifile_sf(spark):
    shutil.rmtree(STAGED_SF, ignore_errors=True)
    os.makedirs(STAGED_SF)
    docs = read_table(spark, SF, "documents")
    from pyspark.sql import Window

    w = Window.orderBy("doc_id")
    slotted = docs.withColumn("_slot", F.row_number().over(w) % 3)
    for s in range(3):
        (
            slotted.filter(F.col("_slot") == s)
            .drop("_slot")
            .coalesce(1)
            .write.mode("append")
            .parquet(os.path.join(STAGED_SF, "documents.parquet"))
        )
    yield STAGED_SF
    shutil.rmtree(STAGED_SF, ignore_errors=True)
    shutil.rmtree(
        "/tmp/nineinfra_stream_src/nineinfra_dedupidx_multifile_sf",
        ignore_errors=True,
    )


def test_index_matches_batch_groupby_across_batches(spark, multifile_sf):
    idx = stream_dedup_index(spark, multifile_sf)
    got = {
        r["content_hash"]: (r["canonical_doc_id"], r["n_copies"])
        for r in idx.collect()
    }
    want = {
        r["content_hash"]: (r["canonical_doc_id"], r["n_copies"])
        for r in (
            read_table(spark, SF, "documents")
            .select(
                "doc_id",
                F.md5(F.expr(f"array_join({TOKS_SPARK}, ' ')")).alias(
                    "content_hash"
                ),
            )
            .groupBy("content_hash")
            .agg(
                F.min("doc_id").alias("canonical_doc_id"),
                F.count(F.lit(1)).alias("n_copies"),
            )
            .collect()
        )
    }
    assert got == want
    # ≥2 micro-batches actually ran: the staged table is 3 files and
    # maxFilesPerTrigger=1 — if the stream collapsed to one batch the
    # adversarial split proves nothing. (The index converging is the
    # real assertion; this guards the harness.)
    staged = "/tmp/nineinfra_stream_src/nineinfra_dedupidx_multifile_sf/documents"
    assert len([f for f in os.listdir(staged) if f.endswith(".parquet")]) == 3


def test_replay_marker_prevents_double_count(spark):
    """A re-delivered micro-batch must not inflate n_copies: the
    ``nine.last_batch_id`` marker commits atomically with each index
    publish and the guard skips any batch id ≤ it."""
    from nineinfra_spark.operators.merge import read_table_property
    from nineinfra_spark.plans.streaming_queries import (
        LAST_BATCH_PROP,
        apply_dedup_index_batch,
    )

    idx = "dedupidx_replay_t"
    for n in (idx, f"{idx}__merge_stage", f"{idx}__merge_old"):
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    spark.createDataFrame(
        [], "content_hash string, canonical_doc_id long, n_copies long"
    ).write.saveAsTable(idx)
    try:
        b0 = spark.createDataFrame(
            [(10, ["same", "text"]), (7, ["same", "text"]), (3, ["other"])],
            "doc_id long, toks array<string>",
        ).select("doc_id", F.array_join("toks", " ").alias("text"))
        b1 = spark.createDataFrame(
            [(1, ["same", "text"])], "doc_id long, toks array<string>"
        ).select("doc_id", F.array_join("toks", " ").alias("text"))

        def state():
            return {
                r["content_hash"]: (r["canonical_doc_id"], r["n_copies"])
                for r in spark.table(idx).collect()
            }

        assert apply_dedup_index_batch(spark, idx, b0, batch_id=0) is True
        after_b0 = state()
        dup_hash = next(h for h, v in after_b0.items() if v[1] == 2)
        assert after_b0[dup_hash] == (7, 2)
        assert read_table_property(spark, idx, LAST_BATCH_PROP) == "0"
        # restart re-delivery: skipped, counts NOT inflated
        assert apply_dedup_index_batch(spark, idx, b0, batch_id=0) is False
        assert state() == after_b0
        # fresh batch: canonical id drops to 1, count rises to 3
        assert apply_dedup_index_batch(spark, idx, b1, batch_id=1) is True
        assert state()[dup_hash] == (1, 3)
        assert read_table_property(spark, idx, LAST_BATCH_PROP) == "1"
    finally:
        for n in (idx, f"{idx}__merge_stage", f"{idx}__merge_old"):
            spark.sql(f"DROP TABLE IF EXISTS {n}")


@pytest.mark.slow
def test_real_checkpoint_redelivery_is_skipped(spark, tmp_path):
    """END-TO-END replay through Spark's own recovery path: run the
    maintainer with a persistent checkpoint, then delete the LAST
    commits/ entry (the exact crash window foreachBatch documents —
    batch ran, commit marker unwritten) and restart. Spark re-delivers
    the final batch with the same batch_id; the table-property marker
    must skip the re-fold or every restart double-counts."""
    import json as _json

    from pyspark.sql import functions as F  # noqa: F401 (parity with module)

    from nineinfra_spark.plans.streaming_queries import (
        apply_dedup_index_batch,
    )

    src = tmp_path / "src"
    src.mkdir()
    docs = spark.createDataFrame(
        [(i, f"text {'x' * (i % 3)}") for i in range(30)],
        "doc_id long, text string",
    )
    for s in range(3):
        (
            docs.filter(F.col("doc_id") % 3 == s)
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )
    idx = "dedupidx_ckpt_replay_t"
    for n in (idx, f"{idx}__merge_stage", f"{idx}__merge_old"):
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    spark.createDataFrame(
        [], "content_hash string, canonical_doc_id long, n_copies long"
    ).write.saveAsTable(idx)
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
                lambda b, bid: apply_dedup_index_batch(
                    spark, idx, b, batch_id=bid
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        run()
        state = {
            r["content_hash"]: (r["canonical_doc_id"], r["n_copies"])
            for r in spark.table(idx).collect()
        }
        assert sum(n for _, n in state.values()) == 30
        # simulate the crash window: last batch ran (its effects are in
        # the table + marker), but Spark's commit log never recorded it
        import os as _os

        commits = sorted(
            f
            for f in _os.listdir(_os.path.join(ckpt, "commits"))
            if f.isdigit()
        )
        assert len(commits) >= 2  # multi-batch replay, or the test is vacuous
        _os.remove(_os.path.join(ckpt, "commits", commits[-1]))
        # the local-FS checkpoint writes a .crc checksum sidecar per
        # commit entry; leaving it orphaned blocks the restarted
        # query's commit rewrite with FileAlreadyExists
        crc = _os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
        if _os.path.exists(crc):
            _os.remove(crc)
        run()  # restart: Spark re-delivers the last batch, same batch_id
        state2 = {
            r["content_hash"]: (r["canonical_doc_id"], r["n_copies"])
            for r in spark.table(idx).collect()
        }
        assert state2 == state, "re-delivered batch was folded twice"
    finally:
        for n in (idx, f"{idx}__merge_stage", f"{idx}__merge_old"):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
