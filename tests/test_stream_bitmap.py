"""stream_bitmap_distinct: the OR-merge algebra's REPLAY idempotence —
the property the docstring claims makes at-least-once delivery yield
the exactly-once result. After the streaming maintainer builds the
bitmap index, re-ingesting the ENTIRE corpus again (the worst replay:
every batch duplicated) must leave every readout row byte-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _readout(spark, idx):
    words = spark.table(idx)
    weekly = words.groupBy("week").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct")
    )
    total = (
        words.groupBy("w_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
        .agg(F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct"))
        .select(F.lit(-1).cast("bigint").alias("week"), "n_distinct")
    )
    return sorted(
        weekly.select("week", "n_distinct").unionByName(total).collect()
    )


def test_full_corpus_replay_is_identity(spark):
    from nineinfra_spark.plans._util import t
    from nineinfra_spark.plans.registry import get
    from nineinfra_spark.plans.streaming_queries import publish_snapshot

    first = sorted(get("stream_bitmap_distinct").fn(spark, SF).collect())

    # replay the WHOLE corpus as one giant duplicate batch into the
    # index the stream just built, via the same OR-merge
    idx = "nine_wh_sf0_001.user_bitmaps"
    delta = (
        t(spark, SF, "events")
        .select(
            F.floor(
                F.datediff(
                    F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
                )
                / 7
            )
            .cast("bigint")
            .alias("week"),
            "user_id",
        )
        .groupBy("week", F.expr("user_id div 63").alias("w_idx"))
        .agg(
            F.expr(
                "bit_or(shiftleft(cast(1 as bigint),"
                " cast(user_id % 63 as int)))"
            ).alias("new_bits")
        )
    )
    base = spark.table(idx).select(
        "week", "w_idx", F.col("bits").alias("old_bits")
    )
    merged = base.join(delta, ["week", "w_idx"], "full_outer").select(
        "week",
        "w_idx",
        F.expr("coalesce(old_bits, 0) | coalesce(new_bits, 0)").alias("bits"),
    )
    publish_snapshot(spark, idx, merged)

    assert _readout(spark, idx) == first
