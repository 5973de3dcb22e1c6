"""Shared helpers for query plan modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nineinfra_spark.sources.readers import read_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (column pruning / predicate pushdown
    apply; nanos-timestamp handling lives in sources.readers)."""
    return read_table(spark, sf_dir, name)


def dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Cast to decimal so sums are exact and order-independent — makes
    floating aggregates bit-stable across engines (Spark vs DuckDB
    would otherwise disagree in the last ulp depending on reduce order).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def ts(s: str) -> Column:
    """Literal timestamp from 'YYYY-MM-DD' (testdata dates are timestamps)."""
    return F.lit(s).cast("timestamp")


def ranked_prefix(df, order_cols, value_col, n_parts: int = 32):
    """Distributed global rank + running sum over a total order — the
    replacement for ``Window.orderBy`` WITHOUT ``partitionBy`` (which
    moves the whole input to ONE task; see tests/test_plan_lint.py's
    unpartitioned-WindowExec rule). Returns ``df`` plus two columns:
    ``i`` (1-based global row_number in ``order_cols`` order, bigint)
    and ``cum`` (running sum of ``value_col`` inclusive, bigint).

    Shape: range-repartition on the sort key (parallel exchange),
    freeze partition ids with a localCheckpoint (BOTH consumers below
    must see the SAME boundaries — re-evaluating a range exchange may
    re-sample), then (a) a pid-local PARTITIONED window for local
    rank/prefix and (b) an |n_parts|²-bounded offsets self-join
    (count/sum of all earlier partitions, broadcast back). No stage
    ever holds more than one range partition; callers that use it on
    an unbounded input need the ``bounded-nlj`` tag for the tiny
    offsets theta-join.

    ``order_cols`` must define a TOTAL order (include a tiebreaker
    key) — rows with equal keys could otherwise straddle a range
    boundary and double-count an offset."""
    reserved = {"_pid", "_li", "_lsum", "_pcnt", "_psum",
                "_cnt_off", "_sum_off", "i", "cum"}
    clash = reserved & set(df.columns)
    if clash:
        # withColumn would silently overwrite (or drop, for _pid) a
        # caller column — refuse loudly instead of losing data
        raise ValueError(
            f"ranked_prefix: input columns collide with the helper's "
            f"working/output names: {sorted(clash)}"
        )
    parts = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    pstats = parts.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_pcnt"),
        F.sum(value_col).alias("_psum"),
    )
    offs = (
        pstats.alias("a")
        .join(pstats.alias("b"), F.col("b._pid") < F.col("a._pid"), "left")
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(
            F.coalesce(F.sum("b._pcnt"), F.lit(0)).cast("bigint").alias("_cnt_off"),
            F.coalesce(F.sum("b._psum"), F.lit(0)).cast("bigint").alias("_sum_off"),
        )
    )
    from pyspark.sql import Window

    lw = Window.partitionBy("_pid").orderBy(*order_cols)
    local = parts.withColumn("_li", F.row_number().over(lw)).withColumn(
        "_lsum",
        F.sum(value_col).over(
            lw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn("i", (F.col("_li") + F.col("_cnt_off")).cast("bigint"))
        .withColumn("cum", (F.col("_lsum") + F.col("_sum_off")).cast("bigint"))
        .drop("_pid", "_li", "_lsum", "_cnt_off", "_sum_off")
    )


def cpu_spread(df):
    """Adaptive pre-compute repartition for CPU-bound per-row work
    (regex tokenization, array folds): Spark sizes scan partitions by
    BYTES, so a small-but-dense single-file table serializes heavy
    row work on one core. If the scan has fewer files than cores,
    shuffle the (tiny) raw rows once and localCheckpoint — the RDD
    boundary doubles as a predicate-pushdown barrier, without which
    InferFiltersFromGenerate + PushDownPredicates drag the expensive
    expressions back below the repartition into the scan stage. On a
    real corpus (files ≥ cores) this is a no-op branch."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) < par:
        return df.repartition(par).localCheckpoint(eager=False)
    return df
