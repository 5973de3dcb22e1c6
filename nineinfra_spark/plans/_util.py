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
