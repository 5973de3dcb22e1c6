"""Shared helpers for query plan modules."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (column pruning / predicate pushdown apply).

    ``events.parquet`` stores its timestamp as INT64 TIMESTAMP(NANOS),
    which Spark's vectorized parquet reader rejects. We read it as a
    raw long (legacy conf) and rebuild a timestamp_ntz, truncating
    nanos → micros exactly like DuckDB's reader does, so both engines
    see identical values.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(path)
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn(
            "ts",
            F.expr(
                "timestamp_ntz'1970-01-01 00:00:00' + "
                "make_dt_interval(0, 0, 0, cast(ts div 1000 as decimal(20,0)) / 1000000)"
            ),
        )
    return raw


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
