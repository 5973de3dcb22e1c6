"""Set operations (SURVEY.md §2.7): UNION [ALL], INTERSECT [ALL],
EXCEPT [ALL], by-name union."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import t, ts
from nineinfra_spark.plans.registry import query


def _cohort(spark: SparkSession, sf_dir: str, lo: str, hi: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= ts(lo)) & (F.col("o_orderdate") < ts(hi)))
        .select("o_custkey")
    )


@query(
    "setop_union_all",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 430000
    UNION ALL
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
      AND o_totalprice > 400000
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — overlapping rows appear twice."""
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 430000).select("o_orderkey", "o_orderstatus")
    b = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 400000)
    ).select("o_orderkey", "o_orderstatus")
    return a.union(b)


@query(
    "setop_union_distinct",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 420000
    UNION
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    tags=("setop",),
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 420000).select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.union(b).distinct()


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers active in both Q1-1996 and Q1-1997 (set semantics)."""
    a = _cohort(spark, sf_dir, "1996-01-01", "1996-04-01")
    b = _cohort(spark, sf_dir, "1997-01-01", "1997-04-01")
    return a.intersect(b)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
    INTERSECT ALL
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection — multiplicity = min of the two sides."""
    a = _cohort(spark, sf_dir, "1996-01-01", "1996-07-01")
    b = _cohort(spark, sf_dir, "1997-01-01", "1997-07-01")
    return a.intersectAll(b)


@query(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churned cohort: active in 1996-Q1 but not 1997-Q1."""
    a = _cohort(spark, sf_dir, "1996-01-01", "1996-04-01")
    b = _cohort(spark, sf_dir, "1997-01-01", "1997-04-01")
    return a.subtract(b)


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
    EXCEPT ALL
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference — multiplicity-aware EXCEPT."""
    a = _cohort(spark, sf_dir, "1996-01-01", "1996-07-01")
    b = _cohort(spark, sf_dir, "1997-01-01", "1997-07-01")
    return a.exceptAll(b)


@query(
    "setop_union_by_name",
    oracle="""
    SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, s_name AS entity_name, 'supplier' AS kind FROM supplier
    """,
    tags=("setop",),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: position-independent union (schema evolution path)."""
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    supp = t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("entity_name"),
        F.col("s_suppkey").alias("entity_key"),
    )
    return cust.unionByName(supp)
