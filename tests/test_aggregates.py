"""Tolerance + determinism tests promised by the plan docstrings:
native one-pass statistics vs exact-moment compositions, sketch error
bounds, seeded-sample determinism, and partition-local sort ordering.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nineinfra_spark.plans._util import t

SF = "/root/testdata/sf0.01"


class TestNativeStatsTolerance:
    """The registered queries expose exact-moment compositions (bit-
    stable); the native one-pass versions must agree within float
    tolerance despite their merge-order-dependent accumulators."""

    def test_stddev_var(self, spark):
        li = t(spark, SF, "lineitem")
        rows = li.groupBy("l_returnflag").agg(
            F.stddev_pop("l_quantity").alias("sd_native"),
            F.var_pop("l_quantity").alias("var_native"),
            F.sum(F.col("l_quantity").cast("long")).alias("s1"),
            F.sum(
                F.col("l_quantity").cast("long") * F.col("l_quantity").cast("long")
            ).alias("s2"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
        for r in rows:
            var_exact = r["s2"] / r["n"] - (r["s1"] / r["n"]) ** 2
            assert math.isclose(r["var_native"], var_exact, rel_tol=1e-9)
            assert math.isclose(r["sd_native"], math.sqrt(var_exact), rel_tol=1e-9)

    def test_corr(self, spark):
        li = t(spark, SF, "lineitem")
        r = li.agg(
            F.corr("l_quantity", "l_extendedprice").alias("corr_native"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("double")).alias("sx"),
            F.sum(F.col("l_extendedprice").cast("double")).alias("sy"),
            F.sum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
            F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
            F.sum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias("syy"),
        ).collect()[0]
        n = r["n"]
        cov = r["sxy"] / n - (r["sx"] / n) * (r["sy"] / n)
        vx = r["sxx"] / n - (r["sx"] / n) ** 2
        vy = r["syy"] / n - (r["sy"] / n) ** 2
        assert math.isclose(r["corr_native"], cov / math.sqrt(vx * vy), rel_tol=1e-6)

    def test_skew_kurt(self, spark):
        """Native F.skewness/F.kurtosis vs the exact-moment query."""
        from nineinfra_spark.plans.aggregates import agg_skew_kurt

        exact = {
            r["l_returnflag"]: (r["skew"], r["kurt"])
            for r in agg_skew_kurt(spark, SF).collect()
        }
        native = t(spark, SF, "lineitem").groupBy("l_returnflag").agg(
            F.skewness("l_quantity").alias("sk"), F.kurtosis("l_quantity").alias("ku")
        ).collect()
        for r in native:
            sk_e, ku_e = exact[r["l_returnflag"]]
            assert math.isclose(r["sk"], sk_e, rel_tol=1e-4, abs_tol=1e-6)
            assert math.isclose(r["ku"], ku_e, rel_tol=1e-4, abs_tol=1e-6)


class TestSketchBounds:
    def test_approx_count_distinct_within_rsd(self, spark):
        """HLL++ at rsd=0.02 must land within 5×rsd of exact (generous
        but non-vacuous: catches wiring errors, tolerates sketch
        variance)."""
        li = t(spark, SF, "lineitem")
        rows = (
            li.groupBy("l_returnflag")
            .agg(
                F.approx_count_distinct("l_partkey", 0.02).alias("approx"),
                F.countDistinct("l_partkey").alias("exact"),
            )
            .collect()
        )
        for r in rows:
            assert abs(r["approx"] - r["exact"]) / r["exact"] <= 0.10, (
                f"{r['l_returnflag']}: approx={r['approx']} exact={r['exact']}"
            )

    def test_percentile_approx_brackets_exact(self, spark):
        """percentile_approx(accuracy=10000) must fall between the
        exact p45 and p55 — i.e., within 5 rank-percent of the true
        median."""
        orders = t(spark, SF, "orders")
        r = orders.agg(
            F.percentile_approx("o_totalprice", 0.5, 10000).alias("ap50"),
            F.expr("percentile(o_totalprice, 0.45)").alias("p45"),
            F.expr("percentile(o_totalprice, 0.55)").alias("p55"),
        ).collect()[0]
        assert r["p45"] <= r["ap50"] <= r["p55"]


class TestSampleDeterminism:
    def test_same_seed_same_rows(self, spark):
        orders = t(spark, SF, "orders")
        a = sorted(r["o_orderkey"] for r in orders.sample(fraction=0.1, seed=42).collect())
        b = sorted(r["o_orderkey"] for r in orders.sample(fraction=0.1, seed=42).collect())
        assert a == b
        assert 0.05 <= len(a) / 15000 <= 0.15  # fraction=0.1 ± slack

    def test_hash_bucket_sample_rate(self, spark):
        from nineinfra_spark.plans.sortlimit import sample_hash_bucket

        n = sample_hash_bucket(spark, SF).count()
        assert 0.09 <= n / 15000 <= 0.16  # expected 1/8 = 0.125

    def test_different_seed_differs(self, spark):
        orders = t(spark, SF, "orders")
        a = sorted(r["o_orderkey"] for r in orders.sample(fraction=0.1, seed=42).collect())
        b = sorted(r["o_orderkey"] for r in orders.sample(fraction=0.1, seed=43).collect())
        assert a != b


class TestSortWithinPartitions:
    def test_each_partition_locally_sorted(self, spark):
        from nineinfra_spark.plans.sortlimit import sort_within_partitions

        df = sort_within_partitions(spark, SF)

        def check(it):
            prev = None
            for row in it:
                if prev is not None and row.o_totalprice < prev:
                    yield ("unsorted",)
                prev = row.o_totalprice

        bad = df.rdd.mapPartitions(check).count()
        assert bad == 0
