"""operators/mv.route_aggregate: containment rules and the
fact-never-scanned guarantee of rollup routing."""

from __future__ import annotations

from pyspark.sql import functions as F

from nineinfra_spark.operators.mv import RollupSpec, route_aggregate

SF = "/root/testdata/sf0.01"


def _spec(spark):
    from nineinfra_spark.plans.registry import get

    # build/refresh the rollup tables via the registered query
    get("catalog_rollup_routing").fn(spark, SF).collect()
    return RollupSpec(
        table="nine_wh_sf0_01.sales_rollup_rt",
        dims=("m", "o_orderstatus"),
        sums=("sum_price",),
        counts=("n_orders",),
    )


def test_routed_plan_never_scans_fact(spark):
    spec = _spec(spark)
    routed = route_aggregate(
        spark, spec, ["o_orderstatus"], {"n": ("count", "n_orders")}
    )
    phys = routed._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "sales_rollup_rt" in phys
    assert "orders.parquet" not in phys  # the fact is never touched


def test_containment_refusals(spark):
    spec = _spec(spark)
    # group-by outside the rollup dims → cannot serve
    assert (
        route_aggregate(spark, spec, ["o_custkey"], {"n": ("count", "n_orders")})
        is None
    )
    # unknown measure column → cannot serve
    assert (
        route_aggregate(spark, spec, ["m"], {"x": ("sum", "nope")}) is None
    )
    # avg must name BOTH a stored sum and a stored count
    assert (
        route_aggregate(spark, spec, ["m"], {"a": ("avg", "sum_price", "nope")})
        is None
    )


def test_derived_avg_not_reaveraged(spark):
    """The rollup-served AVG must equal the fact-computed AVG even
    though group sizes differ across months (re-averaging stored
    per-month averages would NOT — this is the containment rule that
    justifies storing sums+counts only)."""
    spec = _spec(spark)
    routed = route_aggregate(
        spark,
        spec,
        ["o_orderstatus"],
        {"avg_price": ("avg", "sum_price", "n_orders")},
    ).collect()
    got = {r["o_orderstatus"]: r["avg_price"] for r in routed}

    from nineinfra_spark.plans._util import t

    fact = (
        t(spark, SF, "orders")
        .select(
            "o_orderstatus",
            F.round("o_totalprice", 2).cast("decimal(18,2)").alias("p"),
        )
        .groupBy("o_orderstatus")
        .agg((F.sum("p").cast("double") / F.count(F.lit(1))).alias("avg"))
        .collect()
    )
    want = {r["o_orderstatus"]: r["avg"] for r in fact}
    assert got == want


def test_empty_measures_routes_none(spark):
    """A measureless request returns None (fall back to the fact
    table) instead of reaching Spark's agg() with zero expressions
    and raising a bare TypeError far from the caller's mistake."""
    spec = _spec(spark)
    assert route_aggregate(spark, spec, ["o_orderstatus"], {}) is None
