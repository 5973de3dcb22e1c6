"""Plan assertions for the SQL-text subquery shapes (plans/tpch_sql.py).

These queries enter as SQL TEXT with correlated scalar subqueries and
NOT EXISTS — the shapes an ad-hoc gateway user writes. The scale
guarantee is that Catalyst's rewrites fire and stay fired:

- ``RewriteCorrelatedScalarSubquery``: the correlated aggregate in
  WHERE becomes aggregate → equi-join. Witness: the ANALYZED plan
  contains ``scalar-subquery`` expressions, the OPTIMIZED plan
  contains none — and the physical plan scans each table a bounded,
  exact number of times (a per-row re-scan would be O(n²) at 100 TB).
- ``RewritePredicateSubquery``: NOT EXISTS becomes a LEFT ANTI join,
  with the date predicate pushed into the orders SCAN (below every
  exchange), so the anti-join shuffle carries only the recent slice.

If a Spark upgrade ever regresses a rewrite, these fail — not just
the benchmark.
"""

from __future__ import annotations

from nineinfra_spark.plans.registry import get

SF = "/root/testdata/sf0.001"


def _plans(spark, name: str) -> tuple[str, str, str]:
    qe = get(name).fn(spark, SF)._jdf.queryExecution()  # noqa: SLF001
    return (
        qe.analyzed().toString(),
        qe.optimizedPlan().toString(),
        qe.executedPlan().toString(),
    )


def test_q17_correlated_avg_decorrelates_to_aggregate_join(spark):
    ana, opt, phys = _plans(spark, "q17_small_qty_revenue")
    # the user WROTE a correlated scalar subquery...
    assert "scalar-subquery" in ana
    # ...and the optimizer removed every scalar-subquery expression
    # (per-row execution is impossible once none remain)
    assert "scalar-subquery" not in opt
    # the decorrelated form: avg(l_quantity) grouped by partkey,
    # joined back — visible as a keyed aggregate in the physical plan
    assert "avg(l_quantity" in phys
    assert "l_partkey" in phys
    # lineitem is scanned exactly twice (main + the avg aggregate),
    # regardless of row count — the whole point of decorrelation
    assert phys.count("lineitem.parquet") == 2, phys.count("lineitem.parquet")


def test_q2_twin_correlated_subqueries_decorrelate(spark):
    ana, opt, phys = _plans(spark, "q2_above_partition_avg")
    assert ana.count("scalar-subquery") >= 2  # both written as subqueries
    assert "scalar-subquery" not in opt
    # each subquery became its own per-nation aggregate + equi-join:
    # exactly 3 customer scans (main + COUNT agg + SUM agg), 2 joins —
    # bounded and linear; never a per-outer-row re-scan
    assert phys.count("customer.parquet") == 3, phys.count("customer.parquet")
    # correlation is gone: no outer() references survive optimization
    assert "outer(" not in opt


def test_q21_exists_pair_becomes_semi_plus_anti(spark):
    ana, opt, phys = _plans(spark, "q21_waiting_suppliers")
    # the correlated EXISTS / NOT EXISTS pair rewrites to one LEFT
    # SEMI and one LEFT ANTI join (RewritePredicateSubquery), with the
    # non-equi suppkey conjunct carried as a join condition
    assert "LeftSemi" in phys
    assert "LeftAnti" in phys
    assert "outer(" not in opt  # correlation fully eliminated
    # lineitem is scanned exactly three times (main + semi + anti
    # sides) — bounded, never per-outer-row
    assert phys.count("lineitem.parquet") == 3, phys.count("lineitem.parquet")


def test_q22_not_exists_becomes_left_anti_with_pushed_filter(spark):
    ana, opt, phys = _plans(spark, "q22_inactive_customers")
    # NOT EXISTS in the text...
    assert "Exists" in ana or "exists" in ana
    # ...rewritten to LEFT ANTI (RewritePredicateSubquery)
    assert "LeftAnti" in phys
    # correlation eliminated; the two UNcorrelated scalar subqueries
    # legitimately remain (planned once, reused as literals)
    assert "outer(" not in opt
    # the date window is evaluated AT THE ORDERS SCAN — below every
    # exchange — so the anti join shuffles only the recent slice
    orders_scans = [
        line
        for line in phys.splitlines()
        if "orders.parquet" in line and "FileScan" in line
    ]
    assert orders_scans, phys[:2000]
    assert any(
        "o_orderdate" in line and "1998-01-01" in line for line in orders_scans
    ), orders_scans


def test_interval_join_is_equi_not_nested_loop(spark):
    """The binned range-join rewrite must plan as an equi-join on the
    time bucket — no BroadcastNestedLoopJoin / CartesianProduct
    anywhere (the operator's whole reason to exist)."""
    _, _, phys = _plans(spark, "join_interval_bucketed")
    assert "BroadcastNestedLoop" not in phys
    assert "Cartesian" not in phys
    # the selective trigger predicate reaches the interval-side scan
    assert any(
        "events.parquet" in line and "FileScan" in line
        for line in phys.splitlines()
    )
    scans = [
        line
        for line in phys.splitlines()
        if "events.parquet" in line and "PushedFilters" in line
    ]
    assert any("error" in line or "190" in line for line in scans), scans


def test_recursive_cte_plans_as_bounded_union_loop(spark):
    """sql_recursive_cte: WITH RECURSIVE plans as UnionLoop with the
    step filter (m < 12) INSIDE the loop body — the recursion is
    calendar-bounded at plan level, not just by data; and the data
    side joins the tiny spine via broadcast."""
    _, _, phys = _plans(spark, "sql_recursive_cte")
    assert "UnionLoop" in phys
    assert "UnionLoopRef" in phys
    assert "< 12" in phys  # the termination predicate travels into the loop
    assert "BroadcastHashJoin" in phys  # 12-row spine side broadcast


def test_pipe_syntax_plans_identically_to_classical_sql(spark):
    """sql_pipe_syntax: the |> dataflow dialect must produce the SAME
    physical operator sequence as the classical-SQL statement of the
    relation — the pipe parser is surface syntax, not a different
    planner."""
    import re

    from nineinfra_spark.engine import register_testdata

    register_testdata(spark, SF)
    _, _, pipe_phys = _plans(spark, "sql_pipe_syntax")
    classical = spark.sql(get("sql_pipe_syntax").oracle)
    cls_phys = classical._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001

    def ops(plan):
        found = re.findall(r"(\w+)\s*(?:\[|\()", plan)
        keep = {
            "HashAggregate", "Exchange", "Sort", "Filter", "FileScan",
            "BroadcastHashJoin", "SortMergeJoin",
        }
        return [f for f in found if f in keep]

    # the pipe text ends with |> ORDER BY (result presentation); the
    # oracle relation is unordered — compare the dataflow modulo Sort
    assert [o for o in ops(pipe_phys) if o != "Sort"] == [
        o for o in ops(cls_phys) if o != "Sort"
    ], f"pipe ops {ops(pipe_phys)} != classical ops {ops(cls_phys)}"
    # both push the ship-date filter to the scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in pipe_phys


def test_scripting_block_executes_eagerly_to_local_result(spark):
    """sql_scripting_block: BEGIN…END blocks EXECUTE when submitted —
    the returned DataFrame is the script's final resultset as a
    LocalTableScan (the stored-procedure semantic: the procedure ran;
    you hold its output, not a deferred plan). Values are still
    differentially verified against the oracle by the driver."""
    _, _, phys = _plans(spark, "sql_scripting_block")
    assert "LocalTableScan" in phys
    # and the output schema is the report's, proving the block ran
    assert "o_orderpriority" in phys and "sum_above" in phys
