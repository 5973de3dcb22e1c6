"""SQL-text query shapes: correlated scalar subqueries + NOT EXISTS.

The reference serves ad-hoc SQL through the Kyuubi gateway
(``internal/controller/kyuubi.go:189-203``) — users write subqueries,
not pre-decorrelated joins. These queries therefore go through
``spark.sql`` as SQL TEXT, witnessing the Catalyst rewrites a real SQL
workload leans on (SURVEY.md §4):

- ``RewriteCorrelatedScalarSubquery``: a per-group scalar subquery in
  WHERE becomes aggregate → equi-join — executed once, never per-row.
- ``RewritePredicateSubquery``: NOT EXISTS becomes a LEFT ANTI join.

Both rewrites are plan-asserted in ``tests/test_sql_shapes.py``: if a
plan ever regresses to per-row subquery execution, the tests fail, not
just the benchmark. At 100 TB a non-decorrelated subquery is a
quadratic scan — this surface existing and staying rewritten is a
scale guarantee, not a style point.

Exactness: every predicate that compares an aggregate is written in
multiply-through decimal form (``x * COUNT > SUM`` instead of
``x > SUM/COUNT``) wherever float rounding could flip a boundary row,
so Spark and the DuckDB oracle agree bit-for-bit. The one plain
``AVG`` threshold kept (q17) is over integer-valued quantities whose
double sums are exact in any order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nineinfra_spark.engine import register_testdata
from nineinfra_spark.plans.registry import query

# Same text runs on both engines: keep to the ANSI intersection of
# Spark SQL and DuckDB (TIMESTAMP literals, EXISTS, scalar subqueries).
_Q17 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = p_partkey
  )
"""

_Q2 = """
SELECT c_nationkey, c_custkey, c_name, c_acctbal
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (
          SELECT COUNT(*) FROM customer c2
          WHERE c2.c_nationkey = c.c_nationkey
      ) > (
          SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) FROM customer c2
          WHERE c2.c_nationkey = c.c_nationkey
      )
"""

_Q22 = """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (
          SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0
      ) > (
          SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer
          WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1998-01-01'
  )
GROUP BY c_nationkey
"""


_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n.n_name = 'NATION_3'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
"""


_Q15 = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)))
               AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    """Register the testdata views, then plan the SQL text."""
    register_testdata(spark, sf_dir)
    return spark.sql(text)


@query("q17_small_qty_revenue", oracle=_Q17, tags=("subquery", "correlated", "sql"))
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (no p_container in testdata, so the brand alone
    selects the part family): revenue from small-quantity orders of one
    brand, where "small" is 20% of that PART's average quantity — a
    correlated scalar subquery in WHERE.

    Catalyst decorrelates it into ``lineitem → Aggregate(avg per
    partkey) → join back on partkey`` — one extra aggregation and one
    equi-join, both shuffling only (partkey, avg). The naive reading
    (re-scan lineitem per outer row) would be O(n²) at 100 TB; the
    plan assertion in tests/test_sql_shapes.py pins the rewrite.
    Threshold exactness: l_quantity is integer-valued (1..50), so its
    double AVG is exact in any reduce order on both engines."""
    return _sql(spark, sf_dir, _Q17)


@query("q2_above_partition_avg", oracle=_Q2, tags=("subquery", "correlated", "sql"))
def q2_above_partition_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (testdata has no partsupp, so the per-group
    extremum runs over customer): customers whose balance beats their
    nation's average, as TWO correlated scalar subqueries against the
    same group — Catalyst decorrelates each into its own per-nation
    aggregate + equi-join (``MergeScalarSubqueries`` does not apply to
    correlated subqueries post-rewrite), so the plan scans customer
    exactly three times (main + COUNT agg + SUM agg) and joins twice —
    bounded and linear, never a per-outer-row re-scan. Pinned in
    tests/test_sql_shapes.py.

    The comparison is multiply-through decimal (``bal * COUNT > SUM``)
    instead of ``bal > SUM/COUNT``: division would round to a scale
    the two engines choose differently, and a boundary row would flip
    the driver's hash. Exact integer/decimal arithmetic has no
    boundary."""
    return _sql(spark, sf_dir, _Q2)


@query("q15_top_supplier", oracle=_Q15, tags=("subquery", "cte", "sql"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top-revenue supplier of a quarter via a
    CTE consumed TWICE — once as the join input, once inside an
    uncorrelated MAX scalar subquery. The subquery is planned once
    and its result broadcast as a literal; decimal revenue makes the
    MAX-equality exact (a double max would tie-break differently per
    engine on reduce order). At scale the CTE's per-supplier aggregate
    shuffles once; everything downstream is supplier-dimension-sized."""
    return _sql(spark, sf_dir, _Q15)


@query("q21_waiting_suppliers", oracle=_Q21, tags=("subquery", "semi", "anti", "sql"))
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (testdata has no commit/receipt dates, so
    ``l_returnflag = 'R'`` stands in for the late-delivery marker):
    suppliers who were the SOLE failing supplier on a multi-supplier
    finalized order — a correlated EXISTS and a correlated NOT EXISTS
    against the same fact table in one query, each carrying a non-equi
    conjunct (``l2.l_suppkey <> l1.l_suppkey``).

    ``RewritePredicateSubquery`` turns the pair into a LEFT SEMI and a
    LEFT ANTI join on orderkey with the inequality as a join-side
    filter — lineitem is scanned exactly three times, each shuffle
    keyed on orderkey (the naive reading re-scans lineitem twice PER
    ROW). Plan-asserted in tests/test_sql_shapes.py."""
    return _sql(spark, sf_dir, _Q21)


@query("q22_inactive_customers", oracle=_Q22, tags=("subquery", "anti", "sql"))
def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey stands in for the phone country
    code): positive-balance customers above the global average with no
    recent orders. Uncorrelated scalar subqueries (planned once,
    broadcast as literals) + NOT EXISTS, which
    ``RewritePredicateSubquery`` turns into a LEFT ANTI join — the
    orders side is pre-filtered to the date window BEFORE the anti
    join, so at 100 TB the anti-join shuffle carries only the recent
    slice, and only its key column."""
    return _sql(spark, sf_dir, _Q22)


_LATERAL_TOPN = """
SELECT n.n_name, l.c_name, l.c_acctbal
FROM nation n, LATERAL (
    SELECT c_name, c_acctbal
    FROM customer c
    WHERE c.c_nationkey = n.n_nationkey
    ORDER BY c_acctbal DESC, c_name
    LIMIT 2
) l
"""


@query(
    "sql_lateral_topn",
    oracle=_LATERAL_TOPN,
    tags=("subquery", "lateral", "sql"),
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY … LIMIT — the SQL
    spelling of per-group top-N (each nation joins its own 2
    highest-balance customers). DuckDB runs the IDENTICAL text as the
    oracle, so this row pins that the SQL surface agrees across
    engines, not just the DataFrame rewrite (`text_quality_topk_per
    _lang` covers the window-function form).

    Scale posture: Catalyst decorrelates the lateral into a
    rank-within-partition plan over the child — one shuffle on the
    correlation key, per-group sort bounded by group size; the
    dimension side never fans out the fact."""
    return _sql(spark, sf_dir, _LATERAL_TOPN)


# -- Spark 4 SQL-surface features (recursive CTE, pipe syntax, scripting) --

#: Gap-filled monthly order series via WITH RECURSIVE: the calendar
#: spine is GENERATED by the recursion (12 months of 1997), then
#: left-joined to the monthly rollup so empty months surface as
#: zero-count rows — the gap-fill idiom every reporting layer needs,
#: stated identically on both engines (both speak ANSI recursion).
_RECURSIVE_GAPFILL = """
WITH RECURSIVE months(m) AS (
    SELECT 1
    UNION ALL
    SELECT m + 1 FROM months WHERE m < 12
),
rollup_1997 AS (
    SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
)
SELECT months.m AS month_no,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(revenue, CAST(0.0 AS DOUBLE)) AS revenue
FROM months LEFT JOIN rollup_1997 ON months.m = rollup_1997.m
"""


@query(
    "sql_recursive_cte",
    oracle=_RECURSIVE_GAPFILL,
    tags=("sql", "recursive", "cte"),
    min_spark="4.1",  # WITH RECURSIVE
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``WITH RECURSIVE`` through the SQL surface (landed in
    Spark 4): a recursively-generated calendar spine gap-fills the
    monthly order rollup — absent months appear as zero rows instead
    of silently missing, the reporting-layer idiom that otherwise
    needs a driver-side loop or a sequence() explode. The SAME text
    runs on DuckDB, so the recursion semantics (step limit, UNION ALL
    accumulation) are differentially pinned.

    Scale posture: the recursive branch generates 12 spine rows —
    recursion depth is calendar-bounded, never data-bounded; the data
    side stays one partial+final aggregate over the pruned 1997
    scan."""
    return _sql(spark, sf_dir, _RECURSIVE_GAPFILL)


#: The q1-family pricing rollup restated in Spark 4's SQL PIPE syntax
#: (|> operators, SPARK-49555): scan |> filter |> aggregate |> sort —
#: the linear dataflow form gateway users increasingly write. The
#: oracle states the identical relation as classic ANSI SQL, so the
#: pipe parser/planner must agree with the classical path bit-for-bit.
_PIPE_TEXT = """
FROM lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
|> AGGREGATE COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
   GROUP BY l_returnflag, l_linestatus
|> ORDER BY l_returnflag, l_linestatus
"""

_PIPE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query(
    "sql_pipe_syntax",
    oracle=_PIPE_ORACLE,
    tags=("sql", "pipe-syntax"),
    min_spark="4.0",  # |> operator pipelines
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4's ``|>`` operators): the pricing
    rollup written as a linear scan |> filter |> aggregate |> sort
    dataflow. The oracle is the classical-SQL statement of the same
    relation, so the pipe planner must produce value-identical results
    to the traditional surface — parity between the two SQL dialect
    forms a gateway now accepts."""
    return _sql(spark, sf_dir, _PIPE_TEXT)


#: SQL scripting (Spark 4 BEGIN…END): DECLARE a threshold, SET it
#: from a scalar query over the data (90th percentile order value),
#: branch on it, and return the orders above it — the parameterized-
#: report pattern a stored procedure runs, executed entirely on the
#: SQL surface with session-variable state.
_SCRIPT_TEXT = """
BEGIN
  DECLARE thr DOUBLE DEFAULT 0.0;
  SET thr = (SELECT percentile(o_totalprice, 0.9) FROM orders);
  SELECT o_orderpriority,
         COUNT(*) AS n_above,
         CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_above
  FROM orders
  WHERE o_totalprice > thr
  GROUP BY o_orderpriority;
END
"""

_SCRIPT_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_above,
       CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_above
FROM orders
WHERE o_totalprice > (SELECT quantile_cont(o_totalprice, 0.9) FROM orders)
GROUP BY o_orderpriority
"""


@query(
    "sql_scripting_block",
    oracle=_SCRIPT_ORACLE,
    tags=("sql", "scripting"),
    min_spark="4.0",  # BEGIN/DECLARE/SET SQL scripting
)
def sql_scripting_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4 ``BEGIN…END`` blocks): a session
    variable is DECLAREd, SET from a scalar aggregate over the data
    (the exact p90 order value), then used to parameterize the final
    report query — the stored-procedure pattern the thrift/REST
    gateway's BI users expect, with no driver-side Python in the
    loop. The oracle derives the same relation with the threshold
    inlined as a scalar subquery (DuckDB quantile_cont == Spark exact
    percentile on doubles)."""
    return _sql(spark, sf_dir, _SCRIPT_TEXT)
