"""TPC-H-style relational queries: the engine's headline batch surface.

Covers the spine of SURVEY.md §2 (scan → filter → project → hash-agg →
join → sort/top-k) the way the reference's deployed engine (Spark SQL
behind Kyuubi, ``internal/controller/kyuubi.go:189-203``) would run
them. All money aggregates go through decimal casts so the values are
exact and hash-identical to the DuckDB oracle regardless of
partition-level reduce order (100 TB posture: results must not depend
on parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import dec, spread, t, ts
from nineinfra_spark.plans.registry import query

# Shared revenue expression: l_extendedprice * (1 - l_discount), made
# exact via decimal(22,6) before the sum.
def _revenue() -> F.Column:
    return dec(F.col("l_extendedprice") * (1 - F.col("l_discount")), 22, 6)


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(22,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "scan", "filter"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: filter → hash-agg (partial+final) → sort.

    Single scan, predicate pushed to parquet, map-side combine; at
    100 TB this is shuffle-light (two grouping keys, tiny cardinality).
    """
    li = t(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        spread(li.filter(F.col("l_shipdate") <= ts("1998-09-02")), "l_orderkey")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_revenue()).cast("double").alias("sum_disc_price"),
            F.sum(
                dec(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                    22,
                    6,
                )
            )
            .cast("double")
            .alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(dec("l_discount", 18, 6)).cast("double") / n).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: 3-way join → agg → top-k.

    customer scales with SF, so no forced broadcast — AQE + the
    autoBroadcastJoinThreshold decide at runtime (broadcast while it
    fits, shuffle join beyond). lineitem⋈orders shuffles on orderkey.
    Revenue is decimal-exact so the top-k ordering is engine-stable;
    l_orderkey is the deterministic tie-break.
    """
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < ts("1998-03-15"))
    li = spread(
        t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > ts("1998-03-15")),
        "l_orderkey",
    )
    return (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
    tags=("join", "agg"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join over the full star schema.

    nation/region are fixed-size dims → forced broadcast. customer and
    supplier grow with SF, so their joins are left to AQE + the
    broadcast threshold (hinting them would OOM executors at 100 TB).
    Join order still reduces facts first: orders⋈lineitem is the one
    unavoidable fact-fact shuffle.
    """
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-01-01")) & (F.col("o_orderdate") < ts("1997-01-01"))
    )
    li = spread(t(spark, sf_dir, "lineitem"), "l_orderkey")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(22,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("filter", "agg-global"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast revenue: conjunctive pushed-down predicates + global agg."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= ts("1996-01-01"))
            & (F.col("l_shipdate") < ts("1997-01-01"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec(F.col("l_extendedprice") * F.col("l_discount"), 22, 6))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting: join + agg + deterministic top-20.

    nation is a fixed 25-row dim → broadcast; customer scales with SF
    so its join strategy is AQE's call.
    """
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-01-01")) & (F.col("o_orderdate") < ts("1996-04-01"))
    )
    li = spread(
        t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R"),
        "l_orderkey",
    )
    nat = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("join", "agg", "having", "semi"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers: agg-subquery as a semi-join filter.

    The HAVING subquery becomes a left-semi join on the pre-aggregated
    keys — the reduction happens before the wide join, which is the
    shape that scales (never join-then-filter a 100 TB fact table).
    """
    li = spread(t(spark, sf_dir, "lineitem"), "l_orderkey")
    big_orders = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("s")).filter(F.col("s") > 150)
    orders = t(spark, sf_dir, "orders").join(
        big_orders.select("l_orderkey"),
        F.col("o_orderkey") == big_orders.l_orderkey,
        "left_semi",
    )
    cust = t(spark, sf_dir, "customer")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity >= 45
      )
    GROUP BY o_orderpriority
    """,
    tags=("agg", "join", "subquery"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape; the testdata lineitem
    carries no commit/receipt dates, so the EXISTS predicate is a
    large-line condition instead): EXISTS subquery as a LEFT SEMI
    join — the semi side is pre-filtered, the join deduplicates
    matches itself (no row duplication to undo), then a tiny
    hash-agg. At 100 TB the semi join shuffles only matching
    orderkeys, never lineitem payload columns."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-07-01"))
        & (F.col("o_orderdate") < ts("1996-10-01"))
    )
    big = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_quantity >= 30
    GROUP BY l_linestatus
    """,
    tags=("agg", "join", "case"),
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (the testdata has no l_shipmode, so the group
    key is l_linestatus and the selective predicates are quantity +
    ship-date window): pushed-down lineitem filters, fact⋈fact
    equi-join shuffled on orderkey, conditional-sum CASE aggregation.
    The lineitem side is filtered BEFORE the join — at 100 TB the
    shuffle carries only the qualifying window."""
    li = spread(
        t(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= ts("1996-01-01"))
            & (F.col("l_shipdate") < ts("1997-01-01"))
            & (F.col("l_quantity") >= 30)
        ),
        "l_orderkey",
    )
    orders = t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_effect",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%%'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))
                    ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
    tags=("agg", "join", "global"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): one-month lineitem slice
    joined to part, global conditional-revenue ratio. Decimal sums on
    BOTH branches keep the single-row double division bit-stable. The
    date filter prunes the fact scan; part joins by key (AQE decides
    broadcast vs shuffle as part grows with SF)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1996-03-01"))
        & (F.col("l_shipdate") < ts("1996-04-01"))
    )
    part = t(spark, sf_dir, "part")
    rev = _revenue()
    zero = F.lit(0).cast("decimal(22,6)")
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(zero)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                (F.lit(100.0) * F.sum(promo).cast("double"))
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE)
           AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("agg", "join", "disjunction"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under OR-of-ANDs predicates (TPC-H Q19
    shape). Catalyst splits the disjunction: the parts referencing
    only one table (brand/size, quantity bands) are pushed below the
    join as a derived OR filter on EACH side, so both scans shrink
    before the shuffle — the optimization this query exists to
    witness. Decimal-exact revenue sum, single-row result."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    c3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(c1 | c2 | c3).agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               l_extendedprice, l_discount
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two trading nations by year (TPC-H Q7
    shape): 6-way join with TWO roles for the nation dim (supplier's
    and customer's), symmetric nation-pair predicate, per-year rollup.

    Scale posture: both nation copies broadcast (fixed size) and are
    pre-filtered to the two pair nations — Catalyst cannot derive
    those unilateral IN-filters from the symmetric OR predicate on its
    own (it references both roles), so we state them explicitly. The
    broadcast joins against the 2-row filtered dims then semi-filter
    supplier and customer BEFORE the fact joins, so the
    orders⋈lineitem shuffle carries only the two nations' slice; the
    symmetric pair filter on top only removes the two same-nation
    combinations. Year extraction is a scan-side projection."""
    pair_nations = ("NATION_1", "NATION_2")
    supp = t(spark, sf_dir, "supplier")
    li = spread(
        t(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= ts("1995-01-01"))
            & (F.col("l_shipdate") < ts("1997-01-01"))
        ),
        "l_orderkey",
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    n1 = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair_nations))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair_nations))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    # Inner-joining the pre-filtered 2-row dims restricts supplier and
    # customer to the pair nations; each fact side is then reduced to
    # its two-nation slice BEFORE the orderkey fact-fact shuffle.
    supp2 = supp.join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
    cust2 = cust.join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
    li2 = li.join(supp2, li.l_suppkey == supp2.s_suppkey)
    orders2 = orders.join(cust2, orders.o_custkey == cust2.c_custkey)
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li2.join(orders2, li2.l_orderkey == orders2.o_orderkey)
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _revenue().alias("rev"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev").cast("double").alias("revenue"))
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    tags=("join", "agg", "outer"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): LEFT JOIN
    with the exclusion predicate INSIDE the join condition (customers
    with only excluded orders must still appear with count 0 — a WHERE
    would wrongly drop them), then a double aggregation: per-customer
    count, then histogram of counts.

    Scale posture: the outer join shuffles on custkey; the first agg
    reuses that partitioning (no second exchange); the histogram agg
    shuffles only (count, freq) pairs — tiny. COUNT(o_orderkey) skips
    the NULLs the outer join manufactures."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE) AS nation_volume,
           CAST(SUM(volume) AS DOUBLE) AS total_volume,
           CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(22,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
    tags=("join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): one nation's share of
    a region's PROMO-part order volume by year — an 8-way join with
    nation again in two roles (customer-side restricts the market,
    supplier-side labels the share).

    Exactness: volumes are decimal sums (order-independent); the share
    is computed by DOUBLE division of the two exact decimal sums cast
    to double — identical operands, identical IEEE division on both
    engines, so even the ratio is bit-stable. Scale posture: part is
    filtered before its join (PROMO slice), nation/region broadcast,
    and the market restriction is STATED as a region-pruned customer
    set (semi-join customer → ASIA nations, then keep only c_custkey)
    BEFORE the orders join — at 100× scale the fact join sees 1/5 of
    customers by construction, independent of whether the optimizer
    chooses to reorder the dim joins."""
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = spread(t(spark, sf_dir, "lineitem"), "l_orderkey")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1995-01-01")) & (F.col("o_orderdate") < ts("1997-01-01"))
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = (
        t(spark, sf_dir, "nation")
        .join(F.broadcast(reg), F.col("n_regionkey") == reg.r_regionkey)
        .select("n_nationkey")
    )
    cust_asia = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(asia_nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("c_custkey")
    )
    supp = t(spark, sf_dir, "supplier")
    vol = F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(22,6)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_asia, orders.o_custkey == cust_asia.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _revenue().alias("volume"),
            "nation",
        )
        .groupBy("o_year")
        .agg(
            F.sum(vol).cast("double").alias("nation_volume"),
            F.sum("volume").cast("double").alias("total_volume"),
        )
        .withColumn("mkt_share", F.col("nation_volume") / F.col("total_volume"))
    )


# ---------------------------------------------------------------------------
# Synthetic partsupp: the testdata ships no partsupp table, so the four
# TPC-H shapes that need one (q9/q11/q16/q20) derive it DETERMINISTICALLY
# from part × a 4-element sequence — pure integer arithmetic over
# contiguous 0-based keys, reproduced verbatim by the DuckDB oracle CTE,
# so both engines see the identical relation without any stored state.
#
# Scale posture: the derivation is a scan-side projection + explode over
# the part dim (4 rows out per part, no shuffle to build); at TPC-H scale
# partsupp is exactly 4×|part| rows, same as the real table. The supplier
# count is one cheap job over the supplier dim (SF×10k rows) — on a real
# warehouse deployment that's a catalog-stats lookup, not a scan.
# ---------------------------------------------------------------------------

#: |supplier| per sf_dir — a property of the DATA, not the session, so
#: one count job per directory per process is enough (at warehouse
#: scale this is a catalog-stats lookup; here it keeps repeated plan
#: builds — bench iterations, the multi-query driver pass — from
#: re-running the job).
_SUPPLIER_COUNT_CACHE: dict[str, int] = {}


def _supplier_count(spark: SparkSession, sf_dir: str) -> int:
    if sf_dir not in _SUPPLIER_COUNT_CACHE:
        _SUPPLIER_COUNT_CACHE[sf_dir] = t(spark, sf_dir, "supplier").count()
    return _SUPPLIER_COUNT_CACHE[sf_dir]


#: Oracle-side mirror of ``_partsupp``. Must stay arithmetically
#: identical to the Spark derivation below — the correctness gate diffs
#: query results built on both.
_PARTSUPP_CTE = """
WITH partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           CAST((ps_partkey * 37 + ps_suppkey * 11) % 9999 + 1 AS BIGINT)
               AS ps_availqty,
           CAST(CAST((ps_partkey * 181 + ps_suppkey * 59) % 99900 + 100
                     AS DECIMAL(14,2)) * CAST(0.01 AS DECIMAL(3,2))
                AS DECIMAL(12,2)) AS ps_supplycost
    FROM (
        SELECT p_partkey AS ps_partkey,
               (p_partkey * 7 + i * 13) % (SELECT COUNT(*) FROM supplier)
                   AS ps_suppkey
        FROM part
        CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) gen
    ) base
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic ``partsupp``: 4 suppliers per part.

    ``ps_suppkey = (p_partkey*7 + i*13) mod |supplier|`` (i ∈ 0..3 —
    the four offsets are distinct mod |supplier| at every testdata SF,
    so each part gets 4 distinct suppliers, mirroring TPC-H);
    ``ps_availqty`` / ``ps_supplycost`` are integer hashes of the key
    pair, the cost built as exact DECIMAL(12,2) (cents × 0.01 in
    decimal arithmetic — never a float literal, so Spark and DuckDB
    agree bit-for-bit)."""
    n_supp = _supplier_count(spark, sf_dir)
    cents = F.pmod(F.col("ps_partkey") * 181 + F.col("ps_suppkey") * 59, F.lit(99900)) + 100
    return (
        t(spark, sf_dir, "part")
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"),
        )
        .select(
            "ps_partkey",
            F.pmod(F.col("ps_partkey") * 7 + F.col("i") * 13, F.lit(n_supp)).alias(
                "ps_suppkey"
            ),
        )
        .select(
            "ps_partkey",
            "ps_suppkey",
            (
                F.pmod(F.col("ps_partkey") * 37 + F.col("ps_suppkey") * 11, F.lit(9999))
                + 1
            ).alias("ps_availqty"),
            (cents.cast("decimal(14,2)") * F.expr("CAST(0.01 AS DECIMAL(3,2))"))
            .cast("decimal(12,2)")
            .alias("ps_supplycost"),
        )
    )


@query(
    "q9_product_type_profit",
    oracle=_PARTSUPP_CTE
    + """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))
                   - ps_supplycost * CAST(l_quantity AS DECIMAL(18,2)) AS amount
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    tags=("join", "agg"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit by nation and year (TPC-H Q9 shape): the
    widest join in the suite — lineitem against part, partsupp,
    supplier, orders, nation — with profit = revenue − supply cost.

    Scale posture: the part-name filter lands on part BEFORE any fact
    join and the (partkey, suppkey) partsupp join keeps the derived
    relation bucketed by the same key the fact side shuffles on;
    nation broadcasts. All money math is exact decimal, so the sum is
    reduce-order-independent (100 TB: result must not depend on
    parallelism). Cites the reference's full-SQL surface
    (``internal/controller/kyuubi.go:189-203``)."""
    li = spread(t(spark, sf_dir, "lineitem"), "l_orderkey")
    part_f = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    ps = _partsupp(spark, sf_dir)
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = t(spark, sf_dir, "nation")
    amount = _revenue() - F.col("ps_supplycost") * dec("l_quantity", 18, 2)
    return (
        li.join(part_f, li.l_partkey == part_f.p_partkey)
        .join(ps, (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@query(
    "q11_important_stock",
    oracle=_PARTSUPP_CTE
    + """
    , in_nation AS (
        SELECT ps_partkey,
               ps_supplycost * CAST(ps_availqty AS DECIMAL(18,0)) AS val
        FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
    ),
    grouped AS (
        SELECT ps_partkey, SUM(val) AS value_dec
        FROM in_nation GROUP BY ps_partkey
    )
    SELECT ps_partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM grouped
    WHERE value_dec > (
        SELECT SUM(value_dec) * CAST(0.004 AS DECIMAL(6,4)) FROM grouped
    )
    """,
    tags=("join", "agg", "bounded-nlj"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape): per-part
    inventory value for one nation's suppliers, kept only where the
    part's value exceeds a fraction of the nation-wide total —
    HAVING over an uncorrelated scalar aggregate.

    Scale posture: the nation filter reduces supplier to one nation
    before touching partsupp; the grand total is a 1-row aggregate
    broadcast back over the grouped values (tagged bounded-nlj — the
    broadcast side is exactly one row by construction). The threshold
    comparison is decimal-vs-decimal, so the boundary row can't flip
    between engines."""
    ps = _partsupp(spark, sf_dir)
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (F.col("ps_supplycost") * F.col("ps_availqty").cast("decimal(18,0)")).alias(
        "val"
    )
    grouped = (
        ps.join(supp, ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("ps_partkey", val)
        .groupBy("ps_partkey")
        .agg(F.sum("val").alias("value_dec"))
    )
    total = grouped.agg(
        (F.sum("value_dec") * F.expr("CAST(0.004 AS DECIMAL(6,4))")).alias("threshold")
    )
    return (
        grouped.crossJoin(F.broadcast(total))  # 1-row total: bounded
        .filter(F.col("value_dec") > F.col("threshold"))
        .select("ps_partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@query(
    "q16_supplier_cnt",
    oracle=_PARTSUPP_CTE
    + """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#4'
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 7, 10, 14, 19, 23, 45)
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("join", "agg"),
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape): supplier count
    per (brand, type, size) bucket, excluding a blacklist of suppliers
    via NOT IN subquery. The reference's p_comment/s_comment columns
    don't exist in the testdata, so the blacklist predicate is adapted
    to ``s_acctbal < 0`` (same NOT-IN-over-subquery shape).

    Scale posture: all part predicates push to the part scan; the
    blacklist is a LEFT ANTI join against a tiny filtered supplier
    projection (s_suppkey is never null, so anti-join ≡ NOT IN here);
    COUNT(DISTINCT) shuffles once on the grouping key with the
    distinct handled by a partial expand — no driver-side set."""
    ps = _partsupp(spark, sf_dir)
    part_f = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 4, 7, 10, 14, 19, 23, 45)
    )
    blacklist = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(part_f, ps.ps_partkey == part_f.p_partkey)
        .join(blacklist, ps.ps_suppkey == blacklist.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_potential_promotion",
    oracle=_PARTSUPP_CTE
    + """
    , shipped AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_13'
      AND s_suppkey IN (
          SELECT ps_suppkey
          FROM partsupp
          JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'small%'
          JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          WHERE CAST(ps_availqty AS DECIMAL(18,2))
                    > CAST(0.5 AS DECIMAL(2,1)) * qty
      )
    """,
    tags=("join", "agg", "semi"),
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape): suppliers in one
    nation whose stock of name-matched parts exceeds half of what they
    shipped in 1995 — a nested IN over a join against a pre-aggregated
    fact slice.

    Scale posture: the correlated half-quantity threshold is
    decorrelated by hand into a (partkey, suppkey) aggregate of the
    date-sliced lineitem, then equi-joined — never a per-row subquery;
    the final membership test is a LEFT SEMI join on suppkey. The
    availqty-vs-half-shipped comparison is decimal-exact on both
    engines."""
    ps = _partsupp(spark, sf_dir)
    part_f = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        spread(
            t(spark, sf_dir, "lineitem").filter(
                (F.col("l_shipdate") >= ts("1995-01-01"))
                & (F.col("l_shipdate") < ts("1996-01-01"))
            ),
            "l_partkey",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
    )
    qualifying = (
        ps.join(part_f, ps.ps_partkey == part_f.p_partkey)
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(
            F.col("ps_availqty").cast("decimal(18,2)")
            > F.expr("CAST(0.5 AS DECIMAL(2,1))") * F.col("qty")
        )
        .select("ps_suppkey")
    )
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_13")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(qualifying, supp.s_suppkey == qualifying.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "q2_min_cost_supplier",
    oracle=_PARTSUPP_CTE
    + """
    SELECT s_acctbal, s_name, n_name, p_partkey,
           CAST(ps_supplycost AS DOUBLE) AS supplycost
    FROM partsupp ps
    JOIN part     ON p_partkey = ps.ps_partkey
    JOIN supplier ON s_suppkey = ps.ps_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
      AND p_size BETWEEN 10 AND 20
      AND p_type = 'PROMO'
      AND ps_supplycost = (
          SELECT MIN(ps2.ps_supplycost)
          FROM partsupp ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
          JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
          WHERE ps2.ps_partkey = ps.ps_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "agg", "subquery", "topk"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (the REAL TPC-H Q2 shape, now expressible
    over the synthetic partsupp — the earlier `q2_above_partition_avg`
    kept the correlated-scalar-subquery SHAPE over customer when no
    partsupp existed): for each region-eligible part, the suppliers
    offering exactly the region-wide minimum supply cost.

    The correlated MIN is decorrelated by hand into a per-part
    aggregate of the region-filtered partsupp, joined back on
    (partkey, cost) — cost is exact DECIMAL(12,2), so the equality
    join can't miss the boundary row. The oracle keeps the correlated
    form, witnessing that both formulations agree.

    Scale posture: nation/region broadcast; the region filter reduces
    supplier before it meets partsupp; the min-cost aggregate reuses
    the (partkey)-keyed shuffle of its own input; the final ORDER BY
    ... LIMIT is a TakeOrderedAndProject with a fully deterministic
    tie-break (acctbal DESC, nation, name, partkey)."""
    ps = _partsupp(spark, sf_dir)
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp_eu = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eligible = ps.join(supp_eu, ps.ps_suppkey == supp_eu.s_suppkey)
    min_cost = eligible.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    part_f = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "PROMO"))
        .select("p_partkey")
    )
    return (
        eligible.join(
            min_cost,
            (eligible.ps_partkey == min_cost.mc_partkey)
            & (eligible.ps_supplycost == min_cost.min_cost),
        )
        .join(part_f, eligible.ps_partkey == part_f.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )
