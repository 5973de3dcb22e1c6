"""Data-quality constraint checking (DeeQu/dbt-test-style) over the
warehouse tables.

A platform that provisions a metastore + engine (the reference's whole
deliverable, ``internal/controller/kyuubi.go:189-203``) gets asked for
table-quality gates on day one: primary-key uniqueness, referential
integrity, domain/range constraints, null budgets. This module states
each expectation as ONE aggregate over the target table and returns a
verdict table — the shape a CI gate or an orchestration sensor
consumes directly.

Scale design: every check is a single (mostly map-side-combinable)
aggregate or key-keyed anti-join count — no check materializes
violations wholesale (the observed count travels, not the rows). At
100 TB a suite of N checks is N column-pruned scans, each at scan
speed; checks over the same table could share one pass via a combined
agg, which is the optimization `dq_expectations` deliberately leaves
to the reader-visible plan (separate scans keep each check's pushed
filter and pruned schema independently auditable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import t
from nineinfra_spark.plans.registry import query

_STATUS_DOMAIN = ("O", "F", "P")


@query(
    "dq_expectations",
    oracle=f"""
    SELECT 'orders_pk_unique' AS check_name,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
           COUNT(*) = COUNT(DISTINCT o_orderkey) AS passed
    FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST(COUNT(*) AS BIGINT),
           COUNT(*) = 0
    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    UNION ALL
    SELECT 'orders_status_domain',
           CAST(COUNT(*) AS BIGINT),
           COUNT(*) = 0
    FROM orders WHERE o_orderstatus NOT IN {_STATUS_DOMAIN}
    UNION ALL
    SELECT 'orders_custkey_not_null',
           CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT),
           COUNT(*) FILTER (WHERE o_custkey IS NULL) = 0
    FROM orders
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST(COUNT(*) AS BIGINT),
           COUNT(*) = 0
    FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
    UNION ALL
    SELECT 'lineitem_ships_after_order',
           CAST(COUNT(*) AS BIGINT),
           COUNT(*) = 0
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate < o.o_orderdate
    """,
    tags=("dq", "constraints"),
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-expectation quality gate over orders/lineitem: PK
    uniqueness, FK integrity (anti-join count), value domain,
    null budget, numeric range, and a cross-table ordering invariant
    (lines ship on/after their order date). One verdict row per
    check: (check_name, n_violations, passed).

    Each check's plan is the cheapest faithful shape: pushed-filter
    counts for domain/range/null checks (scan speed), a LeftAnti on
    the key for FK integrity, one equi-join for the cross-table
    invariant. Violation COUNTS aggregate map-side; violating ROWS
    are never shipped — at 100 TB the suite costs a handful of
    column-pruned scans and nothing else."""
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")

    def verdict(name: str, n_violations) -> DataFrame:
        return n_violations.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("bigint").alias("n_violations"),
            (F.col("n") == 0).alias("passed"),
        )

    pk = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n")
    )
    fk = (
        lineitem.join(orders.select("o_orderkey"),
                      lineitem["l_orderkey"] == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    domain = (
        orders.filter(~F.col("o_orderstatus").isin(*_STATUS_DOMAIN))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    nulls = orders.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n")
    )
    qty = (
        lineitem.filter((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ship = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .filter(F.col("l_shipdate") < F.col("o_orderdate"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        verdict("orders_pk_unique", pk)
        .unionAll(verdict("lineitem_fk_orders", fk))
        .unionAll(verdict("orders_status_domain", domain))
        .unionAll(verdict("orders_custkey_not_null", nulls))
        .unionAll(verdict("lineitem_qty_range", qty))
        .unionAll(verdict("lineitem_ships_after_order", ship))
    )


@query(
    "dq_volume_freshness",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    vol AS (
        SELECT day, n,
               LAG(n) OVER (ORDER BY day) AS prev_n
        FROM daily
    ),
    vol_rows AS (
        SELECT 'volume_drop' AS check_name,
               strftime(day, '%Y-%m-%d') AS scope,
               CAST(COALESCE(10000 * n // prev_n, -1) AS BIGINT) AS value,
               COALESCE(2 * n >= prev_n, TRUE) AS ok
        FROM vol
    ),
    fresh AS (
        SELECT 'freshness' AS check_name,
               'events' AS scope,
               CAST((epoch_us(TIMESTAMP '2024-01-31 00:00:00')
                     - epoch_us(MAX(ts))) // 3600000000 AS BIGINT) AS value,
               (epoch_us(TIMESTAMP '2024-01-31 00:00:00')
                - epoch_us(MAX(ts))) // 3600000000 <= 48 AS ok
        FROM events
    )
    SELECT * FROM vol_rows UNION ALL SELECT * FROM fresh
    """,
    tags=("dq", "operational", "bounded-nlj", "dimension-only"),
)
def dq_volume_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational data-quality gate — the pipeline-health checks
    `dq_expectations`' CONSTRAINT checks don't cover: (a) day-over-day
    VOLUME: each ingest day is flagged when its row count falls below
    half the previous day's (2·n ≥ prev as cross-multiplied integers —
    the "upstream silently broke" detector), carried with the actual
    ratio in basis points (-1 sentinel on the first day, which has no
    baseline and passes vacuously); (b) FRESHNESS: integer hours
    between the newest event and the reference clock (pinned to
    2024-01-31 — a deployment passes now()), gated at 48 h. One
    verdict row per check, counts and hours only — never data rows.

    Scale posture: one map-side-combined daily rollup (≤|calendar|
    rows) + a calendar-sized lag window + a 1-row freshness
    aggregate — scan-speed at any volume, same contract as
    dq_expectations."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events")
    daily = events.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day")
    vol = daily.select(
        "day", "n", F.lag("n").over(w).alias("prev_n")
    ).select(
        F.lit("volume_drop").alias("check_name"),
        F.date_format("day", "yyyy-MM-dd").alias("scope"),
        F.coalesce(
            F.expr("cast(10000 * n div prev_n as bigint)"), F.lit(-1)
        )
        .cast("bigint")
        .alias("value"),
        F.coalesce(2 * F.col("n") >= F.col("prev_n"), F.lit(True)).alias(
            "ok"
        ),
    )
    hours = F.expr(
        "(unix_micros(timestamp'2024-01-31 00:00:00')"
        " - unix_micros(cast(max(ts) as timestamp))) div 3600000000"
    )
    fresh = events.agg(hours.alias("h")).select(
        F.lit("freshness").alias("check_name"),
        F.lit("events").alias("scope"),
        F.col("h").cast("bigint").alias("value"),
        (F.col("h") <= 48).alias("ok"),
    )
    return vol.unionByName(fresh)
