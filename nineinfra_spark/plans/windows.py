"""Window functions (SURVEY.md §2.5): ranking, analytic, windowed
aggregates, frame specs.

Every ORDER BY inside a window includes a unique tie-break column so
row_number/lag/lead are deterministic under any partitioning — a
correctness requirement, not a style choice, once data is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import dec, t
from nineinfra_spark.plans.registry import query


@query(
    "window_ranking",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           row_number()  OVER w AS rn,
           rank()        OVER w AS rnk,
           dense_rank()  OVER w AS drnk,
           ntile(4)      OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    QUALIFY rn <= 25
    """,
    tags=("window", "rank"),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25-per-group via ranking window (the scalable 'top-k per key':
    one shuffle on the partition key, no global sort)."""
    cust = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .filter(F.col("rn") <= 25)
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(value AS DOUBLE) AS value,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           date_diff('microsecond', lag(ts) OVER w, ts) AS micros_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "analytic"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + inter-event gap — the sessionization building block."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            F.lag("ts").over(w).alias("_prev_ts"),
        )
        .withColumn(
            "micros_since_prev", F.expr("timestampdiff(MICROSECOND, _prev_ts, ts)")
        )
        .drop("_prev_ts")
    )


@query(
    "window_running_agg",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate with an explicit ROWS frame."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("order_seq"),
    )


@query(
    "window_moving_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_last3,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg_last3
    FROM orders
    """,
    tags=("window", "frame"),
)
def window_moving_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS frame (moving sum/avg over the last 3 orders)."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    s = F.sum(dec("o_totalprice")).over(w).cast("double")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        s.alias("sum_last3"),
        (s / F.count(F.lit(1)).over(w)).alias("avg_last3"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT s_suppkey,
           CAST(s_acctbal AS DOUBLE) AS s_acctbal,
           COUNT(*) OVER (
               ORDER BY s_acctbal
               RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS n_within_500
    FROM supplier
    """,
    tags=("window", "frame", "range", "dimension-only"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame keyed on a numeric ordering (value-based peers).

    DIMENSION-ONLY by design: an unpartitioned ORDER BY window funnels
    the table through one task, which is fine for a 100-per-SF-unit
    supplier dimension and wrong for a fact table. The fact-scale
    equivalent of "count within ±500" is a two-pass bucketed plan:
    bucket = floor(value/500), count per bucket (hash agg), then each
    row sums its own ±1 neighbor buckets — O(n) with a uniform
    shuffle key, no global window."""
    supp = t(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal").rangeBetween(-500, 500)
    return supp.select(
        "s_suppkey",
        "s_acctbal",
        F.count(F.lit(1)).over(w).alias("n_within_500"),
    )


@query(
    "window_range_frame_bucketed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_extendedprice / 500.0) AS BIGINT) AS price_bucket,
           COUNT(*) OVER (
               ORDER BY CAST(FLOOR(l_extendedprice / 500.0) AS BIGINT)
               RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS n_within_band
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL
    """,
    tags=("window", "frame", "range", "fact-scale"),
)
def window_range_frame_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-scale RANGE-frame: per-row count of rows within ±1 price
    bucket (bucket = floor(price/500)) over LINEITEM — the plan the
    `window_range_frame` docstring promises instead of documenting.

    NO window executes on the fact table: the plan is
      (1) hash-agg fact rows by bucket (map-side partial combine —
          one fact shuffle bounded by |buckets| keys),
      (2) bucket-level neighbor spread: each bucket's count is
          exploded to itself ±1 and re-summed (dimension-sized —
          ~price_range/500 rows),
      (3) broadcast-join the per-bucket band counts back to the fact.
    The oracle states the SAME semantics declaratively as a DuckDB
    RANGE window over the bucket id (1 PRECEDING..1 FOLLOWING peers).
    At 100 TB the fact never funnels into a single-partition
    WindowExec (plan-asserted in tests/test_plan_lint.py); floor of
    an IEEE divide of identical doubles is bit-stable cross-engine.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice").isNotNull())
    bucketed = li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("cast(floor(l_extendedprice / 500.0) as bigint)").alias(
            "price_bucket"
        ),
    )
    counts = bucketed.groupBy("price_bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    b = F.col("price_bucket")
    band = (
        counts.select(
            F.explode(F.array(b - 1, b, b + 1)).alias("price_bucket"), "n"
        )
        .groupBy("price_bucket")
        .agg(F.sum("n").alias("n_within_band"))
    )
    return bucketed.join(F.broadcast(band), "price_bucket").select(
        "l_orderkey", "l_linenumber", "price_bucket", "n_within_band"
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderdate) OVER w AS first_order_date,
           last_value(o_orderdate)  OVER w AS last_order_date,
           nth_value(o_orderdate, 2) OVER w AS second_order_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "analytic"),
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth over a full-partition frame."""
    orders = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.last("o_orderdate").over(w).alias("last_order_date"),
        F.nth_value("o_orderdate", 2).over(w).alias("second_order_date"),
    )


@query(
    "events_sessionize",
    oracle="""
    WITH l AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM l
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events, MIN(ts) AS t_start, MAX(ts) AS t_end
    FROM s GROUP BY user_id, session_idx
    """,
    tags=("window", "sessionize", "gaps-islands"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts
    after a >30 min silence; session id is the running count of
    session starts per user. The batch twin of the streaming
    ``stream_session_window`` — ONE shuffle on user_id serves both
    window passes and the final per-session aggregate, so at 100 TB
    this costs the same as any keyed window. Gap comparison uses
    whole-second truncation on BOTH engines (Spark date_trunc +
    timestampdiff == DuckDB date_diff('second'), which counts second
    BOUNDARIES), so boundary events classify identically and no
    timezone enters the arithmetic (ts stays ntz throughout);
    (ts, event_id) ordering pins ties."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.date_trunc("second", "ts").alias("_sec")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("_sec").over(w)
    sess = (
        ev.withColumn("_prev", prev)
        .withColumn(
            "new_s",
            F.when(
                F.col("_prev").isNull()
                | (F.expr("timestampdiff(SECOND, _prev, _sec)") > 1800),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_idx",
            F.sum("new_s").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
    )


@query(
    "events_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_stage_view,
           (SELECT COUNT(*) FROM c) AS n_stage_click,
           (SELECT COUNT(*) FROM p) AS n_stage_purchase
    """,
    tags=("window", "funnel", "bounded-nlj"),  # 1-row x 1-row count joins
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view → click → purchase): a user
    advances a stage only with an event strictly AFTER their previous
    stage's first event. Each stage is one filter + groupBy(user_id)
    + semi-filtering join — all shuffles keyed on user_id, so AQE can
    reuse the partitioning; the final stage counts are three 1-row
    frames cross-joined (hence bounded-nlj). The product-analytics
    primitive behind conversion reporting at any scale. The
    depth-independent ONE-shuffle rewrite (per-user stage arrays
    resolved by array expressions) is ``events_funnel_conversion``
    below — prefer it for deep funnels; this per-stage form is the
    shape ad-hoc SQL users write."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_stage_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_stage_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_stage_purchase")))
    )


@query(
    "scd2_intervals",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT user_id, event_type, ts,
               SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS version
        FROM o
    ),
    hist AS (
        SELECT user_id, version, event_type,
               MIN(ts) AS valid_from, COUNT(*) AS n_events
        FROM runs GROUP BY user_id, version, event_type
    )
    SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
           valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY version)
               IS NULL AS is_current,
           CAST(n_events AS BIGINT) AS n_events
    FROM hist
    """,
    tags=("window", "scd2", "gaps-islands"),
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension history: collapse each user's event stream
    into validity intervals — consecutive runs of the same event_type
    become one versioned row with [valid_from, valid_to) and an
    is_current flag on the open interval. This is the
    change-data-capture → warehouse-dimension build every platform
    runs to track attribute history (the reference reserves exactly
    this ELT role to its provisioned engine,
    ``internal/controller/kyuubi.go:189-203``).

    Shape: gaps-and-islands (lag → run counter → per-run agg → lead
    for the closing bound). All three window passes and the aggregate
    are keyed on user_id, so the whole query costs ONE shuffle; ties
    are pinned by (ts, event_id). At 100 TB this parallelizes per
    user like any keyed window — no global ordering exists anywhere."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn(
            "version",
            F.sum(
                F.when(
                    F.col("prev_type").isNull()
                    | (F.col("prev_type") != F.col("event_type")),
                    1,
                ).otherwise(0)
            ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    hist = runs.groupBy("user_id", "version", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_v = Window.partitionBy("user_id").orderBy("version")
    valid_to = F.lead("valid_from").over(w_v)
    return hist.select(
        "user_id",
        F.col("version").cast("bigint").alias("version"),
        "event_type",
        "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"),
        F.col("n_events").cast("bigint").alias("n_events"),
    )


# -- retention cohorts -----------------------------------------------------

COHORT_EPOCH = "2024-01-01"  # week 0 anchor (testdata spans Jan 2024)


@query(
    "events_retention_cohorts",
    oracle=f"""
    WITH wk AS (
        SELECT user_id,
               datediff('day', DATE '{COHORT_EPOCH}', CAST(ts AS DATE)) // 7
                   AS act_week
        FROM events
    ),
    first_seen AS (
        SELECT user_id, MIN(act_week) AS cohort_week FROM wk GROUP BY user_id
    ),
    cohort_sz AS (
        SELECT cohort_week, COUNT(*) AS cohort_size
        FROM first_seen GROUP BY cohort_week
    ),
    activity AS (SELECT DISTINCT user_id, act_week FROM wk),
    ret AS (
        SELECT f.cohort_week, a.act_week - f.cohort_week AS offset_weeks,
               COUNT(*) AS n_active
        FROM first_seen f JOIN activity a ON a.user_id = f.user_id
        GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.offset_weeks, r.n_active, c.cohort_size,
           CAST(10000 * r.n_active // c.cohort_size AS BIGINT)
               AS retention_bps
    FROM ret r JOIN cohort_sz c ON c.cohort_week = r.cohort_week
    """,
    tags=("window", "analytics", "cohort"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort table: users are cohorted by first-seen week;
    for each (cohort, week-offset) cell, how many cohort members were
    active — the standard product-analytics retention triangle, with
    the rate carried as integer basis points (floor division, so no
    float boundary can flip engines).

    Scale posture: ONE exchange on user_id builds a per-user row
    (cohort week + distinct-active-week set — bounded by the calendar,
    ≤5 elements here), materialized once and fanned out to both the
    cohort-size and the retention rollups, which are dimension-sized
    (cohorts × offsets). The naive first-seen ⋈ distinct-activity
    formulation shuffles three times on wider keys; this one never
    shuffles event rows again after the per-user fold. Power-law
    users are bounded by the per-week dedup inside collect_set."""
    events = t(spark, sf_dir, "events")
    # F.floor (not /7 then cast) so timestamps BEFORE the epoch floor
    # to week -1 exactly like the oracle's // — bigint-cast truncation
    # would round toward zero and land them in week 0.
    wk = events.select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit(COHORT_EPOCH).cast("date"))
            / 7
        )
        .cast("bigint")
        .alias("act_week"),
    )
    per_user = wk.groupBy("user_id").agg(
        F.min("act_week").alias("cohort_week"),
        F.collect_set("act_week").alias("weeks"),
    )
    # two consumers (cohort size + retention cells): materialize once
    per_user = per_user.localCheckpoint(eager=False)
    cohort_sz = per_user.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    ret = (
        per_user.select(
            "cohort_week", F.explode("weeks").alias("act_week")
        )
        .groupBy(
            "cohort_week",
            (F.col("act_week") - F.col("cohort_week")).alias("offset_weeks"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return ret.join(cohort_sz, "cohort_week").select(
        "cohort_week",
        "offset_weeks",
        "n_active",
        "cohort_size",
        F.expr("cast(10000 * n_active div cohort_size as bigint)").alias(
            "retention_bps"
        ),
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n_transitions
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
    tags=("window", "analytics", "markov"),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix (the Markov/sankey table): for
    each user's time-ordered event sequence, count every consecutive
    (from_type → to_type) pair — the path-analysis primitive product
    analytics builds funnels and journey maps from. (event_id breaks
    ts ties deterministically.)

    Scale posture: one window shuffle keyed on user_id (bounded by
    the per-user event count), then a dimension-sized
    (|types|² ≤ tiny) rollup — the same single-corpus-shuffle bound
    as sessionization."""
    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "window_distribution_ranks",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           ntile(3) OVER w AS tercile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    """,
    tags=("window", "ranking"),
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position window functions: percent_rank
    ((rank-1)/(n-1)), cume_dist (rows ≤ current / n), ntile — the
    relative-standing trio the ranking query doesn't cover. Both
    ratios are integer÷integer in double (exact IEEE, identical on
    both engines); the ORDER BY carries s_suppkey so equal balances
    can't reorder ties.

    Scale: one shuffle on the partition key, same as every window."""
    supp = t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return supp.select(
        "s_suppkey",
        "s_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(3).over(w).alias("tercile"),
    )


@query(
    "events_rolling_active_users",
    oracle="""
    WITH days AS (
        SELECT CAST(unnest(generate_series(DATE '2024-01-01',
                                           DATE '2024-01-30',
                                           INTERVAL 1 DAY)) AS DATE) AS d
    ),
    ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    contrib AS (
        SELECT DISTINCT user_id,
               CAST(unnest(generate_series(day,
                                           day + INTERVAL 6 DAY,
                                           INTERVAL 1 DAY)) AS DATE) AS w_day
        FROM ud
    )
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           CAST(COALESCE(COUNT(contrib.user_id), 0) AS BIGINT)
               AS rolling_7d_users
    FROM days LEFT JOIN contrib ON contrib.w_day = days.d
    GROUP BY days.d
    """,
    tags=("window", "analytics", "rolling-distinct"),
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling DISTINCT active users per calendar day, with
    calendar gap-fill — the retention dashboard's headline metric.
    Sliding COUNT(DISTINCT) is NOT expressible as a Spark window
    function (distinct aggregates are barred from frames), so the
    scalable rewrite is contribution-explode: each (user, active-day)
    pair contributes to the 7 window-days it falls inside, dedup
    (user, window_day), count per day. The calendar spine
    (sequence of days) left-joins so inactive days report 0 instead
    of vanishing.

    Scale posture: the corpus folds to |users×days| once (DISTINCT on
    a uniform pair key), the explode multiplies that dimension-sized
    frame by 7, and the final count groups on day — every shuffle is
    keyed on (user, day)-class keys, none on raw events after the
    first dedup. The day spine is a 30-row broadcast."""
    events = t(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    contrib = (
        ud.select(
            "user_id",
            F.explode(
                F.expr("sequence(day, date_add(day, 6), interval 1 day)")
            ).alias("w_day"),
        )
        .distinct()
    )
    days = spark.sql(
        "SELECT explode(sequence(date'2024-01-01', date'2024-01-30',"
        " interval 1 day)) AS d"
    )
    return (
        days.join(contrib, contrib.w_day == days.d, "left")
        .groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.coalesce(F.count("user_id"), F.lit(0))
            .cast("bigint")
            .alias("rolling_7d_users")
        )
    )


# -- funnel analysis --------------------------------------------------------

#: Ordered funnel stages over the behavioral event stream.
FUNNEL_STAGES = ("view", "click", "purchase")


@query(
    "events_funnel_conversion",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    ),
    n AS (
        SELECT (SELECT COUNT(*) FROM s1) AS n1,
               (SELECT COUNT(*) FROM s2) AS n2,
               (SELECT COUNT(*) FROM s3) AS n3
    )
    SELECT 1 AS stage_idx, 'view' AS stage, n1 AS n_users,
           CAST(10000 AS BIGINT) AS conv_prev_bps,
           CAST(10000 AS BIGINT) AS conv_top_bps
    FROM n
    UNION ALL
    SELECT 2, 'click', n2,
           CASE WHEN n1 = 0 THEN NULL ELSE 10000 * n2 // n1 END,
           CASE WHEN n1 = 0 THEN NULL ELSE 10000 * n2 // n1 END FROM n
    UNION ALL
    SELECT 3, 'purchase', n3,
           CASE WHEN n2 = 0 THEN NULL ELSE 10000 * n3 // n2 END,
           CASE WHEN n1 = 0 THEN NULL ELSE 10000 * n3 // n1 END FROM n
    """,
    tags=("window", "analytics", "funnel"),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): a user converts at
    stage k+1 only with an event STRICTLY AFTER their stage-k
    conversion time — the product-analytics funnel with ordering
    semantics, not mere set membership. Rates in integer basis points
    (floor division) so no float boundary can flip engines.

    Scale posture: the per-stage formulation (``events_funnel``
    above, and this oracle's shape) is one corpus join + groupBy PER
    STAGE — 3 shuffles over events here, k for a k-stage funnel. This
    plan folds events ONCE per user into three
    per-stage timestamp arrays (bounded by per-user event counts, the
    same bound sessionization carries) and resolves the whole cascade
    with array expressions: t1 = min(views), t2 = min(clicks > t1),
    t3 = min(purchases > t2) — ONE shuffle total regardless of funnel
    depth, then a 1-row global fold fanned back out to stage rows."""
    events = t(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("ts"))).alias(
            "t1"
        ),
        F.collect_list(
            F.when(F.col("event_type") == FUNNEL_STAGES[1], F.col("ts"))
        ).alias("clicks"),
        F.collect_list(
            F.when(F.col("event_type") == FUNNEL_STAGES[2], F.col("ts"))
        ).alias("purchases"),
    )
    # t2 must exist as a column before t3 can filter on it: chain two
    # projections, carrying the purchase array through the first.
    cascade = (
        per_user.select(
            "t1",
            F.array_min(F.expr("filter(clicks, x -> x > t1)")).alias("t2"),
            "purchases",
        )
        .select(
            "t1",
            "t2",
            F.array_min(F.expr("filter(purchases, x -> x > t2)")).alias("t3"),
        )
    )
    totals = cascade.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    return totals.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("stage_idx"),
                    F.lit(FUNNEL_STAGES[0]).alias("stage"),
                    F.col("n1").alias("n_users"),
                    F.lit(10000).cast("bigint").alias("conv_prev_bps"),
                    F.lit(10000).cast("bigint").alias("conv_top_bps"),
                ),
                F.struct(
                    F.lit(2).alias("stage_idx"),
                    F.lit(FUNNEL_STAGES[1]).alias("stage"),
                    F.col("n2").alias("n_users"),
                    # n1 = 0 (EMPTY events table: the global agg still
                    # yields ONE row of zero counts) would raise ANSI
                    # DIVIDE_BY_ZERO — an empty funnel has NULL rates,
                    # not a crashed job (r10 division sweep finding)
                    F.expr(
                        "case when n1 = 0 then cast(null as bigint)"
                        " else cast(10000 * n2 div n1 as bigint) end"
                    ).alias("conv_prev_bps"),
                    F.expr(
                        "case when n1 = 0 then cast(null as bigint)"
                        " else cast(10000 * n2 div n1 as bigint) end"
                    ).alias("conv_top_bps"),
                ),
                F.struct(
                    F.lit(3).alias("stage_idx"),
                    F.lit(FUNNEL_STAGES[2]).alias("stage"),
                    F.col("n3").alias("n_users"),
                    F.expr(
                        "case when n2 = 0 then cast(null as bigint)"
                        " else cast(10000 * n3 div n2 as bigint) end"
                    ).alias("conv_prev_bps"),
                    F.expr(
                        "case when n1 = 0 then cast(null as bigint)"
                        " else cast(10000 * n3 div n1 as bigint) end"
                    ).alias("conv_top_bps"),
                ),
            )
        ).alias("s")
    ).select("s.*")


#: conversion deadline for the windowed funnel: a stage-k+1 event
#: counts only within this many hours AFTER the stage-k conversion —
#: the attribution-window semantics every real product funnel carries
FUNNEL_WINDOW_HOURS = 72


@query(
    "events_funnel_windowed",
    oracle=f"""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s2.t2 + INTERVAL {FUNNEL_WINDOW_HOURS} HOUR
        GROUP BY e.user_id
    ),
    n AS (
        SELECT (SELECT COUNT(*) FROM s1) AS n1,
               (SELECT COUNT(*) FROM s2) AS n2,
               (SELECT COUNT(*) FROM s3) AS n3
    )
    SELECT 1 AS stage_idx, 'view' AS stage, n1 AS n_users,
           CAST(10000 AS BIGINT) AS conv_prev_bps
    FROM n
    UNION ALL
    SELECT 2, 'click', n2,
           CASE WHEN n1 = 0 THEN NULL ELSE 10000 * n2 // n1 END FROM n
    UNION ALL
    SELECT 3, 'purchase', n3,
           CASE WHEN n2 = 0 THEN NULL ELSE 10000 * n3 // n2 END FROM n
    """,
    tags=("window", "analytics", "funnel"),
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with a CONVERSION DEADLINE: stage k+1 counts only
    when its event lands strictly after the stage-k conversion AND
    within ``FUNNEL_WINDOW_HOURS`` of it — the attribution-window
    variant of ``events_funnel_conversion`` (a purchase six months
    after the click is organic, not funnel conversion; every real
    product funnel carries this deadline).

    Same one-shuffle shape as the unwindowed twin: fold events ONCE
    per user into per-stage timestamp arrays, then resolve the whole
    cascade in-row with array expressions — the deadline adds only a
    second predicate inside each ``filter`` lambda (timestamp
    comparisons in exact integer micros on both engines), not a
    shuffle. Empty-input guard from day one: a 0-user prior stage
    yields NULL conversion, never DIVIDE_BY_ZERO."""
    events = t(spark, sf_dir, "events")
    hours = FUNNEL_WINDOW_HOURS
    per_user = events.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("ts"))
        ).alias("t1"),
        F.collect_list(
            F.when(F.col("event_type") == FUNNEL_STAGES[1], F.col("ts"))
        ).alias("clicks"),
        F.collect_list(
            F.when(F.col("event_type") == FUNNEL_STAGES[2], F.col("ts"))
        ).alias("purchases"),
    )
    cascade = per_user.select(
        "t1",
        F.array_min(
            F.expr(
                f"filter(clicks, x -> x > t1"
                f" AND x <= t1 + INTERVAL '{hours}' HOUR)"
            )
        ).alias("t2"),
        "purchases",
    ).select(
        "t1",
        "t2",
        F.array_min(
            F.expr(
                f"filter(purchases, x -> x > t2"
                f" AND x <= t2 + INTERVAL '{hours}' HOUR)"
            )
        ).alias("t3"),
    )
    totals = cascade.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    return totals.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("stage_idx"),
                    F.lit(FUNNEL_STAGES[0]).alias("stage"),
                    F.col("n1").alias("n_users"),
                    F.lit(10000).cast("bigint").alias("conv_prev_bps"),
                ),
                F.struct(
                    F.lit(2).alias("stage_idx"),
                    F.lit(FUNNEL_STAGES[1]).alias("stage"),
                    F.col("n2").alias("n_users"),
                    F.expr(
                        "case when n1 = 0 then cast(null as bigint)"
                        " else cast(10000 * n2 div n1 as bigint) end"
                    ).alias("conv_prev_bps"),
                ),
                F.struct(
                    F.lit(3).alias("stage_idx"),
                    F.lit(FUNNEL_STAGES[2]).alias("stage"),
                    F.col("n3").alias("n_users"),
                    F.expr(
                        "case when n2 = 0 then cast(null as bigint)"
                        " else cast(10000 * n3 div n2 as bigint) end"
                    ).alias("conv_prev_bps"),
                ),
            )
        ).alias("s")
    ).select("s.*")


@query(
    "events_attribution_lastclick",
    oracle="""
    WITH attr AS (
        SELECT event_type, value,
               LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS channel
        FROM events
    )
    SELECT channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM attr WHERE event_type = 'purchase'
    GROUP BY channel
    """,
    tags=("window", "analytics", "attribution"),
)
def events_attribution_lastclick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution: every purchase is credited to the most
    recent preceding marketing touch (view or click) by the same user
    — NULL channel = organic purchase with no prior touch. The
    marketing-analytics twin of the funnel: funnels count converting
    USERS, attribution routes PURCHASE REVENUE to channels.

    One user-partitioned ordered window (``last(..., ignorenulls)``
    over UNBOUNDED PRECEDING..1 PRECEDING — the 'carry the last
    non-null backward' idiom, deterministic via the (ts, event_id)
    tie-break), then one rollup groupBy. Revenue in exact integer
    cents (round(value*100) — same IEEE multiply and integer rounding
    both engines).

    Scale posture: the window is PARTITIONED on user_id (millions of
    independent partitions — no single-task hazard, the lint checks);
    one shuffle on user_id + one rollup-sized groupBy(channel)."""
    events = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attr = events.withColumn(
        "channel",
        F.last(
            F.when(
                F.col("event_type").isin("view", "click"),
                F.col("event_type"),
            ),
            ignorenulls=True,
        ).over(w),
    )
    return (
        attr.filter(F.col("event_type") == "purchase")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.expr("cast(round(value * 100) as bigint)"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


# -- time-series gap fill ----------------------------------------------------

#: Users carried through the gap-fill demo (bounds the spine:
#: |users| × |days| rows — the gap-fill contract at any scale).
GAPFILL_USERS = 100


@query(
    "ts_gap_fill_interpolate",
    oracle=f"""
    WITH obs AS (
        SELECT user_id,
               CAST(ts AS DATE) AS day,
               SUM(CAST(round(value * 100) AS BIGINT)) AS v
        FROM events
        WHERE user_id < {GAPFILL_USERS}
        GROUP BY user_id, CAST(ts AS DATE)
    ),
    spine AS (
        SELECT u.user_id, CAST(d.d AS DATE) AS day
        FROM (SELECT DISTINCT user_id FROM obs) u
        CROSS JOIN generate_series(
            DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY) d(d)
    ),
    j AS (
        SELECT s.user_id, s.day,
               datediff('day', DATE '2024-01-01', s.day) AS di,
               o.v
        FROM spine s LEFT JOIN obs o
          ON o.user_id = s.user_id AND o.day = s.day
    ),
    nb AS (
        SELECT user_id, day, di, v,
               last_value(CASE WHEN v IS NOT NULL
                               THEN {{'d': di, 'x': v}} END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY di
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS prev,
               first_value(CASE WHEN v IS NOT NULL
                                THEN {{'d': di, 'x': v}} END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY di
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS nxt
        FROM j
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           CAST(COALESCE(CASE WHEN v IS NOT NULL THEN v * 1000
                WHEN prev IS NOT NULL AND nxt IS NOT NULL THEN
                    (1000 * (prev.x * (nxt.d - di) + nxt.x * (di - prev.d)))
                        // (nxt.d - prev.d)
                WHEN prev IS NOT NULL THEN prev.x * 1000
           END, -1) AS BIGINT) AS filled_milli,
           CASE WHEN v IS NOT NULL THEN 'obs'
                WHEN prev IS NOT NULL AND nxt IS NOT NULL THEN 'interp'
                WHEN prev IS NOT NULL THEN 'locf'
                ELSE 'none' END AS fill_kind
    FROM nb
    """,
    # bounded-nlj: the spine build crosses users with the CONSTANT
    # 30-row calendar frame (broadcast) — bounded by construction.
    tags=("window", "timeseries", "gapfill", "bounded-nlj"),
)
def ts_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill over a calendar spine — the hypertable
    regularization pass (TimescaleDB time_bucket_gapfill +
    interpolate/locf): per user, daily totals land on a complete
    Jan-2024 day spine; interior gaps LINEARLY INTERPOLATE between
    the flanking observations, trailing gaps carry the last
    observation forward (locf), leading gaps carry the -1 sentinel
    (fill_kind='none'; a NULL here would flip the pandas column to
    float and break the driver's int/float stringify parity) — each
    row labeled with how it was filled.

    Exactness: values quantize to integer cents; the interpolation
    is ONE floor division of cross-multiplied integers
    ((v0·(d1−d) + v1·(d−d0))·1000 div (d1−d0), all non-negative),
    so no float midpoint can flip engines.

    Scale posture: ONE shuffle on user_id serves both neighbor
    windows (same partitioning, ascending + descending frames); the
    spine is |users| × |days| — gap fill is a DIMENSION-shaped
    operation by contract (you fill a bounded entity set over a
    bounded calendar, never raw events)."""
    events = t(spark, sf_dir, "events")
    obs = (
        events.filter(F.col("user_id") < GAPFILL_USERS)
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("v")
        )
    )
    users = obs.select("user_id").distinct()
    days = spark.sql(
        "SELECT explode(sequence(date'2024-01-01', date'2024-01-30',"
        " interval 1 day)) AS day"
    )
    spine = users.crossJoin(days)
    j = spine.join(obs, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.datediff("day", F.lit("2024-01-01").cast("date")).alias("di"),
        "v",
    )
    marked = F.when(
        F.col("v").isNotNull(),
        F.struct(F.col("di").alias("d"), F.col("v").alias("x")),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("di")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("di")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    nb = j.select(
        "user_id",
        "day",
        "di",
        "v",
        F.last(marked, ignorenulls=True).over(w_prev).alias("prev"),
        F.first(marked, ignorenulls=True).over(w_next).alias("nxt"),
    )
    interp = F.expr(
        "cast((1000 * (prev.x * (nxt.d - di) + nxt.x * (di - prev.d)))"
        " div (nxt.d - prev.d) as bigint)"
    )
    return nb.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce(
            F.when(F.col("v").isNotNull(), F.col("v") * 1000)
            .when(F.col("prev").isNotNull() & F.col("nxt").isNotNull(), interp)
            .when(F.col("prev").isNotNull(), F.expr("prev.x * 1000")),
            F.lit(-1),
        )
        .cast("bigint")
        .alias("filled_milli"),
        F.when(F.col("v").isNotNull(), "obs")
        .when(F.col("prev").isNotNull() & F.col("nxt").isNotNull(), "interp")
        .when(F.col("prev").isNotNull(), "locf")
        .otherwise("none")
        .alias("fill_kind"),
    )


@query(
    "events_funnel_latency",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON s1.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON s2.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    ),
    gaps AS (
        SELECT 'view->click' AS stage_pair,
               epoch_us(s2.t2) - epoch_us(s1.t1) AS gap_us
        FROM s2 JOIN s1 ON s1.user_id = s2.user_id
        UNION ALL
        SELECT 'click->purchase',
               epoch_us(s3.t3) - epoch_us(s2.t2)
        FROM s3 JOIN s2 ON s2.user_id = s3.user_id
    )
    SELECT stage_pair,
           COUNT(*) AS n_users,
           CAST(MIN(gap_us) AS BIGINT) AS min_us,
           quantile_cont(gap_us, 0.5)::DOUBLE AS p50_us,
           quantile_cont(gap_us, 0.95)::DOUBLE AS p95_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_us
    FROM gaps GROUP BY stage_pair
    """,
    tags=("window", "analytics", "funnel"),
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution per funnel stage transition —
    the companion readout to `events_funnel_conversion` (how MANY
    convert) answering how FAST they do: per converting user, the gap
    between consecutive stage timestamps, summarized as exact
    min/p50/p95/max. Gaps are integer microseconds (both engines'
    epoch arithmetic), so the percentile interpolation is exact
    (a+b)/2 double math on integers — bit-stable.

    Scale posture: the same ONE user-keyed fold as the conversion
    query resolves the cascade (per-user stage arrays → t1/t2/t3);
    gap percentiles run per stage-pair — 2 bounded groups, the exact-
    percentile regime (swap percentile_approx in beyond that)."""
    events = t(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("ts"))
        ).alias("t1"),
        F.collect_list(
            F.when(F.col("event_type") == FUNNEL_STAGES[1], F.col("ts"))
        ).alias("clicks"),
        F.collect_list(
            F.when(F.col("event_type") == FUNNEL_STAGES[2], F.col("ts"))
        ).alias("purchases"),
    )
    cascade = per_user.select(
        "t1",
        F.array_min(F.expr("filter(clicks, x -> x > t1)")).alias("t2"),
        "purchases",
    ).select(
        "t1",
        "t2",
        F.array_min(F.expr("filter(purchases, x -> x > t2)")).alias("t3"),
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    gaps = cascade.filter(F.col("t2").isNotNull()).select(
        F.lit("view->click").alias("stage_pair"),
        (us("t2") - us("t1")).alias("gap_us"),
    ).unionAll(
        cascade.filter(F.col("t3").isNotNull()).select(
            F.lit("click->purchase").alias("stage_pair"),
            (us("t3") - us("t2")).alias("gap_us"),
        )
    )
    return gaps.groupBy("stage_pair").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("gap_us").cast("bigint").alias("min_us"),
        F.expr("percentile(gap_us, 0.5)").alias("p50_us"),
        F.expr("percentile(gap_us, 0.95)").alias("p95_us"),
        F.max("gap_us").cast("bigint").alias("max_us"),
    )


@query(
    "events_rfm_segments",
    oracle="""
    WITH pu AS (
        SELECT user_id,
               datediff('day', MAX(CAST(ts AS DATE)), DATE '2024-01-31')
                   AS recency_days,
               COUNT(*) AS frequency,
               SUM(CAST(round(value * 100) AS BIGINT)) AS monetary_cents
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    th AS (
        SELECT quantile_cont(recency_days, 0.5)::DOUBLE AS r_med,
               quantile_cont(frequency, 0.5)::DOUBLE AS f_med,
               quantile_cont(monetary_cents, 0.5)::DOUBLE AS m_med
        FROM pu
    ),
    scored AS (
        SELECT CASE WHEN recency_days <= r_med THEN 2 ELSE 1 END AS r_score,
               CASE WHEN frequency > f_med THEN 2 ELSE 1 END AS f_score,
               CASE WHEN monetary_cents > m_med THEN 2 ELSE 1 END AS m_score,
               monetary_cents
        FROM pu CROSS JOIN th
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_users,
           CAST(SUM(monetary_cents) AS BIGINT) AS sum_monetary_cents
    FROM scored GROUP BY r_score, f_score, m_score
    """,
    tags=("window", "analytics", "rfm", "bounded-nlj"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary —
    the CRM workhorse): per purchasing user the three metrics, split
    high/low against the corpus MEDIANS, rolled up to the 8 segment
    cells with user counts and segment revenue.

    Scale posture: scoring uses BROADCAST THRESHOLDS (one 1-row
    median aggregate, the tagged bounded nested loop), NOT a global
    ntile — an ntile window would single-partition every user through
    one task (exactly the WindowExec shape `window_range_frame`
    documents as dimension-only), while threshold comparison is a
    scan-speed projection at any user count. Metrics are exact
    integers (days / counts / cents); the median thresholds
    interpolate integers identically on both engines, and comparisons
    against them are therefore bit-stable."""
    events = t(spark, sf_dir, "events")
    pu = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.lit("2024-01-31").cast("date"),
                F.max(F.col("ts").cast("date")),
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias(
                "monetary_cents"
            ),
        )
    )
    pu = pu.localCheckpoint(eager=False)  # thresholds + scoring
    th = pu.agg(
        F.expr("percentile(recency_days, 0.5)").alias("r_med"),
        F.expr("percentile(frequency, 0.5)").alias("f_med"),
        F.expr("percentile(monetary_cents, 0.5)").alias("m_med"),
    )
    scored = pu.crossJoin(F.broadcast(th)).select(
        F.when(F.col("recency_days") <= F.col("r_med"), 2)
        .otherwise(1)
        .alias("r_score"),
        F.when(F.col("frequency") > F.col("f_med"), 2).otherwise(1).alias(
            "f_score"
        ),
        F.when(F.col("monetary_cents") > F.col("m_med"), 2)
        .otherwise(1)
        .alias("m_score"),
        "monetary_cents",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("monetary_cents").cast("bigint").alias("sum_monetary_cents"),
    )


@query(
    "events_path_3gram",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS step1,
               LEAD(event_type, 1) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS step2,
               LEAD(event_type, 2) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS step3
        FROM events
    )
    SELECT step1, step2, step3, COUNT(*) AS n_paths
    FROM seq WHERE step3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n_paths DESC, step1, step2, step3
    LIMIT 10
    """,
    tags=("window", "analytics", "topk"),
)
def events_path_3gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 three-step user journeys: the path-mining extension of
    ``events_transition_matrix`` from single transitions to ordered
    3-grams — the table behind "what do users actually do before
    converting" journey analysis. A path counts once per position in
    the user's time-ordered stream (event_id breaks ts ties
    deterministically); the top-k order is fully keyed
    (count desc, then path) so equal-count paths can't reorder.

    Scale posture: one window shuffle keyed on user_id (two LEADs
    share a single WindowExec pass), a map-side-combined rollup on
    the ≤|types|³ path grid, and the global LIMIT fuses into
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("event_type").alias("step1"),
            F.lead("event_type", 1).over(w).alias("step2"),
            F.lead("event_type", 2).over(w).alias("step3"),
        )
        .filter(F.col("step3").isNotNull())
        .groupBy("step1", "step2", "step3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(
            F.desc("n_paths"),
            F.asc("step1"),
            F.asc("step2"),
            F.asc("step3"),
        )
        .limit(10)
    )
