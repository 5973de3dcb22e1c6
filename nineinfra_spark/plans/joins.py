"""Join operators — all eight Spark join types plus range and as-of
composites (SURVEY.md §2.3).

The reference guarantees shuffle capacity for exactly these
(dedicated shuffle PVC per executor, ``internal/controller/
kyuubi.go:115-122``); here each type gets its own differential query.
Dimension-sized sides are broadcast explicitly — at 100 TB the only
shuffling join should be fact⋈fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nineinfra_spark.operators.asof import asof_join
from nineinfra_spark.plans._util import dec, t, ts
from nineinfra_spark.plans.registry import query


@query(
    "join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    """,
    tags=("join",),
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain shuffled hash join: customer GROWS with SF, so no
    broadcast hint — AQE + the autoBroadcastJoinThreshold decide at
    runtime (at sf0.1 it still broadcasts; at 100 TB it must not)."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    cust = t(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT p_partkey, p_name, l_orderkey, l_quantity
    FROM part LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 49) li
      ON p_partkey = li.l_partkey
    WHERE p_size <= 2
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer: unmatched parts keep NULL lineitem columns."""
    part = t(spark, sf_dir, "part").filter(F.col("p_size") <= 2)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return part.join(li, part.p_partkey == li.l_partkey, "left").select(
        "p_partkey", "p_name", "l_orderkey", "l_quantity"
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM (SELECT * FROM supplier WHERE s_acctbal > 0) s
    RIGHT JOIN nation ON s.s_nationkey = n_nationkey
    """,
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0)
    nat = t(spark, sf_dir, "nation")
    return supp.join(nat, supp.s_nationkey == nat.n_nationkey, "right").select(
        "s_suppkey", "s_name", "n_name"
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT a.k AS k_1996, b.k AS k_1997, a.n AS n_1996, b.n AS n_1997
    FROM (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-02-01'
          GROUP BY o_custkey) a
    FULL JOIN (SELECT o_custkey AS k, COUNT(*) AS n FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-02-01'
          GROUP BY o_custkey) b
      ON a.k = b.k
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over two month-cohorts of customers (nulls both sides)."""
    orders = t(spark, sf_dir, "orders")
    a = (
        orders.filter(
            (F.col("o_orderdate") >= ts("1996-01-01")) & (F.col("o_orderdate") < ts("1996-02-01"))
        )
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    b = (
        orders.filter(
            (F.col("o_orderdate") >= ts("1997-01-01")) & (F.col("o_orderdate") < ts("1997-02-01"))
        )
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return a.join(b, a.k == b.k, "full").select(
        a.k.alias("k_1996"), b.k.alias("k_1997"), a.n.alias("n_1996"), b.n.alias("n_1997")
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      AND o_totalprice > 300000)
    """,
    tags=("join", "subquery"),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/IN subquery as a left-semi join (no row duplication)."""
    cust = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 300000)
    )
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
    tags=("join", "subquery"),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join."""
    cust = t(spark, sf_dir, "customer")
    big = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    tags=("join", "dimension-only"),  # region x nation cross
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (both sides dimension-sized — never cross-join
    a fact table; Catalyst plans this as BroadcastNestedLoopJoin)."""
    return (
        t(spark, sf_dir, "region")
        .crossJoin(t(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
    )


@query(
    "join_range_theta",
    oracle="""
    SELECT tier, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1e9))
         tiers(tier, lo, hi)
      ON value >= lo AND value < hi
    GROUP BY tier
    """,
    tags=("join", "range", "dimension-only"),
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join: banding rows into tiers via inequality
    predicates. The tier table is tiny → BroadcastNestedLoopJoin, which
    is the right physical plan at any scale (the alternative — shuffle
    on a range key — needs binning; see `ext_similarity` for that)."""
    events = t(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e9)],
        ["tier", "lo", "hi"],
    )
    return (
        events.join(
            F.broadcast(tiers),
            (events.value >= tiers.lo) & (events.value < tiers.hi),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # Explicit round(2) BEFORE the decimal cast: both engines'
            # ROUND on doubles is half-away-from-zero, whereas the raw
            # double→decimal cast differs (Spark HALF_UP vs DuckDB
            # half-even) exactly on .xx5 midpoints.
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@query(
    "join_asof_backward",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS signup_ts, r.value AS signup_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    tags=("join", "asof", "custom"),
)
def join_asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    signup at-or-before it. Composite operator (union + window) — see
    nineinfra_spark/operators/asof.py for the scale rationale."""
    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    signups = events.filter(F.col("event_type") == "signup").select("user_id", "ts", "value")
    joined = asof_join(purchases, signups, on="user_id", ts="ts", payload=["value"], suffix="_r")
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_r").alias("signup_ts"),
        F.col("value_r").alias("signup_value"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
    SELECT event_id, user_id, ts,
           CASE WHEN r_ts IS NOT NULL
                     AND (epoch_us(ts) - epoch_us(r_ts)) <= 3600000000
                THEN r_ts END AS prior_ts,
           CASE WHEN r_ts IS NOT NULL
                     AND (epoch_us(ts) - epoch_us(r_ts)) <= 3600000000
                THEN r_val END AS prior_value
    FROM (
        SELECT l.event_id, l.user_id, l.ts, r.ts AS r_ts, r.value AS r_val
        FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    ) j
    """,
    tags=("join", "asof", "tolerance", "custom"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a MAX-GAP tolerance (pandas ``merge_asof
    (tolerance=...)``): each purchase takes the user's most recent
    page view, but only if it happened within the last hour —
    attribution windows, sensor-reading staleness caps, and
    quote-to-trade matching all need exactly this. A match farther
    back than the tolerance is reported as NO match (NULL payload),
    identical to a user with no prior view at all.

    The tolerance check runs AFTER the one-shuffle union+window fill
    (``operators/asof.py``) — the plan stays free of range products;
    the oracle states the same semantics over DuckDB's native ASOF
    join with an integer-microsecond gap test."""
    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, views, on="user_id", ts="ts", payload=["value"],
        suffix="_r", tolerance_s=3600.0,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_r").alias("prior_ts"),
        F.col("value_r").alias("prior_value"),
    )


@query(
    "join_skew_hotkey",
    oracle="""
    SELECT hot_key, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MAX(c_name) AS key_owner
    FROM (SELECT CASE WHEN user_id < 120 THEN 0 ELSE user_id END AS hot_key,
                 value
          FROM events) e
    JOIN customer c ON c.c_custkey = e.hot_key
    GROUP BY hot_key
    """,
    tags=("join", "skew"),
)
def join_skew_hotkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-key join witness: the testdata's uniform ``user_id`` is
    deliberately collapsed into a power-law key (key 0 carries ~80% of
    events — the "one whale account" shape every real event stream
    has), then joined to a per-key dim.

    Scale posture, in order of preference:
    1. AQE skew-join (on by default, engine.py:106) splits the fat
       post-shuffle partition at runtime — plan-asserted with
       ``skew=true`` in tests/test_skew.py.
    2. ``operators.skew.salted_join`` is the deterministic rewrite for
       the cases AQE can't reach (equivalence-tested there too).
    Here the dim is dimension-sized, so at ANY scale broadcast is the
    honest winner and AQE picks it; the pytest forces the shuffle path
    to make the skew machinery observable."""
    events = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    e = events.select(
        F.when(F.col("user_id") < 120, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("hot_key"),
        "value",
    )
    return (
        e.join(cust, cust.c_custkey == e.hot_key)
        .groupBy("hot_key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
            F.max("c_name").alias("key_owner"),
        )
    )


# -- bucketed interval-overlap join ----------------------------------------

IVL_BUCKET_S = 600  # time-bin width = interval length (≤2 bins per interval)
IVL_TRIGGER = 190.0  # error events above this open a 10-minute window


@query(
    "join_interval_bucketed",
    oracle=f"""
    WITH iv AS (
        SELECT event_id AS interval_id, ts AS w_start,
               ts + INTERVAL 10 MINUTE AS w_end
        FROM events
        WHERE event_type = 'error' AND value > {IVL_TRIGGER}
    )
    SELECT iv.interval_id, iv.w_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(e.value, 2) AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_value
    FROM iv JOIN events e
      ON e.ts >= iv.w_start AND e.ts < iv.w_end
    GROUP BY iv.interval_id, iv.w_start
    """,
    tags=("join", "interval", "bucketed"),
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big interval-overlap join WITHOUT a nested loop: high-value
    error events open 10-minute incident windows; every event falling
    inside a window is aggregated to it. A naive range join is
    BroadcastNestedLoop (quadratic at scale); here both sides are
    binned into IVL_BUCKET_S-second buckets — each interval explodes
    to the ≤2 buckets it covers, each point maps to exactly 1 — and
    the join becomes an EQUI-join on the bucket with the exact range
    predicate as a post-filter. A point matches an interval in at most
    one bucket (its own), so no dedup stage is needed.

    Scale posture: the standard binned range-join rewrite (what
    Databricks' range-join hint does natively). Shuffle is keyed on
    the time bucket — bounded, uniform for event-time data — and the
    plan contains NO nested-loop operator (pinned by
    tests/test_sql_shapes.py). The oracle states the declarative
    range join; the Spark side states the scalable plan."""
    events = t(spark, sf_dir, "events")
    iv = (
        events.filter(
            (F.col("event_type") == "error") & (F.col("value") > IVL_TRIGGER)
        )
        .select(
            F.col("event_id").alias("interval_id"),
            F.col("ts").alias("w_start"),
            F.expr("ts + INTERVAL 10 MINUTES").alias("w_end"),
        )
        .withColumn(
            "bucket",
            # NTZ→TIMESTAMP cast before unix_micros: both sides use the
            # same conversion, so bucket alignment is zone-independent.
            F.explode(
                F.sequence(
                    F.expr(
                        "cast(unix_micros(cast(w_start as timestamp))"
                        f" div {IVL_BUCKET_S * 1_000_000} as bigint)"
                    ),
                    F.expr(
                        "cast((unix_micros(cast(w_end as timestamp)) - 1)"
                        f" div {IVL_BUCKET_S * 1_000_000} as bigint)"
                    ),
                )
            ),
        )
    )
    pts = events.select(
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
        F.expr(
            "cast(unix_micros(cast(ts as timestamp))"
            f" div {IVL_BUCKET_S * 1_000_000} as bigint)"
        ).alias("bucket"),
    )
    return (
        iv.join(pts, "bucket")
        .filter((F.col("p_ts") >= F.col("w_start")) & (F.col("p_ts") < F.col("w_end")))
        .groupBy("interval_id", "w_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("p_value"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@query(
    "join_asof_forward",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS next_error_ts, r.value AS next_error_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
    tags=("join", "asof", "custom"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the EARLIEST error event
    at-or-after it for the same user (the \"what happened next\"
    direction — next failure, next churn, next fill). Same composite
    operator as the backward query (`operators/asof.py`) with
    direction=\"forward\"; DuckDB's native ASOF JOIN states the oracle
    with the <= condition."""
    events = t(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        left,
        right,
        on="user_id",
        ts="ts",
        payload=["value"],
        direction="forward",
        suffix="_r",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_r").alias("next_error_ts"),
        F.col("value_r").alias("next_error_value"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH l AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ),
    r AS (
        SELECT user_id, ts, value FROM events WHERE event_type = 'error'
    ),
    b AS (
        SELECT l.event_id, r.ts AS b_ts, r.value AS b_val
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    ),
    f AS (
        SELECT l.event_id, r.ts AS f_ts, r.value AS f_val
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts <= r.ts
    )
    SELECT l.event_id, l.user_id, l.ts,
           CASE WHEN b_ts IS NULL THEN f_ts
                WHEN f_ts IS NULL THEN b_ts
                WHEN epoch_us(f_ts) - epoch_us(l.ts)
                     < epoch_us(l.ts) - epoch_us(b_ts) THEN f_ts
                ELSE b_ts END AS nearest_ts,
           CASE WHEN b_ts IS NULL THEN f_val
                WHEN f_ts IS NULL THEN b_val
                WHEN epoch_us(f_ts) - epoch_us(l.ts)
                     < epoch_us(l.ts) - epoch_us(b_ts) THEN f_val
                ELSE b_val END AS nearest_value
    FROM l
    JOIN b ON b.event_id = l.event_id
    JOIN f ON f.event_id = l.event_id
    """,
    tags=("join", "asof", "nearest", "custom"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (pandas ``merge_asof(direction=
    "nearest")``): each purchase matched to the user's closest error
    event in EITHER time direction, ties backward — incident
    attribution where cause can precede or follow the observation
    (clock skew between services, post-hoc error logging). Completes
    the as-of family: backward, forward, tolerance, nearest.

    Scale posture: both directional fills run over the SAME user_id
    window partitioning — ONE exchange, two sorts (``operators/
    asof.py``, direction="nearest"); the per-row chooser compares
    exact integer-microsecond gaps, so no float boundary can flip the
    winner cross-engine. The oracle states the same choice over two
    native DuckDB ASOF joins."""
    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, errors, on="user_id", ts="ts", payload=["value"],
        suffix="_r", direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_r").alias("nearest_ts"),
        F.col("value_r").alias("nearest_value"),
    )
