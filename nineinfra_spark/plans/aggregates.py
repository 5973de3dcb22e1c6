"""Aggregation operators (SURVEY.md §2.4): hash aggregate, distinct
aggs, statistical moments, cube/rollup/grouping sets, pivot, approx
sketches.

Statistical functions (stddev/var/corr/covar/skew/kurt) are exposed
as exact-moment compositions: the sums are decimal-exact, so the final
double arithmetic is bit-identical across engines and across any
degree of parallelism — the property that makes the DuckDB
differential meaningful. The native one-pass versions
(F.stddev, F.corr, ...) are unit-tested with tolerance in
tests/test_aggregates.py (their merge order varies by partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import dec, ranked_prefix, spread, t
from nineinfra_spark.plans.registry import query


@query(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
    FROM lineitem
    """,
    tags=("agg",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (Expand-based plan)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def _moments(x: str, scale: int = 6) -> dict[str, Column]:
    """Exact decimal power sums of a column, cast to double."""
    xc = F.col(x)
    return {
        "n": F.count(xc).cast("double"),
        "s1": F.sum(dec(xc, 38, scale)).cast("double"),
        "s2": F.sum(dec(xc * xc, 38, scale)).cast("double"),
    }


@query(
    "agg_stats_moments",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment,
             CAST(COUNT(c_acctbal) AS DOUBLE) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS s2
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment,
           s1 / n AS mean_bal,
           (s2 - s1 * s1 / n) / (n - 1) AS var_bal,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_bal,
           (s2 - s1 * s1 / n) / n AS var_pop_bal
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """variance/stddev from exact power sums (order-independent)."""
    cust = t(spark, sf_dir, "customer")
    m = _moments("c_acctbal")
    agg = cust.groupBy("c_mktsegment").agg(
        m["n"].alias("n"), m["s1"].alias("s1"), m["s2"].alias("s2")
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    ss = s2 - s1 * s1 / n
    return agg.select(
        "c_mktsegment",
        (s1 / n).alias("mean_bal"),
        (ss / (n - 1)).alias("var_bal"),
        F.sqrt(ss / (n - 1)).alias("stddev_bal"),
        (ss / n).alias("var_pop_bal"),
    )


@query(
    "agg_corr_moments",
    oracle="""
    WITH m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      FROM lineitem
    )
    SELECT (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price,
           (n * sxy - sx * sy) / (n * n) AS covar_pop,
           (n * sxy - sx * sy) / (n * (n - 1)) AS covar_samp
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_corr_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + covariance from exact moments."""
    li = t(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    agg = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec(x, 38, 6)).cast("double").alias("sx"),
        F.sum(dec(y, 38, 6)).cast("double").alias("sy"),
        F.sum(dec(x * x, 38, 6)).cast("double").alias("sxx"),
        F.sum(dec(y * y, 38, 6)).cast("double").alias("syy"),
        F.sum(dec(x * y, 38, 6)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return agg.select(
        (
            (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
        ((n * sxy - sx * sy) / (n * n)).alias("covar_pop"),
        ((n * sxy - sx * sy) / (n * (n - 1))).alias("covar_samp"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING_ID(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping combinations + grouping_id."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT r_name, n_name,
           GROUPING_ID(r_name, n_name) AS gid,
           COUNT(*) AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical region → nation subtotals + grand total."""
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.grouping_id().alias("gid"), F.count(F.lit(1)).alias("n_cust"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("agg", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (two disjoint groupings in one pass)."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot rows→columns with an explicit value list (explicit values
    avoid the extra distinct-scan pass — required practice at scale)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_open"),
            F.col("F").alias("qty_filled"),
        )
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list_distinct(list(n_name))), ',') AS nations
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → canonical string (sorted + joined so the result is
    deterministic under any partitioning)."""
    nat = t(spark, sf_dir, "nation")
    return nat.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_set("n_name")), ",").alias("nations")
    )


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT o_orderpriority,
           quantile_cont(o_totalprice, 0.5)::DOUBLE AS p50,
           quantile_cont(o_totalprice, 0.9)::DOUBLE AS p90
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "percentile"),
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (continuous).

    DIMENSION-SCALE ONLY: exact percentile buffers every value per
    group. With bounded groups (orders per priority tier at test SFs)
    that's fine; at 100 TB the default is `percentile_approx` (see
    agg_approx_sketches — constant-memory KLL-style sketch, mergeable
    map-side), with exact reserved for bounded dimensions."""
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
    )


@query(
    "agg_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS hll_within_rsd,
           TRUE AS p50_within_iqr
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL + quantile sketches — the 100 TB workhorses (constant
    memory, mergeable map-side partials vs exact distinct's shuffle).
    Approximate values can't hash-match an oracle, so the query emits
    the BOUNDS CHECK as its result: exact counts plus Spark-computed
    booleans that the HLL estimate lands within 5×rsd of exact and
    the sketch median within the exact IQR; DuckDB recomputes the
    exact columns and expects literal TRUE. (The exact distinct /
    percentile columns here exist to verify the sketches — in
    production you'd ship only the sketch columns. Tighter bound
    assertions: tests/test_aggregates.py.)"""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.02).alias("_hll_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_sk_p50"),
            F.expr("percentile(l_extendedprice, 0.25)").alias("_p25"),
            F.expr("percentile(l_extendedprice, 0.75)").alias("_p75"),
        )
        .select(
            "l_returnflag",
            "n",
            "exact_parts",
            (
                F.abs(F.col("_hll_parts") - F.col("exact_parts"))
                <= F.lit(5 * 0.02) * F.col("exact_parts")
            ).alias("hll_within_rsd"),
            F.col("_sk_p50").between(F.col("_p25"), F.col("_p75")).alias(
                "p50_within_iqr"
            ),
        )
    )


@query(
    "agg_first_last_by",
    oracle="""
    SELECT o_orderpriority,
           arg_min(o_totalprice, o_orderkey) AS first_price,
           arg_max(o_totalprice, o_orderkey) AS last_price,
           arg_min(o_orderstatus, o_orderkey) AS first_status,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "first-last"),
)
def agg_first_last_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last aggregate semantics, made deterministic: raw
    F.first/F.last depend on partition arrival order, so the engine
    surface is min_by/max_by keyed on the unique orderkey — "value at
    the first/last row" with a total order. Same single hash-agg
    shape (and at 100 TB, the same map-side partials) as any groupBy."""
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("min_by(o_totalprice, o_orderkey)").alias("first_price"),
        F.expr("max_by(o_totalprice, o_orderkey)").alias("last_price"),
        F.expr("min_by(o_orderstatus, o_orderkey)").alias("first_status"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_skew_kurt",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS s1,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s2,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT)) AS s3,
               SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS s4
        FROM lineitem GROUP BY l_returnflag
    ), m AS (
        SELECT l_returnflag, n,
               CAST(s1 AS DOUBLE) / n AS m1,
               CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
               CAST(s3 AS DOUBLE) / n
                 - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                 + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m3,
               CAST(s4 AS DOUBLE) / n
                 - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                 + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                 - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                     * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
        FROM s
    )
    SELECT l_returnflag, n,
           ROUND(m3 / (m2 * sqrt(m2)), 6) AS skew,
           ROUND(m4 / (m2 * m2) - 3, 6) AS kurt
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness / excess kurtosis (Spark's definitions) via
    exact integer power sums: l_quantity is integral, so s1..s4 are
    exact BIGINTs, the central moments are computed once in double
    from exact inputs, and the result is bit-stable at any
    parallelism. (The native one-pass F.skewness/F.kurtosis stream
    merge-order-dependent moments — tolerance-tested in
    tests/test_aggregates.py, same policy as stddev/corr.)"""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s1"),
        F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"),
        F.sum(q * q * q * q).alias("s4"),
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n") - m1 * m1
    m3 = F.col("s3").cast("double") / F.col("n") - 3 * m1 * (F.col("s2").cast("double") / F.col("n")) + 2 * m1 * m1 * m1
    m4 = (
        F.col("s4").cast("double") / F.col("n")
        - 4 * m1 * (F.col("s3").cast("double") / F.col("n"))
        + 6 * m1 * m1 * (F.col("s2").cast("double") / F.col("n"))
        - 3 * m1 * m1 * m1 * m1
    )
    return s.select(
        "l_returnflag",
        "n",
        F.round(m3 / (m2 * F.sqrt(m2)), 6).alias("skew"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("kurt"),
    )


@query(
    "agg_collect_list_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), ',') AS all_names,
           len(list(n_name)) AS n
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg", "collect"),
)
def agg_collect_list_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list (bag semantics, duplicates kept) → canonical
    sorted string. Collection order is partition-dependent, so the
    deterministic surface is always sort-then-join."""
    nat = t(spark, sf_dir, "nation")
    return nat.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("all_names"),
        F.size(F.collect_list("n_name")).alias("n"),
    )


@query(
    "agg_boolean_family",
    oracle="""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
           bool_and(o_totalprice > 1000) AS all_over_1k,
           bool_or(o_orderstatus = 'F') AS any_finished,
           COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "boolean"),
)
def agg_boolean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family (count_if / bool_and / bool_or) —
    predicate summaries as single-bit map-side partials, the cheapest
    aggregates that exist at any scale."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count(F.lit(1)).alias("n"),
    )


#: fixed-bin histogram spec for ``agg_histogram_bins``: 10 bins of
#: width 50 over [0, 500) in integer CENTS so the bin of a boundary
#: value can't flip between engines' float arithmetic.
_HIST_LO_C = 0
_HIST_W_C = 50_00
_HIST_N = 10


@query(
    "agg_histogram_bins",
    oracle=f"""
    WITH c AS (
        SELECT event_type,
               LEAST(GREATEST((CAST(ROUND(value * 100) AS BIGINT) - {_HIST_LO_C})
                              // {_HIST_W_C}, 0), {_HIST_N - 1}) AS bin
        FROM events
    )
    SELECT event_type, CAST(bin AS BIGINT) AS bin,
           CAST(bin * {_HIST_W_C} AS DOUBLE) / 100.0 AS bin_lo,
           CAST((bin + 1) * {_HIST_W_C} AS DOUBLE) / 100.0 AS bin_hi,
           COUNT(*) AS n
    FROM c
    GROUP BY event_type, bin
    """,
    tags=("agg", "histogram", "profiling"),
)
def agg_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin numeric histogram per group — the data-profiling
    aggregate every warehouse exposes (width_bucket semantics, with
    under/overflow clamped into the edge bins). Bin assignment runs in
    integer CENTS (round-to-cents → integer floor-divide), so a value
    sitting exactly on a bin edge lands identically on both engines —
    the float-boundary discipline used repo-wide.

    Scale posture: one projection + one (event_type, bin)-keyed
    hash aggregate — map-side combined, output cardinality is
    #groups × #bins (tiny). Scan speed at any corpus size."""
    ev = t(spark, sf_dir, "events")
    bin_c = F.least(
        F.greatest(
            F.expr(f"(cast(round(value * 100) as bigint) - {_HIST_LO_C}) DIV {_HIST_W_C}"),
            F.lit(0),
        ),
        F.lit(_HIST_N - 1),
    )
    return (
        ev.select("event_type", bin_c.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.col("bin").cast("bigint").alias("bin"),
            (F.col("bin") * _HIST_W_C).cast("double").alias("bin_lo_raw"),
            ((F.col("bin") + 1) * _HIST_W_C).cast("double").alias("bin_hi_raw"),
            "n",
        )
        .select(
            "event_type",
            "bin",
            (F.col("bin_lo_raw") / 100.0).alias("bin_lo"),
            (F.col("bin_hi_raw") / 100.0).alias("bin_hi"),
            "n",
        )
    )


# -- Count-Min sketch heavy hitters ----------------------------------------

CMS_DEPTH = 4  # hash rows
CMS_WIDTH = 32  # buckets per row
CMS_TOPN = 10  # report the N most frequent tokens

#: 60-bit md5-derived bucket for CMS row r (same family as ext_dedup).
_CMS_SPARK = (
    "cast(conv(substr(md5(concat('cms{r}:', tok)), 1, 15), 16, 10) as long)"
    " % {w}"
)
_CMS_DUCK = (
    "CAST(CONCAT('0x', SUBSTR(md5('cms{r}:' || tok), 1, 15)) AS BIGINT) % {w}"
)


def _cms_oracle() -> str:
    row_cells = "\n        UNION ALL ".join(
        f"SELECT {r} AS r, {_CMS_DUCK.format(r=r, w=CMS_WIDTH)} AS b,"
        " COUNT(*) AS c FROM toks GROUP BY 1, 2"
        for r in range(CMS_DEPTH)
    )
    est_joins = ",\n        ".join(
        f"(SELECT c FROM cells WHERE r = {r}"
        f" AND b = {_CMS_DUCK.format(r=r, w=CMS_WIDTH)}) AS e{r}"
        for r in range(CMS_DEPTH)
    )
    least = "LEAST(" + ", ".join(f"e{r}" for r in range(CMS_DEPTH)) + ")"
    toks_duck = "regexp_extract_all(lower(text), '[a-z]+')"
    return f"""
    WITH toks AS (
        SELECT unnest({toks_duck}) AS tok
        FROM documents
    ),
    cells AS (
        {row_cells}
    ),
    truth AS (
        SELECT tok, COUNT(*) AS true_cnt FROM toks GROUP BY tok
    ),
    top AS (
        SELECT tok, true_cnt FROM truth
        ORDER BY true_cnt DESC, tok LIMIT {CMS_TOPN}
    ),
    est AS (
        SELECT tok, true_cnt,
        {est_joins}
        FROM top
    )
    SELECT tok, true_cnt, {least} AS est_cnt,
           {least} >= true_cnt AS never_underestimates
    FROM est
    """


@query(
    "agg_cms_heavy_hitters",
    oracle=_cms_oracle(),
    tags=("agg", "sketch", "cms"),
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters: a DEPTH×WIDTH counter grid over
    the corpus token stream (bucket = md5-derived hash per row), then
    the point estimate min over rows for the true top-N tokens. The
    hash family is deterministic, so the DuckDB oracle replicates the
    sketch bit-for-bit — estimates are hash-compared, and the CMS
    one-sided-error invariant (never underestimates) travels as a
    boolean column the oracle expects TRUE.

    Scale posture: the sketch build is ONE groupBy over (row, bucket)
    — 128 cells out regardless of corpus size, with map-side partial
    aggregation doing the heavy lifting; that partial-sum tree IS the
    standard distributed CMS merge (cell-wise addition). Probing joins
    the top-N keys against 128 broadcast cells. This is the mergeable-
    summary pattern every 100 TB profiling pass leans on."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).alias(
            "tok"
        )
    )
    toks = toks.localCheckpoint(eager=False)  # feeds cells + truth
    # One pass builds ALL sketch rows: each token emits its DEPTH
    # (row, bucket) coordinates via posexplode, and a single groupBy
    # folds them — one shuffle of ≤DEPTH×WIDTH map-side partials
    # instead of DEPTH separate aggregation passes over the corpus.
    bucket_arr = F.array(
        *[F.expr(_CMS_SPARK.format(r=r, w=CMS_WIDTH)) for r in range(CMS_DEPTH)]
    )
    cells = (
        toks.select(F.posexplode(bucket_arr).alias("r", "b"))
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # ≤DEPTH×WIDTH rows feeding DEPTH probe joins: materialize once so
    # the probes don't re-run the sketch build per row.
    cells = cells.localCheckpoint(eager=False)
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), "tok")
        .limit(CMS_TOPN)
    )
    probe = top
    for r in range(CMS_DEPTH):
        cr = cells.filter(F.col("r") == r).select(
            F.col("b").alias(f"b{r}"), F.col("c").alias(f"e{r}")
        )
        probe = probe.withColumn(
            f"pb{r}", F.expr(_CMS_SPARK.format(r=r, w=CMS_WIDTH))
        ).join(F.broadcast(cr), F.col(f"pb{r}") == F.col(f"b{r}"))
    est = F.least(*[F.col(f"e{r}") for r in range(CMS_DEPTH)])
    return probe.select(
        "tok",
        "true_cnt",
        est.alias("est_cnt"),
        (est >= F.col("true_cnt")).alias("never_underestimates"),
    )


# -- portable Bloom filter build + probe -----------------------------------

BLOOM_WORDS = 16  # filter words
BLOOM_BITS_PER_WORD = 63  # 63 usable bits/word (1<<63 overflows BIGINT)
BLOOM_M = BLOOM_WORDS * BLOOM_BITS_PER_WORD  # 1008 positions
BLOOM_K = 3  # hash functions
BLOOM_PRICE_MIN = 495000  # build-side predicate: top-tier orders

_BLOOM_POS_SPARK = (
    "cast(conv(substr(md5(concat('bf{h}:', cast({key} as string))), 1, 15),"
    f" 16, 10) as long) % {BLOOM_M}"
)
_BLOOM_POS_DUCK = (
    "CAST(CONCAT('0x', SUBSTR(md5('bf{h}:' || CAST({key} AS VARCHAR)), 1, 15))"
    f" AS BIGINT) % {BLOOM_M}"
)


def _bloom_oracle() -> str:
    pos_rows = "\n            UNION ALL ".join(
        f"SELECT {_BLOOM_POS_DUCK.format(h=h, key='o_custkey')} AS pos FROM big"
        for h in range(BLOOM_K)
    )
    checks = " AND ".join(
        f"""COALESCE((
            SELECT bit_or(CAST(1 AS BIGINT) << CAST(pos % {BLOOM_BITS_PER_WORD} AS INTEGER))
            FROM positions
            WHERE pos // {BLOOM_BITS_PER_WORD} =
                  {_BLOOM_POS_DUCK.format(h=h, key='c.c_custkey')} // {BLOOM_BITS_PER_WORD}
        ) & (CAST(1 AS BIGINT) <<
             CAST({_BLOOM_POS_DUCK.format(h=h, key='c.c_custkey')}
                  % {BLOOM_BITS_PER_WORD} AS INTEGER)), 0) <> 0"""
        for h in range(BLOOM_K)
    )
    return f"""
    WITH big AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > {BLOOM_PRICE_MIN}
    ),
    positions AS (
        {pos_rows}
    )
    SELECT c.c_custkey,
           EXISTS (SELECT 1 FROM big b WHERE b.o_custkey = c.c_custkey)
               AS actually_present,
           ({checks}) AS bloom_maybe
    FROM customer c
    """


@query(
    "agg_bloom_membership",
    oracle=_bloom_oracle(),
    tags=("agg", "sketch", "bloom"),
)
def agg_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom filter as data: the custkeys of big-ticket orders
    are folded into a 16-word × 63-bit filter — each key emits K md5
    positions, ONE bit_or groupBy per word builds the filter (the
    partial-agg tree IS the distributed Bloom merge) — then every
    customer probes the broadcast 16-row filter. `actually_present`
    (exact semi-join) travels next to `bloom_maybe`, so the oracle
    hash-checks the no-false-negative contract AND the exact
    false-positive set bit-for-bit (the hash family is deterministic).

    Scale posture: this is the explicit, engine-portable twin of the
    runtime bloom Catalyst injects (tests/test_runtime_filter.py):
    build cost one groupBy collapsing to BLOOM_WORDS rows regardless
    of build-side size; probe cost a broadcast map lookup at scan
    speed. The pattern pre-filters a 100 TB fact scan against a
    selective dim without shuffling the fact. m is a demo constant —
    production sizes m ≈ 1.44·n·log2(1/fp) from the build-side count
    (a fixed m saturates once n approaches m/k, as it would here at
    sf0.1; correctness is unaffected, only FP rate)."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        orders.filter(F.col("o_totalprice") > BLOOM_PRICE_MIN)
        .select("o_custkey")
        .distinct()
    )
    pos = None
    for h in range(BLOOM_K):
        p = big.select(
            F.expr(_BLOOM_POS_SPARK.format(h=h, key="o_custkey")).alias("pos")
        )
        pos = p if pos is None else pos.unionAll(p)
    words = (
        pos.groupBy(
            (F.col("pos") / BLOOM_BITS_PER_WORD).cast("bigint").alias("word")
        )
        .agg(
            F.bit_or(
                F.expr(
                    "shiftleft(cast(1 as bigint),"
                    f" cast(pos % {BLOOM_BITS_PER_WORD} as int))"
                )
            ).alias("bits")
        )
    )
    probe = cust.select("c_custkey")
    for h in range(BLOOM_K):
        p = F.expr(_BLOOM_POS_SPARK.format(h=h, key="c_custkey"))
        w = words.select(
            F.col("word").alias(f"w{h}"), F.col("bits").alias(f"bits{h}")
        )
        probe = probe.withColumn(f"pos{h}", p).join(
            F.broadcast(w),
            (F.col(f"pos{h}") / BLOOM_BITS_PER_WORD).cast("bigint")
            == F.col(f"w{h}"),
            "left",
        )
    maybe = None
    for h in range(BLOOM_K):
        hit = (
            F.coalesce(F.col(f"bits{h}"), F.lit(0)).bitwiseAND(
                F.expr(
                    "shiftleft(cast(1 as bigint),"
                    f" cast(pos{h} % {BLOOM_BITS_PER_WORD} as int))"
                )
            )
            != 0
        )
        maybe = hit if maybe is None else (maybe & hit)
    exact = big.select(F.col("o_custkey").alias("c_custkey")).withColumn(
        "actually_present", F.lit(True)
    )
    return (
        probe.join(exact, "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce("actually_present", F.lit(False)).alias(
                "actually_present"
            ),
            maybe.alias("bloom_maybe"),
        )
    )


# -- robust outlier detection (median / MAD) -------------------------------


@query(
    "agg_anomaly_mad",
    oracle="""
    WITH v AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    med AS (
        SELECT event_type, median(cents) AS med_cents FROM v GROUP BY event_type
    ),
    dev AS (
        SELECT v.event_type, v.cents, m.med_cents,
               ABS(v.cents - m.med_cents) AS adev
        FROM v JOIN med m ON v.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, median(adev) AS mad_cents FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n_events,
           MAX(d.med_cents) / 100 AS median_value,
           MAX(m2.mad_cents) / 100 AS mad_value,
           CAST(SUM(CASE WHEN d.adev > 3 * m2.mad_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m2 ON d.event_type = m2.event_type
    GROUP BY d.event_type
    """,
    tags=("agg", "robust", "anomaly"),
)
def agg_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median and MAD (median
    absolute deviation) per event_type, then the count of events
    beyond 3×MAD — the profiling gate that survives heavy tails where
    mean/stddev fences drown. Values are folded to integer cents
    before the medians, so interpolated midpoints are exact doubles
    (k or k.5 — representable) on both engines, and the 3×MAD fence
    compares integers against an exact double.

    Scale posture: medians are exact within groups — the bounded-
    cardinality regime (|event_type| groups) where exact percentile
    per group is the right call (same stance as agg_percentile_exact);
    the deviation pass re-joins the 1-row-per-group medians back via
    broadcast, so event rows shuffle only for the per-group folds. At
    unbounded group counts, swap the median for the KLL sketch of
    agg_approx_sketches."""
    events = t(spark, sf_dir, "events")
    v = events.select(
        "event_type",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    v = v.localCheckpoint(eager=False)  # feeds median, deviation, mad
    med = v.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med_cents")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "cents",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("adev"),
    )
    dev = dev.localCheckpoint(eager=False)
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.col("med_cents")) / 100).alias("median_value"),
            (F.max(F.col("mad_cents")) / 100).alias("mad_value"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad_cents"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@query(
    "agg_mode_deterministic",
    oracle=f"""
    WITH counts AS (
        SELECT lang, tok, COUNT(*) AS cnt
        FROM (SELECT lang, unnest({{toks}}) AS tok FROM documents)
        GROUP BY lang, tok
    )
    SELECT lang, tok AS mode_token, cnt AS n_occurrences
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY lang ORDER BY cnt DESC, tok
        ) AS rn
        FROM counts
    ) WHERE rn = 1
    """.format(toks="regexp_extract_all(lower(text), '[a-z]+')"),
    tags=("agg", "mode"),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group, with a DETERMINISTIC
    tie-break: built-in ``mode()`` on both engines picks an arbitrary
    winner among equal counts (partition-layout-dependent in Spark),
    so the portable form is count + row_number ordered by
    (cnt DESC, value) — the same result on any engine, any
    parallelism. Here: the most frequent token per language.

    Scale posture: inverted-index groupBy (map-side combined) + a
    window over the per-group count table keyed on the group — the
    count table is |vocab|-sized, not corpus-sized."""
    docs = t(spark, sf_dir, "documents")
    from pyspark.sql import Window

    counts = (
        docs.select(
            "lang",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("tok"),
        )
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("cnt"), "tok")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", F.col("tok").alias("mode_token"), F.col("cnt").alias("n_occurrences"))
    )


@query(
    "agg_hll_union_rollup",
    oracle="""
    WITH monthly AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS m,
               CAST(strftime(o_orderdate, '%Y') AS VARCHAR) || '-Q'
               || CAST((CAST(strftime(o_orderdate, '%m') AS INT) + 2) // 3
                       AS VARCHAR) AS q
        FROM orders
    ),
    quarters AS (SELECT DISTINCT q FROM monthly)
    SELECT qq.q,
           (SELECT COUNT(DISTINCT o_custkey) FROM orders o
            WHERE CAST(strftime(o.o_orderdate, '%Y') AS VARCHAR) || '-Q'
                  || CAST((CAST(strftime(o.o_orderdate, '%m') AS INT) + 2) // 3
                          AS VARCHAR) = qq.q)
               AS exact_custs,
           TRUE AS union_within_rsd
    FROM quarters qq
    """,
    tags=("agg", "approx", "sketch", "mergeable"),
)
def agg_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY — the property that makes sketches the
    100 TB answer: per-MONTH HLL sketches (Datasketches binary,
    ``hll_sketch_agg``) are built once, then QUARTER distinct-customer
    counts come from ``hll_union_agg`` over the stored monthly
    sketches — no second scan of the fact, which is exactly how a
    serving tier answers "distincts at any rollup level" from
    pre-aggregated sketch columns (re-aggregating raw data per level
    is the thing sketches exist to avoid; a plain COUNT DISTINCT
    cannot roll up).

    Approximate estimates can't hash-match, so the emitted result is
    the exact quarterly distinct plus a Spark-computed boolean that
    the UNIONED estimate lands within 5×rsd of exact; the oracle
    recomputes exact and expects literal TRUE (the
    `agg_approx_sketches` verification pattern)."""
    orders = t(spark, sf_dir, "orders")
    monthly = (
        orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("m"),
            F.concat(
                F.date_format("o_orderdate", "yyyy"),
                F.lit("-Q"),
                ((F.month("o_orderdate") + 2) / 3).cast("int").cast("string"),
            ).alias("q"),
            "o_custkey",
        )
        .groupBy("m", "q")
        .agg(F.hll_sketch_agg("o_custkey", 14).alias("sk"))
    )
    quarterly = monthly.groupBy("q").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_union_est")
    )
    exact = (
        orders.select(
            F.concat(
                F.date_format("o_orderdate", "yyyy"),
                F.lit("-Q"),
                ((F.month("o_orderdate") + 2) / 3).cast("int").cast("string"),
            ).alias("q"),
            "o_custkey",
        )
        .groupBy("q")
        .agg(F.countDistinct("o_custkey").alias("exact_custs"))
    )
    # lgK=14 → rsd ≈ 1.04/sqrt(2^14) ≈ 0.81%; assert within 5×rsd
    return quarterly.join(exact, "q").select(
        "q",
        "exact_custs",
        (
            F.abs(F.col("_union_est") - F.col("exact_custs"))
            <= F.lit(5 * 0.0082) * F.col("exact_custs") + F.lit(1.0)
        ).alias("union_within_rsd"),
    )


@query(
    "agg_kll_merge_rollup",
    oracle="""
    WITH q AS (
        SELECT CAST(strftime(o_orderdate, '%Y') AS VARCHAR) || '-Q'
               || CAST((CAST(strftime(o_orderdate, '%m') AS INT) + 2) // 3
                       AS VARCHAR) AS q,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    )
    SELECT q, COUNT(*) AS n_orders,
           TRUE AS p50_within_rank_eps,
           TRUE AS p95_within_rank_eps
    FROM q GROUP BY q
    """,
    tags=("agg", "approx", "sketch", "mergeable", "quantile"),
)
def agg_kll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch MERGEABILITY — the KLL twin of
    `agg_hll_union_rollup`: per-MONTH KLL sketches of the order value
    (Datasketches ``kll_sketch_agg_bigint`` over exact integer cents)
    are built once; QUARTER p50/p95 come from ``kll_merge_agg_bigint``
    over the stored monthly sketches — no second scan of the fact.
    This is how a serving tier answers "any percentile at any rollup
    level" from pre-aggregated sketch columns; exact percentile
    cannot roll up (it buffers raw values), which is the entire point
    of the sketch.

    Verification (the `agg_approx_sketches` pattern): KLL guarantees
    RANK error ≤ ε, so each merged-estimate quantile must lie between
    the EXACT quantiles at rank p±2ε (ε ≈ 1.65% at k=200; brackets
    computed with Spark's exact `percentile` on the same cents). The
    emitted booleans must be literal TRUE; the oracle recomputes the
    group keys/counts and expects TRUE."""
    orders = t(spark, sf_dir, "orders").select(
        F.concat(
            F.date_format("o_orderdate", "yyyy"),
            F.lit("-Q"),
            ((F.month("o_orderdate") + 2) / 3).cast("int").cast("string"),
        ).alias("q"),
        F.date_format("o_orderdate", "yyyy-MM").alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    monthly = orders.groupBy("q", "m").agg(
        F.kll_sketch_agg_bigint("cents").alias("sk")
    )
    merged = monthly.groupBy("q").agg(
        F.kll_sketch_get_quantile_bigint(
            F.kll_merge_agg_bigint("sk"), F.lit(0.5)
        ).alias("_p50_est"),
        F.kll_sketch_get_quantile_bigint(
            F.kll_merge_agg_bigint("sk"), F.lit(0.95)
        ).alias("_p95_est"),
    )
    eps = 0.0165 * 2  # 2× the k=200 single-sketch rank error
    exact = orders.groupBy("q").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(f"percentile(cents, {0.5 - eps})").alias("_p50_lo"),
        F.expr(f"percentile(cents, {0.5 + eps})").alias("_p50_hi"),
        F.expr(f"percentile(cents, {0.95 - eps})").alias("_p95_lo"),
        F.expr(f"percentile(cents, {min(0.95 + eps, 1.0)})").alias("_p95_hi"),
    )
    return merged.join(exact, "q").select(
        "q",
        "n_orders",
        (
            (F.col("_p50_est") >= F.col("_p50_lo"))
            & (F.col("_p50_est") <= F.col("_p50_hi"))
        ).alias("p50_within_rank_eps"),
        (
            (F.col("_p95_est") >= F.col("_p95_lo"))
            & (F.col("_p95_est") <= F.col("_p95_hi"))
        ).alias("p95_within_rank_eps"),
    )


@query(
    "agg_theta_set_ops",
    oracle="""
    WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE strftime(o_orderdate, '%Y') = '1996'),
    y97 AS (SELECT DISTINCT o_custkey FROM orders
            WHERE strftime(o_orderdate, '%Y') = '1997'),
    m AS (
        SELECT (SELECT COUNT(*) FROM y96) AS n96,
               (SELECT COUNT(*) FROM y97) AS n97,
               (SELECT COUNT(*) FROM y96 JOIN y97 USING (o_custkey)) AS n_both
    )
    SELECT n96 AS exact_1996, n97 AS exact_1997, n_both AS exact_both,
           TRUE AS union_within_rsd, TRUE AS intersect_within_err
    FROM m
    """,
    tags=("agg", "approx", "sketch", "set-ops", "bounded-nlj"),
)
def agg_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA — the capability HLL lacks: theta
    sketches support INTERSECTION (and difference) estimates, so
    "customers active in 1996 AND 1997" is answerable from two stored
    per-year sketches without re-scanning either year — the retention
    /overlap question every serving tier gets, at sketch cost.

    Built per year with ``theta_sketch_agg``, combined with
    ``theta_union`` / ``theta_intersection``. Union error follows the
    HLL-style rsd; intersection error is looser (it scales with the
    union size, not the intersection — the known theta caveat), so
    its bound is |est − exact| ≤ 5·rsd·|union| + 1. Booleans must be
    literal TRUE; the oracle recomputes the exact set sizes."""
    orders = t(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy").alias("y"), "o_custkey"
    )
    sk = (
        orders.filter(F.col("y").isin("1996", "1997"))
        .groupBy("y")
        .agg(F.theta_sketch_agg("o_custkey").alias("sk"))
    )
    both = sk.groupBy().pivot("y", ["1996", "1997"]).agg(F.first("sk"))
    est = both.select(
        F.theta_sketch_estimate(F.col("`1996`")).alias("_e96"),
        F.theta_sketch_estimate(F.col("`1997`")).alias("_e97"),
        F.theta_sketch_estimate(
            F.theta_union(F.col("`1996`"), F.col("`1997`"))
        ).alias("_eu"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("`1996`"), F.col("`1997`"))
        ).alias("_ei"),
    )
    y96 = orders.filter(F.col("y") == "1996").select("o_custkey").distinct()
    y97 = orders.filter(F.col("y") == "1997").select("o_custkey").distinct()
    exact = (
        y96.agg(F.count(F.lit(1)).alias("exact_1996"))
        .crossJoin(y97.agg(F.count(F.lit(1)).alias("exact_1997")))
        .crossJoin(
            y96.join(y97, "o_custkey").agg(F.count(F.lit(1)).alias("exact_both"))
        )
        .crossJoin(
            y96.unionByName(y97).distinct().agg(
                F.count(F.lit(1)).alias("_exact_union")
            )
        )
    )
    return est.crossJoin(exact).select(
        "exact_1996",
        "exact_1997",
        "exact_both",
        (
            F.abs(F.col("_eu") - F.col("_exact_union"))
            <= F.lit(5 * 0.016) * F.col("_exact_union") + F.lit(1.0)
        ).alias("union_within_rsd"),
        (
            F.abs(F.col("_ei") - F.col("exact_both"))
            <= F.lit(5 * 0.016) * F.col("_exact_union") + F.lit(1.0)
        ).alias("intersect_within_err"),
    )


# -- exact-distinct bitmap rollup (the Doris BITMAP type pattern) -----------

#: 63 usable bits per signed-int64 word (bit 63 would need an
#: unsupported `1 << 63` on the oracle side — same bound as the
#: portable Bloom filter).
_BM_WORD_BITS = 63


@query(
    "agg_bitmap_distinct_rollup",
    oracle="""
    WITH wk AS (
        SELECT user_id,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
                   AS week
        FROM events
    ),
    weekly AS (
        SELECT week, COUNT(DISTINCT user_id) AS n_distinct
        FROM wk GROUP BY week
    ),
    total AS (
        SELECT CAST(-1 AS BIGINT) AS week,
               COUNT(DISTINCT user_id) AS n_distinct
        FROM wk
    )
    SELECT week, CAST(n_distinct AS BIGINT) AS n_distinct FROM weekly
    UNION ALL
    SELECT week, CAST(n_distinct AS BIGINT) FROM total
    """,
    tags=("agg", "sketch", "bitmap", "mergeable"),
)
def agg_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via integer bitmaps — the Doris BITMAP
    column type's pattern (precomputed exact distincts that stay
    exact under rollup, where HLL only stays approximate): each week
    folds its users into sparse (week, word) 63-bit bitmap rows by
    bit_or; weekly distinct = Σ bit_count(word), and the Jan-total
    re-aggregates the STORED weekly bitmaps (word-wise OR — set
    union) without ever touching the fact again. The oracle computes
    both levels with native COUNT(DISTINCT), so this differential
    verifies the bitmap implementation against an independent one —
    not bit-math against itself.

    Scale posture: the map-side bit_or partial collapses each
    partition to ≤ ⌈|id-domain|/63⌉ words before the exchange —
    the same one-small-frame-out-at-any-scale contract as the Bloom/
    CMS/HLL rows; the rollup merge is keyed on word index (bounded).
    Dense surrogate ids are the precondition (the Doris deployment
    pattern: dictionary-encode first); sparse domains want roaring
    containers, same algebra."""
    events = t(spark, sf_dir, "events")
    wk = events.select(
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            / 7
        )
        .cast("bigint")
        .alias("week"),
        "user_id",
    )
    words = wk.groupBy(
        "week", F.expr(f"user_id div {_BM_WORD_BITS}").alias("w_idx")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(cast(1 as bigint),"
            f" cast(user_id % {_BM_WORD_BITS} as int)))"
        ).alias("bits")
    )
    words = words.localCheckpoint(eager=False)  # weekly + total rollup
    weekly = words.groupBy("week").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct")
    )
    total = (
        words.groupBy("w_idx")
        .agg(F.expr("bit_or(bits)").alias("bits"))
        .agg(F.sum(F.bit_count("bits")).cast("bigint").alias("n_distinct"))
        .select(F.lit(-1).cast("bigint").alias("week"), "n_distinct")
    )
    return weekly.select("week", "n_distinct").unionByName(total)


# -- A/B experiment readout (Welch's t) -------------------------------------


@query(
    "agg_ab_ttest",
    oracle="""
    WITH v AS (
        SELECT event_type, user_id % 2 AS variant,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    g AS (
        SELECT event_type,
               COUNT(*) FILTER (variant = 0) AS n_a,
               COUNT(*) FILTER (variant = 1) AS n_b,
               SUM(cents) FILTER (variant = 0) AS s1_a,
               SUM(cents) FILTER (variant = 1) AS s1_b,
               SUM(cents * cents) FILTER (variant = 0) AS s2_a,
               SUM(cents * cents) FILTER (variant = 1) AS s2_b
        FROM v GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(s1_a AS DOUBLE) / n_a AS mean_a_cents,
           CAST(s1_b AS DOUBLE) / n_b AS mean_b_cents,
           (CAST(s1_a AS DOUBLE) / n_a - CAST(s1_b AS DOUBLE) / n_b)
             / sqrt(
                 (CAST(n_a * s2_a - s1_a * s1_a AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * (n_a - 1))) / n_a
               + (CAST(n_b * s2_b - s1_b * s1_b AS DOUBLE)
                     / (CAST(n_b AS DOUBLE) * (n_b - 1))) / n_b
             ) AS t_stat
    FROM g
    """,
    tags=("agg", "analytics", "experiment"),
)
def agg_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: Welch's t-statistic per event type
    between variants A/B (user_id parity as the deterministic
    assignment) — the two-sample significance primitive behind any
    experimentation platform's scorecard.

    Exactness: per-variant counts, Σcents and Σcents² fold as EXACT
    integers (one conditional hash-agg, no join); means, Welch
    variances ((n·Σx² − (Σx)²)/(n·(n−1))) and the final t are then a
    fixed chain of IEEE ops (−, /, +, sqrt — all correctly rounded)
    over those identical integer-valued doubles, so both engines
    produce the same bits. Σx² in int64 bounds the corpus at ~10^12
    cent-squared units — beyond that, lift s2 into decimal(38,0).

    Scale posture: one map-side-combined groupBy on event_type;
    |event types| rows out at any corpus size."""
    events = t(spark, sf_dir, "events")
    v = events.select(
        "event_type",
        (F.col("user_id") % 2).alias("variant"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )

    def _f(expr: str, variant: int):
        return F.expr(
            f"sum(case when variant = {variant} then {expr} else 0 end)"
        )

    g = v.groupBy("event_type").agg(
        _f("1", 0).cast("bigint").alias("n_a"),
        _f("1", 1).cast("bigint").alias("n_b"),
        _f("cents", 0).alias("s1_a"),
        _f("cents", 1).alias("s1_b"),
        _f("cents * cents", 0).alias("s2_a"),
        _f("cents * cents", 1).alias("s2_b"),
    )
    mean_a = F.expr("cast(s1_a as double) / n_a")
    mean_b = F.expr("cast(s1_b as double) / n_b")
    var_a = F.expr(
        "cast(n_a * s2_a - s1_a * s1_a as double)"
        " / (cast(n_a as double) * (n_a - 1))"
    )
    var_b = F.expr(
        "cast(n_b * s2_b - s1_b * s1_b as double)"
        " / (cast(n_b as double) * (n_b - 1))"
    )
    return g.select(
        "event_type",
        "n_a",
        "n_b",
        mean_a.alias("mean_a_cents"),
        mean_b.alias("mean_b_cents"),
        (
            (mean_a - mean_b)
            / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
        ).alias("t_stat"),
    )


@query(
    "agg_unpivot_melt",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_linestatus = 'O'
                             THEN CAST(l_quantity AS DECIMAL(18,2)) END)
                    AS DOUBLE) AS qty_open,
               CAST(SUM(CASE WHEN l_linestatus = 'F'
                             THEN CAST(l_quantity AS DECIMAL(18,2)) END)
                    AS DOUBLE) AS qty_filled
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty_open' AS metric, qty_open AS qty FROM wide
    WHERE qty_open IS NOT NULL
    UNION ALL
    SELECT l_returnflag, 'qty_filled', qty_filled FROM wide
    WHERE qty_filled IS NOT NULL
    """,
    tags=("agg", "unpivot"),
)
def agg_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of `agg_pivot`: the pivoted wide
    table folds back to (key, metric, value) long form via the native
    ``unpivot``/``melt`` API (SQL ``UNPIVOT``), the shape feeding
    metric stores and chart tools. Default semantics drop NULL cells
    (both engines here state it explicitly).

    Scale posture: unpivot is a zero-shuffle per-row flatMap — k
    output rows per input row, no exchange; the only shuffle is the
    upstream pivot aggregate it inverts. Decimal sums keep the
    round-trip bit-stable."""
    li = t(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_open"),
            F.col("F").alias("qty_filled"),
        )
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_open", "qty_filled"],
        variableColumnName="metric",
        valueColumnName="qty",
    ).filter(F.col("qty").isNotNull())


@query(
    "part_revenue_abc",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(rev_cents) AS total_cents FROM rev),
    ranked AS (
        SELECT rev_cents,
               SUM(rev_cents) OVER (
                   ORDER BY rev_cents DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_cents
        FROM rev
    ),
    classed AS (
        SELECT rev_cents,
               CASE WHEN 100 * cum_cents <= 80 * t.total_cents THEN 'A'
                    WHEN 100 * cum_cents <= 95 * t.total_cents THEN 'B'
                    ELSE 'C' END AS abc_class,
               t.total_cents
        FROM ranked CROSS JOIN tot t
    )
    SELECT abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(rev_cents) AS BIGINT) AS class_rev_cents,
           CAST(10000 * SUM(rev_cents) // MAX(total_cents) AS BIGINT)
               AS revenue_share_bps
    FROM classed GROUP BY abc_class
    """,
    tags=("agg", "analytics", "pareto", "bounded-nlj"),
)
def part_revenue_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: parts ranked by revenue,
    class A = items covering the first 80% of cumulative revenue,
    B = next 15%, C = the tail — the assortment-analysis primitive
    ("which 20% of SKUs earn 80%"). Revenue folds as exact decimal →
    integer cents; class boundaries compare CROSS-MULTIPLIED integers
    (100·cum ≤ 80·total), so no float midpoint can flip a boundary
    part between engines.

    Scale posture: the fact-sized work is ONE map-side-combined hash
    aggregate (lineitem → per-part revenue); the cumulative share is
    then computed over the |catalog|-sized rollup by the DISTRIBUTED
    prefix-sum in `_util.ranked_prefix` (range-repartition +
    pid-local window + broadcast partition offsets) — a 100 TB corpus
    catalog is 10⁷–10⁸ parts, and an unpartitioned WindowExec over
    that rollup would be a one-task bottleneck (the r9 verdict's
    finding; the plan-lint rule in tests/test_plan_lint.py now guards
    it). The 1-row total and the |n_parts|² offsets theta-join
    broadcast (tagged bounded-nlj)."""
    li = t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_partkey")
        .agg(
            (F.sum(dec("l_extendedprice")) * 100)
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    rev = rev.localCheckpoint(eager=False)  # total + ranking
    tot = rev.agg(F.sum("rev_cents").alias("total_cents"))
    ranked = ranked_prefix(
        rev, [F.col("rev_cents").desc(), F.col("l_partkey")], "rev_cents"
    ).select("rev_cents", F.col("cum").alias("cum_cents"))
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "rev_cents",
        "total_cents",
        F.when(
            100 * F.col("cum_cents") <= 80 * F.col("total_cents"), "A"
        )
        .when(100 * F.col("cum_cents") <= 95 * F.col("total_cents"), "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("rev_cents").cast("bigint").alias("class_rev_cents"),
        F.expr(
            "cast(10000 * sum(rev_cents) div max(total_cents) as bigint)"
        ).alias("revenue_share_bps"),
    )


@query(
    "agg_winsorized_stats",
    oracle="""
    WITH v AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    th AS (
        SELECT event_type,
               CAST(FLOOR(quantile_cont(cents, 0.01)) AS BIGINT) AS p01,
               CAST(FLOOR(quantile_cont(cents, 0.99)) AS BIGINT) AS p99
        FROM v GROUP BY event_type
    ),
    capped AS (
        SELECT v.event_type,
               v.cents,
               GREATEST(LEAST(v.cents, th.p99), th.p01) AS w_cents,
               th.p01, th.p99
        FROM v JOIN th ON th.event_type = v.event_type
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS raw_mean_cents,
           CAST(SUM(w_cents) AS DOUBLE) / COUNT(*) AS winsor_mean_cents,
           CAST(SUM(CASE WHEN cents > p99 OR cents < p01
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_capped
    FROM capped
    GROUP BY event_type
    """,
    tags=("agg", "robust", "analytics"),
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust means per event type — the outlier-capping
    twin of `agg_anomaly_mad`'s outlier-FLAGGING: values clamp to the
    per-group [p01, p99] band before averaging, so one fat-finger
    event can't drag a metric (the standard robust-KPI move).

    Exactness: cents are exact integers; the percentile thresholds
    interpolate integers identically on both engines and are then
    FLOORED to integer cents — clamping against a fractional double
    would need a double→bigint re-quantization, which ROUNDS on
    DuckDB but TRUNCATES on Spark (the known cast trap, measured here
    at the 7th decimal of the mean). Integer thresholds keep the
    whole clamp-and-sum in exact bigints; final means are one IEEE
    division each.

    Scale posture: thresholds are a |groups|-sized aggregate joined
    back (AQE broadcasts it); both passes are map-side-combined hash
    aggs — the two-pass shape every percentile-capped metric needs
    (percentile_approx replaces pass one beyond the exact regime)."""
    events = t(spark, sf_dir, "events")
    v = events.select(
        "event_type", F.expr("cast(round(value * 100) as bigint)").alias("cents")
    )
    th = v.groupBy("event_type").agg(
        F.expr("cast(floor(percentile(cents, 0.01)) as bigint)").alias("p01"),
        F.expr("cast(floor(percentile(cents, 0.99)) as bigint)").alias("p99"),
    )
    capped = v.join(F.broadcast(th), "event_type").select(
        "event_type",
        "cents",
        "p01",
        "p99",
        F.expr("greatest(least(cents, p99), p01)").alias("w_cents"),
    )
    return capped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("cast(sum(cents) as double) / count(1)").alias(
            "raw_mean_cents"
        ),
        F.expr("cast(sum(w_cents) as double) / count(1)").alias(
            "winsor_mean_cents"
        ),
        F.sum(
            F.when(
                (F.col("cents") > F.col("p99"))
                | (F.col("cents") < F.col("p01")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_capped"),
    )


@query(
    "agg_gini_concentration",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
                    AS BIGINT) AS rev_cents
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT rev_cents,
               ROW_NUMBER() OVER (ORDER BY rev_cents, l_partkey) AS i,
               COUNT(*) OVER () AS n,
               SUM(rev_cents) OVER () AS total
        FROM rev
    ),
    g AS (
        SELECT MAX(n) AS n, MAX(total) AS total,
               SUM(i * rev_cents) AS weighted
        FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_parts,
           CAST(total AS BIGINT) AS total_cents,
           (2.0 * CAST(weighted AS DOUBLE)
            - CAST(n + 1 AS DOUBLE) * CAST(total AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)) AS gini
    FROM g
    """,
    tags=("agg", "analytics", "concentration", "bounded-nlj"),
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across parts — the
    scalar companion to `part_revenue_abc`'s class table (assortment
    inequality as one monitorable number; 0 = uniform, →1 = winner
    takes all). Computed by the rank formula
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over ascending-sorted
    revenues: the folds (Σx, Σ i·x) are exact integer cents, the
    final ratio is a FIXED chain of IEEE ops over them (the
    `agg_ab_ttest` pattern) — int64→double conversion is
    value-determined round-to-nearest on both engines, so identical
    integers give identical doubles give an identical ratio. An
    integer basis-point form was tried first and caught OVERFLOWING
    at sf1 by the scale proof (Σ i·x alone reaches ~2^61.6 there; a
    ×10000 on top cannot fit, and split-division can't rescue a
    modulus that large) — the loud ANSI SparkArithmeticException is
    exactly why the proof runs at 10× data.

    Scale posture: the fact-sized work is the same single hash
    aggregate as ABC; the rank over the |catalog|-sized rollup is the
    DISTRIBUTED `_util.ranked_prefix` (range-repartition + pid-local
    window + broadcast partition offsets — no single-partition
    WindowExec; r9 verdict finding, now lint-guarded). Integer bound
    on the folds themselves: Σ i·x < 2^63 holds to ~3× this sf1's
    catalog·mass; beyond, fold in dollars instead of cents."""
    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        (F.sum(dec("l_extendedprice")) * 100).cast("bigint").alias("rev_cents")
    )
    ranked = ranked_prefix(
        rev, [F.col("rev_cents"), F.col("l_partkey")], "rev_cents"
    ).select("rev_cents", "i")
    g = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev_cents").alias("total"),
        F.sum(F.col("i") * F.col("rev_cents")).alias("weighted"),
    )
    return g.select(
        F.col("n").cast("bigint").alias("n_parts"),
        F.col("total").cast("bigint").alias("total_cents"),
        F.expr(
            "(2.0 * cast(weighted as double)"
            " - cast(n + 1 as double) * cast(total as double))"
            " / (cast(n as double) * cast(total as double))"
        ).alias("gini"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH g AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT l_returnflag, price_cents, w,
               SUM(w) OVER (
                   PARTITION BY l_returnflag ORDER BY price_cents
                   ROWS UNBOUNDED PRECEDING
               ) AS cumw,
               SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        FROM g
    )
    SELECT l_returnflag,
           MIN(price_cents) AS wmedian_cents,
           CAST(MAX(tot) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cumw >= tot GROUP BY 1
    """,
    tags=("agg", "window", "percentile"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (lower): smallest extended price v per return
    flag such that the quantity-weighted mass at or below v reaches
    half the group's total — the robust central-price statistic
    ``agg_percentile_exact`` (unweighted) doesn't cover, and one no
    built-in aggregate computes. Integer-exact end to end: prices as
    cents, quantities as integer weights, the half-mass predicate
    cross-multiplied (``2*cumw >= tot``), never a float division.

    Scale posture: the pre-aggregation on (flag, price) collapses the
    fact table to the distinct-value grid BEFORE any window — the
    cumulative sum then runs over |distinct prices| rows per flag,
    partitioned on the group key (no global window), and the final
    min-per-flag reuses the same partitioning. One fact-sized
    shuffle + one grid-sized window, the same shape at any SF."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias(
            "price_cents"
        ),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    # spread on the groupBy's own key subset (guide SS2.4 "two
    # operations keyed the same way share one exchange"): the
    # single-file scan otherwise runs the fact-sized partial aggregate
    # on ONE task (0.75 s of the sf0.1 wall); hashing on the exact
    # groupBy keys moves the aggregate onto all cores without adding
    # an exchange the plan didn't already need. No-op on a real
    # many-file corpus (spread's gate).
    li = spread(li, "l_returnflag", "price_cents")
    g = li.groupBy("l_returnflag", "price_cents").agg(
        F.sum("q").alias("w")
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "price_cents",
        F.sum("w").over(wcum).alias("cumw"),
        F.sum("w").over(wall).alias("tot"),
    )
    return (
        c.filter(F.lit(2) * F.col("cumw") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(
            F.min("price_cents").alias("wmedian_cents"),
            F.max("tot").alias("total_weight"),
        )
    )
