"""Scalar-function surface (SURVEY.md §2.8): one registered query per
family — string, date/time, math, array + higher-order, map, JSON,
null/misc — each oracle-checked against DuckDB.

The reference platform assumes this dialect exists in the engine it
provisions (its own auth query uses ``MD5(CONCAT(...))``,
``internal/controller/kyuubi.go:63``); everything here is the
engine-native equivalent.

All of these are per-row projections — embarrassingly parallel,
inside whole-stage codegen, scan-speed at any scale. The interesting
work is cross-engine determinism:

- date outputs are cast to TIMESTAMP (date-object representations
  differ between pandas conversions);
- transcendentals (exp/ln/trig) are rounded to 6 dp — libm
  implementations differ in the last ulp;
- array results with engine-defined order (``array_union`` /
  ``list_distinct``) are sorted before joining to a string;
- DuckDB's map access returns a single-element list → unwrapped with
  ``[1]``; Spark's ``element_at`` returns the scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import spread, t
from nineinfra_spark.plans.registry import query


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           c_name || '#' || c_mktsegment AS cat,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS cat_ws,
           upper(c_name) AS up, lower(c_mktsegment) AS lo,
           substr(c_name, 1, 8) AS sub8,
           length(c_name) AS len,
           trim('  ' || c_name || ' ') AS trimmed,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS padded,
           rpad(c_mktsegment, 12, '.') AS rpadded,
           strpos(c_name, '0') AS pos0,
           repeat(substr(c_mktsegment, 1, 2), 2) AS rep2,
           reverse(c_mktsegment) AS rev,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS vowlow,
           regexp_extract(c_name, '[0-9]+') AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           printf('%s|%05d', c_mktsegment, c_custkey) AS fmt,
           md5(c_name) AS h_md5,
           sha256(c_name) AS h_sha,
           to_base64(encode(c_mktsegment)) AS b64,
           c_name LIKE '%1%' AS has1,
           regexp_matches(c_name, '^Customer') AS is_cust
    FROM customer
    """,
    tags=("functions", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family incl. the md5/concat dialect the
    reference's own auth query assumes (kyuubi.go:63)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat("c_name", F.lit("#"), "c_mktsegment").alias("cat"),
        F.concat_ws("-", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("cat_ws"),
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.length("c_name").alias("len"),
        F.trim(F.concat(F.lit("  "), "c_name", F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("padded"),
        F.rpad("c_mktsegment", 12, ".").alias("rpadded"),
        F.instr("c_name", "0").alias("pos0"),
        F.repeat(F.substring("c_mktsegment", 1, 2), 2).alias("rep2"),
        F.reverse("c_mktsegment").alias("rev"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("vowlow"),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "#").alias("masked"),
        F.format_string("%s|%05d", "c_mktsegment", "c_custkey").alias("fmt"),
        F.md5("c_name").alias("h_md5"),
        F.sha2("c_name", 256).alias("h_sha"),
        F.base64(F.encode("c_mktsegment", "UTF-8")).alias("b64"),
        F.col("c_name").like("%1%").alias("has1"),
        F.col("c_name").rlike("^Customer").alias("is_cust"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y, quarter(o_orderdate) AS q,
           month(o_orderdate) AS m, day(o_orderdate) AS d,
           dayofweek(o_orderdate) + 1 AS dow,
           weekofyear(o_orderdate) AS woy,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS plus30d,
           CAST(o_orderdate - INTERVAL 7 DAY AS TIMESTAMP) AS minus7d,
           CAST(o_orderdate + INTERVAL 2 MONTH AS TIMESTAMP) AS plus2m,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS mend,
           datediff('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS days_to_end,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders
    """,
    tags=("functions", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. Session timezone is UTC (engine default) so
    epoch seconds agree with DuckDB's tz-free arithmetic; all date
    results are cast to timestamp for a stable cross-engine type."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.dayofweek(d).alias("dow"),
        F.weekofyear(d).alias("woy"),
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("plus30d"),
        F.date_sub(d.cast("date"), 7).cast("timestamp").alias("minus7d"),
        F.add_months(d.cast("date"), 2).cast("timestamp").alias("plus2m"),
        F.date_trunc("month", d).cast("timestamp").alias("mstart"),
        F.last_day(d.cast("date")).cast("timestamp").alias("mend"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date")).alias("days_to_end"),
        F.unix_timestamp(d).alias("unix_ts"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS absd,
           CAST(ceil(l_quantity) AS BIGINT) AS cq,
           CAST(floor(l_quantity) AS BIGINT) AS fq,
           CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * 100, 0) AS BIGINT) AS cents,
           sqrt(l_quantity) AS sq,
           round(exp(l_discount), 6) AS e_d,
           round(ln(l_quantity + 1), 6) AS ln_q,
           round(log10(l_extendedprice), 6) AS lg_p,
           l_quantity * l_quantity AS q2,
           CAST(sign(l_discount - 0.05) AS INT) AS sgn,
           greatest(l_quantity, l_tax * 100) AS gr,
           least(l_quantity, l_tax * 100) AS le,
           CAST(l_orderkey % 7 AS BIGINT) AS m7,
           ((CAST(l_orderkey AS BIGINT) - 3) % 7 + 7) % 7 AS pm7,
           round(sin(l_discount), 6) AS sin_d,
           round(atan2(l_tax, l_discount + 0.001), 6) AS at2
    FROM lineitem
    """,
    tags=("functions", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. Exact ops (abs/ceil/floor/sqrt/sign/mod) compare
    raw; transcendentals round to 6 dp (libm ulp differences)."""
    li = spread(t(spark, sf_dir, "lineitem"), "l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("absd"),
        F.ceil("l_quantity").alias("cq"),
        F.floor("l_quantity").alias("fq"),
        F.round(F.col("l_extendedprice").cast("decimal(18,2)") * 100, 0)
        .cast("long")
        .alias("cents"),
        F.sqrt("l_quantity").alias("sq"),
        F.round(F.exp("l_discount"), 6).alias("e_d"),
        F.round(F.log(F.col("l_quantity") + 1), 6).alias("ln_q"),
        F.round(F.log10("l_extendedprice"), 6).alias("lg_p"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("q2"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sgn"),
        F.greatest("l_quantity", F.col("l_tax") * 100).alias("gr"),
        F.least("l_quantity", F.col("l_tax") * 100).alias("le"),
        (F.col("l_orderkey") % 7).cast("long").alias("m7"),
        F.pmod(F.col("l_orderkey").cast("long") - 3, F.lit(7)).alias("pm7"),
        F.round(F.sin("l_discount"), 6).alias("sin_d"),
        F.round(F.atan2("l_tax", F.col("l_discount") + 0.001), 6).alias("at2"),
    )


@query(
    "fn_array",
    oracle="""
    WITH a AS (
        SELECT o_orderkey,
               generate_series(1, CAST(o_orderkey % 5 + 2 AS INT)) AS seq
        FROM orders
    )
    SELECT o_orderkey,
           len(seq) AS n,
           array_to_string(seq, ',') AS joined,
           array_to_string(list_transform(seq, x -> x * x), ',') AS squares,
           array_to_string(list_filter(seq, x -> x % 2 = 0), ',') AS evens,
           CAST(list_aggregate(seq, 'sum') AS BIGINT) AS total,
           len(list_filter(seq, x -> x > 3)) > 0 AS any_gt3,
           len(list_filter(seq, x -> x > 0)) = len(seq) AS all_pos,
           seq[2] AS second,
           list_contains(seq, 4) AS has4,
           list_position(seq, 3) AS pos3,
           array_to_string(list_sort(list_distinct(list_concat(seq, [2, 9]))), ',') AS uni,
           array_to_string(list_slice(seq, 2, 3), ',') AS mid,
           array_to_string(list_reverse_sort(seq), ',') AS descsort
    FROM a
    """,
    tags=("functions", "array", "hof"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order-function family: transform/filter/
    aggregate/exists/forall plus set-ish ops. Engine-defined orderings
    (array_union) are sorted before string-joining; Spark slice(start,
    length) is mapped onto DuckDB's inclusive list_slice."""
    o = t(spark, sf_dir, "orders")
    a = o.select(
        "o_orderkey",
        F.sequence(F.lit(1), (F.col("o_orderkey") % 5 + 2).cast("int")).alias("seq"),
    )
    return a.select(
        "o_orderkey",
        F.size("seq").alias("n"),
        F.array_join("seq", ",").alias("joined"),
        F.array_join(F.expr("transform(seq, x -> x * x)"), ",").alias("squares"),
        F.array_join(F.expr("filter(seq, x -> x % 2 = 0)"), ",").alias("evens"),
        F.expr("aggregate(seq, 0L, (acc, x) -> acc + x)").alias("total"),
        F.expr("exists(seq, x -> x > 3)").alias("any_gt3"),
        F.expr("forall(seq, x -> x > 0)").alias("all_pos"),
        F.element_at("seq", 2).alias("second"),
        F.array_contains("seq", 4).alias("has4"),
        F.expr("array_position(seq, 3)").alias("pos3"),
        F.array_join(
            F.sort_array(F.array_union("seq", F.array(F.lit(2), F.lit(9)))), ","
        ).alias("uni"),
        F.array_join(F.slice("seq", 2, 2), ",").alias("mid"),
        F.array_join(F.sort_array("seq", asc=False), ",").alias("descsort"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           (m['type'])[1] AS ev_type,
           (m['uid'])[1] AS uid_str,
           cardinality(m) AS n_keys,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
           list_contains(map_keys(m), 'type') AS has_type
    FROM (
        SELECT event_id,
               map(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]) AS m
        FROM events
    )
    """,
    tags=("functions", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: construction, lookup, keys, cardinality. DuckDB map
    lookup yields a 1-element list → unwrapped with [1]; Spark's
    element_at returns the scalar directly."""
    e = t(spark, sf_dir, "events")
    m = e.select(
        "event_id",
        F.create_map(
            F.lit("type"), "event_type", F.lit("uid"), F.col("user_id").cast("string")
        ).alias("m"),
    )
    return m.select(
        "event_id",
        F.element_at("m", "type").alias("ev_type"),
        F.element_at("m", "uid").alias("uid_str"),
        F.size("m").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys("m")), ",").alias("keys_sorted"),
        F.array_contains(F.map_keys("m"), "type").alias("has_type"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_int,
           to_json({'id': event_id, 'et': event_type}) AS packed
    FROM events
    """,
    tags=("functions", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: path extraction (string + typed) and struct →
    JSON serialization (both engines emit compact JSON)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k BIGINT").getField("k").alias("k_int"),
        F.to_json(
            F.struct(F.col("event_id").alias("id"), F.col("event_type").alias("et"))
        ).alias("packed"),
    )


@query(
    "fn_null_misc",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           nullif(c_nationkey, 0) AS nk_nz,
           ifnull(nullif(c_nationkey, 0), -1) AS nk_nvl,
           nullif(c_nationkey, 0) IS NULL AS was_zero,
           isnan(CASE WHEN c_nationkey = 0 THEN CAST('NaN' AS DOUBLE)
                      ELSE CAST(c_acctbal AS DOUBLE) END) AS nan_chk,
           CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal = 0 THEN 'zero'
                ELSE 'pos' END AS bal_sign,
           least(c_nationkey, 10) IS NOT NULL AS nn
    FROM customer
    """,
    tags=("functions", "null"),
)
def fn_null_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: coalesce/nullif/nvl/isnull/isnan and
    CASE. (hash/xxhash64/crc32 are engine-specific hash functions with
    no DuckDB counterpart — md5/sha2 cover content hashing in
    fn_string.)"""
    c = t(spark, sf_dir, "customer")
    nk_nz = F.nullif(F.col("c_nationkey"), F.lit(0))
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        nk_nz.alias("nk_nz"),
        F.nvl(nk_nz, F.lit(-1)).alias("nk_nvl"),
        F.isnull(nk_nz).alias("was_zero"),
        F.isnan(
            F.when(F.col("c_nationkey") == 0, F.lit(float("nan"))).otherwise(
                F.col("c_acctbal").cast("double")
            )
        ).alias("nan_chk"),
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") == 0, "zero")
        .otherwise("pos")
        .alias("bal_sign"),
        F.least(F.col("c_nationkey"), F.lit(10)).isNotNull().alias("nn"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS b_and,
           o_orderkey | 4096 AS b_or,
           xor(o_orderkey, 129) AS b_xor,
           o_orderkey << 2 AS b_shl,
           o_orderkey >> 3 AS b_shr,
           CAST(bit_count(o_orderkey) AS INTEGER) AS b_pop
    FROM orders WHERE o_orderkey < 2000
    """,
    tags=("function", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: AND/OR/XOR, shifts, popcount — pure JVM
    expressions inside whole-stage codegen, with the filter pushed to
    the scan."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("b_and"),
        F.expr("o_orderkey | 4096").alias("b_or"),
        F.expr("o_orderkey ^ 129").alias("b_xor"),
        F.shiftleft("o_orderkey", 2).alias("b_shl"),
        F.shiftright("o_orderkey", 3).alias("b_shr"),
        F.bit_count("o_orderkey").cast("int").alias("b_pop"),
    )


@query(
    "fn_string_distance",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_brand, 'Brand#23') AS lev_brand,
           levenshtein(p_name, p_brand) AS lev_name_brand,
           CASE WHEN levenshtein(p_brand, 'Brand#23') <= 1 THEN 'near'
                ELSE 'far' END AS brand_band
    FROM part WHERE p_partkey < 500
    """,
    tags=("function", "string", "distance"),
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance family (levenshtein — the one distance both
    engines define identically): fuzzy-match scoring as a pure
    projection. The scale note: edit distance belongs AFTER a
    blocking stage (shared tokens / LSH buckets), never as a join
    predicate — it can't push into a scan or hash-partition."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    lev = F.levenshtein(F.col("p_brand"), F.lit("Brand#23"))
    return p.select(
        "p_partkey",
        lev.alias("lev_brand"),
        F.levenshtein(F.col("p_name"), F.col("p_brand")).alias("lev_name_brand"),
        F.when(lev <= 1, "near").otherwise("far").alias("brand_band"),
    )


def _zorder_oracle() -> str:
    """DuckDB mirror of operators/zorder.zvalue_column over the
    integer pair (user_id, event_id), bits=16: identical IEEE-double
    scaling expression, identical bit interleave."""
    bits, k = 16, 2
    grid = (1 << bits) - 1
    cells = []
    for c in ("user_id", "event_id"):
        cells.append(
            f"GREATEST(0, LEAST({grid}, CAST(FLOOR("
            f"(CAST({c} AS DOUBLE) - lo_{c}) / span_{c} * {grid}) AS BIGINT)))"
        )
    terms = [
        f"((((c{i} >> {b}) & 1)) << {b * k + i})"
        for b in range(bits)
        for i in range(k)
    ]
    return f"""
    WITH stats AS (
        SELECT CAST(MIN(CAST(user_id AS DOUBLE)) AS DOUBLE) AS lo_user_id,
               CAST(MAX(CAST(user_id AS DOUBLE)) - MIN(CAST(user_id AS DOUBLE)) AS DOUBLE) AS span_user_id,
               CAST(MIN(CAST(event_id AS DOUBLE)) AS DOUBLE) AS lo_event_id,
               CAST(MAX(CAST(event_id AS DOUBLE)) - MIN(CAST(event_id AS DOUBLE)) AS DOUBLE) AS span_event_id
        FROM events
    ),
    cells AS (
        SELECT event_id AS eid, {cells[0]} AS c0, {cells[1]} AS c1
        FROM events CROSS JOIN stats
    )
    SELECT eid AS event_id, {' | '.join(terms)} AS z
    FROM cells
    """


@query(
    "fn_zorder_values",
    oracle=_zorder_oracle(),
    tags=("fn", "zorder", "bitwise", "layout"),
)
def fn_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) code computation — the kernel of the
    `operators/zorder.py` layout clustering (lakehouse
    ``OPTIMIZE ... ZORDER BY``): min-max scale each column to a 16-bit
    grid, interleave the bits. Verified bit-for-bit against the oracle
    (IEEE-double scaling is reproducible; everything after is integer
    bit arithmetic). The min/max constants are one tiny driver-side
    aggregate — at 100 TB, a column-pruned scan-speed job that runs
    once per layout rewrite, not per row. The layout payoff (per-file
    min-max envelopes tight on BOTH clustered columns) is asserted in
    tests/test_zorder.py."""
    from nineinfra_spark.operators.zorder import zvalue_column

    ev = t(spark, sf_dir, "events").select("event_id", "user_id")
    return ev.select(
        "event_id", zvalue_column(ev, ["user_id", "event_id"]).alias("z")
    )


LONG_TOK_MIN = 12  # rare-enough length that many docs have none


@query(
    "fn_explode_outer",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                           x -> length(x) >= {LONG_TOK_MIN}) AS toks
        FROM documents
    )
    SELECT doc_id, unnest(toks) AS tok FROM d WHERE len(toks) > 0
    UNION ALL
    SELECT doc_id, NULL AS tok FROM d WHERE len(toks) = 0
    """,
    tags=("fn", "array", "explode-outer"),
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER explode semantics (LATERAL VIEW OUTER): a row whose array
    is empty survives as one (doc_id, NULL) row instead of vanishing —
    the difference between "docs and their long tokens" and "docs
    THAT HAVE long tokens". Plain explode() silently drops empty-array
    rows, which in a curation pipeline turns a per-doc feature join
    into an accidental inner filter; this query pins the preserving
    variant row-for-row (the oracle derives it as unnest ∪ NULL-rows).

    Scale posture: generator in the scan stage, no shuffle; same cost
    as inner explode plus the empty-row passthrough."""
    docs = t(spark, sf_dir, "documents")
    toks = F.expr(
        "filter(regexp_extract_all(lower(text), '[a-z]+', 0),"
        f" x -> length(x) >= {LONG_TOK_MIN})"
    )
    return docs.select("doc_id", F.explode_outer(toks).alias("tok"))


@query(
    "fn_variant_json",
    oracle="""
    WITH j AS (
        SELECT o_orderkey,
               '{"k": ' || CAST(o_orderkey AS VARCHAR)
               || ', "pri": "' || o_orderpriority
               || '", "tags": [' || CAST(o_orderkey % 3 AS VARCHAR)
               || ', ' || CAST(o_orderkey % 5 AS VARCHAR)
               || '], "nest": {"cust": '
               || CAST(o_custkey AS VARCHAR)
               || '}}' AS doc
        FROM orders WHERE o_orderkey % 20 = 0
    )
    SELECT o_orderkey,
           CAST(json_extract(doc, '$.k') AS BIGINT) AS k_out,
           json_extract_string(doc, '$.pri') AS pri_out,
           CAST(json_extract(doc, '$.tags[1]') AS BIGINT) AS tag1,
           CAST(json_extract(doc, '$.nest.cust') AS BIGINT) AS cust,
           CAST(json_array_length(json_extract(doc, '$.tags')) AS INT)
               AS n_tags
    FROM j
    """,
    tags=("fn", "variant", "semi-structured"),
    min_spark="4.0",  # VARIANT type

)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VARIANT type (Spark 4's native semi-structured path):
    ``parse_json`` ingests a JSON document ONCE into the binary
    variant encoding, then ``variant_get`` extracts typed fields by
    path — scalar, array element, nested object — without re-parsing
    text per access (the reason variant beats string-JSON at scale:
    the 100-extract query parses once, not 100 times). The documents
    are built deterministically from orders (integers and strings
    only, so serialization is byte-identical across engines) and the
    oracle extracts the same paths with DuckDB's JSON functions.

    Scale posture: per-row expression work at scan speed; variant
    columns store the binary encoding in parquet, so repeated
    downstream extraction amortizes the parse exactly like a struct
    column — the ingestion pattern for schema-fluid event payloads."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 20 == 0)
    doc = F.concat(
        F.lit('{"k": '),
        F.col("o_orderkey").cast("string"),
        F.lit(', "pri": "'),
        F.col("o_orderpriority"),
        F.lit('", "tags": ['),
        (F.col("o_orderkey") % 3).cast("string"),
        F.lit(", "),
        (F.col("o_orderkey") % 5).cast("string"),
        F.lit('], "nest": {"cust": '),
        F.col("o_custkey").cast("string"),
        F.lit("}}"),
    )
    v = orders.select("o_orderkey", F.parse_json(doc).alias("v"))
    return v.select(
        "o_orderkey",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k_out"),
        F.expr("variant_get(v, '$.pri', 'string')").alias("pri_out"),
        F.expr("variant_get(v, '$.tags[1]', 'bigint')").alias("tag1"),
        F.expr("variant_get(v, '$.nest.cust', 'bigint')").alias("cust"),
        F.expr("cast(array_size(variant_get(v, '$.tags', 'array<variant>')) as int)")
        .alias("n_tags"),
    )


@query(
    "fn_try_safe",
    oracle="""
    SELECT s_suppkey,
           CAST(s_acctbal AS DOUBLE) / NULLIF(s_suppkey % 3, 0)
               AS safe_div,
           TRY_CAST(CASE WHEN s_suppkey % 4 = 0 THEN 'n/a'
                         ELSE CAST(s_suppkey AS VARCHAR) END AS BIGINT)
               AS safe_cast,
           ([s_nationkey, s_suppkey])[CAST(1 + s_suppkey % 3 AS INT)]
               AS safe_elem
    FROM supplier
    """,
    tags=("function", "error-safe"),
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family (the try_* surface): division by
    zero, unparseable casts, and out-of-bounds element access all
    degrade to NULL instead of failing the job — the posture a 100 TB
    pipeline needs, where one malformed row must not kill a
    multi-hour stage (the expression-level complement of the
    CSV-level `src_csv_malformed_modes`). ``try_divide`` /
    ``try_cast`` / ``try_element_at`` map to DuckDB's NULLIF-guarded
    division, TRY_CAST, and natively NULL out-of-range list access.
    Pure projection: scan speed, whole-stage codegen."""
    supp = t(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.expr(
            "try_divide(cast(s_acctbal as double), s_suppkey % 3)"
        ).alias("safe_div"),
        F.expr(
            "try_cast(case when s_suppkey % 4 = 0 then 'n/a'"
            " else cast(s_suppkey as string) end as bigint)"
        ).alias("safe_cast"),
        F.expr(
            "try_element_at(array(s_nationkey, s_suppkey),"
            " cast(1 + s_suppkey % 3 as int))"
        ).alias("safe_elem"),
    )
