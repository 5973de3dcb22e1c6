"""Sort / limit / top-k / distinct / projection surface
(SURVEY.md §2.2, §2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import t
from nineinfra_spark.plans.registry import query


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderdate
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
    """,
    tags=("sort", "topk"),
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT — Catalyst fuses into TakeOrderedAndProject:
    per-partition heaps + driver merge, never a full global sort.
    Unique o_orderkey is the deterministic tie-break."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6)) AS DOUBLE) AS net_price,
           CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class,
           CAST(l_quantity AS INTEGER) AS qty_int
    FROM lineitem WHERE l_linenumber = 1 AND l_orderkey < 1000
    """,
    tags=("project", "cast", "case"),
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection: arithmetic, CASE WHEN, explicit casts."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_linenumber") == 1) & (F.col("l_orderkey") < 1000)).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(22,6)")
        .cast("double")
        .alias("net_price"),
        F.when(F.col("l_quantity") >= 25, "bulk").otherwise("small").alias("qty_class"),
        F.col("l_quantity").cast("integer").alias("qty_int"),
    )


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 200000 AND 250000
      AND o_orderpriority LIKE '%H%'
      AND o_custkey IS NOT NULL
    """,
    tags=("filter",),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / IS NOT NULL predicate surface — all of
    these push down to the parquet scan."""
    orders = t(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(200000, 250000)
        & F.col("o_orderpriority").like("%H%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderpriority", "o_orderstatus")


@query(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
    tags=("distinct",),
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "dedup_by_subset",
    oracle="""
    SELECT o_custkey, o_orderstatus,
           MIN(o_orderkey) AS o_orderkey
    FROM orders GROUP BY o_custkey, o_orderstatus
    """,
    tags=("distinct", "dedup"),
)
def dedup_by_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dropDuplicates: keep the MIN key per group.
    (Raw dropDuplicates(subset) keeps an arbitrary row — fine for
    dedup, wrong for a differential test, so we pin the survivor.)"""
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.min("o_orderkey").alias("o_orderkey")
    )


@query(
    "sample_bernoulli",
    oracle="""
    SELECT COUNT(*) AS n_total, TRUE AS frac_ok FROM orders
    """,
    tags=("sample", "bounded-nlj"),  # 1-row x 1-row agg cross
)
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample, verified as a bounds check: the RNG
    stream is engine-specific so the sampled ROWS can't be oracled,
    but the sampled FRACTION can — emit the exact total plus a
    Spark-computed boolean that the observed fraction sits within
    ±5σ of p=0.1 (binomial normal bound, computed from n itself so
    it holds at every SF). The oracle recomputes the exact count and
    expects literal TRUE. Row-level seeded determinism stays a
    pytest (tests/test_aggregates.py::TestSampleDeterminism)."""
    orders = t(spark, sf_dir, "orders")
    n_sampled = (
        orders.sample(fraction=0.1, seed=42)
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    n_total = orders.agg(F.count(F.lit(1)).alias("n_total"))
    return n_total.crossJoin(n_sampled).select(
        "n_total",
        (
            F.abs(F.col("n_sampled") / F.col("n_total") - F.lit(0.1))
            <= F.lit(5.0) * F.sqrt(F.lit(0.1 * 0.9) / F.col("n_total"))
        ).alias("frac_ok"),
    )


@query(
    "sample_hash_bucket",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    tags=("sample", "deterministic"),
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-bucket sample (md5 of the key, first hex
    digit in {0,1} → exactly a 1/8 expected-rate sample). This is the
    scale-stable sampling idiom: reproducible across engines, runs,
    partitionings, and cluster sizes — the property seeded RNG
    sampling cannot give — so it carries an exact row-level oracle.
    Pure pushed-down filter: no shuffle, scan-speed at 100 TB."""
    orders = t(spark, sf_dir, "orders")
    return orders.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1).isin("0", "1")
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "sample_stratified_hash",
    oracle="""
    SELECT event_id, event_type, user_id
    FROM events
    WHERE CASE event_type
        WHEN 'purchase' THEN TRUE
        WHEN 'signup' THEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
                           IN ('0','1','2','3','4','5','6','7')
        WHEN 'error' THEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'
        ELSE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) IN ('0','1')
    END
    """,
    tags=("sample", "deterministic", "stratified"),
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-stratum keep-rates via
    the md5 hex-digit bucket (purchase 16/16, signup 8/16, error 1/16,
    default 2/16) — the training-data curation move of downsampling
    abundant low-value strata while keeping every rare/valuable row.
    Unlike ``df.sampleBy`` (seeded RNG — engine-specific stream, no
    row-level oracle, resample drift on repartition), the hash bucket
    is reproducible across engines/runs/partitionings, so it carries
    an exact row-level oracle. Pure pushed-down filter: no shuffle,
    scan-speed at 100 TB."""
    events = t(spark, sf_dir, "events")
    d = F.substring(F.md5(F.col("event_id").cast("string")), 1, 1)
    keep = (
        F.when(F.col("event_type") == "purchase", F.lit(True))
        .when(F.col("event_type") == "signup", d.isin(*"01234567"))
        .when(F.col("event_type") == "error", d == "0")
        .otherwise(d.isin("0", "1"))
    )
    return events.filter(keep).select("event_id", "event_type", "user_id")


@query(
    "sort_multi_key",
    oracle="""
    SELECT n_name, n_regionkey, n_nationkey
    FROM nation ORDER BY n_regionkey DESC, n_name ASC
    """,
    tags=("sort",),
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort (range-partitioned exchange)."""
    return (
        t(spark, sf_dir, "nation")
        .select("n_name", "n_regionkey", "n_nationkey")
        .orderBy(F.desc("n_regionkey"), F.asc("n_name"))
    )


@query(
    "sort_within_partitions",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    """,
    tags=("sort", "sort-by"),
)
def sort_within_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-local sort (SQL SORT BY): orders each partition
    without a global range exchange — the cheap ordering used before
    per-partition writes or merge-friendly downstream ops. Content is
    partition-order-agnostic (the oracle checks the bag of rows);
    the local-ordering property itself is asserted in
    tests/test_aggregates.py."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.repartition(8, "o_custkey")
        .sortWithinPartitions("o_totalprice")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "project_rename_drop",
    oracle="""
    SELECT o_orderkey AS order_id, o_totalprice AS amount
    FROM orders
    """,
    tags=("project", "rename", "drop"),
)
def project_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema surgery: withColumnRenamed + drop (dedicated coverage —
    pure metadata ops, zero execution cost)."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.withColumnRenamed("o_orderkey", "order_id")
        .withColumnRenamed("o_totalprice", "amount")
        .drop("o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority")
    )


#: Target language mixture for ``sample_mixture_lang`` in basis
#: points (sums to 10_000). The binding stratum (smallest
#: n_lang/weight ratio) is kept whole; every other language is
#: hash-downsampled to match the mixture at the largest feasible
#: total.
MIXTURE_BP = {"en": 3000, "de": 2000, "es": 2000, "fr": 1500, "zh": 1500}


@query(
    "sample_mixture_lang",
    oracle=f"""
    WITH w(lang, bp) AS (VALUES {", ".join(f"('{l}', {bp})" for l, bp in MIXTURE_BP.items())}),
    n AS (
        SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
    ),
    feas AS (
        SELECT MIN(n.n_lang * 10000 // w.bp) AS nstar
        FROM n JOIN w ON n.lang = w.lang
    ),
    thr AS (
        SELECT n.lang,
               (4096 * w.bp * feas.nstar) // (10000 * n.n_lang) AS threshold
        FROM n JOIN w ON n.lang = w.lang CROSS JOIN feas
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN thr ON d.lang = thr.lang
    WHERE CAST(CONCAT('0x', SUBSTR(md5(CAST(d.doc_id AS VARCHAR)), 1, 3)) AS BIGINT)
          < thr.threshold
    """,
    tags=("sample", "deterministic", "mixture", "bounded-nlj"),  # 1-row N* side
)
def sample_mixture_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted corpus sampling: downsample each language to
    hit a TARGET MIXTURE (MIXTURE_BP) at the largest feasible total —
    the data-balancing move every multilingual pretraining run makes
    (cap the over-represented languages instead of upsampling the
    rare ones). The feasible total N* = min_lang(n_lang / w_lang);
    each language then keeps ~w_lang·N* rows via a deterministic
    md5-bucket filter (threshold over the first 3 hex digits,
    0..4095), so the sample is reproducible across engines, runs and
    partitionings, and carries an exact row-level oracle. All
    threshold arithmetic is integer (basis points × floor division) —
    no float boundary can flip a row between engines.

    Scale posture: pass 1 is a column-pruned per-language count (tiny
    agg result); N* and the K per-language thresholds derive from it
    as 1-row/K-row broadcasts; pass 2 is a pushed-down filter joined
    against the broadcast threshold table — scan speed, no shuffle of
    the corpus at any size."""
    docs = t(spark, sf_dir, "documents")
    n = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    w = spark.createDataFrame(
        [(l, bp) for l, bp in MIXTURE_BP.items()], "lang string, bp long"
    )
    nw = n.join(F.broadcast(w), "lang")
    nstar = nw.agg(
        F.min(F.expr("n_lang * 10000 DIV bp")).alias("nstar")
    )
    thr = (
        nw.crossJoin(F.broadcast(nstar))
        .select("lang", F.expr("(4096 * bp * nstar) DIV (10000 * n_lang)").alias("threshold"))
    )
    hx = F.expr("cast(conv(substr(md5(cast(doc_id as string)), 1, 3), 16, 10) as bigint)")
    return (
        docs.join(F.broadcast(thr), "lang")
        .filter(hx < F.col("threshold"))
        .select("doc_id", "lang")
    )


# -- per-group document caps ------------------------------------------------

GROUP_CAP = 8  # keep at most this many docs per source


@query(
    "sample_cap_per_group",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT doc_id, source, rk FROM ranked WHERE rk <= {GROUP_CAP}
    """,
    tags=("sample", "deterministic", "cap"),
)
def sample_cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group document cap (anti-domination curation): keep at most
    K documents per source/domain so no single crawl host dominates
    the training mixture — the standard web-corpus balancing move.
    Which K survive is decided by md5-hash order (a deterministic
    uniform shuffle within the group), NOT arrival order, so the kept
    set is reproducible across engines, runs, and partitionings and
    carries an exact row-level oracle.

    Scale posture: ONE hash-partitioned window per group — row_number
    needs no global sort, and the per-group sort is bounded by group
    size. For pathological mega-groups (one domain = 10% of a 100 TB
    crawl) compose with the two-phase trick: pre-filter by a hash
    THRESHOLD that overshoots K slightly (scan-speed, no shuffle),
    then window only the survivors — the same shape
    ``sample_mixture_lang`` uses for its thresholds."""
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GROUP_CAP)
    )


# -- deterministic train/valid/test split -----------------------------------

#: hash-bucket boundaries over the first TWO md5 hex digits (0..255):
#: [0,204) train ≈ 80%, [204,230) valid ≈ 10%, [230,256) test ≈ 10%
SPLIT_TRAIN_HI = 204
SPLIT_VALID_HI = 230


def _split_of(id_col) -> "F.Column":
    """Deterministic 80/10/10 split label of an integer id: first two
    md5 hex digits bucketed 0..255 — THE split expression, shared by
    the plain split census and the leakage-guarded variant so the two
    queries can never drift apart."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 2), 16, 10).cast(
        "bigint"
    )
    return (
        F.when(h < SPLIT_TRAIN_HI, F.lit("train"))
        .when(h < SPLIT_VALID_HI, F.lit("valid"))
        .otherwise(F.lit("test"))
    )


#: DuckDB rendering of the same expression (``{id}`` = the id column).
_SPLIT_CASE_SQL = (
    "CASE WHEN CAST('0x' || substr(md5(CAST({id} AS VARCHAR)), 1, 2) AS BIGINT)"
    f" < {SPLIT_TRAIN_HI} THEN 'train'"
    " WHEN CAST('0x' || substr(md5(CAST({id} AS VARCHAR)), 1, 2) AS BIGINT)"
    f" < {SPLIT_VALID_HI} THEN 'valid' ELSE 'test' END"
)


@query(
    "split_train_valid_test",
    oracle=f"""
    SELECT lang,
           {_SPLIT_CASE_SQL.format(id='doc_id')} AS split,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang, split
    """,
    tags=("sample", "deterministic", "split"),
)
def split_train_valid_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by key hash —
    the split every training pipeline needs, done the only way that
    survives data refreshes: a document's split is a pure function of
    its id (first two md5 hex digits bucketed 0..255), so re-running
    on a grown corpus never migrates an old doc across splits (no
    eval contamination from re-shuffling), and any engine reproduces
    the same assignment. Returns the per-(lang, split) census the
    pipeline records as its datasheet.

    Scale posture: pure scan-side projection + one map-side-combined
    groupBy on a (langs × 3)-key space — scan speed at any size; the
    split ASSIGNMENT itself is a filter, usable as three pushed-down
    scans without materializing anything."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("lang", _split_of(F.col("doc_id")).alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# -- temperature-scaled multi-source mixture --------------------------------

#: total document budget for the temperature mixture (α = 0.5):
#: small enough that the minority sources' shares visibly exceed
#: their natural proportion at every test SF.
TEMP_BUDGET = 300


@query(
    "sample_temperature_mixture",
    oracle=f"""
    WITH src AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_docs,
               CAST(floor(sqrt(n_docs)) AS BIGINT) AS w_sqrt
        FROM src
    ),
    tot AS (SELECT SUM(w_sqrt) AS w_total FROM w),
    quota AS (
        SELECT source, n_docs, w_sqrt,
               CAST(least(({TEMP_BUDGET} * w_sqrt) // w_total, n_docs)
                    AS BIGINT) AS keep_n
        FROM w, tot
    ),
    ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT q.source, q.n_docs, q.w_sqrt, q.keep_n,
           COUNT(r.doc_id) AS kept,
           CAST(SUM(CASE WHEN r.rk <= q.keep_n THEN 1 ELSE 0 END) AS BIGINT)
               AS kept_check
    FROM quota q
    LEFT JOIN ranked r ON r.source = q.source AND r.rk <= q.keep_n
    GROUP BY q.source, q.n_docs, q.w_sqrt, q.keep_n
    """,
    tags=("sample", "mixture", "temperature", "deterministic", "bounded-nlj"),
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-scaled source mixture (α = 0.5): per-source sampling
    quotas proportional to n^α instead of n — the T5/multilingual-
    pretraining re-balancing that up-weights minority sources without
    letting any single giant source dominate (α=1 is natural
    proportion, α=0 is uniform; √n is the standard middle). Quota_s =
    ⌊budget · √n_s / Σ√n_t⌋ capped at n_s; the surviving docs per
    source are the md5-hash-order prefix (``sample_cap_per_group``'s
    deterministic shuffle), so the sampled corpus is reproducible
    across engines and runs.

    Exactness: IEEE sqrt is CORRECTLY ROUNDED, so floor(sqrt(bigint))
    is bit-identical on both engines; quotas are integer
    floor-division; no float boundary anywhere. Output is the
    per-source census (n_docs, weight, quota, kept) — kept ==
    keep_n == quota proves the selection filled each quota exactly.

    Scale posture: one dimension-sized per-source count, one
    broadcastable quota table, one hash-partitioned per-source window
    over the docs (same cost envelope as sample_cap_per_group); the
    giant-source two-phase pre-filter composes identically."""
    docs = t(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = src.select(
        "source",
        "n_docs",
        F.floor(F.sqrt(F.col("n_docs"))).cast("bigint").alias("w_sqrt"),
    )
    tot = w.agg(F.sum("w_sqrt").alias("w_total"))
    quota = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "w_sqrt",
        F.least(
            F.expr(f"({TEMP_BUDGET} * w_sqrt) div w_total"), F.col("n_docs")
        ).alias("keep_n"),
    )
    win = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select("doc_id", "source").withColumn(
        "rk", F.row_number().over(win)
    )
    kept = ranked.join(F.broadcast(quota), "source").filter(
        F.col("rk") <= F.col("keep_n")
    )
    return (
        quota.join(
            kept.groupBy("source").agg(
                F.count(F.lit(1)).alias("kept"),
                F.sum(F.lit(1)).alias("kept_check"),
            ),
            "source",
            "left",
        )
        .select(
            "source",
            "n_docs",
            "w_sqrt",
            "keep_n",
            F.coalesce(F.col("kept"), F.lit(0)).alias("kept"),
            F.coalesce(F.col("kept_check"), F.lit(0)).alias("kept_check"),
        )
    )


@query(
    "sample_balanced_classes",
    oracle="""
    WITH minority AS (
        SELECT MIN(n) AS floor_n FROM (
            SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)
    ),
    ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    )
    SELECT r.doc_id, r.lang, r.rk
    FROM ranked r JOIN minority m ON r.rk <= m.floor_n
    """,
    tags=("sample", "deterministic", "balance", "bounded-nlj"),
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling: every language keeps exactly
    min-class-count documents (majority classes downsample to the
    minority's size — the classifier-training balance move;
    `sample_temperature_mixture` is its softer T≠0 sibling). The cap
    is DERIVED FROM THE DATA (min per-class count), not a constant,
    and which rows survive is md5-hash order — reproducible across
    engines, runs, and partitionings, so the oracle is exact at the
    row level.

    Scale posture: one |classes|-row aggregate broadcasts as the
    tagged 1-row threshold (the bounded nested loop); the corpus pass
    is the same single per-class window as `sample_cap_per_group` —
    the data-derived cap costs one extra dimension-sized job, never a
    second corpus scan."""
    docs = t(spark, sf_dir, "documents")
    floor_n = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.min("n").alias("floor_n"))
    )
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = (
        docs.select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w))
    )
    return ranked.crossJoin(F.broadcast(floor_n)).filter(
        F.col("rk") <= F.col("floor_n")
    ).select("doc_id", "lang", "rk")


# -- leakage-guarded split --------------------------------------------------


@query(
    "split_leakage_guard",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT -doc_id - 1 AS doc_id, text || '  ' AS text FROM documents
    ),
    keyed AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck
        FROM corpus
    ),
    m AS (
        SELECT doc_id, ck, MIN(doc_id) OVER (PARTITION BY ck) AS canonical
        FROM keyed
    ),
    cl AS (
        SELECT ck,
               COUNT(*) AS n_members,
               COUNT(DISTINCT {_SPLIT_CASE_SQL.format(id='doc_id')})
                   AS naive_splits,
               COUNT(DISTINCT {_SPLIT_CASE_SQL.format(id='canonical')})
                   AS guarded_splits,
               MIN({_SPLIT_CASE_SQL.format(id='canonical')}) AS split
        FROM m GROUP BY ck
    )
    SELECT CAST(SUM(n_members) AS BIGINT) AS n_docs,
           COUNT(*) AS n_clusters,
           CAST(SUM(CASE WHEN n_members > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_multi_clusters,
           CAST(SUM(CASE WHEN naive_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS naive_leaky_clusters,
           CAST(SUM(CASE WHEN guarded_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS guarded_leaky_clusters,
           CAST(SUM(CASE WHEN split = 'train' THEN n_members ELSE 0 END)
                AS BIGINT) AS train_docs,
           CAST(SUM(CASE WHEN split = 'valid' THEN n_members ELSE 0 END)
                AS BIGINT) AS valid_docs,
           CAST(SUM(CASE WHEN split = 'test' THEN n_members ELSE 0 END)
                AS BIGINT) AS test_docs
    FROM cl
    """,
    tags=("sample", "deterministic", "split", "dedup"),
)
def split_leakage_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster-aware train/valid/test split — the eval-leakage
    guard every training pipeline needs on top of the plain hash
    split: a document's split is a function of its duplicate
    CLUSTER's canonical id, not its own id, so exact/whitespace
    duplicates can never straddle train and eval. The query proves
    the guard differentially: it pairs every document with a
    whitespace-edited rendition (id ``-doc_id-1``, the collision-free
    mirror idiom from ``mm_phash_neardup_64``), clusters on the
    normalized content hash, and reports how many clusters the NAIVE
    per-doc-id split would tear across split boundaries
    (``naive_leaky_clusters`` — hundreds, at every SF) versus the
    guarded assignment (``guarded_leaky_clusters`` — computed, not
    asserted, and exactly 0). Organic corpus duplicates (present at
    sf0.1+) cluster and co-travel identically.

    Scale posture: one corpus-sized shuffle on the uniform content
    hash (window + groupBy share the same ``ck`` partitioning — one
    exchange, no second corpus scan), then a 1-row global rollup.
    The guarded assignment itself stays a pure per-row function
    (hash of the cluster canonical), so a production pipeline applies
    it as a projection after any exact-dedup pass."""
    docs = t(spark, sf_dir, "documents")
    corpus = docs.select("doc_id", "text").unionAll(
        docs.select(
            (-F.col("doc_id") - 1).alias("doc_id"),
            F.concat(F.col("text"), F.lit("  ")).alias("text"),
        )
    )
    keyed = corpus.select(
        "doc_id",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("ck"),
    )
    m = keyed.withColumn(
        "canonical", F.min("doc_id").over(Window.partitionBy("ck"))
    )
    cl = m.groupBy("ck").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.countDistinct(_split_of(F.col("doc_id"))).alias("naive_splits"),
        F.countDistinct(_split_of(F.col("canonical"))).alias("guarded_splits"),
        F.min(_split_of(F.col("canonical"))).alias("split"),
    )
    return cl.agg(
        F.sum("n_members").alias("n_docs"),
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum((F.col("n_members") > 1).cast("bigint")).alias(
            "n_multi_clusters"
        ),
        F.sum((F.col("naive_splits") > 1).cast("bigint")).alias(
            "naive_leaky_clusters"
        ),
        F.sum((F.col("guarded_splits") > 1).cast("bigint")).alias(
            "guarded_leaky_clusters"
        ),
        F.sum(
            F.when(F.col("split") == "train", F.col("n_members")).otherwise(
                F.lit(0)
            )
        ).alias("train_docs"),
        F.sum(
            F.when(F.col("split") == "valid", F.col("n_members")).otherwise(
                F.lit(0)
            )
        ).alias("valid_docs"),
        F.sum(
            F.when(F.col("split") == "test", F.col("n_members")).otherwise(
                F.lit(0)
            )
        ).alias("test_docs"),
    )
