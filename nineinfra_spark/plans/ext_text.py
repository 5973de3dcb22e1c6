"""[EXT] Text-analysis operators over the ``documents`` table.

Part of the LLM-data-pipeline surface (SURVEY.md §2.10 [EXT]): quality
scoring, language-ID heuristics, token statistics, and content
fingerprinting — the per-document scoring passes a training-data
pipeline runs before dedup/filtering. The reference platform reserves
this data-processing role to the engine it provisions
(``internal/controller/kyuubi.go:189-203``); these are native
implementations.

Scale design: every operator here is a pure per-row projection or a
single hash aggregation — embarrassingly parallel, no shuffle except
the final small agg, and all expressions are JVM-side built-ins
(whole-stage codegen; no Python in the hot path). At 100 TB these run
at scan speed.

All tokenization is shared: lowercase alpha runs, so the Spark
expressions and the DuckDB oracles compute identical token streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import cpu_spread as _spread, t
from nineinfra_spark.plans.registry import query

#: tokens = lowercase alpha runs — identical regex semantics in Spark
#: (regexp_extract_all 3-arg) and DuckDB (2-arg).
TOKS_SPARK = "regexp_extract_all(lower(text), '[a-z]+', 0)"
TOKS_DUCK = "regexp_extract_all(lower(text), '[a-z]+')"

_STOP = "'the','a','and','of','in'"


@query(
    "text_quality_stats",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, length(text) AS n_chars_measured,
               {TOKS_DUCK} AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, n_chars_measured,
               len(toks) AS n_tokens,
               list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS sum_len,
               len(list_filter(toks, x -> list_contains([{_STOP}], x))) AS n_stop
        FROM d
    )
    SELECT doc_id, n_chars_measured, n_tokens,
           CASE WHEN n_tokens > 0 THEN
               ((20000 * sum_len + n_tokens) // (2 * n_tokens)) / 10000.0
           END AS avg_token_len,
           CASE WHEN n_tokens > 0 THEN
               ((20000 * n_stop + n_tokens) // (2 * n_tokens)) / 10000.0
           END AS stopword_ratio,
           CASE WHEN n_tokens > 0 THEN
               (40 * LEAST(n_tokens, 100)
                + 3000 - (6000 * n_stop + n_tokens) // (2 * n_tokens)
                + LEAST((6000 * sum_len + 8 * n_tokens) // (16 * n_tokens),
                        3000)
               ) / 10000.0
           END AS quality_score
    FROM s
    """,
    tags=("ext", "text"),
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring: token count, mean token length,
    stopword ratio, and a composite quality score — the standard
    pre-filter signals for training-data curation. Pure projection:
    runs at scan speed at any scale.

    The composite score is computed in scaled-integer arithmetic with
    explicit half-up integer division, then divided by 10000 — double
    rounding of a float composite lands on .xxxx5 midpoints where
    engines disagree in the last ulp; integers never do."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.length("text").alias("n_chars_measured"),
            F.expr(TOKS_SPARK).alias("toks"),
        )
        .select(
            "doc_id",
            "n_chars_measured",
            F.size("toks").alias("n_tokens"),
            F.expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))").alias("sum_len"),
            F.expr(f"size(filter(toks, x -> array_contains(array({_STOP}), x)))").alias(
                "n_stop"
            ),
        )
        .select(
            "doc_id",
            "n_chars_measured",
            "n_tokens",
            # Zero-token docs (whitespace/punctuation-only text) have
            # no defined ratios: NULL, never ANSI DIVIDE_BY_ZERO (the
            # triangles r9-advice class; oracle mirrors the guard).
            F.expr(
                "case when n_tokens > 0 then"
                " ((20000 * sum_len + n_tokens) div (2 * n_tokens))"
                " / 10000.0D end"
            ).alias("avg_token_len"),
            F.expr(
                "case when n_tokens > 0 then"
                " ((20000 * n_stop + n_tokens) div (2 * n_tokens))"
                " / 10000.0D end"
            ).alias("stopword_ratio"),
            F.expr(
                "case when n_tokens > 0 then"
                " (40 * least(n_tokens, 100)"
                "  + 3000 - (6000 * n_stop + n_tokens) div (2 * n_tokens)"
                "  + least((6000 * sum_len + 8 * n_tokens)"
                "          div (16 * n_tokens), 3000)"
                " ) / 10000.0D end"
            ).alias("quality_score"),
        )
    )


_MARKERS = {
    "en": "'the','a','and'",
    "de": "'der','die','und','das'",
    "fr": "'le','la','et','les'",
}


@query(
    "text_lang_id",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, {TOKS_DUCK} AS toks FROM documents
    ), s AS (
        SELECT lang,
               len(list_filter(toks, x -> list_contains([{_MARKERS['en']}], x))) AS s_en,
               len(list_filter(toks, x -> list_contains([{_MARKERS['de']}], x))) AS s_de,
               len(list_filter(toks, x -> list_contains([{_MARKERS['fr']}], x))) AS s_fr
        FROM d
    )
    SELECT lang,
           CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS pred_lang,
           COUNT(*) AS n_docs
    FROM s
    GROUP BY 1, 2
    """,
    tags=("ext", "text"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic: score each doc against
    per-language stopword sets, argmax with a deterministic tie-break
    (en > de > fr), then cross-tab predicted vs declared language.

    The n-gram-profile approach at scale is the same shape: a per-row
    projection over a broadcast marker table, then one tiny agg.
    (The synthetic corpus is English-ish word salad, so predictions
    skew 'en' — the operator contract is the deterministic scoring.)
    """
    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        *[
            F.expr(
                f"size(filter({TOKS_SPARK}, x -> array_contains(array({m}), x)))"
            ).alias(f"s_{lg}")
            for lg, m in _MARKERS.items()
        ],
    )
    pred = F.when(
        (F.col("s_en") >= F.col("s_de")) & (F.col("s_en") >= F.col("s_fr")), "en"
    ).when(F.col("s_de") >= F.col("s_fr"), "de").otherwise("fr")
    return (
        scored.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_token_topk",
    oracle=f"""
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest({TOKS_DUCK}) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
    tags=("ext", "text", "explode"),
)
def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency top-k via explode (the table-function /
    LATERAL VIEW shape, SURVEY.md §2.10). At scale: explode → partial
    map-side count → shuffle only (token, partial-count) pairs — the
    shuffle carries vocabulary-sized data, not corpus-sized."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.expr(TOKS_SPARK)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )


@query(
    "text_fingerprint",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               md5(array_to_string({TOKS_DUCK}, ' ')) AS fingerprint
        FROM documents
    )
    SELECT doc_id, fingerprint,
           doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint) AS is_canonical
    FROM f
    """,
    tags=("ext", "text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: md5 over whitespace-normalized token
    stream (case/punctuation-insensitive), plus canonical-row marking
    per fingerprint group. The canonical flag is one window over the
    fingerprint hash — shuffle keyed on the hash, uniform by
    construction, no skew at any scale."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("fingerprint")
    return (
        docs.select(
            "doc_id",
            F.md5(F.array_join(F.expr(TOKS_SPARK), " ")).alias("fingerprint"),
        )
        .select(
            "doc_id",
            "fingerprint",
            (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_canonical"),
        )
    )


def _quality_topk_oracle() -> str:
    from nineinfra_spark.plans.registry import get

    quality_sql = get("text_quality_stats").oracle
    return f"""
    WITH q AS ({quality_sql})
    SELECT lang, doc_id, quality_score, rank FROM (
        SELECT d.lang, q.doc_id, q.quality_score,
               ROW_NUMBER() OVER (
                   PARTITION BY d.lang
                   ORDER BY q.quality_score DESC, q.doc_id
               ) AS rank
        FROM q JOIN documents d USING (doc_id)
    ) WHERE rank <= 5
    """


@query(
    "text_quality_topk_per_lang",
    oracle=_quality_topk_oracle(),
    tags=("ext", "text", "topk"),
)
def text_quality_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality selection: the top-5 documents of each
    declared language by the composite quality score — the "keep the
    best N per stratum" curation step that follows scoring. One window
    over (lang), shuffle keyed on language; deterministic tie-break on
    doc_id so the selection is stable under re-partitioning. Reuses
    `text_quality_stats` (same scaled-integer score, so the oracle
    agrees digit-for-digit)."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    scores = text_quality_stats(spark, sf_dir).select("doc_id", "quality_score")
    w = Window.partitionBy("lang").orderBy(F.desc("quality_score"), "doc_id")
    return (
        docs.join(scores, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", "doc_id", "quality_score", "rank")
    )


@query(
    "text_token_classes",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+')) AS n_word_toks,
           len(regexp_extract_all(text, '[0-9]+')) AS n_num_toks,
           len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]+')) AS n_punct_toks,
           len(regexp_extract_all(text, '\\S+')) AS n_ws_toks,
           len(regexp_extract_all(text, '[a-zA-Z]+'))
             + len(regexp_extract_all(text, '[0-9]+'))
             + len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]+')) AS n_bpe_toks
    FROM documents
    """,
    tags=("ext", "text", "tokenize"),
)
def text_token_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (the LLM-pipeline budget signals):
    whitespace tokens (`\\S+` runs) and a BPE-ish pre-tokenization —
    letter runs / digit runs / punctuation runs counted separately,
    the class split a byte-pair pre-tokenizer (GPT-2 style) makes
    before merges. Lookahead-free on purpose so the exact same regex
    family runs on Spark (java.util.regex) and DuckDB (RE2). Pure
    projection: scan-speed at any scale, no shuffle."""
    docs = t(spark, sf_dir, "documents")
    word = "size(regexp_extract_all(text, '[a-zA-Z]+', 0))"
    num = "size(regexp_extract_all(text, '[0-9]+', 0))"
    punct = "size(regexp_extract_all(text, '[^a-zA-Z0-9\\\\s]+', 0))"
    ws = "size(regexp_extract_all(text, '\\\\S+', 0))"
    return docs.select(
        "doc_id",
        F.expr(word).cast("long").alias("n_word_toks"),
        F.expr(num).cast("long").alias("n_num_toks"),
        F.expr(punct).cast("long").alias("n_punct_toks"),
        F.expr(ws).cast("long").alias("n_ws_toks"),
        (F.expr(word) + F.expr(num) + F.expr(punct)).cast("long").alias("n_bpe_toks"),
    )


# -- training-sample prep ---------------------------------------------------

#: Fixed-size token windows with overlap (stride < size) — the
#: standard packing step between curation and tokenization.
CHUNK_SIZE = 16
CHUNK_STRIDE = 12


@query(
    "text_chunk_windows",
    oracle=f"""
    WITH d AS (SELECT doc_id, {TOKS_DUCK} AS toks FROM documents),
         w AS (
             SELECT doc_id, toks, len(toks) AS n,
                    unnest(generate_series(0, len(toks) - 1, {CHUNK_STRIDE})) AS start
             FROM d WHERE len(toks) > 0
         )
    SELECT doc_id,
           CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(LEAST({CHUNK_SIZE}, n - start) AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(toks[start + 1 : start + {CHUNK_SIZE}], ' ')) AS chunk_hash
    FROM w
    """,
    tags=("ext", "text", "chunk"),
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (training-sample prep): every
    document becomes ⌈n/stride⌉ windows of up to CHUNK_SIZE tokens,
    stride CHUNK_STRIDE (25% overlap), so no token span is lost at a
    window boundary. The window CONTENT is carried as an md5 of the
    joined tokens — the differential gate then pins the exact token
    slice of every chunk without shipping duplicated text.

    Scale posture: pure projection + explode — no shuffle, no window
    function; output rows ≈ input tokens / stride. At 100 TB this is
    the mapper-side packing pass a tokenizer feeds on, and it
    parallelizes per input split with no coordination."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.expr(TOKS_SPARK).alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
        .select(
            "doc_id",
            "toks",
            "n",
            F.explode(
                F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
            ).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / CHUNK_STRIDE).cast("bigint").alias("chunk_id"),
            F.least(F.lit(CHUNK_SIZE), F.col("n") - F.col("start"))
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.expr(
                f"md5(array_join(slice(toks, start + 1, {CHUNK_SIZE}), ' '))"
            ).alias("chunk_hash"),
        )
    )


@query(
    "text_repetition_filter",
    oracle=f"""
    WITH d AS (SELECT doc_id, {TOKS_DUCK} AS toks FROM documents),
         base AS (
             SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) >= 2
         ),
         top_tok AS (
             SELECT doc_id, MAX(cnt) AS top_tok_cnt FROM (
                 SELECT doc_id, tok, COUNT(*) AS cnt
                 FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
                 GROUP BY doc_id, tok
             ) GROUP BY doc_id
         ),
         bg AS (
             SELECT doc_id, n,
                    list_transform(
                        generate_series(1, n - 1),
                        i -> toks[i] || ' ' || toks[i + 1]
                    ) AS bigrams
             FROM base
         )
    SELECT bg.doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(top_tok_cnt AS BIGINT) AS top_tok_cnt,
           CAST(len(bigrams) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bigrams)) AS BIGINT) AS n_distinct_bigrams,
           (top_tok_cnt * 10 <= n * 3
            AND (len(bigrams) - len(list_distinct(bigrams))) * 2 <= len(bigrams))
               AS keep
    FROM bg JOIN top_tok ON bg.doc_id = top_tok.doc_id
    """,
    tags=("ext", "text", "quality"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filtering (the Gopher-rules family):
    per document, the most-frequent-token count and the duplicate-
    bigram fraction; ``keep`` = top-token fraction ≤ 0.3 AND
    duplicate-bigram fraction ≤ 0.5. Both thresholds are evaluated by
    CROSS-MULTIPLIED INTEGER comparison (never a float division), so
    the boundary document cannot flip between engines.

    Scale posture: the top-token count is explode → two groupBys
    keyed on doc_id (map-side combined; the second reuses the first's
    partitioning); the bigram stats are a pure per-row projection
    (transform over the token array). Docs with <2 tokens have no
    bigram signal and are excluded up front — at 100 TB they belong
    to the length filter, not this one."""
    docs = t(spark, sf_dir, "documents")
    base = (
        docs.select("doc_id", F.expr(TOKS_SPARK).alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= 2)
    )
    top_tok = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_tok_cnt"))
    )
    bg = base.select(
        "doc_id",
        "n",
        F.expr(
            "transform(sequence(1, n - 1),"
            " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
        ).alias("bigrams"),
    )
    return (
        bg.join(top_tok, "doc_id")
        .select(
            "doc_id",
            F.col("n").cast("bigint").alias("n_tokens"),
            F.col("top_tok_cnt").cast("bigint").alias("top_tok_cnt"),
            F.size("bigrams").cast("bigint").alias("n_bigrams"),
            F.size(F.array_distinct("bigrams")).cast("bigint").alias("n_distinct_bigrams"),
            (
                (F.col("top_tok_cnt") * 10 <= F.col("n") * 3)
                & (
                    (F.size("bigrams") - F.size(F.array_distinct("bigrams"))) * 2
                    <= F.size("bigrams")
                )
            ).alias("keep"),
        )
    )


#: Training-sequence length for the packing pass (tokens per sequence)
#: and the shard width that bounds each packing unit: sequences are
#: numbered per (source, shard), never globally.
SEQ_LEN = 128
PACK_SHARD_DOCS = 100


@query(
    "text_pack_sequences",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, len({TOKS_DUCK}) AS n_tokens
        FROM documents
    ),
    sh AS (
        SELECT doc_id, source, doc_id // {PACK_SHARD_DOCS} AS shard, n_tokens
        FROM d WHERE n_tokens > 0
    ),
    off AS (
        SELECT doc_id, source, shard, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY source, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS tok_offset
        FROM sh
    )
    SELECT doc_id, source, CAST(shard AS BIGINT) AS shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(tok_offset AS BIGINT) AS tok_offset,
           CAST(tok_offset // {SEQ_LEN} AS BIGINT) AS first_seq,
           CAST((tok_offset + n_tokens - 1) // {SEQ_LEN} AS BIGINT) AS last_seq,
           CAST((tok_offset + n_tokens - 1) // {SEQ_LEN}
                - tok_offset // {SEQ_LEN} + 1 AS BIGINT) AS n_seqs
    FROM off
    """,
    tags=("ext", "text", "pack"),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (the concat-and-chunk step a pretraining
    pipeline runs after curation): documents are concatenated in
    deterministic (doc_id) order and cut into SEQ_LEN-token training
    sequences; per document this emits its token offset in the packed
    stream and the [first_seq, last_seq] span it lands in.

    The packing unit is (source, shard) — shard = doc_id //
    PACK_SHARD_DOCS — exactly how a production packer works: each
    output shard is packed INDEPENDENTLY, sequence ids are namespaced
    per shard, and no global token offset exists. That bounds the
    window partition (at 100 TB a global cumulative sum would
    serialize; per-shard cumsums are thousands of small independent
    windows → one shuffle keyed on (source, shard), embarrassingly
    parallel). Integer arithmetic end-to-end — bit-stable on both
    engines."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        docs.select(
            "doc_id",
            "source",
            F.size(F.expr(TOKS_SPARK)).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("shard", F.expr(f"doc_id DIV {PACK_SHARD_DOCS}"))
    )
    off = base.withColumn(
        "tok_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    first_seq = F.expr(f"tok_offset DIV {SEQ_LEN}")
    last_seq = F.expr(f"(tok_offset + n_tokens - 1) DIV {SEQ_LEN}")
    return off.select(
        "doc_id",
        "source",
        "shard",
        "n_tokens",
        "tok_offset",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + F.lit(1)).cast("bigint").alias("n_seqs"),
    )


@query(
    "text_corpus_datasheet",
    oracle=f"""
    WITH d AS (
        SELECT lang, source, len({TOKS_DUCK}) AS n_toks FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(MIN(n_toks) AS BIGINT) AS min_tokens,
           CAST(MAX(n_toks) AS BIGINT) AS max_tokens,
           quantile_cont(n_toks, 0.5)::DOUBLE AS p50_tokens,
           quantile_cont(n_toks, 0.95)::DOUBLE AS p95_tokens
    FROM d GROUP BY lang
    """,
    tags=("ext", "text", "datasheet", "profiling"),
)
def text_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus DATASHEET: per-language document counts, source
    diversity, token totals, and the exact token-length distribution
    (min/max/p50/p95) — the summary table every dataset card and
    mixture decision starts from (and the input `sample_mixture_lang`
    would consume to set its weights).

    Exact interpolated percentiles buffer per-group values —
    LANGUAGE-bounded groups here (bounded cardinality, the documented
    exact-percentile regime of `agg_percentile_exact`); at 100 TB the
    same datasheet swaps in percentile_approx per the sketch query.
    Percentile interpolation is (a+b)/2-style arithmetic on INTEGER
    token counts — exact in double on both engines. Everything else
    is one map-side-combined hash aggregate at scan speed."""
    docs = t(spark, sf_dir, "documents")
    d = docs.select(
        "lang", "source", F.size(F.expr(TOKS_SPARK)).cast("long").alias("n_toks")
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_toks").alias("total_tokens"),
        F.min("n_toks").alias("min_tokens"),
        F.max("n_toks").alias("max_tokens"),
        F.expr("percentile(n_toks, 0.5)").alias("p50_tokens"),
        F.expr("percentile(n_toks, 0.95)").alias("p95_tokens"),
    )


@query(
    "text_bigram_familiarity",
    oracle=f"""
    WITH d AS (SELECT doc_id, {TOKS_DUCK} AS toks FROM documents),
    bg AS (
        SELECT doc_id, unnest(list_transform(
            generate_series(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i + 1]
        )) AS bigram
        FROM d WHERE len(toks) >= 2
    ),
    freq AS (
        SELECT bigram, COUNT(*) AS corpus_n FROM bg GROUP BY bigram
    ),
    scored AS (
        SELECT bg.doc_id,
               COUNT(*) AS n_bigrams,
               SUM(freq.corpus_n) AS familiarity_sum
        FROM bg JOIN freq ON bg.bigram = freq.bigram
        GROUP BY bg.doc_id
    )
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(familiarity_sum AS BIGINT) AS familiarity_sum,
           familiarity_sum * 10 >= n_bigrams * 15 AS keep
    FROM scored
    """,
    tags=("ext", "text", "quality", "lm"),
)
def text_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative language-model familiarity score — the
    integer-exact stand-in for the CCNet/KenLM perplexity filter: a
    document whose bigrams are RARE across the corpus reads as
    unusual text (noise, boilerplate-stripped fragments, wrong
    language); one whose bigrams are common reads as fluent. Score =
    mean corpus frequency of the doc's bigrams, carried as the exact
    integer pair (familiarity_sum, n_bigrams); ``keep`` compares the
    mean against 1.5 by cross-multiplied integers, so no float
    boundary exists anywhere.

    Scale posture: the corpus bigram table is the classic inverted-
    index aggregation (explode → map-side-combined count keyed on the
    bigram — the shuffle carries vocabulary-sized pairs, not corpus
    text); scoring joins each doc's bigrams back against that table
    (same key, same partitioning — AQE reuses the exchange) and
    reduces per doc_id. The KenLM upgrade path keeps this exact
    shape: the n-gram table becomes the model, the join becomes a
    log-prob lookup."""
    docs = t(spark, sf_dir, "documents")
    bg = (
        docs.select("doc_id", F.expr(TOKS_SPARK).alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
                )
            ).alias("bigram"),
        )
    )
    freq = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("corpus_n"))
    return (
        bg.join(freq, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("corpus_n").alias("familiarity_sum"),
        )
        .select(
            "doc_id",
            F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
            F.col("familiarity_sum").cast("bigint").alias("familiarity_sum"),
            (F.col("familiarity_sum") * 10 >= F.col("n_bigrams") * 15).alias("keep"),
        )
    )


# -- PII redaction ---------------------------------------------------------

#: Identical regex semantics in Java (Spark) and RE2 (DuckDB): no
#: lookaround, no word boundaries, explicit character classes only.
PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+"
PII_PHONE = "\\+[0-9][0-9]?-[0-9]{3}-[0-9]{4}"
PII_IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


@query(
    "text_pii_redact",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com call +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                   AS full_text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(full_text, '{PII_EMAIL}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(full_text, '{PII_PHONE}')) AS BIGINT)
               AS n_phones,
           CAST(len(regexp_extract_all(
               regexp_replace(full_text, '{PII_EMAIL}', '<EMAIL>', 'g'),
               '{PII_IP}')) AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(
               full_text,
               '{PII_EMAIL}', '<EMAIL>', 'g'),
               '{PII_PHONE}', '<PHONE>', 'g'),
               '{PII_IP}', '<IP>', 'g')) AS redacted_hash
    FROM aug
    """,
    tags=("ext", "text", "pii"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (training-data compliance scrub): emails,
    phone numbers, and IPv4 addresses are replaced with typed
    placeholder tokens; per-document match counts travel alongside an
    md5 of the redacted text, so the differential gate pins the exact
    redacted byte stream. The synthetic corpus carries no PII, so the
    query stage deterministically augments each document with
    doc_id-derived contact strings — the redaction kernel itself is
    the operator under test and applies to any text column.

    IP counting runs on the email-redacted text (an email's numeric
    domain could otherwise double-count); replacement order is
    email → phone → IP for the same reason.

    Scale posture: pure per-row regexp projection — whole-stage
    codegen, no shuffle, no Python; redaction runs at scan speed,
    the same cost class as tokenization."""
    docs = t(spark, sf_dir, "documents")
    full = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    aug = docs.select("doc_id", full.alias("full_text"))
    no_email = F.regexp_replace("full_text", PII_EMAIL, "<EMAIL>")
    redacted = F.regexp_replace(
        F.regexp_replace(no_email, PII_PHONE, "<PHONE>"), PII_IP, "<IP>"
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("full_text", F.lit(PII_EMAIL), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("full_text", F.lit(PII_PHONE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(no_email, F.lit(PII_IP), F.lit(0)))
        .cast("bigint")
        .alias("n_ips"),
        F.md5(redacted).alias("redacted_hash"),
    )


# -- URL canonicalization --------------------------------------------------


@query(
    "fn_url_normalize",
    oracle="""
    WITH aug AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'HTTP' ELSE 'https' END
               || '://WWW.' || source || '-Mirror' || CAST(doc_id % 4 AS VARCHAR)
               || '.Example.COM'
               || CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END
               || '/Docs/' || CAST(doc_id AS VARCHAR) || '/'
               || '?utm_source=feed&id=' || CAST(doc_id % 100 AS VARCHAR)
               || '&utm_campaign=x#section-' || CAST(doc_id % 7 AS VARCHAR)
                   AS raw_url
        FROM documents
    ),
    norm AS (
        SELECT doc_id, raw_url,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(
                   raw_url,
                   '#.*$', '', 'g'),                  -- drop fragment
                   '([?&])utm_[a-zA-Z_]+=[^&]*', '\\1', 'g'), -- drop utm params
                   '[?&]+$', '', 'g'),                -- dangling separators
                   '&&+', '&', 'g'),                  -- collapse doubled &
                   '\\?&', '?', 'g'),                 -- ?& -> ?
                   ':443/', '/', 'g')                 -- default port
                   AS u1
        FROM aug
    ),
    lowered AS (
        SELECT doc_id, raw_url,
               regexp_replace(
                   lower(regexp_extract(u1, '^[a-zA-Z]+://[^/]*'))
                   || regexp_replace(u1, '^[a-zA-Z]+://[^/]*', ''),
                   '/\\?', '?', 'g')
                   AS url_norm
        FROM norm
    )
    SELECT doc_id, raw_url, url_norm,
           md5(url_norm) AS url_key
    FROM lowered
    """,
    tags=("ext", "text", "url"),
)
def fn_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization (web-corpus dedup prerequisite): lowercase
    scheme+host, strip the default :443 port, drop fragments and
    utm_* tracking params, clean dangling separators — so crawl
    variants of one resource share a canonical key. The corpus has no
    URL column, so the query augments each doc with a deterministic
    messy URL (mixed case, tracking params, fragment, default port);
    the normalization chain is the operator under test. Path and
    query CASE is preserved (case-sensitive per RFC 3986); only
    scheme/host fold.

    Scale posture: pure per-row regexp projection — no shuffle, scan
    speed; the url_key md5 is what a downstream exact-dedup groupBy
    keys on."""
    docs = t(spark, sf_dir, "documents")
    raw = F.concat(
        F.when(F.col("doc_id") % 3 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://WWW."),
        F.col("source"),
        F.lit("-Mirror"),
        (F.col("doc_id") % 4).cast("string"),
        F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 2 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Docs/"),
        F.col("doc_id").cast("string"),
        F.lit("/"),
        F.lit("?utm_source=feed&id="),
        (F.col("doc_id") % 100).cast("string"),
        F.lit("&utm_campaign=x#section-"),
        (F.col("doc_id") % 7).cast("string"),
    )
    aug = docs.select("doc_id", raw.alias("raw_url"))
    u1 = F.col("raw_url")
    for pat, repl in [
        ("#.*$", ""),
        ("([?&])utm_[a-zA-Z_]+=[^&]*", "$1"),
        ("[?&]+$", ""),
        ("&&+", "&"),
        ("\\?&", "?"),
        (":443/", "/"),
    ]:
        u1 = F.regexp_replace(u1, pat, repl)
    host = F.lower(F.regexp_extract(u1, "^[a-zA-Z]+://[^/]*", 0))
    rest = F.regexp_replace(u1, "^[a-zA-Z]+://[^/]*", "")
    url_norm = F.regexp_replace(F.concat(host, rest), "/\\?", "?")
    return aug.select(
        "doc_id",
        "raw_url",
        url_norm.alias("url_norm"),
        F.md5(url_norm).alias("url_key"),
    )


# -- BPE vocab-induction step ----------------------------------------------

BPE_TOP_PAIRS = 10  # report the N most frequent adjacent symbol pairs


@query(
    "text_bpe_pair_counts",
    oracle=f"""
    WITH toks AS (
        SELECT unnest({TOKS_DUCK}) AS tok FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(generate_series(1, length(tok) - 1),
                                     i -> substr(tok, CAST(i AS INT), 2)))
               AS pair
        FROM toks WHERE length(tok) >= 2
    )
    SELECT pair, COUNT(*) AS n_occurrences,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, pair) AS merge_rank
    FROM pairs GROUP BY pair
    ORDER BY merge_rank LIMIT {BPE_TOP_PAIRS}
    """,
    tags=("ext", "text", "bpe"),
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE tokenizer-training inner loop, distributed: count every
    ADJACENT SYMBOL PAIR across the corpus token stream and rank the
    merge candidates — rank 1 is the pair the next BPE merge would
    fuse. (Full training iterates: merge rank-1, recount; each
    iteration is exactly this job over the re-segmented corpus, so
    the per-iteration cost — not expressible-at-all — is what decides
    BPE feasibility at 100 TB.)

    Implementation: adjacent pairs are emitted INSIDE each row
    (substr(tok, i, 2) over a higher-order transform) — no positional
    self-join anywhere — then one explode + one groupBy. Deterministic
    tie-break (count DESC, pair) keeps the merge choice engine-stable.

    Scale posture: pure per-row pair emission + one map-side-combined
    groupBy on the pair (|alphabet|² keys at most) — the canonical
    word-count shape; the top-N is dimension-sized."""
    from pyspark.sql import Window

    docs = _spread(t(spark, sf_dir, "documents"))
    # length(tok) >= 2 guard: Spark's sequence(1, 0) auto-DESCENDS
    # ([1, 0]), so an unguarded transform would emit a 1-char token's
    # character twice as a phantom "pair" (DuckDB's generate_series(1,0)
    # is empty — the engines would diverge on any corpus where 1-char
    # tokens are frequent).
    pairs = (
        docs.select(F.explode(F.expr(TOKS_SPARK)).alias("tok"))
        .filter(F.length("tok") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(tok) - 1),"
                    " i -> substr(tok, i, 2))"
                )
            ).alias("pair")
        )
    )
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n_occurrences"))
    # TakeOrdered(N) first — distributed per-partition top-k merge —
    # then the ranking window runs over just N rows (same shape as
    # plans/graph.py; a global row_number over every pair key would
    # single-partition the |alphabet|² table).
    top = counted.orderBy(F.desc("n_occurrences"), "pair").limit(BPE_TOP_PAIRS)
    w = Window.orderBy(F.desc("n_occurrences"), "pair")
    return (
        top.withColumn("merge_rank", F.row_number().over(w))
        .select("pair", "n_occurrences", "merge_rank")
    )


# -- length-bucketed batch planning ----------------------------------------

LEN_BUCKET_MULT = 8  # sequences pad to the next multiple of 8 tokens


@query(
    "text_length_buckets",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, len({TOKS_DUCK}) AS n_tokens FROM documents
    ),
    b AS (
        SELECT doc_id, n_tokens,
               CAST(((n_tokens + {LEN_BUCKET_MULT} - 1) // {LEN_BUCKET_MULT})
                    * {LEN_BUCKET_MULT} AS BIGINT) AS bucket_len
        FROM d WHERE n_tokens > 0
    )
    SELECT bucket_len,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) * bucket_len AS BIGINT) AS padded_tokens,
           CAST(10000 * (COUNT(*) * bucket_len - SUM(n_tokens))
                // (COUNT(*) * bucket_len) AS BIGINT) AS waste_bps
    FROM b GROUP BY bucket_len
    """,
    tags=("ext", "text", "batching"),
)
def text_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch planning (padding-waste minimization):
    documents are grouped into pad-to-multiple-of-8 length buckets —
    the batching strategy that replaces pad-everything-to-global-max —
    and each bucket reports its exact padding waste in integer basis
    points. tests/test_ext_pipeline.py proves the bucketed plan
    strictly dominates global padding on this corpus (the whole point
    of the operator).

    Scale posture: one scan-shaped token count + one groupBy on the
    bucket id (≤ max_len/8 groups — dimension-sized); the bucket
    assignment is what a batch-building `repartitionByRange` or
    writer partitionBy keys on downstream."""
    docs = _spread(t(spark, sf_dir, "documents"))
    b = docs.select(
        F.size(F.expr(TOKS_SPARK)).alias("n_tokens")
    ).filter(F.col("n_tokens") > 0).select(
        "n_tokens",
        F.expr(
            f"cast(((n_tokens + {LEN_BUCKET_MULT} - 1) div {LEN_BUCKET_MULT})"
            f" * {LEN_BUCKET_MULT} as bigint)"
        ).alias("bucket_len"),
    )
    return b.groupBy("bucket_len").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.count(F.lit(1)) * F.col("bucket_len")).alias("padded_tokens"),
        F.expr(
            "cast(10000 * (count(1) * bucket_len - sum(n_tokens))"
            " div (count(1) * bucket_len) as bigint)"
        ).alias("waste_bps"),
    )


# -- distinctive-keyword extraction ----------------------------------------

KW_PER_DOC = 3  # keep the N most corpus-distinctive terms per doc


@query(
    "text_idf_keywords",
    oracle=f"""
    WITH dt AS (
        SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id, unnest({TOKS_DUCK}) AS tok FROM documents
        )
    ),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok),
    ranked AS (
        SELECT dt.doc_id, dt.tok, dfreq.df,
               ROW_NUMBER() OVER (
                   PARTITION BY dt.doc_id ORDER BY dfreq.df, dt.tok
               ) AS kw_rank
        FROM dt JOIN dfreq USING (tok)
    )
    SELECT doc_id, tok, df, kw_rank FROM ranked WHERE kw_rank <= {KW_PER_DOC}
    """,
    tags=("ext", "text", "keywords"),
)
def text_idf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document distinctive-keyword extraction (the IDF half of
    TF-IDF): each doc's top-N rarest terms by corpus document
    frequency — the keywords that route documents to topics, power
    near-dup triage ("same keywords, different text?"), and label
    clusters. Ranking is purely ORDINAL — (df ASC, term ASC) — so no
    log()/division enters the comparison and no float boundary can
    flip a keyword between engines (idf = log(N/df) is monotone in df,
    so the ordinal rank IS the IDF rank).

    Scale posture: three key-partitioned exchanges, each on a
    different natural key — distinct on (doc, term), document
    frequency as a map-side-combined groupBy on term, and the per-doc
    top-N window on doc_id (bounded by per-doc vocabulary). The df
    table is vocabulary-sized; at 100 TB broadcast its hot head and
    the join stays shuffle-light under AQE."""
    docs = _spread(t(spark, sf_dir, "documents"))
    dt = (
        docs.select("doc_id", F.explode(F.expr(TOKS_SPARK)).alias("tok"))
        .distinct()
    )
    dfreq = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("df", "tok")
    return (
        dt.join(dfreq, "tok")
        .withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= KW_PER_DOC)
        .select("doc_id", "tok", "df", "kw_rank")
    )


# -- wordlist safety filter -------------------------------------------------

BLOCK_TERMS = "'slow','crash','leak'"  # demo wordlist over this corpus
BLOCK_MIN_HITS = 3  # threshold: incidental single hits pass


@query(
    "text_blocklist_filter",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               len(list_filter({TOKS_DUCK},
                               x -> list_contains([{BLOCK_TERMS}], x)))
                   AS n_hits
        FROM documents
    )
    SELECT doc_id, n_hits,
           CASE WHEN n_hits >= {BLOCK_MIN_HITS} THEN 'drop' ELSE 'keep' END
               AS action
    FROM h
    """,
    tags=("ext", "text", "safety"),
)
def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wordlist safety filter (the toxicity/spam gate every corpus
    pipeline runs): count blocklist-term hits per document and decide
    keep/drop by a THRESHOLD — single incidental mentions pass, term-
    dense documents drop (binary single-hit blocking would censor
    quotation and discussion; production wordlist scorers threshold
    for exactly this reason). The verdict row carries the hit count so
    the borderline band can be routed to a model-based classifier.

    Scale posture: pure per-row projection over a LITERAL (broadcast-
    free) wordlist — scan speed; for a 10⁵-term production wordlist
    the same shape switches to an Aho-Corasick pandas UDF or a
    broadcast token semi-join, keeping the one-pass property."""
    docs = t(spark, sf_dir, "documents")
    n_hits = F.expr(
        f"size(filter({TOKS_SPARK}, x -> array_contains(array({BLOCK_TERMS}), x)))"
    )
    return docs.select(
        "doc_id",
        n_hits.alias("n_hits"),
        F.when(F.col("n_hits") >= BLOCK_MIN_HITS, "drop")
        .otherwise("keep")
        .alias("action"),
    )


@query(
    "text_trigram_lm_score",
    oracle="""
    WITH tri AS (
        SELECT doc_id, lang, substr(text, CAST(i AS INTEGER), 3) AS tri
        FROM (
            SELECT doc_id, lang, text,
                   unnest(generate_series(1, len(text) - 2)) AS i
            FROM documents WHERE len(text) >= 3
        )
    ),
    counts AS (
        SELECT lang, tri, COUNT(*) AS corpus_n FROM tri GROUP BY lang, tri
    ),
    scored AS (
        SELECT t.doc_id, t.lang,
               COUNT(*) AS n_tri,
               CAST(SUM(c.corpus_n) AS BIGINT) AS sum_freq
        FROM tri t JOIN counts c ON t.lang = c.lang AND t.tri = c.tri
        GROUP BY t.doc_id, t.lang
    )
    SELECT lang, doc_id, n_tri, sum_freq,
           CAST(sum_freq AS DOUBLE) / CAST(n_tri AS DOUBLE) AS score,
           lm_rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY lang
            ORDER BY CAST(sum_freq AS DOUBLE) / CAST(n_tri AS DOUBLE) ASC,
                     doc_id
        ) AS lm_rank
        FROM scored
    ) ranked
    WHERE lm_rank <= 5
    """,
    tags=("text", "lm", "quality", "language-model"),
)
def text_trigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language-model quality score — the CCNet/
    KenLM-style perplexity-proxy filter every pretraining pipeline
    runs: train trigram statistics ON THE CORPUS ITSELF (per
    language), score each document by how typical its trigrams are,
    and surface the 5 LEAST-typical documents per language (the
    gibberish/boilerplate/encoding-damage candidates a quality gate
    drops or routes to review).

    Cross-engine exactness: the score is avg corpus frequency of the
    doc's trigrams = SUM(corpus_count)/n_trigrams — both operands
    exact integers, so the IEEE division (and therefore the ranking)
    is bit-identical on both engines; no float logs anywhere. A real
    log-prob LM orders documents identically under the monotone
    avg-frequency proxy at fixed length.

    Scale posture (r16 two-level aggregation — measured 2x at sf0.1,
    4.6x at sf1 over the direct form): one explode over characters
    (corpus-linear, spread across cores via cpu_spread — the
    single-file documents table would otherwise serialize) feeds ONE
    shuffle to per-document trigram counts ``(doc_id, lang, tri,
    d_n)``; everything downstream works on that aggregated relation —
    the corpus counts are a second, much smaller (lang, tri) agg of
    it, and the join back is distinct-(doc,tri)-sized instead of
    trigram-INSTANCE-sized. The direct form exploded the corpus TWICE
    (once per side of the join) and shuffled every trigram instance
    into the join; in-document repetition (natural language repeats
    trigrams heavily) is collapsed before any join here. Identities:
    ``n_tri = SUM(d_n)``, ``sum_freq = SUM(d_n * corpus_n)`` — exact
    integers, so the result is bit-identical to the direct form (A/B
    checked). The per-language top-5 is dimension-sized. Guard:
    Spark's sequence(1, n) DESCENDS for n <= 0, so length >= 3 is
    filtered up front (DuckDB's generate_series is empty there — the
    engines would otherwise diverge on short docs)."""
    from pyspark.sql import Window

    docs = _spread(t(spark, sf_dir, "documents"))
    tri = (
        docs.filter(F.length("text") >= 3)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(text) - 2),"
                    " i -> substr(text, i, 3))"
                )
            ).alias("tri"),
        )
    )
    tri_doc = tri.groupBy("doc_id", "lang", "tri").agg(
        F.count(F.lit(1)).alias("d_n")
    )
    counts = tri_doc.groupBy("lang", "tri").agg(
        F.sum("d_n").alias("corpus_n")
    )
    scored = (
        tri_doc.join(counts, ["lang", "tri"])
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("d_n").alias("n_tri"),
            F.sum(F.col("d_n") * F.col("corpus_n")).alias("sum_freq"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("score").asc(), F.col("doc_id"))
    return (
        scored.withColumn(
            "score",
            F.col("sum_freq").cast("double") / F.col("n_tri").cast("double"),
        )
        .withColumn("lm_rank", F.row_number().over(w))
        .filter(F.col("lm_rank") <= 5)
        .select("lang", "doc_id", "n_tri", "sum_freq", "score", "lm_rank")
    )


# -- hashed linear quality classifier ---------------------------------------

#: Feature-hashing bucket count. 2^10 keeps the oracle SQL legible;
#: production fastText uses 2^21 — the plan shape is identical.
HASH_CLS_BUCKETS = 1024

# 60-bit md5 hashes (the repo-wide portable-hash idiom): Spark and
# DuckDB spellings of the same integer.
_HB_SPARK = (
    "cast(conv(substr(md5(x), 1, 15), 16, 10) as bigint)"
    f" % {HASH_CLS_BUCKETS}"
)
_HB_DUCK = (
    "CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)"
    f" % {HASH_CLS_BUCKETS}"
)
_W_SPARK = (
    "cast(conv(substr(md5(concat('w:', cast(("
    + _HB_SPARK
    + ") as string))), 1, 15), 16, 10) as bigint) % 2001 - 1000"
)
_W_DUCK = (
    "CAST('0x' || substr(md5('w:' || CAST(("
    + _HB_DUCK
    + ") AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000"
)


@query(
    "text_hash_classifier",
    oracle=f"""
    WITH scored AS (
        SELECT lang,
               COALESCE(list_aggregate(
                   list_transform({TOKS_DUCK}, x -> {_W_DUCK}), 'sum'
               ), 0) AS score
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (score >= 0) AS n_keep,
           CAST(10000 * COUNT(*) FILTER (score >= 0) // COUNT(*) AS BIGINT)
               AS keep_bps,
           CAST(SUM(score) AS BIGINT) AS sum_score
    FROM scored GROUP BY lang
    """,
    tags=("ext", "text", "classifier"),
)
def text_hash_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality classifier (the fastText serving
    shape, per CCNet/DataComp quality gates): token → feature-hash
    bucket (``HASH_CLS_BUCKETS``-way, md5-derived) → per-bucket weight
    → doc score = Σ weights; keep iff score ≥ 0. The weights here are
    hash-derived placeholders — a TRAINED model drops in as the same
    bucket → weight map (broadcast, or inlined as expression exactly
    like this) with zero plan change, which is the point: scoring a
    linear bag-of-words model is a pure per-row fold, not an ML-
    runtime dependency.

    Scale posture: score is computed IN-ROW (``transform`` +
    ``aggregate`` over the token array — no explode, so a zero-token
    doc can't vanish and the corpus is never amplified); the only
    shuffle is the |langs|-sized rollup. Runs at scan speed at 100 TB.
    Sums and the keep decision are exact integers; ``keep_bps``
    divides non-negative integers, so Spark ``div`` and DuckDB ``//``
    agree."""
    docs = t(spark, sf_dir, "documents")
    scored = docs.select(
        "lang",
        F.expr(
            f"aggregate(transform({TOKS_SPARK}, x -> {_W_SPARK}),"
            " 0L, (acc, w) -> acc + w)"
        ).alias("score"),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("score") >= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_keep"),
        F.expr(
            "cast(10000 * sum(case when score >= 0 then 1 else 0 end)"
            " div count(1) as bigint)"
        ).alias("keep_bps"),
        F.sum("score").cast("bigint").alias("sum_score"),
    )


# -- vocabulary / Zipf datasheet --------------------------------------------


@query(
    "text_vocab_stats",
    oracle=f"""
    WITH tok AS (SELECT unnest({TOKS_DUCK}) AS tok FROM documents),
    cnt AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok),
    tot AS (
        SELECT COUNT(*) AS vocab_size,
               SUM(n) AS total_tokens,
               COUNT(*) FILTER (n = 1) AS hapax_count,
               COUNT(*) FILTER (n = 2) AS dis_count
        FROM cnt
    ),
    top10 AS (
        SELECT SUM(n) AS top_n FROM
            (SELECT n FROM cnt ORDER BY n DESC, tok LIMIT 10)
    )
    SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(hapax_count AS BIGINT) AS hapax_count,
           CAST(dis_count AS BIGINT) AS dis_count,
           CAST(10000 * vocab_size // total_tokens AS BIGINT)
               AS type_token_bps,
           CAST(10000 * top_n // total_tokens AS BIGINT)
               AS top10_coverage_bps
    FROM tot, top10
    """,
    tags=("ext", "text", "datasheet", "bounded-nlj"),
)
def text_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary datasheet: vocabulary size, total token count,
    hapax/dis legomena counts (the Zipf-tail mass — a high hapax share
    flags OCR noise or junk tokenization; a LOW one flags template
    spam), type-token ratio, and top-10-token coverage (the Zipf-head
    mass) — all in integer basis points. These are the
    corpus-composition numbers a dataset card reports next to
    ``text_corpus_datasheet``'s per-language table.

    Scale posture: one word-count-shaped groupBy (map-side partials
    collapse to vocabulary-sized data before the exchange), then
    vocabulary-sized rollups; the top-10 head is
    TakeOrderedAndProject, never a global sort. The final 1-row
    combine is the tagged bounded nested loop."""
    docs = t(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.expr(TOKS_SPARK)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cnt = cnt.localCheckpoint(eager=False)  # two consumers: totals + head
    tot = cnt.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("n").alias("total_tokens"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("hapax_count"),
        F.sum(F.when(F.col("n") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("dis_count"),
    )
    top10 = (
        cnt.orderBy(F.desc("n"), "tok")
        .limit(10)
        .agg(F.sum("n").alias("top_n"))
    )
    return tot.crossJoin(top10).select(
        "vocab_size",
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        "hapax_count",
        "dis_count",
        F.expr("cast(10000 * vocab_size div total_tokens as bigint)").alias(
            "type_token_bps"
        ),
        F.expr("cast(10000 * top_n div total_tokens as bigint)").alias(
            "top10_coverage_bps"
        ),
    )


# -- BPE tokenizer APPLICATION ----------------------------------------------

#: Frozen merge table in APPLICATION order — the vocabulary artifact a
#: trained tokenizer ships (these are the merges ``text_bpe_pair_counts``
#: ranks highest on English corpora, frozen as literals so both engines
#: apply the identical vocabulary; a live tokenizer loads exactly such a
#: frozen list, it never re-trains at encode time). Later merges build
#: on earlier ones ('t'+'h' -> 'th', then 'th'+'e' -> 'the').
BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"), ("i", "n"),
    ("in", "g"), ("e", "r"), ("o", "n"), ("r", "e"), ("o", "f"),
    ("e", "d"), ("e", "s"),
]


def _bpe_merge_chain(base: str) -> str:
    """Nested ``replace`` expression applying every merge in order to a
    space-separated symbol string (identical function name + semantics
    in Spark SQL and DuckDB: replace ALL non-overlapping occurrences,
    scanning left to right). Each merge is ONE greedy pass — two
    adjacent occurrences sharing a boundary space leave the second
    unmerged, deterministically, on both engines; that single-pass
    greedy semantics IS this operator's contract (documented, stable),
    chosen over iterate-to-fixpoint because it keeps the expression a
    fixed-depth codegen-able tree."""
    expr = base
    for a, b in BPE_MERGES:
        expr = f"replace({expr}, ' {a} {b} ', ' {a}{b} ')"
    return expr


#: per-word symbol string: ' a b c ' (one leading space; the per-char
#: regexp replacement appends one trailing space per symbol)
_BPE_BASE_SPARK = "concat(' ', regexp_replace(w, '(.)', '$1 '))"
_BPE_BASE_DUCK = "' ' || regexp_replace(w, '(.)', '\\1 ', 'g')"


@query(
    "text_bpe_apply",
    oracle=f"""
    WITH words AS (
        SELECT doc_id, unnest({TOKS_DUCK}) AS w FROM documents
    ),
    enc AS (
        SELECT doc_id,
               length(w) AS n_chars,
               len(string_split(trim({_bpe_merge_chain(_BPE_BASE_DUCK)}),
                                ' ')) AS n_sym
        FROM words
    )
    SELECT doc_id,
           COUNT(*) AS n_words,
           CAST(SUM(n_chars) AS BIGINT) AS n_alpha_chars,
           CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens,
           CAST(10000 * CAST(SUM(n_sym) AS BIGINT)
                // CAST(SUM(n_chars) AS BIGINT) AS BIGINT)
               AS compression_bps
    FROM enc GROUP BY doc_id
    """,
    tags=("ext", "text", "bpe"),
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — the encode half that completes the
    tokenizer loop ``text_bpe_pair_counts`` trains for: apply a frozen,
    ordered merge table to every word of every document and report the
    per-document token count and char->token compression. This is the
    'how many training tokens is this corpus' pass every LLM data
    pipeline runs before packing.

    Encoding is IN-ROW: each word becomes a space-separated symbol
    string and the merge table is applied as a fixed chain of
    ``replace`` calls (greedy single pass per merge, in merge-priority
    order — see ``_bpe_merge_chain``). No explode-per-character, no
    per-merge shuffle, no Python: the whole encoder is one
    whole-stage-codegen projection.

    Scale posture: explode(words) -> in-row encode -> ONE
    map-side-combined groupBy(doc_id) — and the words of a document
    colocate with their scan partition, so the partial aggregate
    collapses each doc to one row before the shuffle. Word-count
    shape; runs at scan speed on 100 TB. The merge table is a
    broadcast-free literal baked into the plan (a real vocab of 32k
    merges would ride a broadcast variable into a pandas UDF — the
    12-merge literal chain here keeps both engines bit-identical,
    which is what the oracle gate needs).

    Cf. reference data-processing role: the platform delegates batch
    text processing to its provisioned engine
    (``internal/controller/kyuubi.go:189-203``); tokenizer-application
    is implemented natively here."""
    docs = _spread(t(spark, sf_dir, "documents"))
    words = docs.select(
        "doc_id", F.explode(F.expr(TOKS_SPARK)).alias("w")
    )
    enc = words.select(
        "doc_id",
        F.length("w").cast("bigint").alias("n_chars"),
        F.expr(
            f"cast(size(split(trim({_bpe_merge_chain(_BPE_BASE_SPARK)}),"
            " ' ')) as bigint)"
        ).alias("n_sym"),
    )
    return enc.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_chars").cast("bigint").alias("n_alpha_chars"),
        F.sum("n_sym").cast("bigint").alias("n_bpe_tokens"),
    ).select(
        "doc_id",
        "n_words",
        "n_alpha_chars",
        "n_bpe_tokens",
        F.expr(
            "cast(10000 * n_bpe_tokens div n_alpha_chars as bigint)"
        ).alias("compression_bps"),
    )


@query(
    "text_snapshot_drift",
    oracle="""
    WITH h AS (
        SELECT lang, source,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)
                    AS BIGINT) AS hb
        FROM documents
    ),
    grid AS (
        SELECT lang, source,
            CAST(SUM(CASE WHEN hb % 10 < 8
                           AND NOT (lang = 'fr' AND hb % 3 = 0)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
            CAST(SUM(CASE WHEN hb % 10 >= 2
                           AND NOT (lang = 'de' AND hb % 2 = 0)
                           AND NOT (lang = 'zh' AND source = 'src0')
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        FROM h
        GROUP BY lang, source
    ),
    tot AS (
        SELECT CAST(SUM(n_old) AS BIGINT) AS t_old,
               CAST(SUM(n_new) AS BIGINT) AS t_new
        FROM grid
    )
    SELECT lang, source, n_old, n_new,
        CASE
            WHEN n_old + n_new < 20 THEN 'low_support'
            WHEN n_old = 0 AND n_new > 0 THEN 'new'
            WHEN n_old > 0 AND n_new = 0 THEN 'gone'
            WHEN 100 * n_new * t_old > 125 * n_old * t_new THEN 'drift_up'
            WHEN 100 * n_new * t_old < 80 * n_old * t_new THEN 'drift_down'
            ELSE 'stable'
        END AS status
    FROM grid CROSS JOIN tot
    WHERE n_old + n_new > 0
    """,
    tags=("ext", "text", "drift", "dq", "bounded-nlj"),
)
def text_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot drift monitor — the "did my pipeline silently
    change the mixture" gate a training-data refresh needs (the text
    twin of ``emb_centroid_drift``): compare the per-(lang, source)
    cell distribution between two corpus snapshots and classify each
    cell as stable / drift_up / drift_down / new / gone /
    low_support. Snapshots are deterministic md5-hash-keyed views of
    the corpus simulating an upstream change: the new snapshot loses
    half of 'de' (ingestion regression → drift_down), the old one
    lacked a third of 'fr' (its share RISES in the new snapshot →
    drift_up), and (zh, src0) disappears entirely (gone). Membership
    is keyed on the md5 3-hex-digit bucket of doc_id, NOT doc_id
    modulo — the testdata assigns ``source = src(doc_id % 20)``, so
    any modulo split is CONFOUNDED with source and fabricates
    wholesale new/gone cells (found while calibrating this query).

    Drift is decided in EXACT INTEGERS — a cell's share ratio
    (n_new/t_new)/(n_old/t_old) is outside [0.80, 1.25] iff
    ``100·n_new·t_old <> {80,125}·n_old·t_new`` — no float division,
    so the boundary cell never flips between engines. Cells with
    fewer than 20 docs across both snapshots report ``low_support``
    instead of a noise-driven verdict (the standard monitor guard).
    At trillion-doc scale route the two cross-products through
    DECIMAL(38,0); the shape is unchanged.

    Scale posture: ONE corpus scan → map-side-combined hash agg on the
    (lang, source) grid (thousands of cells, never rows); totals are
    an agg OF THE GRID, broadcast back as a 1-row frame (bounded-nlj).
    At 100 TB this runs at scan speed with a cells-sized shuffle.
    Reference scope: corpus governance is engine-delegated
    (``internal/controller/kyuubi.go:189-203``)."""
    d = t(spark, sf_dir, "documents").withColumn(
        "hb",
        F.expr(
            "cast(conv(substr(md5(cast(doc_id as string)), 1, 3), 16, 10)"
            " as bigint)"
        ),
    )
    is_old = (F.col("hb") % 10 < 8) & ~(
        (F.col("lang") == "fr") & (F.col("hb") % 3 == 0)
    )
    is_new = (
        (F.col("hb") % 10 >= 2)
        & ~((F.col("lang") == "de") & (F.col("hb") % 2 == 0))
        & ~((F.col("lang") == "zh") & (F.col("source") == "src0"))
    )
    grid = d.groupBy("lang", "source").agg(
        F.sum(is_old.cast("bigint")).alias("n_old"),
        F.sum(is_new.cast("bigint")).alias("n_new"),
    )
    tot = grid.agg(
        F.sum("n_old").alias("t_old"), F.sum("n_new").alias("t_new")
    )
    up = F.lit(100) * F.col("n_new") * F.col("t_old") > F.lit(125) * F.col(
        "n_old"
    ) * F.col("t_new")
    down = F.lit(100) * F.col("n_new") * F.col("t_old") < F.lit(80) * F.col(
        "n_old"
    ) * F.col("t_new")
    status = (
        F.when(F.col("n_old") + F.col("n_new") < 20, "low_support")
        .when((F.col("n_old") == 0) & (F.col("n_new") > 0), "new")
        .when((F.col("n_old") > 0) & (F.col("n_new") == 0), "gone")
        .when(up, "drift_up")
        .when(down, "drift_down")
        .otherwise("stable")
    )
    return (
        grid.crossJoin(F.broadcast(tot))
        .filter(F.col("n_old") + F.col("n_new") > 0)
        .select("lang", "source", "n_old", "n_new", status.alias("status"))
    )
