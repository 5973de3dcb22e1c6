"""[EXT] Hybrid retrieval: lexical + vector search fused with
reciprocal-rank fusion (RRF).

The retrieval stack RAG pipelines actually deploy: a lexical leg
(token-overlap scoring — the degenerate-but-deterministic BM25) and a
vector leg (exact cosine) each produce a per-query ranked list; RRF
combines them as score = Σ_legs 1/(60 + rank) — rank-space fusion, so
the two legs' incomparable score scales never meet. Queries are the
docs with doc_id < 5 (their embeddings are vec_id < 5 — the testdata
pairs documents and embeddings by id), candidates are the rest.

Scale posture: both legs broadcast the |Q|-row query side and stream
the corpus (the `ann_cosine_topk` shape); per-leg rank is a window
keyed on query_id; the fusion is a (query, doc)-keyed full-outer join
of two ≤RRF_DEPTH-deep lists — dimension-sized. At 100 TB the legs
swap in their indexed forms (inverted index / PQ+re-rank) and the
fusion stage is UNCHANGED — that's the point of rank-space fusion.

Determinism: overlap counts are integers; cosine is the shared
sequential fold; 1/(60+rank) is one IEEE division and the fused score
adds two such terms in fixed order — bit-stable on both engines; all
rank ties pinned by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import t
from nineinfra_spark.plans.ext_similarity import COS_DUCK, COS_SPARK, N_QUERIES
from nineinfra_spark.plans.ext_text import TOKS_DUCK, TOKS_SPARK
from nineinfra_spark.plans.registry import query

RRF_DEPTH = 20  # per-leg list depth
RRF_K = 60  # the standard RRF dampening constant
HYBRID_TOP = 10  # fused results per query


def _hybrid_oracle() -> str:
    cos = COS_DUCK.format(a="q.embedding", b="c.embedding")
    return f"""
    WITH qd AS (
        SELECT doc_id, list_distinct({TOKS_DUCK}) AS toks FROM documents
        WHERE doc_id < {N_QUERIES}
    ),
    cd AS (
        SELECT doc_id, list_distinct({TOKS_DUCK}) AS toks FROM documents
        WHERE doc_id >= {N_QUERIES}
    ),
    lex AS (
        SELECT query_id, doc_id, lrank FROM (
            SELECT qd.doc_id AS query_id, cd.doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY qd.doc_id
                       ORDER BY len(list_intersect(qd.toks, cd.toks)) DESC, cd.doc_id
                   ) AS lrank
            FROM qd, cd
        ) WHERE lrank <= {RRF_DEPTH}
    ),
    vec AS (
        SELECT query_id, doc_id, vrank FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id ORDER BY {cos} DESC, c.vec_id
                   ) AS vrank
            FROM embeddings q JOIN embeddings c
              ON q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
        ) WHERE vrank <= {RRF_DEPTH}
    ),
    fused AS (
        SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
               COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
               COALESCE(1.0 / ({RRF_K} + lrank), 0.0)
                   + COALESCE(1.0 / ({RRF_K} + vrank), 0.0) AS rrf_score,
               lrank, vrank
        FROM lex FULL OUTER JOIN vec
          ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id
    )
    SELECT query_id, doc_id, rrf_score,
           CAST(lrank AS BIGINT) AS lex_rank, CAST(vrank AS BIGINT) AS vec_rank,
           rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY rrf_score DESC, doc_id
               ) AS rank
        FROM fused
    ) WHERE rank <= {HYBRID_TOP}
    """


@query(
    "hybrid_search_rrf",
    oracle=_hybrid_oracle(),
    tags=("ext", "hybrid", "retrieval", "rrf", "bounded-nlj"),
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search with reciprocal-rank fusion: lexical
    token-overlap top-20 ∪ vector cosine top-20, fused by
    1/(60+rank) + 1/(60+rank), top-10 per query. See module docstring
    for the scale contract (legs broadcast |Q| and stream the corpus;
    fusion operates purely in rank space, so indexed legs slot in
    unchanged at 100 TB)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.array_distinct(F.expr(TOKS_SPARK)).alias("toks")
    )
    qd = toks.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("toks").alias("q_toks")
    )
    cd = toks.filter(F.col("doc_id") >= N_QUERIES)

    w_lex = Window.partitionBy("query_id").orderBy(F.desc("overlap"), "doc_id")
    lex = (
        cd.crossJoin(F.broadcast(qd))
        .select(
            "query_id",
            "doc_id",
            F.size(F.array_intersect("q_toks", "toks")).alias("overlap"),
        )
        .withColumn("lrank", F.row_number().over(w_lex))
        .filter(F.col("lrank") <= RRF_DEPTH)
        .select("query_id", "doc_id", "lrank")
    )

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("doc_id"), F.col("embedding").alias("c_emb")
    )
    w_vec = Window.partitionBy("query_id").orderBy(F.desc("cos"), "doc_id")
    vec = (
        c.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "doc_id",
            F.expr(COS_SPARK.format(a="q_emb", b="c_emb")).alias("cos"),
        )
        .withColumn("vrank", F.row_number().over(w_vec))
        .filter(F.col("vrank") <= RRF_DEPTH)
        .select("query_id", "doc_id", "vrank")
    )

    fused = (
        lex.join(vec, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            (
                F.coalesce(1.0 / (F.lit(RRF_K) + F.col("lrank")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("vrank")), F.lit(0.0))
            ).alias("rrf_score"),
            F.col("lrank").cast("bigint").alias("lex_rank"),
            F.col("vrank").cast("bigint").alias("vec_rank"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= HYBRID_TOP)
        .select("query_id", "doc_id", "rrf_score", "lex_rank", "vec_rank", "rank")
    )


# -- BM25 lexical retrieval (integer-exact form) -----------------------------

BM25_TOP = 10
#: idf surrogate scale: idf_int = IDF_SCALE // df — monotone in 1/df
#: (the same no-log idf trick as text_idf_keywords, chosen because
#: ln() is only 1-ulp-accurate and NOT identical across engines).
BM25_IDF_SCALE = 1_000_000


def _bm25_oracle() -> str:
    return f"""
    WITH cd AS (
        SELECT doc_id, {TOKS_DUCK} AS toks FROM documents
        WHERE doc_id >= {N_QUERIES}
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               SUM(len(toks)) AS total_len
        FROM cd
    ),
    tf AS (
        SELECT doc_id, dl, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS tok FROM cd)
        GROUP BY doc_id, dl, tok
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    qt AS (
        SELECT doc_id AS query_id, unnest(list_distinct({TOKS_DUCK})) AS tok
        FROM documents WHERE doc_id < {N_QUERIES}
    ),
    terms AS (
        SELECT qt.query_id, tf.doc_id,
               ({BM25_IDF_SCALE} // df.df) * 44 * s.total_len * tf.tf
                   // (20 * s.total_len * tf.tf + 6 * s.total_len
                       + 18 * tf.dl * s.n_docs) AS term_score
        FROM qt
        JOIN tf ON tf.tok = qt.tok
        JOIN df ON df.tok = qt.tok
        CROSS JOIN stats s
    )
    SELECT query_id, doc_id, score, rank FROM (
        SELECT query_id, doc_id,
               CAST(SUM(term_score) AS BIGINT) AS score,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY SUM(term_score) DESC, doc_id) AS rank
        FROM terms GROUP BY query_id, doc_id
    ) WHERE rank <= {BM25_TOP}
    """


@query(
    "search_bm25_topk",
    oracle=_bm25_oracle(),
    tags=("ext", "hybrid", "retrieval", "bm25", "bounded-nlj"),
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval, top-{BM25_TOP} per query — the REAL
    scorer behind the hybrid leg's token-overlap stand-in: per-term
    tf saturation (k1 = 6/5) and document-length normalization
    (b = 3/4), with the whole per-term score folded into ONE integer
    floor division:

        term = (IDF//df) · 44·L·tf  //  (20·L·tf + 6·L + 18·dl·N)

    (the k1/b rationals cross-multiplied through avgdl = L/N, so no
    float touches the ranking). The idf is the repo's no-log
    surrogate (monotone in 1/df, like ``text_idf_keywords``) because
    ln() is only 1-ulp accurate and differs across engines; a
    production deployment would use float ln-idf and give up
    bit-exact cross-engine ranking — exactly the trade this form
    makes explicit. Integer bound: terms need idf·44·L·tf < 2^63,
    i.e. corpora to ~10^11 total tokens at tf ≤ 100; beyond that,
    drop the IDF_SCALE a few decades.

    Scale posture: the probe is inverted-index-shaped — query terms
    equi-join the (tok, doc, tf) posting table and the |vocab|-sized
    df table; corpus stats broadcast as the tagged 1-row frame;
    per-query heads are rank windows over posting-bounded rows. At
    100 TB the posting table is the thing you'd have materialized
    anyway; nothing here scans all pairs."""
    docs = t(spark, sf_dir, "documents")
    cd = docs.filter(F.col("doc_id") >= N_QUERIES).select(
        "doc_id", F.expr(TOKS_SPARK).alias("toks")
    )
    stats = cd.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("toks")).alias("total_len"),
    )
    tf = (
        cd.select(
            "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok")
        )
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tf = tf.localCheckpoint(eager=False)  # probe + df both consume it
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    qt = docs.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.array_distinct(F.expr(TOKS_SPARK))).alias("tok"),
    )
    terms = (
        qt.join(tf, "tok")
        .join(df, "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                f"({BM25_IDF_SCALE} div df) * 44 * total_len * tf"
                " div (20 * total_len * tf + 6 * total_len"
                " + 18 * dl * n_docs)"
            ).alias("term_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        terms.groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").cast("bigint").alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP)
    )
