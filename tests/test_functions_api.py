"""The curated ``nineinfra_spark.functions`` namespace must agree
exactly with the engine's internal expression paths — same fold
orders, same hash family, same shingle semantics — so a pipeline
built from the public surface hashes identically to the registered
queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from nineinfra_spark import functions as NF
from nineinfra_spark.plans._util import t

SF = "/root/testdata/sf0.001"


def test_cosine_bit_equals_sql_expression(spark):
    from nineinfra_spark.plans.ext_similarity import COS_SPARK

    emb = t(spark, SF, "embeddings")
    pairs = (
        emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
        .join(
            emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb")),
            F.col("id_a") + 1 == F.col("id_b"),
        )
        .select(
            F.expr(COS_SPARK.format(a="ea", b="eb")).alias("sql_cos"),
            NF.cosine_similarity("ea", "eb").alias("api_cos"),
        )
    )
    bad = pairs.filter(F.col("sql_cos") != F.col("api_cos")).count()
    assert bad == 0, f"{bad} pairs differ between SQL and Column-API cosine"


def test_tokens_and_shingles_match_dedup_pipeline(spark):
    from nineinfra_spark.plans.ext_dedup import _shingled
    from nineinfra_spark.plans.ext_text import TOKS_SPARK

    docs = t(spark, SF, "documents")
    api = docs.select(
        "doc_id", NF.ngram_shingles(NF.tokens("text"), 5).alias("api_sh")
    )
    internal = _shingled(spark, SF).select("doc_id", F.col("shingles").alias("int_sh"))
    joined = api.join(internal, "doc_id")
    bad = joined.filter(F.col("api_sh") != F.col("int_sh")).count()
    assert bad == 0

    tok_bad = docs.select(
        (NF.tokens("text") != F.expr(TOKS_SPARK)).alias("d")
    ).filter("d").count()
    assert tok_bad == 0


def test_stable_hash64_matches_minhash_family(spark):
    from nineinfra_spark.plans.ext_dedup import _h_spark

    docs = t(spark, SF, "documents").select(
        F.substring("text", 1, 20).alias("s")
    )
    bad = docs.select(
        (NF.stable_hash64("s", salt="a:") != F.expr(_h_spark("concat('a:', s)"))).alias("d")
    ).filter("d").count()
    assert bad == 0
    # non-negative (60-bit) by construction
    neg = docs.select(NF.stable_hash64("s").alias("h")).filter("h < 0").count()
    assert neg == 0


def test_jaccard_against_python(spark):
    docs = t(spark, SF, "documents").limit(50)
    rows = (
        docs.select("doc_id", NF.tokens("text").alias("toks"))
        .select(
            "doc_id",
            F.array_distinct("toks").alias("s"),
        )
        .collect()
    )
    sets = {r["doc_id"]: set(r["s"]) for r in rows}
    ids = sorted(sets)[:10]
    df = (
        docs.selectExpr("doc_id AS id_a", "text AS ta")
        .join(docs.selectExpr("doc_id AS id_b", "text AS tb"), F.col("id_a") < F.col("id_b"))
        .filter(F.col("id_a").isin(ids) & F.col("id_b").isin(ids))
        .select(
            "id_a",
            "id_b",
            NF.jaccard(
                F.array_distinct(NF.tokens("ta")), F.array_distinct(NF.tokens("tb"))
            ).alias("j"),
        )
    )
    for r in df.collect():
        a, b = sets[r["id_a"]], sets[r["id_b"]]
        expect = len(a & b) / len(a | b)
        assert abs(r["j"] - expect) < 1e-12


def test_dec_matches_util(spark):
    from nineinfra_spark.plans._util import dec as util_dec

    li = t(spark, SF, "lineitem")
    got = li.agg(
        F.sum(NF.dec("l_extendedprice")).alias("a"),
        F.sum(util_dec("l_extendedprice")).alias("b"),
    ).collect()[0]
    assert got["a"] == got["b"]
