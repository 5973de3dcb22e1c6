"""PQ/ADC index (ann_pq_adc_topk): the differential oracle pins the
exact arithmetic; these tests pin the INDEX properties — valid code
range, deterministic encoding, and that the compressed scores still
carry signal (the exact top-k scores higher under ADC than the corpus
average, per query)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nineinfra_spark.plans.ext_similarity import (
    PQ_K,
    PQ_M,
    ann_cosine_topk,
    ann_pq_adc_topk,
)

SF = "/root/testdata/sf0.001"


def test_pq_topk_shape_and_determinism(spark):
    a = ann_pq_adc_topk(spark, SF).collect()
    b = ann_pq_adc_topk(spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_q = {}
    for r in a:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == [1, 2, 3], (q, ranks)


def test_adc_scores_are_informative(spark):
    """The compressed index must carry signal: the ADC top-3 and the
    exact cosine top-3 intersect for at least one query. An
    8-codeword untrained quantizer on weakly-clustered synthetic
    vectors is lossy by construction, so this is a floor, not a
    recall target — if it fails, the code assignment is noise."""
    adc_top = ann_pq_adc_topk(spark, SF)
    exact = ann_cosine_topk(spark, SF).select(
        "query_id", F.col("cand_id").alias("exact_cand"), F.col("rank").alias("er")
    )
    joined = (
        adc_top.join(exact, "query_id")
        .filter(F.col("cand_id") == F.col("exact_cand"))
        .select("query_id")
        .distinct()
        .count()
    )
    # at least some queries' ADC top-3 intersect the exact top-3 —
    # lossy-but-informative floor for 8 codewords on weakly-clustered
    # synthetic vectors
    assert joined >= 1


def test_pq_code_range(spark):
    """Every emitted code is one of the PQ_K codewords in each of the
    PQ_M subspaces (validity of the compressed representation)."""
    from nineinfra_spark.plans.ext_similarity import N_QUERIES, _pq_sub_spark
    from nineinfra_spark.sources.readers import read_table

    # reconstruct codes exactly as the query does
    emb = read_table(spark, SF, "embeddings")
    from pyspark.sql import Window

    cw = None
    for m in range(PQ_M):
        p = emb.filter(
            (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + PQ_K)
        ).select(
            F.lit(m).alias("m"),
            (F.col("vec_id") - N_QUERIES).alias("j"),
            F.expr(_pq_sub_spark("embedding", m)).alias("cw_sub"),
        )
        cw = p if cw is None else cw.unionAll(p)
    sv = None
    for m in range(PQ_M):
        p = emb.filter(F.col("vec_id") >= N_QUERIES).select(
            "vec_id", F.lit(m).alias("m"), F.expr(_pq_sub_spark("embedding", m)).alias("sub")
        )
        sv = p if sv is None else sv.unionAll(p)
    d = F.expr(
        "aggregate(zip_with(sub, cw_sub, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    w = Window.partitionBy("vec_id", "m").orderBy(F.desc("d"), "j")
    codes = (
        sv.join(F.broadcast(cw), "m")
        .select("vec_id", "m", "j", d.alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    stats = codes.agg(
        F.min("j").alias("lo"), F.max("j").alias("hi"), F.countDistinct("m").alias("nm")
    ).first()
    assert stats["lo"] >= 0 and stats["hi"] < PQ_K
    assert stats["nm"] == PQ_M


def test_rerank_recall_dominates_raw_adc(spark):
    """The point of the two-stage shape: exact re-rank of a deep ADC
    shortlist recalls at least as many of the exact top-3 as the raw
    ADC top-3 (it can only improve — the shortlist is a superset)."""
    from nineinfra_spark.plans.ext_similarity import ann_pq_rerank_topk

    exact = {
        (r["query_id"], r["cand_id"]) for r in ann_cosine_topk(spark, SF).collect()
    }
    adc = {
        (r["query_id"], r["cand_id"]) for r in ann_pq_adc_topk(spark, SF).collect()
    }
    rr = {
        (r["query_id"], r["cand_id"]) for r in ann_pq_rerank_topk(spark, SF).collect()
    }
    assert len(rr & exact) >= len(adc & exact)
    assert len(rr & exact) >= 1
