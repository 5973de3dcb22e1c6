"""Multi-pass Lloyd training operator (operators/ivf.py).

Pins the contract the registry query (`ann_ivf_refined_topk`, one
pass) relies on, plus the multi-pass behavior only the operator
offers: movement metric decreases, early stop on tol, and recall at
fixed n_probe does not degrade with a second pass on the fixture."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from nineinfra_spark.functions import cosine_similarity
from nineinfra_spark.operators.ivf import assign_cells, refine_centroids, train
from nineinfra_spark.plans._util import t
from nineinfra_spark.plans.ext_similarity import (
    N_IVF_CELLS,
    N_IVF_PROBE,
    N_QUERIES,
    TOP_K,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return t(spark, SF, "embeddings").localCheckpoint(eager=False)


@pytest.fixture(scope="module")
def cand(emb):
    return emb.filter(F.col("vec_id") >= N_QUERIES)


@pytest.fixture(scope="module")
def cent0(emb):
    return emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_IVF_CELLS)
    ).select(
        (F.col("vec_id") - N_QUERIES).alias("cell"),
        F.col("embedding").alias("c_emb"),
    )


def _search_topk(emb, cand, centroids):
    """IVF search against an arbitrary centroid set: probe
    N_IVF_PROBE cells per query, exact cosine within posting lists,
    per-query top-k. Mirrors the registry query's search stage."""
    cos_vc = cosine_similarity(F.col("embedding"), F.col("c_emb")).alias("cos_vc")
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_vc"), "cell")
    assigned = assign_cells(cand, centroids).select(
        F.col("vec_id").alias("cand_id"), "cell"
    )
    probed = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(centroids))
        .select("vec_id", "cell", cos_vc)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= N_IVF_PROBE)
        .select(F.col("vec_id").alias("query_id"), "cell")
    )
    qe = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    ce = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("e_emb"))
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    rows = (
        probed.join(assigned, "cell")
        .join(qe, "query_id")
        .join(ce, "cand_id")
        .select(
            "query_id",
            "cand_id",
            cosine_similarity(F.col("q_emb"), F.col("e_emb")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= TOP_K)
        .collect()
    )
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["cand_id"])
    return out


def _exact_topk(emb, cand):
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    rows = (
        cand.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("e_emb"))
        .crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "cand_id",
            cosine_similarity(F.col("q_emb"), F.col("e_emb")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .collect()
    )
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["cand_id"])
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = sum(len(approx.get(q, set()) & e) for q, e in exact.items())
    total = sum(len(e) for e in exact.values())
    return hits / total


def test_assign_covers_every_vector_once(cand, cent0):
    assigned = assign_cells(cand, cent0)
    n_cand = cand.count()
    assert assigned.count() == n_cand
    assert assigned.select("vec_id").distinct().count() == n_cand
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(N_IVF_CELLS))


def test_refine_emits_one_centroid_per_nonempty_cell(cand, cent0):
    assigned = assign_cells(cand, cent0)
    refined = refine_centroids(assigned)
    n_cells = assigned.select("cell").distinct().count()
    assert refined.count() == n_cells
    # full dimensionality preserved, in position order
    dim = len(cand.select("embedding").first()["embedding"])
    assert all(len(r["c_emb"]) == dim for r in refined.collect())


def test_movement_decreases_and_tol_stops_early(cand, cent0):
    r3 = train(cand, cent0, passes=3)
    assert r3.passes_run == 3
    assert len(r3.movements) == 3
    # Lloyd on a fixed assignment objective: movement must not grow
    assert r3.movements[1] <= r3.movements[0]
    assert r3.movements[2] <= r3.movements[1]

    # a generous tol must stop after the first pass
    r_tol = train(cand, cent0, passes=3, tol=r3.movements[0] + 1.0)
    assert r_tol.passes_run == 1
    assert len(r_tol.movements) == 1


def test_second_pass_recall_not_worse(spark, emb, cand, cent0):
    exact = _exact_topk(emb, cand)
    rec1 = _recall(_search_topk(emb, cand, train(cand, cent0, passes=1).centroids), exact)
    rec2 = _recall(_search_topk(emb, cand, train(cand, cent0, passes=2).centroids), exact)
    assert rec2 >= rec1, (rec1, rec2)


def test_train_rejects_zero_passes(cand, cent0):
    with pytest.raises(ValueError, match="passes"):
        train(cand, cent0, passes=0)


class TestConvergenceCountsDegenerateCells:
    """r11 review finding: the movement metric inner-joined old/new
    centroids and SUM-skipped NULL cosines, so a vanished cell or a
    zero-norm refined centroid (opposite-signed members summing to
    zero) contributed NO movement — train() could stop early claiming
    convergence while the centroid set actually changed. Both cases
    now count as maximal movement (2.0)."""

    def test_zero_sum_cell_is_not_convergence(self, spark):
        vectors = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [-1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        cent0 = spark.createDataFrame(
            [(0, [1.0, 0.0])], "cell int, c_emb array<double>"
        )
        # both vectors land in the single cell; their mean is the zero
        # vector -> cosine(old, new) is NULL
        res = train(vectors, cent0, passes=2, tol=0.0)
        assert res.movements[0] == pytest.approx(2.0)
        assert res.passes_run == 2  # did NOT stop claiming convergence

    def test_vanished_cell_counts_as_movement(self, spark):
        vectors = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.9, 0.1])], "vec_id long, embedding array<double>"
        )
        cent0 = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [-1.0, 0.0])],
            "cell int, c_emb array<double>",
        )
        # every vector is nearest cell 0; cell 1 refines to NOTHING —
        # the centroid set shrank, which must register as movement
        res = train(vectors, cent0, passes=1, tol=0.0)
        assert res.movements[0] >= 2.0
