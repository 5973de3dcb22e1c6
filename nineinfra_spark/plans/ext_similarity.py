"""[EXT] Embedding similarity search over the ``embeddings`` table.

LLM-data-pipeline surface (SURVEY.md §2.3/§2.10 [EXT]): brute-force
cosine top-k (the exact baseline), an exact threshold similarity
join, a sign-bucket LSH variant (the scale path), and an
Arrow-vectorized pandas-UDF kernel.

Precision contract: both Spark (``aggregate`` fold) and DuckDB
(``list_aggregate 'sum'``) reduce arrays sequentially left-to-right
in double, so cosine values are BIT-IDENTICAL across engines
(verified empirically) — results are hash-compared raw, no rounding.
The pandas kernel preserves this by summing dims sequentially
(vectorized across rows, ordered across dims).

Scale design:

- Top-k: the query set is the small side → broadcast; candidates
  stream by. Per-query top-k via window over query_id. Cost is
  O(|Q|·N) — the right baseline; past that, switch to the bucketed
  variant.
- Threshold join: exact all-pairs is quadratic and exists here only
  as the verification oracle shape; the LSH query shows the bucketed
  plan (candidates only from same-bucket pairs → the self-join is
  keyed on the bucket, shuffle bounded by bucket occupancy).
- No ``collect()`` anywhere; the kernels are JVM expressions or
  Arrow-batched pandas — never row-at-a-time Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import cpu_spread, t
from nineinfra_spark.plans.registry import query

# -- shared expressions ----------------------------------------------------

#: Spark SQL: cosine between two array<float> cols (sequential fold).
COS_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0 as double), (acc, v) -> acc + v)"
    " / (sqrt(aggregate({a}, cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    " * sqrt(aggregate({b}, cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))))"
)

#: DuckDB: same cosine, same fold order.
COS_DUCK = (
    "list_aggregate(list_transform(generate_series(1, len({a})),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
    " / (sqrt(list_aggregate(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"
    " * sqrt(list_aggregate(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')))"
)

N_QUERIES = 5  # vec_id < 5 are the query vectors
TOP_K = 3
SIM_T = 0.4  # threshold for the similarity joins (see data calibration)

#: Sign-code LSH: 4 bands, each a 6-bit sign pattern over a disjoint
#: dim group (an axis-aligned random-hyperplane family). A pair is a
#: candidate if it collides in ANY band — the same banding OR-
#: construction as MinHash-LSH, deterministic and SQL-expressible.
N_SIM_BANDS = 4
_BITS_PER_BAND = 6


def _band_spark(b: int) -> str:
    return " + ".join(
        f"(case when element_at(embedding, {b * _BITS_PER_BAND + i + 1}) > 0"
        f" then {1 << i} else 0 end)"
        for i in range(_BITS_PER_BAND)
    )


def _band_duck(b: int, e: str = "embedding") -> str:
    return " + ".join(
        f"(CASE WHEN {e}[{b * _BITS_PER_BAND + i + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_BITS_PER_BAND)
    )


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
         c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERIES})
    SELECT query_id, cand_id, cos, rank
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {COS_DUCK.format(a='q.embedding', b='c.embedding')} AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {COS_DUCK.format(a='q.embedding', b='c.embedding')} DESC,
                            c.vec_id
               ) AS rank
        FROM q, c
    )
    WHERE rank <= {TOP_K}
    """,
    tags=("ext", "similarity", "topk", "bounded-nlj"),  # broadcast |Q| side
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: each query vector against every
    candidate. The query set is broadcast (small side), candidates
    stream — one scan, no shuffle of the big side until the per-query
    window (keyed on query_id, |Q| partitions). Exact baseline for
    the ANN variants."""
    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        c.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "cand_id",
            F.expr(COS_SPARK.format(a="q_emb", b="c_emb")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rank")
    )


@query(
    "sim_join_exact_oracle",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {COS_DUCK.format(a='a.embedding', b='b.embedding')} AS cos
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE {COS_DUCK.format(a='a.embedding', b='b.embedding')} >= {SIM_T}
    """,
    tags=("ext", "similarity", "exact-oracle", "not-for-scale"),
)
def sim_join_exact_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERIFICATION ORACLE, not a production operator (the name and
    the ``not-for-scale`` tag say so): exact cosine threshold
    self-join — all pairs scored, pairs with cos ≥ t kept. Quadratic
    by definition; it exists to define ground truth at dimension
    scale so `ann_lsh_buckets` (the bucketed 100 TB path) can be
    recall-tested against it (tests/test_ext_pipeline.py). Reach for
    `ann_lsh_buckets` for any real corpus."""
    emb = t(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.expr(COS_SPARK.format(a="ea", b="eb")).alias("cos"),
        )
        .filter(F.col("cos") >= SIM_T)
    )


def _lsh_oracle() -> str:
    band_union = "\n        UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_idx, {_band_duck(b)} AS code FROM embeddings"
        for b in range(N_SIM_BANDS)
    )
    return f"""
    WITH bb AS (
        {band_union}
    ),
    cand AS (
        SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
        FROM bb x JOIN bb y
          ON x.band_idx = y.band_idx AND x.code = y.code AND x.vec_id < y.vec_id
    )
    SELECT id_a, id_b,
           {COS_DUCK.format(a='a.embedding', b='b.embedding')} AS cos
    FROM cand
    JOIN embeddings a ON cand.id_a = a.vec_id
    JOIN embeddings b ON cand.id_b = b.vec_id
    WHERE {COS_DUCK.format(a='a.embedding', b='b.embedding')} >= {SIM_T}
    """


@query("ann_lsh_buckets", oracle=_lsh_oracle(), tags=("ext", "similarity", "lsh"))
def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sign-code LSH similarity join: 4 bands × 6-bit sign
    patterns over disjoint dim groups; a pair is a candidate if it
    collides in ANY band (the OR-construction), then exact-cosine
    verified. Candidates come from equi-joins on (band, code) —
    shuffle keyed on the code, never all-pairs. Deterministic, so the
    oracle replicates it exactly; recall vs the exact join is
    tolerance-tested in pytest."""
    emb = t(spark, sf_dir, "embeddings")
    bb = emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.expr(_band_spark(b)) for b in range(N_SIM_BANDS)])
        ).alias("band_idx", "code"),
    )
    cand = (
        bb.alias("x")
        .join(
            bb.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.code") == F.col("y.code"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b"))
        .distinct()
    )
    # Verify with per-vector norms precomputed ONCE (r16 optimization
    # round; guide §1.2 "per-task work" — the same factoring
    # dedup_semantic_cells already documents): the inline COS_SPARK
    # re-folds BOTH vectors' norms for every candidate pair, and the
    # interpreted higher-order-function folds are the pair stage's
    # cost. dot/(na*nb) performs the exact operation sequence of the
    # inline cosine (same sequential folds, same multiply-then-divide
    # order), so every cos value stays bit-identical to the oracle's
    # — a ~3× cut of the verify arithmetic, not a semantics change.
    norm = F.expr(
        "sqrt(aggregate(embedding, cast(0 as double),"
        " (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    emb_n = emb.select("vec_id", "embedding", norm.alias("nrm"))
    a = emb_n.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = emb_n.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.expr(
        "aggregate(zip_with(ea, eb, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", (dot / (F.col("na") * F.col("nb"))).alias("cos"))
        .filter(F.col("cos") >= SIM_T)
    )


# -- embedding near-dup clustering -----------------------------------------


def _emb_cc_oracle() -> str:
    """Recursive-CTE min-label reachability over the EMBEDDING
    near-dup pair graph (the deterministic sign-LSH + cosine-threshold
    join above, which DuckDB replicates exactly)."""
    pairs_sql = _lsh_oracle()
    return f"""
    WITH RECURSIVE
    pairs AS (SELECT id_a, id_b FROM ({pairs_sql})),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS vec_id FROM edges),
    cc AS (
        SELECT vec_id, vec_id AS label FROM nodes
        UNION
        SELECT e.dst AS vec_id, c.label
        FROM cc c JOIN edges e ON c.vec_id = e.src
    ),
    lab AS (SELECT vec_id, MIN(label) AS cluster_id FROM cc GROUP BY vec_id)
    SELECT l.vec_id, l.cluster_id, s.n_members
    FROM lab l
    JOIN (SELECT cluster_id, COUNT(*) AS n_members FROM lab GROUP BY cluster_id) s
      USING (cluster_id)
    """


@query(
    "dedup_embedding_clusters",
    oracle=_emb_cc_oracle(),
    tags=("ext", "dedup", "similarity", "iterative", "graph"),
)
def dedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup → transitive clusters: the semantic
    twin of `dedup_connected_clusters` for the vector modality (two
    paraphrases never share shingles but sit close in embedding
    space). Candidate pairs come from the banded sign-LSH join
    (`ann_lsh_buckets` — bucket-keyed equi-join, never all-pairs),
    exact-cosine verified at threshold, then clustered by alternating
    large-star/small-star contraction (`operators.components` —
    O(log n) shuffle rounds on any graph shape, diameter included).
    cluster_id = min vec_id of the component (the canonical
    representative a dedup pass keeps).

    At 100 TB both stages are shuffle-bounded: LSH candidates by
    bucket occupancy, contraction by O(log n) rounds — no driver-side
    state beyond the convergence flag."""
    from nineinfra_spark.operators.components import star_components

    pairs = ann_lsh_buckets(spark, sf_dir).select("id_a", "id_b")
    return star_components(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id", "n_members"
    )


# -- Arrow-vectorized pandas kernel ---------------------------------------


def _cosine_pandas(ea: pd.Series, eb: pd.Series) -> pd.Series:
    """Cosine between two array columns, Arrow-batched.

    Vectorized ACROSS rows, sequential ACROSS dims — the dim-order
    summation matches the JVM/DuckDB fold exactly, so results are
    bit-identical to the built-in expression path (a plain np.dot
    would use pairwise summation and drift in the last ulp).
    """
    import numpy as np

    a = np.stack(ea.to_numpy()).astype("float64")
    b = np.stack(eb.to_numpy()).astype("float64")
    dot = np.zeros(len(a))
    na = np.zeros(len(a))
    nb = np.zeros(len(a))
    for k in range(a.shape[1]):
        dot += a[:, k] * b[:, k]
        na += a[:, k] * a[:, k]
        nb += b[:, k] * b[:, k]
    return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))


@query(
    "ann_cosine_topk_pandas",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
         c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERIES})
    SELECT query_id, cand_id, cos, rank
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {COS_DUCK.format(a='q.embedding', b='c.embedding')} AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {COS_DUCK.format(a='q.embedding', b='c.embedding')} DESC,
                            c.vec_id
               ) AS rank
        FROM q, c
    )
    WHERE rank <= {TOP_K}
    """,
    tags=("ext", "similarity", "pandas-udf", "bounded-nlj"),
)
def ann_cosine_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same top-k as `ann_cosine_topk`, but the cosine kernel is an
    Arrow-batched pandas UDF (SURVEY.md §2.10 vectorized-UDF surface).
    Demonstrates the pattern for kernels Spark expressions can't
    express (model scoring, learned filters): Arrow transfer + numpy
    across the batch — never per-row Python. Same oracle, bit-equal
    results."""
    from pyspark.sql.functions import pandas_udf

    cos_udf = pandas_udf(_cosine_pandas, "double")

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("c_emb")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        c.crossJoin(F.broadcast(q))
        .select("query_id", "cand_id", cos_udf("q_emb", "c_emb").alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rank")
    )


# -- IVF (inverted-file) ANN ----------------------------------------------

N_IVF_CELLS = 8  # coarse quantizer size (vec_id in [N_QUERIES, N_QUERIES+8))
N_IVF_PROBE = 3  # cells probed per query


def _ivf_oracle() -> str:
    cos_qc = COS_DUCK.format(a="v.embedding", b="c.embedding")
    return f"""
    WITH cent AS (
        SELECT vec_id - {N_QUERIES} AS cell, embedding
        FROM embeddings
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_IVF_CELLS}
    ),
    cand AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERIES}),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cos_qc} DESC, c.cell
                   ) AS rn
            FROM cand v, cent c
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    probed AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT v.vec_id, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cos_qc} DESC, c.cell
                   ) AS rn
            FROM q v, cent c
        ) WHERE rn <= {N_IVF_PROBE}
    )
    SELECT query_id, cand_id, cos, rank FROM (
        SELECT p.query_id, a.vec_id AS cand_id,
               {COS_DUCK.format(a='qe.embedding', b='ce.embedding')} AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY p.query_id
                   ORDER BY {COS_DUCK.format(a='qe.embedding', b='ce.embedding')} DESC,
                            a.vec_id
               ) AS rank
        FROM probed p
        JOIN assigned a ON p.cell = a.cell
        JOIN embeddings qe ON qe.vec_id = p.query_id
        JOIN embeddings ce ON ce.vec_id = a.vec_id
    ) WHERE rank <= {TOP_K}
    """


def _ivf_refined_oracle() -> str:
    cos_qc = COS_DUCK.format(a="v.embedding", b="c.embedding")
    return f"""
    WITH cent0 AS (
        SELECT vec_id - {N_QUERIES} AS cell, embedding
        FROM embeddings
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_IVF_CELLS}
    ),
    cand AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERIES}),
    assigned0 AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cos_qc} DESC, c.cell
                   ) AS rn
            FROM cand v, cent0 c
        ) WHERE rn = 1
    ),
    member_comp AS (
        SELECT a.cell,
               unnest(generate_series(1, len(v.embedding))) - 1 AS pos,
               CAST(unnest(v.embedding) AS DOUBLE) AS val
        FROM assigned0 a JOIN cand v ON a.vec_id = v.vec_id
    ),
    refined AS (
        SELECT cell, array_agg(comp ORDER BY pos) AS embedding FROM (
            SELECT cell, pos,
                   CAST(SUM(CAST(val AS DECIMAL(38,18))) AS DOUBLE) AS comp
            FROM member_comp GROUP BY cell, pos
        ) GROUP BY cell
    ),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cos_qc} DESC, c.cell
                   ) AS rn
            FROM cand v, refined c
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}),
    probed AS (
        SELECT vec_id AS query_id, cell FROM (
            SELECT v.vec_id, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cos_qc} DESC, c.cell
                   ) AS rn
            FROM q v, refined c
        ) WHERE rn <= {N_IVF_PROBE}
    )
    SELECT query_id, cand_id, cos, rank FROM (
        SELECT p.query_id, a.vec_id AS cand_id,
               {COS_DUCK.format(a='qe.embedding', b='ce.embedding')} AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY p.query_id
                   ORDER BY {COS_DUCK.format(a='qe.embedding', b='ce.embedding')} DESC,
                            a.vec_id
               ) AS rank
        FROM probed p
        JOIN assigned a ON p.cell = a.cell
        JOIN embeddings qe ON qe.vec_id = p.query_id
        JOIN embeddings ce ON ce.vec_id = a.vec_id
    ) WHERE rank <= {TOP_K}
    """


@query(
    "ann_ivf_refined_topk",
    oracle=_ivf_refined_oracle(),
    tags=("ext", "similarity", "ivf", "kmeans", "bounded-nlj"),
)
def ann_ivf_refined_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with ONE deterministic Lloyd refinement pass — the centroid
    training step `ann_ivf_topk` skips, run as a distributed job:

    1. assign every candidate to its nearest SEED centroid (broadcast,
       one scan — the E-step);
    2. refine each cell's centroid from its members (the M-step),
       computed as the elementwise DECIMAL SUM per (cell, dim) via
       posexplode → groupBy — fully distributed, map-side-combined,
       never a per-cell collect. Cosine is scale-invariant, so the
       unnormalized sum IS the mean direction — skipping the division
       keeps the arithmetic exact (decimal sums are reduce-order-
       independent), which is what lets DuckDB replicate the refined
       index bit-for-bit;
    3. re-assign candidates and probe queries against the refined
       centroids; exact-cosine score within probed cells only.

    At 100 TB each Lloyd pass is one broadcast-assign scan + one
    (cell, dim)-keyed aggregation (K×d rows out — tiny); more passes
    iterate the same two jobs (the multi-pass loop with a convergence
    metric lives in ``operators/ivf.py:train`` — this query runs
    exactly one pass of it, keeping the oracle replicable).
    Refinement tightens cells around the data's actual clusters,
    raising recall at the same n_probe — the train/index/search split
    every production IVF system uses."""
    from nineinfra_spark.operators.ivf import train as ivf_train

    emb = t(spark, sf_dir, "embeddings")
    cent0 = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_IVF_CELLS)
    ).select((F.col("vec_id") - N_QUERIES).alias("cell"), F.col("embedding").alias("c_emb"))

    cos_vc = F.expr(COS_SPARK.format(a="embedding", b="c_emb"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cos_vc"), "cell")

    cand = emb.filter(F.col("vec_id") >= N_QUERIES)
    refined = ivf_train(cand, cent0, passes=1).centroids

    assigned = (
        cand.crossJoin(F.broadcast(refined))
        .select("vec_id", "cell", cos_vc.alias("cos_vc"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("cand_id"), "cell")
    )

    q = emb.filter(F.col("vec_id") < N_QUERIES)
    probed = (
        q.crossJoin(F.broadcast(refined))
        .select("vec_id", "cell", cos_vc.alias("cos_vc"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= N_IVF_PROBE)
        .select(F.col("vec_id").alias("query_id"), "cell")
    )

    qe = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    ce = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("e_emb"))
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        probed.join(assigned, "cell")
        .join(qe, "query_id")
        .join(ce, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.expr(COS_SPARK.format(a="q_emb", b="e_emb")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rank")
    )


@query("ann_ivf_topk", oracle=_ivf_oracle(), tags=("ext", "similarity", "ivf", "bounded-nlj"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the third leg of the ANN
    surface next to brute force (`ann_cosine_topk`) and sign-LSH
    (`ann_lsh_buckets`).

    Index: a coarse quantizer of K=8 centroids assigns every candidate
    to its nearest cell — one scan against a BROADCAST centroid set
    (K is constant, hence the bounded-nlj tag). Search: each query
    probes its n_probe=3 closest cells and scores exact cosine only
    against those cells' posting lists — at 100 TB the corpus scan
    drops to ~n_probe/K of the data, and the posting-list join is an
    equi-join on cell id (hash-partitionable, AQE-skew-splittable;
    cell sizes are balanced by construction when centroids come from
    a sample of the corpus).

    Centroids are taken deterministically (vec_id ∈ [5, 13) — the
    no-training analog of sampled k-means seeds) so the whole index is
    oracle-replicable; recall vs the exact top-k is asserted in
    tests/test_lsh_curve.py. NOTE: the synthetic corpus is weakly
    clustered, so measured recall sits near the n_probe/K floor —
    on real (clustered) embeddings the same index concentrates
    neighbors in probed cells, which is the IVF premise.
    """
    emb = t(spark, sf_dir, "embeddings")
    cent = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_IVF_CELLS)
    ).select((F.col("vec_id") - N_QUERIES).alias("cell"), F.col("embedding").alias("c_emb"))

    cos_vc = F.expr(COS_SPARK.format(a="embedding", b="c_emb"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cos_vc"), "cell")

    cand = emb.filter(F.col("vec_id") >= N_QUERIES)
    assigned = (
        cand.crossJoin(F.broadcast(cent))
        .select("vec_id", "cell", cos_vc.alias("cos_vc"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select(F.col("vec_id").alias("cand_id"), "cell")
    )

    q = emb.filter(F.col("vec_id") < N_QUERIES)
    probed = (
        q.crossJoin(F.broadcast(cent))
        .select("vec_id", "cell", cos_vc.alias("cos_vc"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= N_IVF_PROBE)
        .select(F.col("vec_id").alias("query_id"), "cell")
    )

    qe = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    ce = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("e_emb"))
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        probed.join(assigned, "cell")
        .join(qe, "query_id")
        .join(ce, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.expr(COS_SPARK.format(a="q_emb", b="e_emb")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rank")
    )


# -- semantic dedup (SemDeDup) ---------------------------------------------

#: cosine threshold above which two same-cell embeddings are semantic
#: duplicates (calibrated like SIM_T for the synthetic corpus).
SEMDEDUP_T = SIM_T


#: memoized per-sf_dir quantizer size: K = clamp(floor(sqrt(N)), 8, 1024)
#: over the embeddings row count — a property of the DATA, not the
#: session, so one tiny count job per directory serves every plan build.
_SEMDEDUP_K_CACHE: dict[str, int] = {}


def _semdedup_k(spark: SparkSession, sf_dir: str) -> int:
    if sf_dir not in _SEMDEDUP_K_CACHE:
        import math

        n = t(spark, sf_dir, "embeddings").count()
        _SEMDEDUP_K_CACHE[sf_dir] = max(8, min(1024, int(math.floor(math.sqrt(n)))))
    return _SEMDEDUP_K_CACHE[sf_dir]


def _semdedup_oracle() -> str:
    cos_vc = COS_DUCK.format(a="v.embedding", b="c.embedding")
    cos_ab = COS_DUCK.format(a="ea.embedding", b="eb.embedding")
    return f"""
    WITH kk AS (
        SELECT GREATEST(8, LEAST(1024, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT))) AS k
        FROM embeddings
    ),
    cent AS (
        SELECT vec_id - {N_QUERIES} AS cell, embedding
        FROM embeddings, kk
        WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES} + kk.k
    ),
    cand AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {N_QUERIES}),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, c.cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cos_vc} DESC, c.cell
                   ) AS rn
            FROM cand v, cent c
        ) WHERE rn = 1
    ),
    dups AS (
        SELECT DISTINCT b.vec_id
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id
        WHERE {cos_ab} >= {SEMDEDUP_T}
    )
    SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
           d.vec_id IS NOT NULL AS is_dup
    FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
    """


@query(
    "dedup_semantic_cells",
    oracle=_semdedup_oracle(),
    tags=("ext", "similarity", "dedup", "semdedup", "bounded-nlj"),
)
def dedup_semantic_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication, SemDeDup-style (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the IVF coarse
    quantizer, then WITHIN each cell mark every vector that has a
    smaller-id neighbor above SEMDEDUP_T cosine as a semantic
    duplicate — keep one representative per near-identical semantic
    group. This is the embedding-space complement of the lexical
    MinHash pipeline: it catches paraphrases and re-encodings that
    share no shingles.

    Scale posture — the defining SemDeDup trick is that the pairwise
    step is CELL-LOCAL, and the quantizer is SIZED TO THE CORPUS:
    K = clamp(floor(sqrt(N)), 8, 1024) cells (both engines derive K
    from the same COUNT, so the oracle replicates the index), which
    holds expected cell occupancy to ~sqrt(N). Total cost is then
    assignment N·K + pairs N·(N/K) ≈ 2·N^1.5 — the balanced point;
    a FIXED K would leave the pair step quadratic (the r6 sf1
    scale-proof measured exactly that: 15.5× wall for 10× data before
    this sizing, see NOTES). Plan: one broadcast-assign scan
    (centroids are the K-row side of a bounded NLJ), then a self
    equi-join keyed on cell (hash-partitionable, AQE-skew-splittable)
    with the cosine filter inside the join (per-vector norms
    precomputed once), then a doc-keyed left join for the flag.
    Cosine and the ≥ threshold compare are bit-identical across
    engines (sequential-fold contract above), so the boundary pair
    cannot flip. K derives from a memoized driver-side COUNT — one
    column-pruned count job per sf_dir, the `_partsupp` pattern."""
    emb = t(spark, sf_dir, "embeddings")
    k = _semdedup_k(spark, sf_dir)
    cent = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + k)
    ).select((F.col("vec_id") - N_QUERIES).alias("cell"), F.col("embedding").alias("c_emb"))

    cos_vc = F.expr(COS_SPARK.format(a="embedding", b="c_emb"))
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("cos_vc"), "cell")
    # E-step is N×K cosine folds — CPU-bound per row; spread it (the
    # cent side stays on the raw scan so its vec_id filter pushes down)
    cand = cpu_spread(emb).filter(F.col("vec_id") >= N_QUERIES)
    assigned = (
        cand.crossJoin(F.broadcast(cent))
        .select("vec_id", "embedding", "cell", cos_vc.alias("cos_vc"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell", "embedding")
    )

    # Precompute each vector's norm ONCE (sqrt of the same sequential
    # fold COS_SPARK uses); the pair predicate then costs one dot
    # product + one divide. dot/(na*nb) performs the exact operation
    # sequence of the inline cosine, so values stay bit-identical to
    # the oracle's — this is a constant-factor cut (~3×) in the
    # quadratic step's arithmetic, not a semantics change.
    norm = F.expr(
        "sqrt(aggregate(embedding, cast(0 as double),"
        " (acc, v) -> acc + cast(v as double) * cast(v as double)))"
    )
    with_norm = assigned.withColumn("nrm", norm)
    a = with_norm.select(
        F.col("cell"),
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = with_norm.select(
        F.col("cell"),
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    dot = F.expr(
        "aggregate(zip_with(a_emb, b_emb,"
        " (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0 as double), (acc, v) -> acc + v)"
    )
    dups = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("vec_id"))
        .filter(dot / (F.col("a_nrm") * F.col("b_nrm")) >= SEMDEDUP_T)
        .select("vec_id")
        .distinct()
    )
    return (
        assigned.join(dups.withColumn("is_dup", F.lit(True)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("bigint").alias("cell"),
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )


# -- product quantization (PQ / ADC) ---------------------------------------

PQ_M = 4  # subspaces
PQ_SUB = 16  # dims per subspace (4 × 16 = 64)
PQ_K = 8  # codewords per subspace (taken from vec_id ∈ [5, 13))


def _pq_sub_spark(col: str, m: int) -> str:
    return f"slice({col}, {m * PQ_SUB + 1}, {PQ_SUB})"


def _pq_sub_duck(col: str, m: int) -> str:
    return f"{col}[{m * PQ_SUB + 1}:{m * PQ_SUB + PQ_SUB}]"


_PQ_DOT_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " cast(0 as double), (acc, v) -> acc + v)"
)
_PQ_DOT_DUCK = (
    "list_aggregate(list_transform(generate_series(1, len({a})),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), 'sum')"
)


def _pq_oracle() -> str:
    dot_vc = _PQ_DOT_DUCK.format(a="sv.sub", b="cw.sub")
    dot_qc = _PQ_DOT_DUCK.format(a="qv.sub", b="cw.sub")
    sub_union_cand = "\n        UNION ALL ".join(
        f"SELECT vec_id, {m} AS m, {_pq_sub_duck('embedding', m)} AS sub"
        f" FROM embeddings WHERE vec_id >= {N_QUERIES}"
        for m in range(PQ_M)
    )
    sub_union_q = "\n        UNION ALL ".join(
        f"SELECT vec_id, {m} AS m, {_pq_sub_duck('embedding', m)} AS sub"
        f" FROM embeddings WHERE vec_id < {N_QUERIES}"
        for m in range(PQ_M)
    )
    return f"""
    WITH cw AS (
        SELECT m, vec_id - {N_QUERIES} AS j, sub FROM (
            {sub_union_cand.replace(f"WHERE vec_id >= {N_QUERIES}",
                                    f"WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + PQ_K}")}
        )
    ),
    sv AS ({sub_union_cand}),
    codes AS (
        SELECT vec_id, m, j AS code FROM (
            SELECT sv.vec_id, sv.m, cw.j,
                   ROW_NUMBER() OVER (
                       PARTITION BY sv.vec_id, sv.m
                       ORDER BY {dot_vc} DESC, cw.j
                   ) AS rn
            FROM sv JOIN cw ON sv.m = cw.m
        ) WHERE rn = 1
    ),
    qv AS ({sub_union_q}),
    qtab AS (
        SELECT qv.vec_id AS query_id, qv.m, cw.j, {dot_qc} AS qdot
        FROM qv JOIN cw ON qv.m = cw.m
    ),
    scored AS (
        -- fixed-order add (((d0+d1)+d2)+d3): a grouped SUM over
        -- doubles is accumulation-order-dependent; the pivot is not
        SELECT qtab.query_id, codes.vec_id AS cand_id,
               ((MAX(CASE WHEN codes.m = 0 THEN qdot END)
                 + MAX(CASE WHEN codes.m = 1 THEN qdot END))
                 + MAX(CASE WHEN codes.m = 2 THEN qdot END))
                 + MAX(CASE WHEN codes.m = 3 THEN qdot END) AS approx_dot
        FROM codes JOIN qtab ON codes.m = qtab.m AND codes.code = qtab.j
        GROUP BY qtab.query_id, codes.vec_id
    )
    SELECT query_id, cand_id, approx_dot, rank FROM (
        SELECT query_id, cand_id, approx_dot,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY approx_dot DESC, cand_id
               ) AS rank
        FROM scored
    ) WHERE rank <= {TOP_K}
    """


@query(
    "ann_pq_adc_topk",
    oracle=_pq_oracle(),
    tags=("ext", "similarity", "pq", "adc", "bounded-nlj"),
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization with asymmetric distance computation — the
    memory-side leg of the production ANN triad (IVF prunes WHAT you
    scan, PQ compresses WHAT you store): each candidate's 64-dim
    vector is encoded as M=4 one-byte codes (nearest codeword per
    16-dim subspace, inner-product quantizer), and a query scores a
    candidate by summing M table lookups instead of a 64-dim dot —
    at 100 TB the index shrinks ~64× and search touches only the
    code table plus a |Q|·M·K lookup table.

    Codewords are taken deterministically from corpus rows (the
    sampled-seed idiom of `ann_ivf_topk`), so the whole index —
    encode, tables, ADC scores — is replicated bit-for-bit by the
    oracle (subspace dots are the same sequential fold both engines
    use). Plan: encoding is one scan against a BROADCAST M·K-row
    codebook (groupBy (vec_id, m) argmax — map-side combinable);
    the query table is |Q|·M·K rows (broadcast); ADC is an equi-join
    on (m, code) + a (query, cand)-keyed sum. Recall floor vs exact
    cosine is asserted in tests/test_pq.py; on real clustered
    embeddings (and trained codebooks — the k-means upgrade reuses
    `operators/ivf.py:train` per subspace) the same index
    concentrates mass exactly as IVF does."""
    return _pq_adc_scored(spark, sf_dir, TOP_K)


def _pq_adc_scored(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """PQ encode + ADC score + per-query rank cut at ``k`` (shared by
    the raw ADC query and the two-stage re-rank)."""
    emb = t(spark, sf_dir, "embeddings")

    def subspaces(df: DataFrame, id_alias: str) -> DataFrame:
        parts = None
        for m in range(PQ_M):
            p = df.select(
                F.col("vec_id").alias(id_alias),
                F.lit(m).alias("m"),
                F.expr(_pq_sub_spark("embedding", m)).alias("sub"),
            )
            parts = p if parts is None else parts.unionAll(p)
        return parts

    cw = subspaces(
        emb.filter(
            (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + PQ_K)
        ),
        "cw_id",
    ).select("m", (F.col("cw_id") - N_QUERIES).alias("j"), F.col("sub").alias("cw_sub"))

    sv = subspaces(emb.filter(F.col("vec_id") >= N_QUERIES), "vec_id")
    dot_vc = F.expr(_PQ_DOT_SPARK.format(a="sub", b="cw_sub"))
    w_code = Window.partitionBy("vec_id", "m").orderBy(F.desc("d"), "j")
    codes = (
        sv.join(F.broadcast(cw), "m")
        .select("vec_id", "m", "j", dot_vc.alias("d"))
        .withColumn("rn", F.row_number().over(w_code))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", F.col("j").alias("code"))
    )

    qv = subspaces(emb.filter(F.col("vec_id") < N_QUERIES), "query_id")
    qtab = (
        qv.join(F.broadcast(cw), "m")
        .select(
            F.col("query_id"),
            "m",
            "j",
            F.expr(_PQ_DOT_SPARK.format(a="sub", b="cw_sub")).alias("qdot"),
        )
    )

    w_rank = Window.partitionBy("query_id").orderBy(F.desc("approx_dot"), "cand_id")
    return (
        codes.join(
            F.broadcast(qtab),
            (codes["m"] == qtab["m"]) & (codes["code"] == qtab["j"]),
        )
        .groupBy("query_id", F.col("vec_id").alias("cand_id"))
        .agg(
            *[
                F.max(F.when(codes["m"] == m, F.col("qdot"))).alias(f"d{m}")
                for m in range(PQ_M)
            ]
        )
        .select(
            "query_id",
            "cand_id",
            (
                ((F.col("d0") + F.col("d1")) + F.col("d2")) + F.col("d3")
            ).alias("approx_dot"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "approx_dot", "rank")
    )


PQ_SHORTLIST = 20  # ADC candidates re-ranked exactly per query


def _pq_rerank_oracle() -> str:
    # shortlist = ADC top-PQ_SHORTLIST (the _pq_oracle pipeline with a
    # wider rank cut), then exact cosine re-rank of just those rows.
    inner = _pq_oracle().replace(
        f"WHERE rank <= {TOP_K}", f"WHERE rank <= {PQ_SHORTLIST}"
    )
    cos = COS_DUCK.format(a="qe.embedding", b="ce.embedding")
    return f"""
    WITH shortlist AS ({inner})
    SELECT query_id, cand_id, cos, rank FROM (
        SELECT s.query_id, s.cand_id, {cos} AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY s.query_id ORDER BY {cos} DESC, s.cand_id
               ) AS rank
        FROM shortlist s
        JOIN embeddings qe ON qe.vec_id = s.query_id
        JOIN embeddings ce ON ce.vec_id = s.cand_id
    ) WHERE rank <= {TOP_K}
    """


@query(
    "ann_pq_rerank_topk",
    oracle=_pq_rerank_oracle(),
    tags=("ext", "similarity", "pq", "rerank", "bounded-nlj"),
)
def ann_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval — the shape every production vector search
    actually ships: a cheap compressed index (PQ/ADC) produces a
    PQ_SHORTLIST-deep candidate list, then ONLY those rows are scored
    with the exact cosine and re-ranked to the final top-k. Quality
    comes from the exact stage, cost from the compressed one: at
    100 TB the full-precision vectors are touched for |Q|·shortlist
    rows instead of the corpus (a keyed join against the vector
    store), which is why recall@k of this query dominates raw ADC —
    ADC only has to get the true neighbors into the top-20, not the
    top-3.

    Plan: the ADC stage is `ann_pq_adc_topk`'s (broadcast codebook +
    (m, code) lookup join); the re-rank stage joins the shortlist
    back to embeddings on vec_id (the posting-list fetch) and windows
    per query. Bit-replicated by the oracle end-to-end."""
    shortlist = _pq_adc_scored(spark, sf_dir, PQ_SHORTLIST).select(
        "query_id", "cand_id"
    )
    emb = t(spark, sf_dir, "embeddings")
    qe = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    ce = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("e_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        shortlist.join(qe, "query_id")
        .join(ce, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.expr(COS_SPARK.format(a="q_emb", b="e_emb")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rank")
    )


# -- Johnson-Lindenstrauss sign random projection --------------------------

RP_OUT_DIMS = 16  # projected dimensionality (4× reduction)
RP_IN_DIMS = 64  # embedding dimensionality of the testdata


def _rp_sign(j: int, i: int) -> int:
    """Deterministic ±1 from md5 — computed once in Python and embedded
    as literals in BOTH engines' expressions, so the projection matrix
    is identical by construction (no per-engine hash evaluation)."""
    import hashlib

    return 1 if int(hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[0], 16) < 8 else -1


def _rp_expr(j: int, elem: str) -> str:
    """Left-to-right sum chain for projected dim j; identical term
    order in Spark and DuckDB keeps IEEE addition bit-stable."""
    terms = " ".join(
        f"{'+' if _rp_sign(j, i) > 0 else '-'} CAST({elem.format(i=i + 1)} AS DOUBLE)"
        for i in range(RP_IN_DIMS)
    )
    return f"(0.0 {terms})"


def _rp_oracle() -> str:
    cols = ",\n           ".join(
        f"{_rp_expr(j, 'embedding[{i}]')} AS r{j}" for j in range(RP_OUT_DIMS)
    )
    return f"""
    SELECT vec_id,
           {cols}
    FROM embeddings
    """


@query(
    "emb_random_projection",
    oracle=_rp_oracle(),
    tags=("ext", "similarity", "projection"),
)
def emb_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection: every embedding is
    mapped to RP_OUT_DIMS dims via a fixed ±1 matrix (md5-derived,
    embedded as literals in both engines). This is the dimensionality-
    reduction leg of the ANN stack — at 100 TB you project once,
    store the narrow vectors, and run candidate generation (LSH /
    IVF / brute-force shortlists) in 16 dims instead of 64, a 4×
    bandwidth and memory cut with JL-bounded distance distortion
    (cosine correlation ~0.44 vs exact on this corpus — measured in
    tests/test_ext_pipeline.py; raise RP_OUT_DIMS for tighter ε).

    Scale posture: a pure per-row projection of 1024 fused
    multiply-adds — whole-stage codegen, no Python, no shuffle;
    runs at scan speed on any corpus."""
    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        *[
            F.expr(_rp_expr(j, "element_at(embedding, {i})")).alias(f"r{j}")
            for j in range(RP_OUT_DIMS)
        ],
    )

RP_SHORTLIST = 50  # RP-space candidates fetched per query for re-rank
# (measured recall@3 vs exact: 0.67 at sf0.001, 0.33 at sf0.01 — better
# than the PQ/ADC leg on this weakly-clustered corpus at equal depth;
# the knob trades shortlist fetch volume for recall, see NOTES.md)


def _rp_cos_terms(qa: str, ca: str) -> str:
    """Fixed-order dot / norms over the RP columns of aliases qa/ca —
    a literal left-fold chain, bit-identical across engines."""
    dot = " + ".join(f"{qa}.r{j} * {ca}.r{j}" for j in range(RP_OUT_DIMS))
    nq = " + ".join(f"{qa}.r{j} * {qa}.r{j}" for j in range(RP_OUT_DIMS))
    nc = " + ".join(f"{ca}.r{j} * {ca}.r{j}" for j in range(RP_OUT_DIMS))
    return f"(({dot}) / (sqrt({nq}) * sqrt({nc})))"


def _rp_rerank_oracle() -> str:
    rp_cols = ",\n               ".join(
        f"{_rp_expr(j, 'embedding[{i}]')} AS r{j}" for j in range(RP_OUT_DIMS)
    )
    return f"""
    WITH rp AS (
        SELECT vec_id,
               {rp_cols}
        FROM embeddings
    ),
    q AS (SELECT * FROM rp WHERE vec_id < {N_QUERIES}),
    c AS (SELECT * FROM rp WHERE vec_id >= {N_QUERIES}),
    shortlist AS (
        SELECT query_id, cand_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_rp_cos_terms('q', 'c')} DESC, c.vec_id
                   ) AS rp_rank
            FROM q, c
        ) WHERE rp_rank <= {RP_SHORTLIST}
    )
    SELECT query_id, cand_id, cos, rank FROM (
        SELECT s.query_id, s.cand_id,
               {COS_DUCK.format(a='qe.embedding', b='ce.embedding')} AS cos,
               ROW_NUMBER() OVER (
                   PARTITION BY s.query_id
                   ORDER BY {COS_DUCK.format(a='qe.embedding', b='ce.embedding')} DESC,
                            s.cand_id
               ) AS rank
        FROM shortlist s
        JOIN embeddings qe ON qe.vec_id = s.query_id
        JOIN embeddings ce ON ce.vec_id = s.cand_id
    )
    WHERE rank <= {TOP_K}
    """


@query(
    "ann_rp_rerank_topk",
    oracle=_rp_rerank_oracle(),
    tags=("ext", "similarity", "projection", "rerank", "bounded-nlj"),
)
def ann_rp_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval over the JL projection: candidates are
    scored in 16-dim RP space (4× cheaper per comparison, and the
    narrow vectors are what you'd actually store hot at 100 TB), the
    top-RP_SHORTLIST per query survive, and only those fetch their
    full-precision embeddings for the exact-cosine re-rank — the
    memory-bandwidth twin of `ann_pq_rerank_topk`'s compute-side ADC.
    At scale the RP stage drops brute-force for an LSH/IVF bucketing
    of the projected space; the re-rank join is unchanged.

    Plan: RP columns are pure projections; the scoring pass broadcasts
    the |Q| query rows; re-rank joins the |Q|·shortlist rows back to
    the vector store on vec_id. Bit-replicated by the oracle."""
    emb = t(spark, sf_dir, "embeddings")
    rp = emb.select(
        "vec_id",
        *[
            F.expr(_rp_expr(j, "element_at(embedding, {i})")).alias(f"r{j}")
            for j in range(RP_OUT_DIMS)
        ],
    )
    q = rp.filter(F.col("vec_id") < N_QUERIES).alias("q")
    c = rp.filter(F.col("vec_id") >= N_QUERIES).alias("c")
    w_rp = Window.partitionBy("query_id").orderBy(F.desc("rp_cos"), "cand_id")
    shortlist = (
        c.crossJoin(F.broadcast(q))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("cand_id"),
            F.expr(_rp_cos_terms("q", "c")).alias("rp_cos"),
        )
        .withColumn("rp_rank", F.row_number().over(w_rp))
        .filter(F.col("rp_rank") <= RP_SHORTLIST)
        .select("query_id", "cand_id")
    )
    qe = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    ce = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("e_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        shortlist.join(qe, "query_id")
        .join(ce, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.expr(COS_SPARK.format(a="q_emb", b="e_emb")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rank")
    )


# -- embedding-matrix health profile ---------------------------------------


@query(
    "emb_dim_stats",
    oracle="""
    WITH comp AS (
        SELECT unnest(generate_series(1, len(embedding))) - 1 AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings
    )
    SELECT dim,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(val * 1000000000) AS BIGINT)) AS DOUBLE)
               / (COUNT(*) * CAST(1000000000 AS DOUBLE)) AS mean_val,
           MIN(val) AS min_val,
           MAX(val) AS max_val,
           CAST(SUM(CASE WHEN val = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero
    FROM comp GROUP BY dim
    """,
    tags=("ext", "similarity", "profile"),
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION embedding-matrix health profile: mean, range, and
    dead-component count for every coordinate — the monitoring table
    that catches a drifting or collapsed embedding model (a dimension
    whose variance dies, or a normalization bug shifting the means)
    before a retrieval index is built on bad vectors.

    Exactness: components quantize to EXACT nano-unit integers
    (round(val·1e9) — the multiply is the same IEEE op on both
    engines, integer rounding of doubles agrees, and a float32's
    ±0.x values never sit on a decimal midpoint), the sum is exact
    integer arithmetic, and the mean is one IEEE division of
    identical operands — bit-stable. (A double→DECIMAL(38,18) cast
    is NOT portable at the last ulp: the two engines take different
    conversion paths, measured on this corpus.) min/max/zero-count
    are exact comparisons.

    Scale posture: posexplode → ONE map-side-combined groupBy keyed by
    dimension (64..4096 keys — tiny result regardless of corpus
    size); the explode is width×rows but pipelined at scan, never
    materialized. This is the canonical 'profile a 100 TB matrix into
    a dashboard table' shape."""
    emb = cpu_spread(t(spark, sf_dir, "embeddings"))
    comp = emb.select(
        F.posexplode("embedding").alias("dim", "val_f")
    ).select("dim", F.col("val_f").cast("double").alias("val"))
    return comp.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("val") * 1000000000).cast("bigint"))
            .cast("double")
            / (F.count(F.lit(1)) * F.lit(1000000000).cast("double"))
        ).alias("mean_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum(F.when(F.col("val") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
    )


# -- deterministic contrastive-negative sampling ----------------------------

N_NEGATIVES = 4  # negatives drawn per query vector


@query(
    "pair_contrastive_negatives",
    oracle=f"""
    WITH n_tot AS (SELECT COUNT(*) AS n FROM embeddings),
    q AS (
        SELECT vec_id AS query_id, embedding AS q_emb
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    gen AS (
        SELECT query_id, q_emb, k,
               CAST('0x' || substr(
                   md5(CAST(query_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)),
                   1, 15) AS BIGINT) % n AS raw_neg, n
        FROM q, (SELECT unnest(generate_series(1, {N_NEGATIVES})) AS k), n_tot
    ),
    pick AS (
        SELECT query_id, q_emb, k,
               CASE WHEN raw_neg = query_id THEN (raw_neg + 1) % n
                    ELSE raw_neg END AS neg_id
        FROM gen
    )
    SELECT p.query_id, p.k, p.neg_id,
           {COS_DUCK.format(a='p.q_emb', b='e.embedding')} AS cos
    FROM pick p JOIN embeddings e ON p.neg_id = e.vec_id
    """,
    tags=("ext", "similarity", "training-pairs", "bounded-nlj"),
)
def pair_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    query vector draws K uniform negatives by keyed hash —
    ``md5(qid:k) mod N`` — with a +1 bump on self-collision. Hash
    draws (not RNG) make the training pairs REPRODUCIBLE across
    engines, runs, epochs-as-jobs, and repartitioning, and give every
    pair an exact oracle; the emitted cosine is the curriculum signal
    (filter near-zero for easy negatives, take the top band for
    hard-negative mining).

    Scale posture: the (query × K) pair list is |Q|·K rows — tiny —
    and fetching negative vectors is ONE equi-join on vec_id against
    the corpus (hash-partitioned, AQE-broadcast when the pair list is
    small). No window, no corpus shuffle; the corpus-size scalar is a
    1-row broadcast cross-join, not a collect."""
    emb = t(spark, sf_dir, "embeddings")
    n_tot = emb.agg(F.count(F.lit(1)).alias("n"))
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ks = spark.range(1, N_NEGATIVES + 1).select(F.col("id").alias("k"))
    raw = F.expr(
        "cast(conv(substr(md5(concat(cast(query_id as string), ':',"
        " cast(k as string))), 1, 15), 16, 10) as bigint) % n"
    )
    pick = (
        q.crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(n_tot))
        .select(
            "query_id",
            "q_emb",
            "k",
            F.when(raw == F.col("query_id"), (raw + 1) % F.col("n"))
            .otherwise(raw)
            .alias("neg_id"),
        )
    )
    neg = emb.select(
        F.col("vec_id").alias("neg_id"), F.col("embedding").alias("n_emb")
    )
    return pick.join(neg, "neg_id").select(
        "query_id",
        "k",
        "neg_id",
        F.expr(COS_SPARK.format(a="q_emb", b="n_emb")).alias("cos"),
    )


# -- Matryoshka prefix-dimension retrieval ----------------------------------

#: Leading dimensions used for the cheap first-pass scoring.
#: Matryoshka-represented models (Kusupati et al., NeurIPS'22) train
#: embeddings so any PREFIX is itself a valid lower-dim embedding —
#: the production trick that makes "store 64 dims, search 16" work
#: with no projection matrix at all.
PREFIX_DIMS = 16
PREFIX_SHORTLIST = 20


def _prefix_rerank_oracle() -> str:
    pre_cos = COS_DUCK.format(a="q.pre", b="c.pre")
    full_cos = COS_DUCK.format(a="qe.embedding", b="ce.embedding")
    return f"""
    WITH p AS (
        SELECT vec_id, embedding[1:{PREFIX_DIMS}] AS pre FROM embeddings
    ),
    pre_scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {pre_cos} AS pre_cos
        FROM p q JOIN p c
          ON q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
    ),
    short AS (
        SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY pre_cos DESC, cand_id) AS r
            FROM pre_scored)
        WHERE r <= {PREFIX_SHORTLIST}
    )
    SELECT query_id, cand_id, cos, rank FROM (
        SELECT s.query_id, s.cand_id, {full_cos} AS cos,
               row_number() OVER (
                   PARTITION BY s.query_id
                   ORDER BY {full_cos} DESC, s.cand_id) AS rank
        FROM short s
        JOIN embeddings qe ON qe.vec_id = s.query_id
        JOIN embeddings ce ON ce.vec_id = s.cand_id)
    WHERE rank <= {TOP_K}
    """


@query(
    "ann_prefix_rerank_topk",
    oracle=_prefix_rerank_oracle(),
    tags=("ext", "similarity", "matryoshka", "rerank", "bounded-nlj"),
)
def ann_prefix_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval over PREFIX dimensions (the Matryoshka /
    MRL pattern, Kusupati et al. NeurIPS'22): first-pass cosine over
    only the leading ``PREFIX_DIMS`` coordinates — a 4× cheaper
    comparison needing NO projection matrix, codebook, or training
    artifact, because MRL-trained models make every prefix a valid
    embedding — then the top-``PREFIX_SHORTLIST`` per query fetch full
    vectors for the exact re-rank. Completes the compressed-first-pass
    family: PQ/ADC (compute-side), random projection (storage-side),
    prefix (FREE — slicing is a projection pushdown, so a columnar
    store reads only the prefix bytes in pass one).

    Plan: prefix columns are pure projections; pass one broadcasts the
    |Q| query rows; the re-rank joins |Q|·shortlist rows back to the
    vector store on vec_id. At scale pass one runs over an LSH/IVF
    bucketing of prefix space; the re-rank join is unchanged.
    Bit-replicated by the oracle (same fold order both engines)."""
    emb = t(spark, sf_dir, "embeddings")
    p = emb.select(
        "vec_id", F.expr(f"slice(embedding, 1, {PREFIX_DIMS})").alias("pre")
    )
    q = p.filter(F.col("vec_id") < N_QUERIES).alias("q")
    c = p.filter(F.col("vec_id") >= N_QUERIES).alias("c")
    w_pre = Window.partitionBy("query_id").orderBy(F.desc("pre_cos"), "cand_id")
    shortlist = (
        c.crossJoin(F.broadcast(q))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("cand_id"),
            F.expr(COS_SPARK.format(a="q.pre", b="c.pre")).alias("pre_cos"),
        )
        .withColumn("r", F.row_number().over(w_pre))
        .filter(F.col("r") <= PREFIX_SHORTLIST)
        .select("query_id", "cand_id")
    )
    qe = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    ce = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("e_emb")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return (
        shortlist.join(qe, "query_id")
        .join(ce, "cand_id")
        .select(
            "query_id",
            "cand_id",
            F.expr(COS_SPARK.format(a="q_emb", b="e_emb")).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "cand_id", "cos", "rank")
    )


# -- embedding drift monitor -------------------------------------------------

#: quantization for drift sums: 1e5 keeps per-(label,half,dim) sums
#: and their squared cross-products inside int64 up to ~10^5 vectors
#: per label (document the bound; drop a decade per 100× beyond).
DRIFT_SCALE = 100_000


@query(
    "emb_centroid_drift",
    oracle=f"""
    WITH comp AS (
        SELECT label, vec_id % 2 AS half,
               unnest(generate_series(1, len(embedding))) AS dim,
               CAST(round(CAST(unnest(embedding) AS DOUBLE)
                          * {DRIFT_SCALE}) AS BIGINT) AS q
        FROM embeddings
    ),
    sums AS (
        SELECT label, dim,
               SUM(CASE WHEN half = 0 THEN q ELSE 0 END) AS a_sum,
               SUM(CASE WHEN half = 1 THEN q ELSE 0 END) AS b_sum
        FROM comp GROUP BY label, dim
    ),
    halves AS (
        SELECT label,
               COUNT(DISTINCT CASE WHEN half = 0 THEN vec_id END) AS n_a,
               COUNT(DISTINCT CASE WHEN half = 1 THEN vec_id END) AS n_b
        FROM (SELECT label, vec_id % 2 AS half, vec_id FROM embeddings)
        GROUP BY label
    )
    SELECT s.label,
           CAST(h.n_a AS BIGINT) AS n_a, CAST(h.n_b AS BIGINT) AS n_b,
           CAST(SUM(s.a_sum * s.b_sum) AS DOUBLE)
               / (sqrt(CAST(SUM(s.a_sum * s.a_sum) AS DOUBLE))
                  * sqrt(CAST(SUM(s.b_sum * s.b_sum) AS DOUBLE)))
               AS centroid_cos
    FROM sums s JOIN halves h ON h.label = s.label
    GROUP BY s.label, h.n_a, h.n_b
    """,
    tags=("ext", "similarity", "monitoring", "drift"),
)
def emb_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding DRIFT monitor: per label, the cosine between the
    centroids of two deterministic cohort halves (vec_id parity here;
    a deployment compares week N vs week N+1). A healthy stable
    embedding pipeline keeps per-label centroid cosine near 1; a
    model swap, normalization bug, or upstream-content shift drags it
    down — the check that catches a silently-retrained encoder before
    a retrieval index is rebuilt on mixed vectors. Complements
    `emb_dim_stats` (per-dimension health) with per-LABEL geometry.

    Exactness: components quantize to exact 1e5-scale integers (same
    IEEE multiply+round both engines); centroid cosine uses the SUM
    vectors directly — cosine is scale-invariant, so skipping the /n
    mean keeps everything in integer cross-products (bounded in int64
    to ~10^5 vectors/label; rescale a decade per 100× beyond), and
    the final cosine is a fixed chain of IEEE ops on identical
    integers. No float summation order anywhere.

    Scale posture: one (label, dim)-keyed map-side-combined aggregate
    over the exploded components (|labels|·|dims| rows out), then a
    |labels|-sized rollup — scan speed at any corpus size."""
    emb = t(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim0", "val"),
    ).select(
        "label",
        "half",
        (F.col("dim0") + 1).alias("dim"),
        F.expr(
            f"cast(round(cast(val as double) * {DRIFT_SCALE}) as bigint)"
        ).alias("q"),
    )
    sums = comp.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("half") == 0, F.col("q")).otherwise(0)).alias(
            "a_sum"
        ),
        F.sum(F.when(F.col("half") == 1, F.col("q")).otherwise(0)).alias(
            "b_sum"
        ),
    )
    halves = emb.groupBy("label").agg(
        F.sum(F.when(F.col("vec_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("vec_id") % 2 == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    per_label = sums.groupBy("label").agg(
        F.expr(
            "cast(sum(a_sum * b_sum) as double)"
            " / (sqrt(cast(sum(a_sum * a_sum) as double))"
            " * sqrt(cast(sum(b_sum * b_sum) as double)))"
        ).alias("centroid_cos")
    )
    return per_label.join(halves, "label").select(
        "label", "n_a", "n_b", "centroid_cos"
    )


# -- embedding-norm outlier gate --------------------------------------------


@query(
    "emb_norm_outliers",
    oracle="""
    WITH norms AS (
        SELECT vec_id, label,
               CAST(round(list_aggregate(
                        list_transform(embedding,
                                       x -> CAST(x AS DOUBLE)
                                            * CAST(x AS DOUBLE)),
                        'sum') * 1000000000.0) AS BIGINT) AS norm2_nano
        FROM embeddings
    ),
    th AS (
        SELECT CAST(floor(quantile_cont(norm2_nano, 0.01)) AS BIGINT) AS lo,
               CAST(floor(quantile_cont(norm2_nano, 0.99)) AS BIGINT) AS hi
        FROM norms
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           CAST(SUM(CASE WHEN norm2_nano < lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN norm2_nano > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_high,
           CAST(10000 * (CAST(SUM(CASE WHEN norm2_nano < lo
                                       THEN 1 ELSE 0 END) AS BIGINT)
                         + CAST(SUM(CASE WHEN norm2_nano > hi
                                         THEN 1 ELSE 0 END) AS BIGINT))
                // COUNT(*) AS BIGINT) AS outlier_bps
    FROM norms, th
    GROUP BY label
    """,
    tags=("ext", "similarity", "profile", "bounded-nlj"),
)
def emb_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bucketed embedding-NORM outlier gate (the r10-verdict
    suggested companion to ``emb_dim_stats``): squared-L2 norms land
    outside the corpus [p1, p99] band for exactly the vectors an
    embedding pipeline must quarantine — near-zero norms (a failed
    encode, an all-pad input) and exploding norms (fp overflow, a
    mis-normalized model) — reported per label so a single bad source
    shows up as a hot bucket.

    Exactness: the squared norm is a SEQUENTIAL left-fold of IEEE
    double products (bit-identical fold order on both engines), then
    quantized once to exact nano-unit integers (round(x*1e9) — same
    IEEE multiply, same integer rounding). The p1/p99 thresholds
    interpolate over those INTEGERS (identical on both engines) and
    are FLOORED to integers before any comparison — the winsorize
    idiom: never re-quantize a float threshold through a cast, clamp
    in pure ints.

    Scale posture: one scan computes norms, one 1-row global
    percentile agg, broadcast back (bounded-nlj: the 1-row threshold
    frame), one map-side-combined groupBy(label) — rollup-sized
    output no matter the corpus. The norm scan is arrow-free,
    whole-stage-codegen (higher-order ``aggregate``)."""
    emb = cpu_spread(t(spark, sf_dir, "embeddings"))
    norms = emb.select(
        "label",
        F.expr(
            "cast(round(aggregate(embedding, cast(0.0 as double),"
            " (acc, x) -> acc + cast(x as double) * cast(x as double))"
            " * 1000000000.0D) as bigint)"
        ).alias("norm2_nano"),
    )
    th = norms.agg(
        F.expr(
            "cast(floor(percentile(norm2_nano, 0.01D)) as bigint)"
        ).alias("lo"),
        F.expr(
            "cast(floor(percentile(norm2_nano, 0.99D)) as bigint)"
        ).alias("hi"),
    )
    return (
        norms.crossJoin(F.broadcast(th))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.when(F.col("norm2_nano") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_low"),
            F.sum(F.when(F.col("norm2_nano") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_high"),
        )
        .select(
            "label",
            "n_vecs",
            "n_low",
            "n_high",
            F.expr(
                "cast(10000 * (n_low + n_high) div n_vecs as bigint)"
            ).alias("outlier_bps"),
        )
    )
