"""IVF coarse-quantizer training: distributed Lloyd iterations.

Reusable E/M steps behind the ``ann_ivf_refined_topk`` registry query
(which runs exactly one pass): the train / index / search split every
production IVF system uses, with the train step as a first-class
operator supporting multiple passes and a convergence metric.

Scale design (unchanged from the single-pass query, per pass):

- **E-step** (:func:`assign_cells`): one scan of the vectors against a
  BROADCAST centroid set (K is small by definition of a coarse
  quantizer); nearest-by-cosine via a per-vector window. Never
  shuffles the corpus on anything but the final window key.
- **M-step** (:func:`refine_centroids`): the new centroid of each cell
  is the elementwise DECIMAL SUM of its members, computed by
  posexplode → groupBy(cell, pos) — fully distributed, map-side
  combined, K×d rows out. Cosine is scale-invariant, so the
  unnormalized sum IS the mean direction; skipping the division keeps
  the arithmetic exact (decimal sums are reduce-order-independent),
  which is what lets the DuckDB oracle replicate a trained index
  bit-for-bit.
- **Convergence** (:func:`train`): after each pass the movement of
  every centroid is measured as ``1 − cosine(old, new)`` (scale-
  invariant, so the unnormalized representation doesn't distort it)
  and summed — a K-row job per pass, nothing corpus-sized reaches the
  driver. Training stops early when the movement sum drops below
  ``tol``.

The per-pass cost at 100 TB is therefore: one broadcast-assign scan +
one (cell, dim)-keyed aggregation. ``passes`` multiplies that linearly
— there is no accumulated lineage because each pass's centroids are a
K-row local checkpoint (``collect``-free: K×d values flow through a
broadcast, never through the driver as a Python loop over rows).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nineinfra_spark.functions import cosine_similarity


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """E-step: nearest centroid by cosine for every vector.

    ``vectors``: (id_col, vec_col, …); ``centroids``: (cell, c_emb).
    Returns (id_col, vec_col, cell). Ties break on the lower cell id —
    deterministic, so repeated runs (and the SQL oracle) agree."""
    cos = cosine_similarity(F.col(vec_col), F.col("c_emb")).alias("cos_vc")
    w = Window.partitionBy(id_col).orderBy(F.desc("cos_vc"), "cell")
    return (
        vectors.select(id_col, vec_col)
        .crossJoin(F.broadcast(centroids))  # K-row side: bounded
        .select(id_col, vec_col, "cell", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, "cell")
    )


def refine_centroids(assigned: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """M-step: per-cell elementwise decimal sum of member vectors
    (the unnormalized mean direction — see module docstring).
    ``assigned``: (…, cell, vec_col) from :func:`assign_cells`.
    Returns (cell, c_emb). Cells that lost all members disappear
    (standard Lloyd behavior for empty cells)."""
    return (
        assigned.select("cell", F.posexplode(vec_col).alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(
            F.sum(F.col("val").cast("double").cast("decimal(38,18)"))
            .cast("double")
            .alias("comp")
        )
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "comp"))).alias("sc"))
        .select("cell", F.transform("sc", lambda s: s.comp).alias("c_emb"))
    )


@dataclass
class IvfTrainResult:
    #: Final centroid set: (cell, c_emb), unnormalized mean directions.
    centroids: DataFrame
    #: Per-pass movement sums: Σ_cells (1 − cos(old, new)); one entry
    #: per executed pass. Monotone-decreasing on well-behaved data.
    movements: list[float]
    #: Passes actually executed (may be < requested when tol hits).
    passes_run: int


def train(
    vectors: DataFrame,
    centroids0: DataFrame,
    passes: int = 1,
    tol: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IvfTrainResult:
    """Run ``passes`` Lloyd iterations from seed ``centroids0``.

    Each pass: E-step assign → M-step refine → K-row movement
    measurement. Stops early when a pass's movement sum ≤ ``tol``
    (0.0 = run all requested passes unless a pass moves nothing).
    The returned centroids DataFrame is lazily evaluated like any
    plan; pass results are stabilized between iterations with
    ``localCheckpoint`` so lineage doesn't snowball across passes
    (same treatment as the connected-components loop)."""
    if passes < 1:
        raise ValueError(f"passes must be >= 1, got {passes}")
    current = centroids0
    movements: list[float] = []
    for i in range(passes):
        assigned = assign_cells(vectors, current, id_col=id_col, vec_col=vec_col)
        refined = refine_centroids(assigned, vec_col=vec_col).localCheckpoint()
        old = current.select("cell", F.col("c_emb").alias("old_emb"))
        # Convergence must COUNT what changed, not skip it (r11 review
        # finding): an inner join dropped cells that vanished between
        # passes, and a NULL cosine (zero-norm centroid — opposite-
        # signed members summing to zero) was silently skipped by
        # SUM — both could report convergence while the centroid set
        # actually changed. Full-outer join + maximal movement (2.0,
        # the 1-cos range limit) for missing/degenerate cells.
        move_rows = (
            refined.select("cell", "c_emb")
            .join(old, "cell", "full_outer")
            .select(
                F.when(
                    F.col("c_emb").isNull() | F.col("old_emb").isNull(),
                    F.lit(2.0),
                )
                .otherwise(
                    F.lit(1.0)
                    - F.coalesce(
                        cosine_similarity(F.col("c_emb"), F.col("old_emb")),
                        F.lit(-1.0),
                    )
                )
                .alias("move")
            )
            .agg(F.sum("move").alias("total"))
            .collect()  # 1-row convergence metric, like the CC flag
        )
        movement = float(move_rows[0]["total"] or 0.0)
        movements.append(movement)
        current = refined
        if movement <= tol:
            return IvfTrainResult(current, movements, i + 1)
    return IvfTrainResult(current, movements, passes)
