"""Connected components in O(log n) shuffle rounds: the alternating
large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14).

Why not plain min-label propagation (``ext_dedup.min_label_components``)?
Propagation needs one shuffle round per unit of graph DIAMETER — a
pathological near-dup CHAIN (doc₁~doc₂~…~docₖ, each pair similar but
the ends unrelated) makes k rounds. The star operations instead
contract the graph geometrically:

- **large-star(u)**: every neighbor v > u re-attaches to
  m = min(Γ(u) ∪ {u}) — strictly-larger neighbors hop toward the
  component minimum;
- **small-star(u)**: every neighbor v ≤ u (and u itself) attaches to
  m — the tree flattens into stars.

Alternating the two halves the effective height every round, so the
fixpoint — a star forest whose centers are the component minima —
arrives in O(log n) rounds on ANY graph shape, diameter included.
That is the property that makes components tractable on a 100 TB
near-dup graph: each round is two groupBy-min + one join (all
key-partitioned, AQE-managed, no driver state beyond a converged
flag), with ``localCheckpoint`` cutting lineage per round.

Both operations preserve connectivity (each emitted edge connects two
nodes already connected through u), so the fixpoint labels equal the
true components; convergence is detected EXACTLY (set equality with
the previous round's edges), never by a lossy fingerprint.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round over canonical ``(hi, lo)`` edges
    (hi > lo). Emits ``(v, min(Γ(u) ∪ {u}))`` for every neighbor
    v > u; output is canonical by construction (m ≤ u < v)."""
    adj = edges.select(
        F.col("hi").alias("u"), F.col("lo").alias("v")
    ).unionAll(edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    return (
        adj.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: key each edge by its LARGER endpoint u;
    with N = smaller neighbors and m = min(N), attach every node of
    N ∪ {u} to m (self-loop dropped).

    (r16 note: a window-over-one-exchange variant — min via
    Window.partitionBy(hi) feeding both leaves and centers — was
    measured at sf0.1 and did NOT beat this groupBy+join form (the
    window's required sort costs what the join-back saves), so the
    hash-based shape stays.)"""
    m = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    leaves = edges.join(m, "hi").select(
        F.col("lo").alias("a"), F.col("m").alias("b")
    )
    centers = m.select(F.col("hi").alias("a"), F.col("m").alias("b"))
    return (
        leaves.unionAll(centers)
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .distinct()
    )


def star_contract(pairs: DataFrame, max_rounds: int | None = None) -> tuple[DataFrame, int]:
    """Run alternating large-star/small-star to the fixpoint; returns
    ``(star_edges, rounds)`` where star_edges is the converged
    ``(hi, lo)`` star forest (lo = component minimum for every hi).

    ``max_rounds`` defaults to ``4·⌈log₂(n+2)⌉ + 8`` — a generous
    multiple of the paper's bound; hitting it means a bug, not a big
    graph, so it raises rather than returning partial labels."""
    a, b = pairs.columns
    edges = (
        pairs.filter(F.col(a) != F.col(b))
        .select(
            F.greatest(F.col(a), F.col(b)).alias("hi"),
            F.least(F.col(a), F.col(b)).alias("lo"),
        )
        .distinct()
        # lazy checkpoint + count = ONE job that both materializes and
        # counts (an eager checkpoint here was a second full pass)
        .localCheckpoint(eager=False)
    )
    prev = edges
    prev_n = prev.count()
    if max_rounds is None:
        # n_nodes <= 2*n_edges, and the edge count is computed anyway
        # for the convergence check — deriving the bound from it
        # deletes what used to be a SECOND full-graph shuffle (union
        # of both endpoints + distinct + count) whose only purpose was
        # a ceil(log2) that this loosens by at most ~4 rounds (r11
        # review finding).
        max_rounds = 4 * math.ceil(math.log2(2 * prev_n + 2)) + 8
    for rounds in range(1, max_rounds + 1):
        # lazy checkpoint: the count() is the materializing action, so
        # each round is one job, not checkpoint-job + count-job
        nxt = _small_star(_large_star(prev)).localCheckpoint(eager=False)
        nxt_n = nxt.count()
        # exact set-equality convergence: same cardinality and no edge
        # in nxt outside prev (distinct sets => subset + equal size)
        if nxt_n == prev_n and nxt.exceptAll(prev).limit(1).count() == 0:
            return nxt, rounds
        prev, prev_n = nxt, nxt_n
    raise RuntimeError(
        f"star_contract did not converge in {max_rounds} rounds — "
        "this exceeds the O(log n) bound and indicates a bug"
    )


def star_components(pairs: DataFrame, max_rounds: int | None = None) -> DataFrame:
    """Connected components over an undirected pair graph; same
    contract as ``ext_dedup.min_label_components`` — returns
    ``(doc_id, cluster_id, n_members)`` with cluster_id = the
    component's MIN node id — but in O(log n) shuffle rounds
    regardless of graph diameter (see module docstring)."""
    stars, _ = star_contract(pairs, max_rounds=max_rounds)
    # star forest: every non-center node appears exactly once as hi
    members = stars.select(
        F.col("hi").alias("doc_id"), F.col("lo").alias("cluster_id")
    ).unionAll(
        stars.select(F.col("lo").alias("doc_id"), F.col("lo").alias("cluster_id"))
        .distinct()
    )
    sizes = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return members.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "n_members"
    )
