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
near-dup graph: each round is two groupBy-min + two equi-joins (all
key-partitioned, AQE-managed, no driver state beyond a converged
flag), with ``localCheckpoint`` cutting lineage per round — each
round's edge set feeds three subtrees (both adjacency directions +
the large-star probe), so the per-round materialization is also what
keeps the work per round linear (see the measured note in
``star_contract``).

Both operations preserve connectivity (each emitted edge connects two
nodes already connected through u), so the fixpoint labels equal the
true components; convergence is detected EXACTLY (set equality with
the previous round's edges), never by a lossy fingerprint.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round over canonical ``(hi, lo)`` edges
    (hi > lo). Emits ``(v, min(Γ(u) ∪ {u}))`` for every neighbor
    v > u; output is canonical by construction (m ≤ u < v).

    r16 optimization-round shape (guide §2.3/§2.4), two changes from
    the original window form, both A/B-measured:

    - The neighborhood min comes from a groupBy-min + equi-join back
      (the same form ``_small_star`` uses — its window variant was
      measured SLOWER in this round, see that docstring): the partial
      aggregate map-side-combines the doubled adjacency down to one
      row per node BEFORE its exchange, where the window had to
      shuffle and SORT all 2|E| adjacency rows.
    - No output ``distinct()``: the pre-dedup output is exactly ONE
      row per canonical input edge (only the u < v orientation
      survives), and the only consumer — ``_small_star`` — is
      duplicate-insensitive (its min aggregate ignores multiplicity
      and its own final ``distinct`` dedupes the round output), so
      the extra full exchange bought nothing.
    """
    adj = edges.select(
        F.col("hi").alias("u"), F.col("lo").alias("v")
    ).unionAll(edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
    mins = adj.groupBy("u").agg(F.min("v").alias("mv"))
    # the v > u probe side is exactly the canonical edge list re-keyed
    # by its smaller endpoint — no need to re-filter the doubled adj
    probe = edges.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    return probe.join(mins, "u").select(
        F.col("v").alias("hi"), F.least(F.col("mv"), F.col("u")).alias("lo")
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: key each edge by its LARGER endpoint u;
    with N = smaller neighbors and m = min(N), attach every node of
    N ∪ {u} to m (self-loop dropped).

    Output is canonicalized (hi > lo) but NOT distinct-ed (r16
    optimization round): the one caller — ``star_contract``'s round
    loop — dedupes it inside the same groupBy that performs the
    convergence compare, so a distinct here would be a second
    full exchange on exactly the same key (guide §2.4 "two
    operations keyed the same way can share one exchange").

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
    if prev_n == 0:
        # Empty edge set (reachable: pair queries whose threshold
        # matches nothing). The round loop's symmetric-difference
        # count is F.sum over ZERO groups → NULL, so without this
        # early return (or the coalesce below) convergence would
        # never be detected (r16 ADVICE). Mirrors the pre-r16
        # size+exceptAll check, which returned (empty, 1).
        return prev, 1
    if max_rounds is None:
        # n_nodes <= 2*n_edges, and the edge count is computed anyway
        # for the convergence check — deriving the bound from it
        # deletes what used to be a SECOND full-graph shuffle (union
        # of both endpoints + distinct + count) whose only purpose was
        # a ceil(log2) that this loosens by at most ~4 rounds (r11
        # review finding).
        max_rounds = 4 * math.ceil(math.log2(2 * prev_n + 2)) + 8
    for rounds in range(1, max_rounds + 1):
        # ONE job per round (r16 optimization round, measured-first —
        # the per-round wall on a near-converged graph is job/stage
        # overhead, not data): the round's dedup, its materialization,
        # AND the exact set-equality convergence compare all ride one
        # groupBy (guide §2.4). The raw small-star rows (tag +1) union
        # the previous round's edges (tag -1); grouping on (hi, lo)
        # yields per-edge membership flags, so
        #   - `_in_nxt` rows ARE the distinct round output (the
        #     distinct formerly inside _small_star — same exchange),
        #   - flag disagreement counts the exact symmetric difference
        #     (the former count-gated exceptAll SECOND job, which
        #     measured 0.8-2.2 s of pure stage overhead per firing).
        # The lazy checkpoint sits on the grouped relation; the tiny
        # stats aggregate is the materializing action.
        # (Also measured and REJECTED here: batching TWO alternations
        # per materialization — embedding clusters 4.71 → 6.67 s,
        # connected clusters 2.55 → 5.30 s at sf0.1 — each round's
        # edge set feeds three subtrees (both adjacency directions +
        # the large-star probe), so an un-checkpointed inner round is
        # recomputed by every outer-round consumer.)
        merged = (
            _small_star(_large_star(prev))
            .select("hi", "lo", F.lit(1).alias("_t"))
            .unionAll(prev.select("hi", "lo", F.lit(-1).alias("_t")))
            .groupBy("hi", "lo")
            .agg(
                (F.max("_t") == 1).alias("_in_nxt"),
                (F.min("_t") == -1).alias("_in_prev"),
            )
            .localCheckpoint(eager=False)
        )
        n_diff = merged.agg(
            # coalesce: SUM over zero rows is NULL, and NULL == 0 is
            # False — an all-empty round must still count as converged
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_in_nxt") != F.col("_in_prev"), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("d")
        ).first()["d"]
        nxt = merged.filter("_in_nxt").select("hi", "lo")
        if n_diff == 0:
            return nxt, rounds
        prev = nxt
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
