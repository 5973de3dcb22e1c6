"""Fixed-iteration PageRank in exact integer arithmetic.

The iterative-algorithm companion to ``operators/components.py``
(large-star/small-star contraction): where components needs
O(log n) DATA-DEPENDENT rounds, PageRank's power iteration is a
FIXED number of identical rounds — each one equi-join (ranks ⋈ edges
on src) + one groupBy(dst) sum, the canonical distributed PageRank
step (Brin & Page 1998; the Pregel/GraphX formulation maps to exactly
this join-aggregate pair).

Exactness design: ranks are INTEGER mass. Start every node at
``scale`` (default 10¹²); each round a node keeps the teleport share
``scale·(1-d)`` and receives ``floor(d·rank(u)/outdeg(u))`` from each
in-neighbor ``u`` — floor division on 64-bit integers, so every
engine (and the DuckDB oracle's unrolled-CTE form) reproduces the
ranks BIT-IDENTICALLY; no float summation order anywhere. The floor
drops ≤ outdeg units of mass per node per round — a deliberate,
deterministic rounding that leaves the ranking semantics intact
(standard float PageRank tolerates far larger numerical drift).

Overflow bound: the per-edge contribution is evaluated by the split
identity ``d_num·(rank div m) + (d_num·(rank mod m)) div m`` with
``m = d_den·outdeg`` — integer-equal to ``(d_num·rank) div m`` but
never forming the ``85·rank`` product, so every intermediate stays
≤ max(rank, 85·m). Total mass only shrinks (floor leakage), hence
rank ≤ |V|·SCALE always, and the arithmetic provably fits int64 for
``|V|·SCALE < 2^63`` — about 9.2 million nodes at the default SCALE.
For larger graphs pass a smaller ``scale`` (precision trades off at
``scale/|E|`` mass units per edge). tests/test_graph.py exercises a
hub graph whose naive form would wrap.

Scale posture: per round, one shuffle keyed by ``src`` (or a
broadcast when ranks are dimension-sized) + one map-side-combined
sum keyed by ``dst``. Rounds are fixed (default 3) so total shuffle
volume is ``iters × |edges|`` — no convergence-dependent tail. At
100 TB the ranks table is |V| rows against |E|-row edges, the same
small-against-big join every iteration; localCheckpoint between
rounds caps lineage depth exactly as in components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 10^12 integer mass units per node
DAMP_NUM, DAMP_DEN = 85, 100  # d = 0.85 as an exact rational


def pagerank_fixed(edges: DataFrame, iters: int = 3) -> DataFrame:
    """PageRank over a directed edge list ``edges(src, dst)`` (each
    directed edge appearing once), ``iters`` exact power-iteration
    rounds. Returns ``(node, rank)`` with integer ranks.

    Nodes are taken from the ``src`` column — callers whose graphs
    have sink nodes (appearing only as ``dst``) should add reverse
    edges or self-loops first; a sink would otherwise leak its mass,
    which this exact-arithmetic formulation makes visible instead of
    silently renormalizing."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # The edge list feeds the degree count plus every iteration's join
    # — materialize it ONCE (upstream distincts/joins would otherwise
    # recompute per round, turning iters× reuse into iters× rebuild).
    edges = edges.localCheckpoint(eager=False)
    # outdeg never changes across rounds, so it is FUSED into the rank
    # state once (r16 optimization round, guide §2.4 "remove shuffles
    # outright"/§3: the former shape probed the |E|-row edge fact with
    # TWO broadcast hash joins per round — ranks, then deg — and built
    # three broadcasts per round; carrying outdeg inside the state
    # halves the fact probes and drops one broadcast build per round
    # while leaving the integer arithmetic bit-identical).
    state0 = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=False)
    )
    teleport = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    ranks = state0.select("node", "outdeg", F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(iters):
        # ranks (with fused outdeg) is |V|-sized against the |E|-row
        # edge fact — broadcast it so each round is ONE map-side join
        # + one combined shuffle on dst (checkpointed inputs lose
        # their size stats, so without the hint AQE falls back to
        # sort-merge). For graphs whose rank table outgrows the
        # broadcast budget, drop the hints and the same plan shuffles
        # on src.
        contrib = (
            edges.join(F.broadcast(ranks), edges.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                # (85·rank) div m computed as 85·(rank div m) +
                # (85·(rank mod m)) div m with m = 100·outdeg — the
                # SAME integer (q = rank div m, r = rank mod m ⇒
                # 85·rank = 85·q·m + 85·r), but no 85× headroom
                # blowup: the naive 85·rank wraps int64 once a hub's
                # rank passes ~10^17 (|V| ≈ 10^5 at SCALE=10^12),
                # silently in Spark vs checked in DuckDB (advice r8).
                # Here every term stays ≤ max(rank, 85·m) — the
                # provable bound is |V|·SCALE < 2^63, i.e. ~9·10^6
                # nodes at the default SCALE.
                F.expr(
                    f"{DAMP_NUM} * (rank div ({DAMP_DEN} * outdeg))"
                    f" + ({DAMP_NUM} * (rank % ({DAMP_DEN} * outdeg)))"
                    f" div ({DAMP_DEN} * outdeg)"
                ).alias("c"),
            )
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("inflow"))
        ranks = (
            state0.join(F.broadcast(inflow), "node", "left")
            .select(
                "node",
                "outdeg",
                (
                    F.lit(teleport).cast("long")
                    + F.coalesce(F.col("inflow"), F.lit(0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)  # cap lineage across rounds
        )
    return ranks.select("node", "rank")
