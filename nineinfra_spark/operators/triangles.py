"""Distributed triangle counting by degree-ordered orientation.

Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
Reducer" (WWW'11): orient every undirected edge from its
(degree, id)-smaller endpoint to the larger. The orientation is a DAG
under a total order, so each triangle u≺v≺w is discovered exactly once
as the wedge (u→v, u→w) closed by the oriented edge v→w — and every
node's OUT-degree is O(√m), which bounds the wedge join at O(m^1.5)
regardless of hubs. The naive id-ordered join (the oracle form in
``plans/graph.py``) is exact too but a degree-d hub with a small id
contributes d² wedges; real co-occurrence graphs always have hubs.

Used by ``plans/graph.py::graph_triangle_count`` (part co-occurrence);
reference parity: analytics-cluster workloads over warehouse tables
(``api/v1alpha1/ninecluster_types.go:31-38``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Global triangle statistics for an undirected simple graph.

    ``edges``: one row per undirected edge, columns ``u`` / ``v`` with
    ``u < v`` (canonical form, no duplicates, no self-loops — the
    caller's contract; build it with a ``u < v`` filter + distinct).

    Returns one row: ``n_nodes, n_edges, n_wedges, n_triangles,
    clustering_bps`` where ``n_wedges = Σ d(d−1)/2`` (orientation-
    independent, computed from the degree table — wedges are counted,
    never materialized) and ``clustering_bps`` is the global clustering
    coefficient ``3·triangles / wedges`` in integer basis points.

    Shuffle inventory: edge→degree groupBy, two degree joins (AQE
    broadcasts whichever side is small), one wedge self-join keyed on
    ``src``, one closing equi-join — all equi-joins; the only
    nested-loop anywhere is the 1-row stats combine at the end (tag
    queries using this with ``bounded-nlj``)."""
    edges = edges.select("u", "v").localCheckpoint(eager=False)

    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    deg = deg.localCheckpoint(eager=False)

    # orientation: src = (deg, id)-smaller endpoint; the (d, node)
    # struct IS the total order, carried so wedge endpoints compare by
    # the same key
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    ukey = F.struct(F.col("du").alias("kd"), F.col("u").alias("kn"))
    vkey = F.struct(F.col("dv").alias("kd"), F.col("v").alias("kn"))
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(ukey < vkey, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(ukey < vkey, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(ukey < vkey, vkey).otherwise(ukey).alias("dst_key"),
        )
    )
    oriented = oriented.localCheckpoint(eager=False)

    x = oriented.select(
        F.col("src"), F.col("dst").alias("w1"), F.col("dst_key").alias("k1")
    )
    y = oriented.select(
        F.col("src"), F.col("dst").alias("w2"), F.col("dst_key").alias("k2")
    )
    wedges = x.join(y, "src").filter(F.col("k1") < F.col("k2"))
    closing = oriented.select(
        F.col("src").alias("w1"), F.col("dst").alias("w2")
    )
    n_tri = wedges.join(closing, ["w1", "w2"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )

    node_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.coalesce(
            F.sum(F.expr("d * (d - 1) div 2")), F.lit(0).cast("bigint")
        ).alias("n_wedges"),
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))

    return (
        node_stats.crossJoin(n_edges)
        .crossJoin(n_tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            # Wedge-free graphs (all degrees ≤ 1) have no defined
            # clustering coefficient: return NULL instead of raising
            # DIVIDE_BY_ZERO under ANSI mode (the oracle mirrors the
            # same CASE guard).
            F.expr(
                "cast(case when n_wedges > 0"
                " then 10000 * 3 * n_triangles div n_wedges end as bigint)"
            ).alias("clustering_bps"),
        )
    )
