"""triangle_stats (operators/triangles.py) pinned against brute-force
enumeration on seeded random graphs — independent of the registered
query's lineitem-derived graph and its DuckDB oracle, this checks the
degree-ordered orientation itself: exactly-once triangle discovery on
hubs, stars (0 triangles), cliques (C(n,3)), and the wedge formula."""

from __future__ import annotations

import itertools
import random

import pytest


def _brute(edges: list[tuple[int, int]]) -> dict:
    es = set(edges)
    nodes = sorted({n for e in edges for n in e})
    deg: dict[int, int] = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    return {
        "n_nodes": len(nodes),
        "n_edges": len(es),
        "n_wedges": wedges,
        "n_triangles": tri,
        "clustering_bps": (10000 * 3 * tri) // wedges if wedges else None,
    }


def _spark_stats(spark, edges: list[tuple[int, int]]) -> dict:
    from nineinfra_spark.operators.triangles import triangle_stats

    df = spark.createDataFrame(sorted(set(edges)), "u long, v long")
    row = triangle_stats(df).collect()[0]
    return row.asDict()


def _rand_graph(seed: int, n: int, p_pct: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (a, b)
        for a, b in itertools.combinations(range(n), 2)
        if rng.randrange(100) < p_pct
    ]


@pytest.mark.parametrize("seed,n,p", [(1, 12, 30), (2, 14, 50), (3, 10, 80)])
def test_random_graphs_match_brute_force(spark, seed, n, p):
    edges = _rand_graph(seed, n, p)
    assert _spark_stats(spark, edges) == _brute(edges)


def test_hub_star_has_zero_triangles(spark):
    """A pure star is the orientation's worst adversary (one hub,
    every edge incident): zero triangles, all wedges at the hub."""
    k = 15
    edges = [(0, i) for i in range(1, k + 1)]
    got = _spark_stats(spark, edges)
    assert got["n_triangles"] == 0
    assert got["n_wedges"] == k * (k - 1) // 2
    assert got["clustering_bps"] == 0


def test_wedge_free_graph_returns_null_coefficient(spark):
    """A perfect matching (every degree 1) has ZERO wedges — the
    coefficient is undefined and must come back NULL, not raise
    DIVIDE_BY_ZERO under ANSI mode (r9 ADVICE finding)."""
    edges = [(0, 1), (2, 3), (4, 5)]
    got = _spark_stats(spark, edges)
    assert got["n_wedges"] == 0
    assert got["n_triangles"] == 0
    assert got["clustering_bps"] is None
    assert got == _brute(edges)


def test_clique_counts_every_triple_once(spark):
    n = 8
    edges = list(itertools.combinations(range(n), 2))
    got = _spark_stats(spark, edges)
    assert got["n_triangles"] == n * (n - 1) * (n - 2) // 6
    # in a clique every wedge closes: coefficient is exactly 1
    assert got["clustering_bps"] == 10000


def test_hub_plus_clique_mixture(spark):
    """Hub attached to a clique: triangles come only from the clique
    and the hub's pendant edges add wedges but no closures — the case
    where id-ordered counting would explode and orientation must not
    double- or zero-count."""
    clique = list(itertools.combinations(range(1, 7), 2))  # K6 on 1..6
    pendants = [(0, i) for i in range(1, 20)]  # node 0 spans clique + tail
    edges = sorted(set(clique + pendants))
    assert _spark_stats(spark, edges) == _brute(edges)
