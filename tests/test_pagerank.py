"""pagerank_fixed (operators/pagerank.py): exact-integer power
iteration — differential-tested against a pure-Python model of the
same recurrence, plus contract checks.
"""

from __future__ import annotations

import hashlib

import pytest

from nineinfra_spark.operators.pagerank import (
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    pagerank_fixed,
)


def _python_pagerank(edges: list[tuple[str, str]], iters: int) -> dict[str, int]:
    nodes = sorted({s for s, _ in edges})
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    teleport = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    rank = {n: SCALE for n in nodes}
    for _ in range(iters):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            if d in inflow:
                inflow[d] += (DAMP_NUM * rank[s]) // (DAMP_DEN * outdeg[s])
        rank = {n: teleport + inflow[n] for n in nodes}
    return rank


def _spark_ranks(spark, edges, iters):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: r["rank"] for r in pagerank_fixed(df, iters=iters).collect()
    }


def test_matches_python_model_on_random_graph(spark):
    """50-node md5-derived digraph (every node has out-edges): the
    Spark join-aggregate rounds must reproduce the Python recurrence
    bit-for-bit — integer arithmetic leaves no tolerance window."""
    nodes = [f"n{i}" for i in range(50)]
    edges = []
    for i, s in enumerate(nodes):
        h = int(hashlib.md5(s.encode()).hexdigest()[:8], 16)
        for k in range(1 + h % 3):  # 1..3 out-edges per node
            edges.append((s, nodes[(i + 1 + (h >> (4 * k)) % 17) % 50]))
    edges = sorted(set(edges))
    for iters in (1, 3):
        assert _spark_ranks(spark, edges, iters) == _python_pagerank(edges, iters)


def test_hub_outranks_leaves(spark):
    """A hub with many in-edges must end above its spokes."""
    spokes = [f"s{i}" for i in range(8)]
    edges = [(s, "hub") for s in spokes] + [("hub", s) for s in spokes]
    ranks = _spark_ranks(spark, edges, 3)
    assert all(ranks["hub"] > ranks[s] for s in spokes)


def test_two_cycle_is_symmetric(spark):
    """a⇄b with identical structure → identical integer ranks."""
    ranks = _spark_ranks(spark, [("a", "b"), ("b", "a")], 3)
    assert ranks["a"] == ranks["b"]
    # mass is conserved up to the deterministic floor loss
    assert ranks["a"] <= SCALE


def test_iters_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="iters"):
        pagerank_fixed(df, iters=0)
