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


def test_hub_rank_beyond_naive_int64_wrap(spark, monkeypatch):
    """Advice r8: the naive `85·rank` product wraps int64 once a
    hub's rank passes ~1.08·10^17 (silently in Spark, checked in
    DuckDB). The split identity `85·(rank div m) + (85·(rank mod m))
    div m` is integer-equal with every intermediate ≤ max(rank, 85·m).
    Force SCALE to 2·10^17: after round 1 the hub holds ~1.7·10^18 —
    round 2's contribution would wrap under the naive form — and the
    Spark ranks must still equal the arbitrary-precision Python
    recurrence exactly."""
    from nineinfra_spark.operators import pagerank as P

    big = 200_000_000_000_000_000  # 2e17
    monkeypatch.setattr(P, "SCALE", big)
    spokes = [f"s{i}" for i in range(10)]
    edges = [(s, "hub") for s in spokes] + [("hub", s) for s in spokes]

    # arbitrary-precision reference of the same recurrence
    outdeg = {"hub": 10, **{s: 1 for s in spokes}}
    teleport = big * (DAMP_DEN - DAMP_NUM) // DAMP_DEN
    rank = {n: big for n in outdeg}
    for _ in range(3):
        inflow = {n: 0 for n in outdeg}
        for s, d in edges:
            inflow[d] += (DAMP_NUM * rank[s]) // (DAMP_DEN * outdeg[s])
        rank = {n: teleport + inflow[n] for n in outdeg}

    assert rank["hub"] > 2**60  # the round-2 input really is wrap-range
    got = _spark_ranks(spark, edges, 3)
    assert got == rank
    assert all(v > 0 for v in got.values())  # no silent wrap to negatives


def test_iters_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="iters"):
        pagerank_fixed(df, iters=0)
