"""Materialized-view (rollup) routing: answer an aggregate from a
pre-aggregated rollup table instead of the fact table when the rollup
can serve it — the query-acceleration move the reference's OLAP tier
makes (Doris rollup/MV selection, ``internal/controller/doris.go:20-28``),
implemented engine-side as an explicit, testable router.

Routing rules (the standard MV-containment conditions):

- the requested GROUP BY must be a SUBSET of the rollup's dimensions
  (the rollup is then re-aggregated over the absent dims — legal
  because every stored measure is ADDITIVE);
- every requested measure must be derivable from stored additive
  columns: sums re-sum, counts re-sum, and AVG must be derived as
  SUM(sum_col)/SUM(count_col) — re-averaging stored averages is the
  classic MV wrong-answer and is impossible to express here by
  construction (the spec stores only sums and counts).

``route_aggregate`` returns ``None`` when the rollup cannot serve the
request; the caller falls back to the fact table. At 100 TB the win
is structural: the rollup is |dims-cartesian|-sized, so a routed
query never touches the fact scan at all.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RollupSpec:
    """A registered rollup: ``table`` holds one row per dims-tuple with
    additive measure columns (``sums`` are SUM-of-fact columns,
    ``counts`` are COUNT-of-fact columns — both re-aggregate by
    summation)."""

    table: str
    dims: tuple[str, ...]
    sums: tuple[str, ...]
    counts: tuple[str, ...]


#: measure request forms: ("sum", stored_sum_col), ("count", stored
#: count_col), ("avg", stored_sum_col, stored_count_col)
Measure = tuple


def route_aggregate(
    spark: SparkSession,
    spec: RollupSpec,
    group_by: Sequence[str],
    measures: Mapping[str, Measure],
) -> DataFrame | None:
    """The routed aggregate, or ``None`` if the rollup can't serve it."""
    if not measures:
        # a measureless request has nothing to route; falling through
        # would reach Spark's agg() with zero expressions and raise a
        # bare TypeError far from the caller's mistake
        return None
    if not set(group_by) <= set(spec.dims):
        return None
    aggs = []
    for out, m in measures.items():
        kind = m[0]
        if kind == "sum":
            if m[1] not in spec.sums:
                return None
            aggs.append(F.sum(m[1]).alias(out))
        elif kind == "count":
            if m[1] not in spec.counts:
                return None
            aggs.append(F.sum(m[1]).alias(out))
        elif kind == "avg":
            if m[1] not in spec.sums or m[2] not in spec.counts:
                return None
            # derived, never re-averaged: Σsum / Σcount
            aggs.append(
                (F.sum(m[1]).cast("double") / F.sum(m[2])).alias(out)
            )
        else:
            return None
    rollup = spark.table(spec.table)
    return rollup.groupBy(*group_by).agg(*aggs)
