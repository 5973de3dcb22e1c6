"""Registry mapping query name -> (spark, sf_dir) -> DataFrame, plus
an optional DuckDB oracle SQL string for differential correctness.

Contract (driver): the Spark result and the oracle result are compared
at sf0.01 by row count + schema + order-insensitive value hash, with
columns sorted by name. Therefore every registered query must
(a) alias every computed column identically on both sides and
(b) produce bit-stable values (round floating aggregates; use
deterministic tie-breaks in any top-k).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = ()


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: rq.fn for name, rq in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: rq.oracle for name, rq in _REGISTRY.items() if rq.oracle is not None}


def get(name: str) -> RegisteredQuery:
    return _REGISTRY[name]


def names() -> list[str]:
    return list(_REGISTRY)
