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

#: Explicit verification-priority prefix for the exported ordering
#: (set once by ``plans/__init__``). The driver's CORRECTNESS gate
#: checks a bounded window of queries in ``queries()`` order, so the
#: queries that most need a fresh differential row must come first —
#: per-query control here beats reordering module imports.
_ORDER: list[str] = []


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def set_order(priority: list[str]) -> None:
    """Pin the leading export order. Every name must exist — a stale
    entry (e.g. after a query rename) fails loudly here rather than
    silently burning a verification slot."""
    unknown = sorted(set(priority) - set(_REGISTRY))
    if unknown:
        raise ValueError(f"set_order: unknown query names {unknown}")
    if len(set(priority)) != len(priority):
        dupes = sorted({n for n in priority if priority.count(n) > 1})
        raise ValueError(f"set_order: duplicate names {dupes}")
    _ORDER[:] = priority


def _ordered_names() -> list[str]:
    head = set(_ORDER)
    return list(_ORDER) + [n for n in _REGISTRY if n not in head]


def queries() -> dict[str, QueryFn]:
    return {name: _REGISTRY[name].fn for name in _ordered_names()}


def oracles() -> dict[str, str]:
    return {
        name: _REGISTRY[name].oracle
        for name in _ordered_names()
        if _REGISTRY[name].oracle is not None
    }


def get(name: str) -> RegisteredQuery:
    return _REGISTRY[name]


def names() -> list[str]:
    return _ordered_names()
