"""Curated public function surface (the ``nine.functions`` namespace
promised in SURVEY.md §7 Phase 3).

Column-expression builders a pipeline author imports directly —
the engine-flavored primitives the registered queries are built from,
re-expressed over the Column API so they compose with any DataFrame:

    from nineinfra_spark import functions as NF
    docs.select(NF.tokens("text").alias("toks"))
    pairs.select(NF.cosine_similarity("ea", "eb").alias("cos"))

Everything here is a JVM-side Catalyst expression (zero Python in the
hot path); semantics are pinned by tests/test_functions_api.py against
the same differential discipline as the registered queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# asof_join is re-exported LAZILY (PEP 562 __getattr__ below): an
# eager import here closes a cycle — functions → operators.asof →
# operators/__init__ → operators.ivf → functions — that made
# `import nineinfra_spark.functions` fail whenever it was the FIRST
# nineinfra import of a fresh process (found by the cosine property
# test running before anything had touched operators).


def __getattr__(name: str):
    if name == "asof_join":
        from nineinfra_spark.operators.asof import asof_join

        return asof_join
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

__all__ = [
    "asof_join",
    "cosine_similarity",
    "dec",
    "jaccard",
    "ngram_shingles",
    "stable_hash64",
    "token_count",
    "tokens",
]


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec(col: str | Column, precision: int = 18, scale: int = 2) -> Column:
    """Decimal cast for exact, reduce-order-independent aggregation —
    the repo-wide discipline for float sums (see plans/_util.dec)."""
    return _c(col).cast(f"decimal({precision},{scale})")


def tokens(col: str | Column) -> Column:
    """Lowercase word tokens (the corpus tokenization used by the
    text/dedup operators: ``[a-z]+`` runs of the lowered text)."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit("[a-z]+"), 0)


def token_count(col: str | Column) -> Column:
    """Whitespace-free token count over :func:`tokens`."""
    return F.size(tokens(col))


def ngram_shingles(toks: str | Column, n: int = 5) -> Column:
    """Distinct n-gram word shingles from a token-array column —
    the unit of the shingle-Jaccard / MinHash dedup operators.
    Empty-safe: arrays shorter than ``n`` yield ``array()`` (Spark's
    ``sequence(1, m)`` DESCENDS for m < 1, hence the guard)."""
    t = _c(toks)
    return F.when(
        F.size(t) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.array_join(F.slice(t, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def jaccard(a: str | Column, b: str | Column) -> Column:
    """Exact SET Jaccard similarity of two array columns (double).
    Inputs are de-duplicated internally (``array_distinct``), so arrays
    with repeated elements still get set semantics — without it the
    ``|a| + |b| - common`` union term over-counts duplicates while
    ``array_intersect`` dedups, skewing the ratio low. Both-empty input
    yields NULL (``try_divide`` — no 0/0 error under ANSI mode, which
    is Spark 4's default)."""
    ca, cb = F.array_distinct(_c(a)), F.array_distinct(_c(b))
    common = F.size(F.array_intersect(ca, cb)).cast("bigint")
    union = (F.size(ca) + F.size(cb)).cast("bigint") - common
    return F.try_divide(common, union)


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """Cosine between two numeric array columns, as a sequential
    left-to-right double fold — BIT-IDENTICAL to the engine's SQL
    expression path and the DuckDB oracle fold (see
    plans/ext_similarity.COS_SPARK), so results are hash-stable."""
    ca, cb = _c(a), _c(b)

    def _sq_sum(col: Column) -> Column:
        return F.aggregate(
            col,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )

    dot = F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # try_divide: zero-norm sides yield NULL instead of an ANSI
    # DIVIDE_BY_ZERO error; non-degenerate results are bit-identical
    # to the plain division the SQL expression path uses.
    return F.try_divide(dot, F.sqrt(_sq_sum(ca)) * F.sqrt(_sq_sum(cb)))


def stable_hash64(col: str | Column, salt: str = "") -> Column:
    """Deterministic 60-bit non-negative hash from md5 — the
    engine-portable hash family behind MinHash signatures and
    hash-bucket sampling (reproducible across engines and runs,
    unlike ``F.hash``'s Spark-specific murmur3)."""
    salted = F.concat(F.lit(salt), _c(col).cast("string")) if salt else _c(
        col
    ).cast("string")
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")
