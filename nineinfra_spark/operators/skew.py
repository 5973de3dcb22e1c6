"""Skew-mitigated joins: salting for hot keys AQE can't split.

The engine's first line of defense against join skew is AQE
(``spark.sql.adaptive.skewJoin.enabled`` — set by ``EngineConfig``,
engine.py:106): at runtime the fat shuffle partition is split and the
matching side replicated, with no query rewrite. That covers
sort-merge joins. Salting is the fallback for the cases AQE can't
touch — a skewed *aggregation* upstream, a key so hot one task still
OOMs after splitting, or an engine with AQE off — expressed here as a
deterministic query rewrite with identical join semantics.

Shape: fact rows get ``salt = pmod(hash(row), n)``; the (small or
pre-aggregated) dim side is exploded n× with every salt value; the
join key becomes ``(key, salt)``, so the hot key's rows spread over n
shuffle partitions instead of one. Cost: dim side inflates n× — use
only when dim ≪ fact, which is exactly the skewed-join case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Internal column names — prefixed to avoid user-column collisions.
_SALT = "__nine_salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    n_salts: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``on`` with the fact side salted
    ``n_salts`` ways.

    ``on`` is the ordinary equi-join condition (e.g. ``fact.k ==
    dim.k``); the salt conjunct is added internally. The salt is
    ``pmod(hash(<salt_cols or all fact columns>), n)`` — deterministic
    per row content, no RNG, so the plan is replayable and retry-safe
    (a recomputed task salts identically). Returns the same columns a
    plain ``fact.join(dim, on, how)`` would.

    Supported ``how``: inner / left / left_outer (dim replication is
    transparent for these; semi/anti would dedup wrongly — use AQE or
    pre-aggregation for those).

    Caveats of the content-hash salt (pass ``salt_cols`` to address
    both):

    - ``fact`` must not carry duplicate column names (common after a
      prior join): ``F.hash(*fact.columns)`` resolves by NAME and
      raises ``AMBIGUOUS_REFERENCE``. Give ``salt_cols`` an
      unambiguous subset instead.
    - Rows with identical content in the hashed columns all land on
      ONE salt — a hot key whose rows are exact duplicates is not
      spread at all. Include a high-cardinality column (an event id,
      a timestamp) in ``salt_cols``, or de-duplicate/pre-aggregate
      first (duplicate-heavy hot keys usually want the aggregation
      rewrite anyway, not a bigger join).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join: unsupported join type {how!r}")
    if n_salts < 1:
        raise ValueError("salted_join: n_salts must be >= 1")
    hashed = [F.col(c) for c in (salt_cols if salt_cols is not None else fact.columns)]
    salted_fact = fact.withColumn(_SALT, F.pmod(F.hash(*hashed), F.lit(n_salts)))
    exploded_dim = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    cond = on & (salted_fact[_SALT] == exploded_dim[_SALT])
    return salted_fact.join(exploded_dim, cond, how).drop(_SALT)
