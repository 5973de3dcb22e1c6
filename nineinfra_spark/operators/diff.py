"""Row-level snapshot DIFF between two table versions.

The versioned-merge protocol (``operators/merge.py``) archives every
superseded snapshot as ``{table}__v{n}`` — the audit question that
pairs with it is "what exactly changed between v3 and live?": the
row-level delta every versioned lakehouse exposes (Delta's
table-changes / CDC view, Iceberg's changelog scan). The reference
platform provisions the warehouse these tables live in
(``internal/controller/metastore.go:105-114``); the diff semantics are
native here.

Two forms, both single-digit-shuffle at any scale:

- :func:`snapshot_diff` — KEYED diff: full-outer join on the key
  columns (null-safe), classify ``insert`` / ``delete`` / ``update``,
  carry both old and new payloads for updates. One shuffle per side
  keyed on the key columns; rows equal in payload are dropped
  join-side and never ship further.
- :func:`snapshot_diff_counts` — KEYLESS multiset diff: ±1-weighted
  union then one groupBy over all columns (``row_delta`` = occurrences
  gained/lost). ONE total shuffle; duplicate-row tables diff exactly
  (the full-outer-join form can't express multiplicity).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def _null_extend(df: DataFrame, other: DataFrame) -> DataFrame:
    """NULL-extend ``df`` with columns only ``other`` has — the
    parquet ``mergeSchema`` semantic (additive evolution: an old
    snapshot simply has NULL for columns added later). Typed from the
    other side's schema so the extended column compares exactly."""
    mine = set(df.columns)
    added = [f for f in other.schema.fields if f.name not in mine]
    for f in added:
        df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    allow_schema_evolution: bool = False,
) -> DataFrame:
    """Keyed row-level diff ``old → new``.

    Output: the key columns, ``change_type`` ∈ {'insert', 'delete',
    'update'}, and ``old_<c>`` / ``new_<c>`` for every non-key column
    (NULL on the side that has no row). Unchanged rows (key present on
    both sides, payload null-safe-equal) are filtered out before the
    projection widens, so only the changed slice flows downstream.

    Key equality is NULL-SAFE (``<=>``): a NULL key value matches a
    NULL key value, so nullable keys diff deterministically instead of
    classifying every NULL-keyed row as a delete+insert pair. Payload
    comparison is struct ``<=>`` — elementwise null-safe, exact for
    nested/array columns too.

    ``allow_schema_evolution=True`` diffs across an ADDITIVE schema
    change (the `src_parquet_schema_merge` semantic): columns missing
    on one side NULL-extend with the other side's type, so a row
    whose added column is NULL on both sides is still 'unchanged',
    and one that gained a value classifies as 'update'. Renames and
    type changes are NOT reconciled — they are a rewrite, not an
    evolution.

    Scale posture: one hash exchange per side on ``key_cols``; the
    payload-equality filter runs join-side so the (usually dominant)
    unchanged mass never reaches the output projection. If both
    versions are bucketed on the key, the exchanges vanish entirely.
    """
    key_cols = list(key_cols)
    if not key_cols:
        raise ValueError("snapshot_diff: key_cols must be non-empty")
    # key columns must exist on BOTH sides BEFORE any NULL-extension:
    # a NULL-extended key would null-safe-match every other NULL key
    # and turn the diff into a degenerate all-delete/all-insert.
    for side, df in (("old", old), ("new", new)):
        missing = [c for c in key_cols if c not in df.columns]
        if missing:
            raise ValueError(
                f"snapshot_diff: key columns {missing} not in {side} table"
            )
    if sorted(old.columns) != sorted(new.columns):
        if not allow_schema_evolution:
            raise ValueError(
                f"snapshot_diff: column sets differ — "
                f"old={sorted(old.columns)} new={sorted(new.columns)} "
                "(pass allow_schema_evolution=True to diff across an "
                "additive schema change: missing columns NULL-extend, "
                "so a row whose added column is NULL on both sides "
                "stays 'unchanged')"
            )
        old, new = _null_extend(old, new), _null_extend(new, old)
    reserved = {"_o_present", "_n_present", CHANGE_COL} & set(old.columns)
    if reserved:
        raise ValueError(
            f"snapshot_diff: columns {sorted(reserved)} collide with the "
            "diff's presence/verdict columns — rename them first"
        )
    payload = [c for c in old.columns if c not in key_cols]
    # old_/new_ output names must not collide with real input columns
    # (a payload column literally named 'old_x' next to payload 'x'
    # would emit duplicate output names and break select-by-name).
    out_names = {f"{p}{c}" for c in payload for p in ("old_", "new_")}
    clash = sorted(out_names & set(old.columns))
    if clash:
        raise ValueError(
            f"snapshot_diff: input columns {clash} collide with the "
            "diff's old_/new_ prefixed output names — rename them first"
        )

    # presence tags: a key column can be legitimately NULL on a
    # present row, and full-outer emits NULL for EVERY column of the
    # absent side — so presence is decided by a non-null literal
    # tagged onto each side BEFORE the join, never by key nullness.
    o = old.alias("o").withColumn("_o_present", F.lit(True))
    n = new.alias("n").withColumn("_n_present", F.lit(True))
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in key_cols],
    )
    j = o.join(n, cond, "full_outer")
    o_present = F.col("_o_present").isNotNull()
    n_present = F.col("_n_present").isNotNull()

    if payload:
        changed = ~F.struct(*[F.col(f"o.{c}") for c in payload]).eqNullSafe(
            F.struct(*[F.col(f"n.{c}") for c in payload])
        )
    else:
        changed = F.lit(False)  # key-only table: update is impossible

    change = (
        F.when(~o_present, F.lit("insert"))
        .when(~n_present, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    # key carry: coalesce would mis-carry a present-but-NULL key value
    # from the wrong side; pick by PRESENCE instead (full-outer cannot
    # produce a both-absent row, so the otherwise-branch is exact).
    out_keys = [
        F.when(o_present, F.col(f"o.{c}"))
        .otherwise(F.col(f"n.{c}"))
        .alias(c)
        for c in key_cols
    ]
    wide = [
        col
        for c in payload
        for col in (
            F.col(f"o.{c}").alias(f"old_{c}"),
            F.col(f"n.{c}").alias(f"new_{c}"),
        )
    ]
    return (
        j.withColumn(CHANGE_COL, change)
        .filter(F.col(CHANGE_COL).isNotNull())
        .select(*out_keys, F.col(CHANGE_COL), *wide)
    )


def snapshot_diff_counts(old: DataFrame, new: DataFrame) -> DataFrame:
    """Keyless MULTISET diff: every distinct row with the change in
    its occurrence count (``row_delta`` > 0 gained, < 0 lost; rows
    with identical multiplicity are absent). Exact under duplicate
    rows — the form a keyed join cannot express.

    Shape: ±1-weighted union → ONE groupBy over all columns. A single
    shuffle whatever the table width; NULLs group as values (SQL
    GROUP BY semantics), so null-bearing rows diff exactly."""
    if sorted(old.columns) != sorted(new.columns):
        raise ValueError(
            f"snapshot_diff_counts: column sets differ — "
            f"old={sorted(old.columns)} new={sorted(new.columns)}"
        )
    reserved = {"_w", "row_delta"} & set(old.columns)
    if reserved:
        # same guard class as snapshot_diff's presence/verdict names:
        # without it the weight/output columns collide with input
        # columns and surface as an ambiguous-reference AnalysisError
        # far from the caller's mistake
        raise ValueError(
            f"snapshot_diff_counts: columns {sorted(reserved)} collide "
            "with the diff's weight/output columns — rename them first"
        )
    cols = list(old.columns)
    w = old.select(*cols, F.lit(-1).alias("_w")).unionByName(
        new.select(*cols, F.lit(1).alias("_w"))
    )
    return (
        w.groupBy(*cols)
        .agg(F.sum("_w").cast("bigint").alias("row_delta"))
        .filter(F.col("row_delta") != 0)
    )


def table_changes(
    spark: SparkSession,
    table: str,
    key_cols: Sequence[str],
    from_version: int = 0,
    allow_schema_evolution: bool = False,
) -> DataFrame:
    """CDC-style changelog: the keyed diffs of every CONSECUTIVE
    snapshot pair from ``from_version`` through the live table, each
    row tagged ``(v_from, v_to)`` — the Delta ``table_changes`` /
    Iceberg changelog-scan shape, over the merge protocol's ``__v{n}``
    archives. The live state is tagged ``v_to = max(archives) + 1``
    (the number the NEXT merge will archive the current live under).

    Gaps from :func:`merge.vacuum_versions` are handled by diffing
    ADJACENT SURVIVING versions — the changelog then reports the NET
    change across the vacuumed span (exactly what the surviving
    snapshots can witness), never an error.

    Scale posture: one keyed diff per consecutive pair — the version
    count is retention-bounded (single digits in practice), each diff
    two key-keyed exchanges; the union is plan-level only."""
    from nineinfra_spark.operators.merge import list_versions

    versions = [v for v in list_versions(spark, table) if v >= from_version]
    if not versions:
        raise ValueError(
            f"table_changes({table!r}): no archived version ≥ "
            f"{from_version} to diff from"
        )
    live_tag = max(versions) + 1
    states = [(v, spark.table(f"{table}__v{v}")) for v in versions]
    states.append((live_tag, spark.table(table)))
    parts = []
    for (v0, df0), (v1, df1) in zip(states, states[1:]):
        parts.append(
            snapshot_diff(
                df0, df1, key_cols,
                allow_schema_evolution=allow_schema_evolution,
            )
            .withColumn("v_from", F.lit(v0).cast("bigint"))
            .withColumn("v_to", F.lit(v1).cast("bigint"))
        )
    # Under schema evolution, pairs that predate an added column lack
    # its old_/new_ output columns — allowMissingColumns NULL-fills
    # them, matching the NULL-extend semantics of the diff itself.
    return reduce(
        lambda a, b: a.unionByName(
            b, allowMissingColumns=allow_schema_evolution
        ),
        parts,
    )


def snapshot_diff_versions(
    spark: SparkSession,
    table: str,
    v_old: int,
    v_new: int | None = None,
    key_cols: Sequence[str] | None = None,
    allow_schema_evolution: bool = False,
) -> DataFrame:
    """Diff two snapshots of a versioned table (``operators/merge.py``
    archive naming): ``v_old`` is an archived ``{table}__v{n}``;
    ``v_new=None`` means the LIVE table — "what changed since v_old"
    — otherwise another archive. With ``key_cols`` the keyed
    :func:`snapshot_diff`; without, :func:`snapshot_diff_counts`."""
    old = spark.table(f"{table}__v{v_old}")
    new = (
        spark.table(table)
        if v_new is None
        else spark.table(f"{table}__v{v_new}")
    )
    if key_cols:
        return snapshot_diff(
            old, new, key_cols,
            allow_schema_evolution=allow_schema_evolution,
        )
    return snapshot_diff_counts(old, new)
