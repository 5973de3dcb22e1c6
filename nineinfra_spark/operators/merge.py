"""MERGE / upsert for parquet-backed warehouse tables.

The reference platform stores its warehouse on plain object storage
(MinIO ``datahouse/`` folder, ``internal/controller/minio.go:72-121``)
with metastore-registered tables — a format with no row-level update
primitive. The engine-side answer every lakehouse uses on such tables
is the SNAPSHOT REWRITE merge: compute the merged relation
declaratively, write it out atomically, swap. This module implements
that as

- :func:`merge_upsert` — the pure relational MERGE (composable,
  side-effect-free, what the registered query verifies), and
- :func:`merge_into_table` — the catalog operation (stage + swap, so
  readers never observe a half-written table and the source table is
  never overwritten while being read).

Scale design: the merge itself is one equi-join on the key columns —
hash-partitionable, AQE decides broadcast vs shuffle (updates batches
are usually dimension-sized → broadcast anti-join at scan speed over
the base). Nothing collects; the stage-and-swap writes with the
input's parallelism. At 100 TB the base-side scan is the cost floor,
exactly as in Delta/Iceberg's copy-on-write merge; partition-pruned
merges (updates touching few partitions) compose by pre-filtering
``base`` before calling in, same as their file-pruning step.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


_WHEN_MATCHED = ("update", "ignore", "delete")


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    when_matched: str = "update",
) -> DataFrame:
    """ANSI MERGE over DataFrames (snapshot semantics):

    - ``when_matched="update"``: matched base rows are REPLACED by
      their update row, unmatched update rows are INSERTED —
      ``WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *``.
    - ``when_matched="ignore"``: matched update rows are dropped
      (insert-only merge — ``WHEN NOT MATCHED THEN INSERT *``).
    - ``when_matched="delete"``: matched base rows are removed and no
      update rows are inserted (``WHEN MATCHED THEN DELETE``).

    ``base`` and ``updates`` must share column NAMES (order-free;
    resolution is by name). Duplicate keys WITHIN ``updates`` are the
    caller's bug — MERGE's "multiple source rows matched" error — and
    are not deduplicated here.
    """
    if when_matched not in _WHEN_MATCHED:
        raise ValueError(
            f"when_matched={when_matched!r} not in {_WHEN_MATCHED}"
        )
    missing = set(keys) - set(base.columns)
    if missing:
        raise ValueError(f"merge keys {sorted(missing)} not in base columns")
    if set(base.columns) != set(updates.columns):
        raise ValueError(
            "merge_upsert: base/updates column sets differ: "
            f"{sorted(set(base.columns) ^ set(updates.columns))}"
        )
    keys = list(keys)
    if when_matched == "update":
        return base.join(updates, keys, "left_anti").unionByName(updates)
    if when_matched == "ignore":
        new_rows = updates.join(base, keys, "left_anti")
        return base.unionByName(new_rows)
    # delete: matched base rows go away; updates contribute nothing
    return base.join(updates, keys, "left_anti")


def merge_into_table(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: Sequence[str],
    when_matched: str = "update",
) -> None:
    """MERGE ``updates`` into a managed (metastore-registered) table
    via stage-and-swap: the merged snapshot is written to a staging
    table first, then swapped in with ``ALTER TABLE RENAME`` — the
    base table is never overwritten while its files are being read
    (Spark rejects that cycle outright), and a failure mid-write
    leaves the original table untouched.
    """
    base = spark.table(table)
    merged = merge_upsert(base, updates, keys, when_matched=when_matched)
    stage = f"{table}__merge_stage"
    spark.sql(f"DROP TABLE IF EXISTS {stage}")
    merged.write.saveAsTable(stage)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")


def merge_into_table_versioned(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: Sequence[str],
    when_matched: str = "update",
) -> int:
    """MERGE with snapshot retention (time travel on plain tables):
    instead of dropping the pre-merge snapshot, it is renamed to
    ``{table}__v{n}`` (n = number of existing versions) before the
    staged merge result takes the live name. Returns the version
    number the OLD state was archived under. Read an old state with
    :func:`read_version`; bound retention with :func:`vacuum_versions`.

    This is copy-on-write time travel exactly as Delta/Iceberg expose
    it, minus the manifest layer: every version is a full, valid table
    (no delta chains to replay), so old-version reads cost one scan
    and retention is a table drop. At 100 TB you bound the archive by
    vacuuming — same operational contract as ``VACUUM`` there."""
    base = spark.table(table)
    merged = merge_upsert(base, updates, keys, when_matched=when_matched)
    stage = f"{table}__merge_stage"
    spark.sql(f"DROP TABLE IF EXISTS {stage}")
    merged.write.saveAsTable(stage)
    version = len(list_versions(spark, table))
    spark.sql(f"ALTER TABLE {table} RENAME TO {table}__v{version}")
    spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")
    return version


def list_versions(spark: SparkSession, table: str) -> list[int]:
    """Archived version numbers for ``table``, ascending (the live
    table is not listed — it is 'current')."""
    db, _, name = table.rpartition(".")
    prefix = f"{name}__v"
    rows = spark.sql(f"SHOW TABLES IN {db}" if db else "SHOW TABLES").collect()
    out = []
    for r in rows:
        tn = r["tableName"]
        if tn.startswith(prefix) and tn[len(prefix):].isdigit():
            out.append(int(tn[len(prefix):]))
    return sorted(out)


def read_version(spark: SparkSession, table: str, version: int) -> DataFrame:
    """Time-travel read: the archived snapshot ``version`` (as
    returned by :func:`merge_into_table_versioned`)."""
    return spark.table(f"{table}__v{version}")


def vacuum_versions(spark: SparkSession, table: str, keep: int) -> list[int]:
    """Drop all but the newest ``keep`` archived versions; returns the
    dropped version numbers (retention enforcement — the VACUUM half
    of the time-travel contract)."""
    versions = list_versions(spark, table)
    drop = versions[:-keep] if keep > 0 else versions
    for v in drop:
        spark.sql(f"DROP TABLE {table}__v{v}")
    return drop
