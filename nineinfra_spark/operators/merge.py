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
