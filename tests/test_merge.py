"""merge_upsert / merge_into_table semantics (operators/merge.py).

The registered query `catalog_merge_upsert` differentially verifies
the update-mode stage-and-swap path against DuckDB; these tests pin
the remaining operator contract: insert-only and delete modes, schema
validation, and that the swap leaves no staging residue.
"""

from __future__ import annotations

import pytest

from nineinfra_spark.operators.merge import merge_into_table, merge_upsert


@pytest.fixture()
def frames(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, s string, v double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "id long, s string, v double"
    )
    return base, updates


def _by_id(df):
    return {r["id"]: (r["s"], r["v"]) for r in df.collect()}


def test_update_mode_replaces_and_inserts(frames):
    base, updates = frames
    got = _by_id(merge_upsert(base, updates, ["id"]))
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_ignore_mode_keeps_base_row(frames):
    base, updates = frames
    got = _by_id(merge_upsert(base, updates, ["id"], when_matched="ignore"))
    assert got == {1: ("a", 10.0), 2: ("b", 20.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_delete_mode_removes_matched(frames):
    base, updates = frames
    got = _by_id(merge_upsert(base, updates, ["id"], when_matched="delete"))
    assert got == {1: ("a", 10.0), 3: ("c", 30.0)}


def test_schema_mismatch_rejected(spark, frames):
    base, _ = frames
    bad = spark.createDataFrame([(9, "x")], "id long, s string")
    with pytest.raises(ValueError, match="column sets differ"):
        merge_upsert(base, bad, ["id"])


def test_unknown_key_rejected(frames):
    base, updates = frames
    with pytest.raises(ValueError, match="not in base columns"):
        merge_upsert(base, updates, ["nope"])


def test_bad_when_matched_rejected(frames):
    base, updates = frames
    with pytest.raises(ValueError, match="when_matched"):
        merge_upsert(base, updates, ["id"], when_matched="upsert")


def test_merge_into_table_swaps_without_residue(spark, frames):
    base, updates = frames
    spark.sql("DROP TABLE IF EXISTS merge_t")
    spark.sql("DROP TABLE IF EXISTS merge_t__merge_stage")
    base.write.mode("overwrite").saveAsTable("merge_t")
    merge_into_table(spark, "merge_t", updates, ["id"])
    got = _by_id(spark.table("merge_t"))
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}
    # swap is complete: no staging table left behind
    assert not spark.catalog.tableExists("merge_t__merge_stage")
    # merging again is idempotent on the swapped table (regression for
    # a swap that leaves the table name pointing at a dropped location)
    merge_into_table(spark, "merge_t", updates, ["id"])
    assert _by_id(spark.table("merge_t")) == got
    spark.sql("DROP TABLE merge_t")


def test_versioned_merge_time_travel_and_vacuum(spark, frames):
    from nineinfra_spark.operators.merge import (
        list_versions,
        merge_into_table_versioned,
        read_version,
        vacuum_versions,
    )

    base, updates = frames
    for tbl in ("tt_t", "tt_t__v0", "tt_t__v1", "tt_t__merge_stage"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    base.write.mode("overwrite").saveAsTable("tt_t")

    v = merge_into_table_versioned(spark, "tt_t", updates, ["id"])
    assert v == 0
    # archived v0 is the ORIGINAL base, current is the merged state
    assert _by_id(read_version(spark, "tt_t", 0)) == _by_id(base)
    assert _by_id(spark.table("tt_t")) == {
        1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)
    }

    v = merge_into_table_versioned(
        spark, "tt_t", updates.limit(1), ["id"], when_matched="delete"
    )
    assert v == 1
    assert list_versions(spark, "tt_t") == [0, 1]
    # v1 equals the state after merge #1 — archives are immutable
    assert _by_id(read_version(spark, "tt_t", 1)) == {
        1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)
    }

    # retention: keep the newest archive only
    dropped = vacuum_versions(spark, "tt_t", keep=1)
    assert dropped == [0]
    assert list_versions(spark, "tt_t") == [1]
    for tbl in ("tt_t", "tt_t__v1"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
