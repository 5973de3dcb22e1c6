"""Snapshot diff (operators/diff.py): keyed insert/delete/update
classification, null-safe keys and payloads, multiset exactness under
duplicates, and the versioned-table wrapper over the merge protocol's
``__v{n}`` archives."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nineinfra_spark.operators.diff import (
    snapshot_diff,
    snapshot_diff_counts,
    snapshot_diff_versions,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string, bal long")


@pytest.fixture(scope="module")
def pair(spark):
    old = _df(
        spark,
        [
            (1, "A", 100),  # unchanged
            (2, "A", 200),  # updated (bal)
            (3, "B", 300),  # deleted
            (None, "B", 400),  # NULL key, unchanged
            (5, None, 500),  # NULL payload → non-null (update)
        ],
    )
    new = _df(
        spark,
        [
            (1, "A", 100),
            (2, "A", 250),
            (None, "B", 400),
            (5, "C", 500),
            (6, "D", 600),  # inserted
        ],
    )
    return old, new


def test_keyed_classification(pair):
    old, new = pair
    got = {
        r["k"]: (r["change_type"], r["old_bal"], r["new_bal"])
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("update", 200, 250),
        3: ("delete", 300, None),
        5: ("update", 500, 500),  # seg NULL → 'C' is a payload change
        6: ("insert", None, 600),
    }


def test_null_key_matches_null_key(pair):
    """eqNullSafe join keys: the NULL-keyed unchanged row must NOT
    appear as a delete+insert pair."""
    old, new = pair
    ks = [r["k"] for r in snapshot_diff(old, new, ["k"]).collect()]
    assert None not in ks


def test_unchanged_rows_never_emitted(pair):
    old, new = pair
    out = snapshot_diff(old, new, ["k"])
    assert out.filter(F.col("k") == 1).count() == 0


def test_delete_carries_old_key_and_payload(pair):
    old, new = pair
    row = snapshot_diff(old, new, ["k"]).filter(F.col("k") == 3).first()
    assert (row["old_seg"], row["new_seg"]) == ("B", None)


def test_composite_key(spark):
    old = _df(spark, [(1, "A", 10), (1, "B", 20)])
    new = _df(spark, [(1, "A", 11), (1, "B", 20), (2, "B", 30)])
    got = {
        (r["k"], r["seg"]): r["change_type"]
        for r in snapshot_diff(old, new, ["k", "seg"]).collect()
    }
    assert got == {(1, "A"): "update", (2, "B"): "insert"}


def test_validation(spark, pair):
    old, new = pair
    with pytest.raises(ValueError, match="non-empty"):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError, match="not in old table"):
        snapshot_diff(old, new, ["nope"])
    with pytest.raises(ValueError, match="column sets differ"):
        snapshot_diff(old, new.withColumnRenamed("bal", "balance"), ["k"])
    with pytest.raises(ValueError, match="column sets differ"):
        snapshot_diff_counts(old, new.drop("bal"))


def test_multiset_diff_exact_under_duplicates(spark):
    """The keyed form cannot express multiplicity; the ±1-weighted
    groupBy must: one copy of a duplicated row removed → row_delta -1,
    a new row added twice → +2, same-multiplicity rows absent."""
    old = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("b", 2)], "s string, v long"
    )
    new = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("c", 3), ("c", 3)], "s string, v long"
    )
    got = {
        (r["s"], r["v"]): r["row_delta"]
        for r in snapshot_diff_counts(old, new).collect()
    }
    assert got == {("a", 1): -1, ("c", 3): 2}


def test_multiset_diff_groups_nulls_as_values(spark):
    old = spark.createDataFrame([(None, 1)], "s string, v long")
    new = spark.createDataFrame([(None, 1), (None, 1)], "s string, v long")
    got = snapshot_diff_counts(old, new).collect()
    assert len(got) == 1 and got[0]["row_delta"] == 1


def test_key_only_table_never_updates(spark):
    old = spark.createDataFrame([(1,), (2,)], "k long")
    new = spark.createDataFrame([(2,), (3,)], "k long")
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {1: "delete", 3: "insert"}


def test_versioned_wrapper_against_merge_archives(spark, tmp_path):
    """End-to-end with the real merge protocol: publish v0, merge an
    upsert (archives v0 as __v0), diff v0 → live."""
    from nineinfra_spark.operators.merge import merge_into_table_versioned

    spark.sql("DROP TABLE IF EXISTS sdiff_t")
    spark.sql("DROP TABLE IF EXISTS sdiff_t__v0")
    _df(spark, [(1, "A", 100), (2, "B", 200)]).write.saveAsTable("sdiff_t")
    try:
        delta = _df(spark, [(2, "B", 999), (3, "C", 300)])
        merge_into_table_versioned(spark, "sdiff_t", delta, keys=["k"])
        got = {
            r["k"]: r["change_type"]
            for r in snapshot_diff_versions(
                spark, "sdiff_t", 0, key_cols=["k"]
            ).collect()
        }
        assert got == {2: "update", 3: "insert"}
        counts = {
            (r["k"], r["bal"]): r["row_delta"]
            for r in snapshot_diff_versions(spark, "sdiff_t", 0).collect()
        }
        assert counts == {(2, 200): -1, (2, 999): 1, (3, 300): 1}
    finally:
        spark.sql("DROP TABLE IF EXISTS sdiff_t")
        spark.sql("DROP TABLE IF EXISTS sdiff_t__v0")


def test_reserved_columns_rejected(spark):
    old = spark.createDataFrame([(1, True)], "k long, _o_present boolean")
    with pytest.raises(ValueError, match="collide"):
        snapshot_diff(old, old, ["k"])
    old2 = spark.createDataFrame([(1, "x")], "k long, change_type string")
    with pytest.raises(ValueError, match="collide"):
        snapshot_diff(old2, old2, ["k"])


def test_table_changes_across_versions(spark):
    """Three merges → changelog over every consecutive pair, live
    tagged max+1; a vacuumed middle version collapses to the NET
    change across the gap."""
    from nineinfra_spark.operators.diff import table_changes
    from nineinfra_spark.operators.merge import (
        merge_into_table_versioned,
        vacuum_versions,
    )

    for t in ("tc_t", "tc_t__v0", "tc_t__v1", "tc_t__v2"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    _df(spark, [(1, "A", 100)]).write.saveAsTable("tc_t")
    try:
        merge_into_table_versioned(
            spark, "tc_t", _df(spark, [(2, "B", 200)]), keys=["k"]
        )  # archives v0: {1}
        merge_into_table_versioned(
            spark, "tc_t", _df(spark, [(1, "A", 111)]), keys=["k"]
        )  # archives v1: {1,2}
        merge_into_table_versioned(
            spark, "tc_t", _df(spark, [(3, "C", 300)]), keys=["k"]
        )  # archives v2: {1',2}; live = {1',2,3}
        log = {
            (r["v_from"], r["v_to"], r["k"]): r["change_type"]
            for r in table_changes(spark, "tc_t", ["k"]).collect()
        }
        assert log == {
            (0, 1, 2): "insert",
            (1, 2, 1): "update",
            (2, 3, 3): "insert",
        }
        # vacuum v0 and v1 → only v2 survives; changelog = v2 → live
        vacuum_versions(spark, "tc_t", keep=1)
        log2 = {
            (r["v_from"], r["v_to"], r["k"]): r["change_type"]
            for r in table_changes(spark, "tc_t", ["k"]).collect()
        }
        assert log2 == {(2, 3, 3): "insert"}
        import pytest as _pytest

        with _pytest.raises(ValueError, match="no archived version"):
            table_changes(spark, "tc_t", ["k"], from_version=99)
    finally:
        for t in ("tc_t", "tc_t__v0", "tc_t__v1", "tc_t__v2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_schema_evolution_diff(spark):
    """Diff across an ALTER ADD COLUMNS boundary: the old snapshot
    NULL-extends (mergeSchema semantics), so rows whose added column
    is NULL on both sides stay unchanged and rows that gained a value
    classify as updates."""
    old = spark.createDataFrame([(1, "A"), (2, "B")], "k long, seg string")
    new = spark.createDataFrame(
        [(1, "A", None), (2, "B", 250), (3, "C", 300)],
        "k long, seg string, bal long",
    )
    with pytest.raises(ValueError, match="column sets differ"):
        snapshot_diff(old, new, ["k"])
    got = {
        r["k"]: (r["change_type"], r["old_bal"], r["new_bal"])
        for r in snapshot_diff(
            old, new, ["k"], allow_schema_evolution=True
        ).collect()
    }
    # k=1: bal NULL on both sides after extension → unchanged, absent
    assert got == {
        2: ("update", None, 250),
        3: ("insert", None, 300),
    }
    # symmetric: diffing new → old classifies the gained value as an
    # update back to NULL and the extra row as a delete
    rev = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(
            new, old, ["k"], allow_schema_evolution=True
        ).collect()
    }
    assert rev == {2: "update", 3: "delete"}


def test_versioned_wrapper_schema_evolution(spark):
    """A versioned table that gained a column between the archive and
    live diffs through the wrapper with allow_schema_evolution."""
    spark.sql("DROP TABLE IF EXISTS sev_t")
    spark.sql("DROP TABLE IF EXISTS sev_t__v0")
    spark.createDataFrame([(1, "A")], "k long, seg string").write.saveAsTable(
        "sev_t"
    )
    try:
        spark.sql("ALTER TABLE sev_t RENAME TO sev_t__v0")
        spark.createDataFrame(
            [(1, "A", 100)], "k long, seg string, bal long"
        ).write.saveAsTable("sev_t")
        with pytest.raises(ValueError, match="column sets differ"):
            snapshot_diff_versions(spark, "sev_t", 0, key_cols=["k"])
        got = snapshot_diff_versions(
            spark, "sev_t", 0, key_cols=["k"], allow_schema_evolution=True
        ).collect()
        assert len(got) == 1
        assert (got[0]["change_type"], got[0]["old_bal"], got[0]["new_bal"]) == (
            "update", None, 100,
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS sev_t")
        spark.sql("DROP TABLE IF EXISTS sev_t__v0")


def test_key_column_missing_on_one_side_rejected(spark):
    """A key column absent from one side must raise — even under
    allow_schema_evolution. NULL-extending a key would null-safe-match
    every other NULL key and degenerate into all-delete/all-insert
    (r12 advice finding)."""
    old = spark.createDataFrame([(1, "A")], "k long, seg string")
    new = spark.createDataFrame([("A", 100)], "seg string, bal long")
    with pytest.raises(ValueError, match="key columns.*not in new"):
        snapshot_diff(old, new, ["k"], allow_schema_evolution=True)
    with pytest.raises(ValueError, match="key columns.*not in old"):
        snapshot_diff(old, new, ["bal"], allow_schema_evolution=True)


def test_old_new_prefix_collision_rejected(spark):
    """A real input column named like an old_/new_ output (payload 'x'
    next to a column literally named 'old_x') would duplicate output
    names — refused up front (r12 advice finding)."""
    df = spark.createDataFrame([(1, 2, 3)], "k long, x long, old_x long")
    with pytest.raises(ValueError, match="old_/new_"):
        snapshot_diff(df, df, ["k"])
    df2 = spark.createDataFrame([(1, 2, 3)], "k long, x long, new_x long")
    with pytest.raises(ValueError, match="old_/new_"):
        snapshot_diff(df2, df2, ["k"])
    # prefixed names with no matching payload base are fine
    ok = spark.createDataFrame([(1, 5)], "k long, old_gone long")
    assert snapshot_diff(ok, ok, ["k"]).count() == 0


def test_table_changes_three_state_evolution(spark):
    """CDC across 3+ states spanning an ADDITIVE schema change: the
    pre-evolution pair lacks the added column's old_/new_ columns, so
    the changelog union must NULL-fill (allowMissingColumns) instead
    of raising — exactly the scenario allow_schema_evolution exists
    for (r12 advice finding, medium)."""
    from nineinfra_spark.operators.diff import table_changes

    for t in ("tc3_t", "tc3_t__v0", "tc3_t__v1"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.createDataFrame([(1, "A")], "k long, seg string").write.saveAsTable(
        "tc3_t__v0"
    )
    spark.createDataFrame(
        [(1, "A"), (2, "B")], "k long, seg string"
    ).write.saveAsTable("tc3_t__v1")
    spark.createDataFrame(
        [(1, "A", 100), (2, "B", None)], "k long, seg string, bal long"
    ).write.saveAsTable("tc3_t")
    try:
        log = {
            (r["v_from"], r["v_to"], r["k"]): (
                r["change_type"],
                r["old_bal"],
                r["new_bal"],
            )
            for r in table_changes(
                spark, "tc3_t", ["k"], allow_schema_evolution=True
            ).collect()
        }
        # pair (0,1): pre-evolution — bal columns NULL-filled by union
        # pair (1,2): k=1 gained bal=100 (update); k=2 bal NULL→NULL
        assert log == {
            (0, 1, 2): ("insert", None, None),
            (1, 2, 1): ("update", None, 100),
        }
        # without the flag the width mismatch is still an error
        with pytest.raises(ValueError, match="column sets differ"):
            table_changes(spark, "tc3_t", ["k"]).collect()
    finally:
        for t in ("tc3_t", "tc3_t__v0", "tc3_t__v1"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_counts_reserved_column_names_rejected(spark):
    """The keyless form's weight/output names must be guarded like the
    keyed form's presence/verdict names — a clear ValueError, not an
    ambiguous-reference AnalysisException (r15 review pass)."""
    import pytest as _pytest

    from nineinfra_spark.operators.diff import snapshot_diff_counts

    df = spark.createDataFrame([(1, 2)], "a int, _w int")
    with _pytest.raises(ValueError, match="_w"):
        snapshot_diff_counts(df, df)
    df2 = spark.createDataFrame([(1, 2)], "a int, row_delta int")
    with _pytest.raises(ValueError, match="row_delta"):
        snapshot_diff_counts(df2, df2)
