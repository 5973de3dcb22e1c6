"""_util.ranked_prefix — the distributed global-rank/prefix-sum that
replaces unpartitioned ordered WindowExec (tests/test_plan_lint.py
rule 4). Pinned against a single-partition pandas computation across
partition counts, orders, duplicates-in-the-value-column, and sizes
smaller than n_parts; plus the plan-shape claim itself."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nineinfra_spark.plans._util import ranked_prefix


def _expected(rows, key=lambda r: (r[1], r[0])):
    """(id, val) rows → {id: (i, cum)} by the total order `key`."""
    out, cum = {}, 0
    for i, r in enumerate(sorted(rows, key=key), start=1):
        cum += r[1]
        out[r[0]] = (i, cum)
    return out


@pytest.mark.parametrize("n_parts", [1, 3, 32])
@pytest.mark.parametrize("n_rows", [0, 5, 400])
def test_matches_single_partition_semantics(spark, n_parts, n_rows):
    rng = random.Random(n_parts * 1000 + n_rows)
    # heavy duplication in the VALUE column: rank ties broken by id
    rows = [(i, rng.randrange(20)) for i in range(n_rows)]
    df = spark.createDataFrame(rows, "id long, val long") if rows else (
        spark.createDataFrame([], "id long, val long")
    )
    got = {
        r["id"]: (r["i"], r["cum"])
        for r in ranked_prefix(
            df, [F.col("val"), F.col("id")], "val", n_parts=n_parts
        ).collect()
    }
    assert got == _expected(rows)


def test_descending_order(spark):
    rows = [(i, (i * 7) % 13) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, val long")
    got = {
        r["id"]: (r["i"], r["cum"])
        for r in ranked_prefix(
            df, [F.col("val").desc(), F.col("id")], "val"
        ).collect()
    }
    assert got == _expected(rows, key=lambda r: (-r[1], r[0]))


def test_plan_has_no_unpartitioned_window(spark):
    """The whole point: the only WindowExec in the plan must carry a
    partition spec (the _pid-local one); the offsets side is a tiny
    broadcast."""
    df = spark.createDataFrame(
        [(i, i % 9) for i in range(300)], "id long, val long"
    )
    out = ranked_prefix(df, [F.col("val"), F.col("id")], "val")
    plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    for line in plan.splitlines():
        stripped = line.strip().lstrip(":+- ")
        if stripped.startswith("Window "):
            # Window [exprs], [partitionSpec], [orderSpec] — 3 groups
            depth, groups = 0, 0
            for ch in line:
                if ch == "[":
                    if depth == 0:
                        groups += 1
                    depth += 1
                elif ch == "]":
                    depth -= 1
            assert groups == 3, line
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_rejects_colliding_column_names(spark):
    df = spark.createDataFrame([(1, 2, 3)], "id long, val long, cum long")
    with pytest.raises(ValueError, match="collide"):
        ranked_prefix(df, [F.col("val"), F.col("id")], "val")
