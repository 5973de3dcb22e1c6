"""Physical-plan lint over the WHOLE registry — the scale rules as a
test, so a regression can't sneak in behind a green differential:

1. No unbounded cartesian product: ``CartesianProduct`` may appear
   only in queries tagged ``not-for-scale`` (the explicit exact-
   verification oracles).
2. ``BroadcastNestedLoopJoin`` (the bounded cross shape) only where a
   tag declares WHY it's bounded: ``bounded-nlj`` (a broadcast
   constant-size side), ``dimension-only``, or ``not-for-scale``.
3. Row-at-a-time Python (``BatchEvalPython``, which also matches
   ``BatchEvalPythonUDTF``) only in the three deliberate API-parity
   UDF/UDTF queries — everywhere else Python must be Arrow-batched
   (``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``)
   or absent.

Queries whose build has side effects (streaming runs, sink writes,
catalog DDL) are skipped: their returned frames are trivial sink/scan
reads, and executing them here would just re-run test_oracle_all.
"""

from __future__ import annotations

import pytest

from nineinfra_spark.plans import registry

SF = "/root/testdata/sf0.001"

_SKIP_TAGS = {"streaming", "sink", "catalog", "source"}

_LINTABLE = [
    n
    for n in registry.names()
    if not (_SKIP_TAGS & set(registry.get(n).tags))
]

#: queries allowed to plan row-at-a-time Python, by design (API parity
#: with the SLOW path — their docstrings say exactly that)
_ROW_PYTHON_OK = {"udf_scalar_python", "udf_sql_registered", "udf_python_udtf"}


def _plan(spark, name: str) -> str:
    df = registry.get(name).fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


@pytest.mark.parametrize("name", _LINTABLE)
def test_plan_scale_rules(spark, name):
    tags = set(registry.get(name).tags)
    plan = _plan(spark, name)

    if "CartesianProduct" in plan:
        assert "not-for-scale" in tags, (
            f"{name}: unbounded CartesianProduct in plan without a "
            f"not-for-scale tag\n{plan[:1500]}"
        )

    if "BroadcastNestedLoopJoin" in plan:
        assert tags & {"bounded-nlj", "dimension-only", "not-for-scale"}, (
            f"{name}: BroadcastNestedLoopJoin without a tag declaring "
            f"why it is bounded\n{plan[:1500]}"
        )

    if "BatchEvalPython" in plan:
        assert name in _ROW_PYTHON_OK, (
            f"{name}: row-at-a-time Python UDF in the plan — use an "
            f"Arrow-batched pandas UDF\n{plan[:1500]}"
        )


def test_range_frame_bucketed_has_no_window(spark):
    """The fact-scale RANGE-frame variant must never plan a WindowExec
    (the whole point vs. the dimension-only `window_range_frame`):
    hash-agg + bucket-level spread + broadcast join-back only."""
    plan = _plan(spark, "window_range_frame_bucketed")
    assert "Window" not in plan, plan[:1500]
    assert "BroadcastHashJoin" in plan, plan[:1500]


def test_bpe_pair_counts_takes_ordered_before_window(spark):
    """text_bpe_pair_counts ranks AFTER a TakeOrdered(N) — the global
    row_number window must only ever see N rows, not every pair key."""
    plan = _plan(spark, "text_bpe_pair_counts")
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_lint_covers_most_of_registry():
    """The skip set must stay the minority — if a refactor re-tags
    half the registry into the skip list, this fails."""
    assert len(_LINTABLE) >= 70, (len(_LINTABLE), len(registry.names()))


def test_verify_priority_fits_driver_window():
    """_VERIFY_FIRST must fit the driver's ~50-slot CORRECTNESS
    window — an oversized priority list silently pushes its own tail
    outside the gate, defeating the point."""
    from nineinfra_spark.plans import _VERIFY_FIRST

    assert len(_VERIFY_FIRST) <= 50, len(_VERIFY_FIRST)
