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
4. No single-partition WindowExec: a ``Window`` node whose partition
   spec is EMPTY but whose order spec is not moves the entire input
   to ONE task ("No Partition Defined for Window operation"). Allowed
   only when (a) the window's subtree contains a
   ``TakeOrderedAndProject``/``GlobalLimit`` (the rank-after-top-k
   house pattern: the window sees ≤N rows), or (b) the query is
   tagged ``dimension-only`` (a declared bounded rollup —
   ``window_range_frame``'s supplier-catalog frame,
   ``dq_volume_freshness``'s day-grain gate). This is the rule that
   would have caught the r9 ``agg_gini_concentration`` /
   ``part_revenue_abc`` catalog-rollup windows mechanically (both now
   use ``_util.ranked_prefix`` instead).
5. No unpruned partitioned scan: a ``FileScan`` whose
   ``PartitionFilters`` is empty while a ``Filter`` elsewhere in the
   plan references one of that scan's partition columns (derived from
   the scan line: in the output list, absent from ``ReadSchema``) —
   the pruning-regression class nothing excuses. Plans are rendered
   via ``doctor.full_plan`` (metadata un-truncated) so the rule can
   read wide fact-table scan lines.

Only queries whose build RUNS a stream (tag ``streaming``) are
skipped: a micro-batch run here would just re-run test_streaming
slowly, and the returned frames are memory-sink reads. Catalog / sink
/ source builds ARE executed (they are idempotent — the driver sim
runs the whole registry twice back-to-back) so their read-back plans
get linted too: the 11 streaming-run queries are the entire skip
list (test_lint_covers_most_of_registry pins coverage ≥ 210 and the
skip count ≤ 15, so neither number in this docstring can silently
rot).
"""

from __future__ import annotations

import pytest

from nineinfra_spark import doctor

from nineinfra_spark.plans import registry

SF = "/root/testdata/sf0.001"

_SKIP_TAGS = {"streaming"}

_LINTABLE = [
    n
    for n in registry.names()
    if not (_SKIP_TAGS & set(registry.get(n).tags))
]

#: queries allowed to plan row-at-a-time Python, by design (API parity
#: with the SLOW path — their docstrings say exactly that)
_ROW_PYTHON_OK = {"udf_scalar_python", "udf_sql_registered", "udf_python_udtf"}


def _plan(spark, name: str) -> str:
    # full_plan: metadata strings un-truncated, so the unpruned-scan
    # rule can actually read ReadSchema on wide fact-table scans
    return doctor.full_plan(registry.get(name).fn(spark, SF))


# the detection helpers live in nineinfra_spark.doctor — the
# user-facing plan-doctor API; this suite is the same rule engine
# applied registry-wide with the tag-based exemption policy

#: which Finding kinds each exemption tag excuses
_TAG_EXCUSES = {
    "cartesian": {"not-for-scale"},
    "nested-loop": {"bounded-nlj", "dimension-only", "not-for-scale"},
    "global-window": {"dimension-only"},
    # NO tag excuses an unpruned partitioned scan: a partition-column
    # filter that fails to reach the scan is a bug, fix the plan
    "unpruned-scan": set(),
}


@pytest.mark.parametrize("name", _LINTABLE)
def test_plan_scale_rules(spark, name):
    tags = set(registry.get(name).tags)
    plan = _plan(spark, name)

    for f in doctor.scale_risks_in_plan(plan):
        if f.kind == "row-python":
            assert name in _ROW_PYTHON_OK, (
                f"{name}: {f.kind} — {f.hint}\n{f.line}"
            )
            continue
        assert tags & _TAG_EXCUSES[f.kind], (
            f"{name}: {f.kind} without a declaring tag — {f.hint}"
            f"\n{f.line}"
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
    part of the registry into the skip list, this fails. r10 narrowed
    the skip to streaming-run queries only."""
    assert len(_LINTABLE) >= 210, (len(_LINTABLE), len(registry.names()))
    assert len(registry.names()) - len(_LINTABLE) <= 15, (
        len(_LINTABLE),
        len(registry.names()),
    )


def test_verify_priority_fits_driver_window():
    """_VERIFY_FIRST must fit the driver's ~50-slot CORRECTNESS
    window — an oversized priority list silently pushes its own tail
    outside the gate, defeating the point."""
    from nineinfra_spark.plans import _VERIFY_FIRST

    assert len(_VERIFY_FIRST) <= 50, len(_VERIFY_FIRST)
