"""Property tests for operators/diff.py against pure-Python
references — random frames with NULLs and duplicate rows, the inputs
hand-written cases under-sample (the r12 lesson: property-test the
kernels, don't eyeball them)."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nineinfra_spark.operators.diff import snapshot_diff, snapshot_diff_counts

# property sweep: randomized diff vs reference model — excluded from the default lane (see pytest.ini), run via -m slow
pytestmark = pytest.mark.slow

_VALS = st.one_of(st.none(), st.integers(min_value=0, max_value=3))
_ROW = st.tuples(_VALS, _VALS)
_ROWS = st.lists(_ROW, max_size=12)


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, v) for k, v in rows] or [(0, 0)], "k long, v long"
    ).filter("true" if rows else "false")


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=_ROWS, new=_ROWS)
def test_multiset_diff_matches_counter_reference(spark, old, new):
    got = {
        (r["k"], r["v"]): r["row_delta"]
        for r in snapshot_diff_counts(_mk(spark, old), _mk(spark, new)).collect()
    }
    co, cn = Counter(old), Counter(new)
    want = {
        r: cn[r] - co[r] for r in co.keys() | cn.keys() if cn[r] != co[r]
    }
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    old=st.dictionaries(_VALS, _VALS, max_size=6),
    new=st.dictionaries(_VALS, _VALS, max_size=6),
)
def test_keyed_diff_matches_dict_reference(spark, old, new):
    """Key-unique frames (dict-generated): classification must equal
    the dict diff, including NULL keys and NULL payloads."""
    o = _mk(spark, list(old.items()))
    n = _mk(spark, list(new.items()))
    got = {
        r["k"]: (r["change_type"], r["old_v"], r["new_v"])
        for r in snapshot_diff(o, n, ["k"]).collect()
    }
    want = {}
    for k in old.keys() | new.keys():
        if k not in old:
            want[k] = ("insert", None, new[k])
        elif k not in new:
            want[k] = ("delete", old[k], None)
        elif old[k] != new[k]:
            want[k] = ("update", old[k], new[k])
    assert got == want
