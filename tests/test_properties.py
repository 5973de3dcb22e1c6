"""Property-based algebraic spot checks (SURVEY.md §5.2 item 5):
identities that must hold for ANY input, exercised on small generated
frames. Few examples per property (Spark job per example), no
deadline — these catch semantic regressions, not perf.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),
        st.integers(min_value=0, max_value=3),
        st.text(alphabet="abc", min_size=0, max_size=2),
    ),
    min_size=0,
    max_size=12,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

SCHEMA = "k int, v int, s string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA) if rows else spark.createDataFrame([], SCHEMA)


def _bag(df):
    return sorted(map(tuple, df.collect()))


@SETTINGS
@given(rows=ROWS)
def test_filter_projection_commute(spark, rows):
    """σ∘π == π∘σ when the predicate only references kept columns —
    the identity predicate pushdown relies on."""
    df = _df(spark, rows)
    a = df.filter(F.col("v") > 1).select("k", "v")
    b = df.select("k", "v").filter(F.col("v") > 1)
    assert _bag(a) == _bag(b)


@SETTINGS
@given(a=ROWS, b=ROWS)
def test_union_all_count_additive(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    assert da.unionAll(db).count() == da.count() + db.count()


@SETTINGS
@given(a=ROWS, b=ROWS)
def test_inner_join_commutative(spark, a, b):
    da, db = _df(spark, a), _df(spark, b)
    left = da.join(db, "k").select("k")
    right = db.join(da, "k").select("k")
    assert _bag(left) == _bag(right)


@SETTINGS
@given(rows=ROWS)
def test_distinct_idempotent(spark, rows):
    df = _df(spark, rows)
    assert _bag(df.distinct().distinct()) == _bag(df.distinct())


@SETTINGS
@given(a=ROWS, b=ROWS)
def test_intersect_except_all_partition(spark, a, b):
    """Bag semantics: intersectAll(a,b) + exceptAll(a,b) == a."""
    da, db = _df(spark, a), _df(spark, b)
    part = _bag(da.intersectAll(db)) + _bag(da.exceptAll(db))
    assert sorted(part) == _bag(da)
