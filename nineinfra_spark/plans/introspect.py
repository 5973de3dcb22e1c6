"""Introspection queries: the engine's own diagnostics as a query
surface.

The reference platform exposes cluster/engine health through its
operator status objects (``api/v1alpha1/ninecluster_types.go`` — the
CR's ``status`` block is how a user asks "is my engine sane"); the
analog here is the plan doctor (``nineinfra_spark/doctor.py``)
exposed as a REGISTERED QUERY, so its behavior is pinned by the same
driver-sim + DuckDB-oracle gate as every data operator: product
documentation as a test (r10 verdict item 7c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nineinfra_spark.plans.registry import query


@query(
    "doctor_scale_witness",
    oracle="""
    SELECT * FROM (VALUES ('global-window'), ('nested-loop'),
                          ('row-python')) AS t(risk_kind)
    """,
    tags=("introspection", "doctor"),
)
def doctor_scale_witness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITNESS query for the plan doctor: build a deliberately-risky
    plan — a global ordered window with no bounding limit, a broadcast
    nested-loop cross join, and a row-at-a-time Python UDF — run
    ``doctor.scale_risks`` over it, and return the DISTINCT risk kinds
    found. The oracle pins the exact verdict, so any regression in the
    detector (a rule that stops firing, a suppression that grows too
    eager) fails the correctness gate, not just a unit test.

    The risky frame is built on ``spark.range`` literals (64 rows) and
    is PLANNED, never executed — ``scale_risks`` inspects the physical
    plan only. The returned frame is a local relation of the sorted
    kind names; the registry lint sees only that clean local scan.
    (The cartesian and unpruned-scan rules have their own
    crafted-plan pytests in ``tests/test_doctor.py`` — triggering a
    CartesianProduct here would need a session-conf flip inside a
    registered query, which the idempotent double driver-sim run
    forbids.)"""
    from nineinfra_spark import doctor

    @F.udf("long")
    def _row_python(v):
        return v + 1

    base = spark.range(64)
    ranked = base.withColumn(
        "r", F.row_number().over(Window.orderBy("id"))
    )
    one = spark.range(1).agg(F.count(F.lit(1)).alias("n"))
    risky = ranked.select(
        "id", "r", _row_python("id").alias("s")
    ).crossJoin(F.broadcast(one))
    kinds = sorted({f.kind for f in doctor.scale_risks(risky)})
    return spark.createDataFrame(
        [(k,) for k in kinds], "risk_kind string"
    )
