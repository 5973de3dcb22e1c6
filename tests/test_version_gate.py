"""Version gating (registry.min_spark): the registry loads fully on
any Spark, and queries exercising post-3.2.4 features (the reference
pins Spark 3.2.4, ninecluster_metadata.go:108-117) degrade into a
clear SparkVersionUnsupported instead of an opaque analyzer error.
"""

from __future__ import annotations

import pytest

from nineinfra_spark.plans import registry
from nineinfra_spark.plans.registry import SparkVersionUnsupported, _version_tuple

GATED = {
    "sql_recursive_cte": "4.1",
    "sql_pipe_syntax": "4.0",
    "sql_scripting_block": "4.0",
    "fn_variant_json": "4.0",
    "src_python_datasource": "4.0",
    "stream_python_datasource": "4.0",
    "sink_python_datasource": "4.0",  # DataSource writer API (r9)
    "src_avro_roundtrip": "4.0",  # reader rides the Python DataSource
    "src_xml_roundtrip": "4.0",  # built-in XML source (SPARK-44265)
    "stream_topics_rate_capped": "4.0",  # Python DataSource stream
    "udf_python_udtf": "3.5",
}


def test_gated_set_is_exhaustive():
    """Every registry entry declaring min_spark is in GATED — a new
    gated query must land here too, or the floor goes untested."""
    declared = {n for n in registry.names() if registry.get(n).min_spark}
    assert declared == set(GATED), declared ^ set(GATED)


class _FakeSession:
    """Only .version — the gate must trip BEFORE any Spark API use."""

    def __init__(self, version: str):
        self.version = version


def test_gated_queries_declare_floors():
    for name, floor in GATED.items():
        assert registry.get(name).min_spark == floor, name


def test_gate_raises_on_reference_pinned_spark():
    old = _FakeSession("3.2.4")
    for name in GATED:
        with pytest.raises(SparkVersionUnsupported, match="3.2.4"):
            registry.get(name).fn(old, "/root/testdata/sf0.001")


def test_udtf_floor_is_3_5_not_4():
    assert registry.get("udf_python_udtf").min_spark == "3.5"
    # 3.5 session passes the gate (fails later only if API truly absent)
    gate_ok = _FakeSession("3.5.1")
    try:
        registry.get("udf_python_udtf").fn(gate_ok, "/nonexistent")
    except SparkVersionUnsupported:  # pragma: no cover
        pytest.fail("3.5 session must pass the 3.5 gate")
    except Exception:
        pass  # downstream failure on the fake session is expected


def test_ungated_queries_run_on_any_version():
    """A 3.2 session must reach the query body for ungated entries —
    the wrapper only exists when min_spark is declared."""
    q = registry.get("join_inner_equi")
    assert q.min_spark is None


def test_version_tuple_parsing():
    assert _version_tuple("3.2.4") == (3, 2)
    assert _version_tuple("4.1.2") == (4, 1)
    assert _version_tuple("4.0.0-preview2") == (4, 0)
    assert _version_tuple("4.1") == (4, 1)
    assert _version_tuple("3.5.1") < _version_tuple("4.0")
    assert _version_tuple("4.1.2") >= _version_tuple("4.1")


def test_real_session_passes_all_gates(spark):
    """The env's Spark 4.1 session satisfies every declared floor —
    gates exist for OLDER engines, they must be invisible here."""
    for name in GATED:
        assert _version_tuple(spark.version) >= _version_tuple(
            registry.get(name).min_spark
        )
