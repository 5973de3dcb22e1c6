"""Property tests for engine.merge_required_conf — the conf merger
that keeps the thrift-auth classpath/options alive under arbitrary
user extra_conf (pure-Python, no Spark needed)."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from nineinfra_spark.engine import merge_required_conf

_KEY = st.sampled_from(
    [
        "spark.driver.extraClassPath",
        "spark.executor.extraClassPath",
        "spark.driver.extraJavaOptions",
        "spark.hadoop.hive.server2.authentication",
        "spark.sql.shuffle.partitions",
        "spark.custom.key",
    ]
)
_VAL = st.text(
    alphabet="abcdefg/.:-=Dx0123456789", min_size=1, max_size=20
)
_CONF = st.dictionaries(_KEY, _VAL, max_size=5)


@settings(max_examples=300, deadline=None)
@given(user=_CONF, required=_CONF)
def test_invariants(user, required):
    merged = merge_required_conf(user, required)
    # 1. every key from either side is present
    assert set(merged) == set(user) | set(required)
    # 2. required values always survive: verbatim for plain keys,
    #    as the LEADING segment for mergeable keys
    for k, v in required.items():
        if k.endswith(".extraClassPath") and k in user:
            assert merged[k].startswith(v + os.pathsep)
            assert merged[k].endswith(user[k])
        elif k.endswith(".extraJavaOptions") and k in user:
            assert merged[k].startswith(v + " ")
            assert merged[k].endswith(user[k])
        else:
            assert merged[k] == v
    # 3. user keys the platform doesn't require pass through untouched
    for k, v in user.items():
        if k not in required:
            assert merged[k] == v
    # 4. inputs are never mutated
    assert merge_required_conf(user, required) == merged


@settings(max_examples=100, deadline=None)
@given(user=_CONF)
def test_empty_required_is_identity(user):
    assert merge_required_conf(user, {}) == user
