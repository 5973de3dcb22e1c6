"""Property-based round-trip for the avro_lite codec (hypothesis):
arbitrary rows of every supported type — including IEEE edge cases
(NaN, ±inf, -0.0, subnormals), unicode strings, empty/long bytes, and
None through nullable unions — must survive write→read bit-exactly
under both codecs.
"""

from __future__ import annotations

import math
import os

from hypothesis import given, settings, strategies as st

from nineinfra_spark.sources import avro_lite as A

OUT = "/tmp/nineinfra_avro_prop"

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "a_long", "type": "long"},
        {"name": "a_int", "type": "int"},
        {"name": "a_bool", "type": "boolean"},
        {"name": "a_double", "type": ["null", "double"]},
        {"name": "a_string", "type": "string"},
        {"name": "a_bytes", "type": "bytes"},
    ],
}

_doubles = st.one_of(
    st.none(),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
)

_row = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.booleans(),
    _doubles,
    st.text(max_size=200),
    st.binary(max_size=200),
)


def _eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # bit-exact: distinguishes -0.0 from 0.0
        import struct

        return struct.pack("<d", a) == struct.pack("<d", b)
    return a == b


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(_row, max_size=40), codec=st.sampled_from(["null", "deflate"]))
def test_roundtrip_property(rows, codec):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"prop_{os.getpid()}.avro")
    n = A.write_avro(path, SCHEMA, rows, codec=codec, rows_per_block=7)
    assert n == len(rows)
    got = list(A.read_avro(path))
    assert len(got) == len(rows)
    for g, w in zip(got, rows):
        assert len(g) == len(w)
        for gv, wv in zip(g, w):
            assert _eq(gv, wv), (gv, wv)


@settings(max_examples=60, deadline=None)
@given(n=st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_roundtrip_property(n):
    import io

    assert A._zigzag_decode(io.BytesIO(A._zigzag_encode(n))) == n
