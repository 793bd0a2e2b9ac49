"""TypedBytes codec tests: roundtrips (incl. hypothesis), wire-format
byte-level checks against the published layout, and a pipe integration
using base64 framing.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hadoop_3_0_0_beta1_gaia_spark.operators import typedbytes as tb


def test_wire_format_bytes():
    # layout per TypedBytesOutput.java: code byte + big-endian payload
    assert tb.dumps(5) == bytes([tb.INT]) + struct.pack(">i", 5)
    assert tb.dumps(2**40) == bytes([tb.LONG]) + struct.pack(">q", 2**40)
    assert tb.dumps(True) == bytes([tb.BOOL, 1])
    assert tb.dumps(1.5) == bytes([tb.DOUBLE]) + struct.pack(">d", 1.5)
    assert tb.dumps("hi") == bytes([tb.STRING]) + struct.pack(">i", 2) + b"hi"
    assert tb.dumps(b"\x00\x01") == bytes([tb.BYTES]) + struct.pack(">i", 2) + b"\x00\x01"
    assert tb.dumps([1]) == bytes([tb.LIST]) + tb.dumps(1) + bytes([0xFF])
    assert tb.dumps((1, "a")) == (
        bytes([tb.VECTOR]) + struct.pack(">i", 2) + tb.dumps(1) + tb.dumps("a")
    )


def test_roundtrip_nested():
    rec = {"k": [1, 2.5, "x", (True, b"raw")], "n": 2**50}
    assert tb.loads(tb.dumps(rec)) == rec


def test_kv_and_b64_framing():
    k, v = "key1", {"a": 1, "b": [False, 3.25]}
    assert tb.loads_kv(tb.dumps_kv(k, v)) == (k, v)
    assert tb.loads_b64(tb.dumps_b64(k, v)) == (k, v)


_scalars = st.one_of(
    st.booleans(),
    st.integers(-(2**62), 2**62),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
    st.binary(max_size=20),
)
_values = st.recursive(
    _scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.tuples(inner, inner),
        st.dictionaries(st.text(max_size=8), inner, max_size=4),
    ),
    max_leaves=10,
)


@given(_values)
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(v):
    assert tb.loads(tb.dumps(v)) == v


def test_typedbytes_pipe_integration(spark):
    """-io typedbytes through rdd.pipe: frames as base64 lines; `cat` as the
    identity streaming command."""
    records = [("k1", [1, 2.5]), ("k2", {"x": True})]
    rdd = spark.sparkContext.parallelize(records, 2).map(
        lambda kv: tb.dumps_b64(kv[0], kv[1])
    )
    out = rdd.pipe("cat").map(tb.loads_b64).collect()
    assert sorted(out) == sorted(records)


def test_list_containing_terminator_valued_int():
    """Regression (hypothesis-found): int 255 == the list-terminator byte;
    the decoder must distinguish the terminator out-of-band."""
    for v in ([255], [255, 1], [[255]], [-1, 255, True]):
        assert tb.loads(tb.dumps(v)) == v
