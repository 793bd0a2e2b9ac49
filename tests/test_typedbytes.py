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


def test_pipe_df_typedbytes_mode(spark):
    """pipe_df(io='typedbytes') end-to-end with a python child: typed
    records survive the pipe (no string round-trip), composite keys become
    typedbytes vectors, and the child's ops apply to decoded values."""
    import sys

    from hadoop_3_0_0_beta1_gaia_spark.operators import typedbytes_child
    from hadoop_3_0_0_beta1_gaia_spark.operators.pipe import pipe_df

    child = typedbytes_child.__file__
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k bigint, v bigint"
    ).repartition(2)

    doubled = pipe_df(
        df, f"{sys.executable} {child} scale2",
        io="typedbytes", out_schema="key bigint, value bigint",
    )
    assert sorted(tuple(r) for r in doubled.collect()) == [(1, 20), (2, 40), (3, 60)]

    swapped = pipe_df(
        df, f"{sys.executable} {child} swap",
        io="typedbytes", out_schema="key bigint, value bigint",
    )
    assert sorted(tuple(r) for r in swapped.collect()) == [(10, 1), (20, 2), (30, 3)]

    # composite key: two key fields → vector key, scalar value
    df3 = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 7)], "k1 bigint, k2 string, v bigint"
    )
    ident = pipe_df(
        df3, f"{sys.executable} {child} identity",
        io="typedbytes", num_key_fields=2,
        out_schema="k1 bigint, k2 string, value bigint",
    )
    assert sorted(tuple(r) for r in ident.collect()) == [(1, "a", 5), (2, "b", 7)]


def test_pipe_df_rejects_unknown_io(spark):
    import pytest

    from hadoop_3_0_0_beta1_gaia_spark.operators.pipe import pipe_df

    df = spark.range(1)
    with pytest.raises(ValueError, match="io mode"):
        pipe_df(df, "cat", io="avro")


def test_rawbytes_framing_roundtrip():
    from hadoop_3_0_0_beta1_gaia_spark.operators.pipe import (
        rawbytes_dumps,
        rawbytes_loads,
    )

    for k, v in [(b"a", b"bc"), (b"", b""), (bytes(range(256)), b"\x00\xff")]:
        assert rawbytes_loads(rawbytes_dumps(k, v)) == (k, v)


def test_pipe_df_rawbytes_mode(spark):
    """pipe_df(io='rawbytes') end-to-end: length-prefixed byte frames cross
    the pipe, and the transport is byte-clean (a child emitting non-UTF-8
    bytes round-trips intact — the property rawbytes exists for)."""
    import sys

    from hadoop_3_0_0_beta1_gaia_spark.operators import rawbytes_child
    from hadoop_3_0_0_beta1_gaia_spark.operators.pipe import pipe_df

    child = rawbytes_child.__file__
    df = spark.createDataFrame(
        [("k1", "alpha"), ("k2", "beta")], "k string, v string"
    ).repartition(2)

    upper = pipe_df(df, f"{sys.executable} {child} upper", io="rawbytes")
    got = sorted((bytes(r.key), bytes(r.value)) for r in upper.collect())
    assert got == [(b"k1", b"ALPHA"), (b"k2", b"BETA")]

    xored = pipe_df(df, f"{sys.executable} {child} xor1", io="rawbytes")
    got = sorted((bytes(r.key), bytes(r.value)) for r in xored.collect())
    assert got == [
        (b"k1", bytes(b ^ 1 for b in b"alpha")),
        (b"k2", bytes(b ^ 1 for b in b"beta")),
    ]

    # multi-column: key = first 2 cols sep-joined, value = rest
    df3 = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")], "a bigint, b string, c string")
    ident = pipe_df(
        df3, f"{sys.executable} {child} identity", io="rawbytes", num_key_fields=2
    )
    got = sorted((bytes(r.key), bytes(r.value)) for r in ident.collect())
    assert got == [(b"1\ta", b"x"), (b"2\tb", b"y")]
