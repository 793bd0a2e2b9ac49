"""Unit tests for the four little languages (SURVEY §7.3): join expressions,
key-field specs, field-selection specs, aggregator descriptors — mirroring
the reference's Parser/TestKeyFieldHelper/TestMRFieldSelection/AggregatorTests.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _kv(spark, rows):
    return spark.createDataFrame(rows, ["key", "value"])


# ------------------------------------------------------- join expressions


@pytest.fixture()
def catalog(spark):
    return {
        "a": _kv(spark, [(1, "a1"), (2, "a2"), (3, "a3")]),
        "b": _kv(spark, [(2, "b2"), (3, "b3"), (4, "b4")]),
        "c": _kv(spark, [(3, "c3"), (5, "c5")]),
    }


def test_join_expr_inner(spark, catalog):
    from hadoop_3_0_0_beta1_gaia_spark.operators.join import compile_join_expr

    out = compile_join_expr("inner(a, b)", catalog).collect()
    got = {r["key"]: tuple(r["value"]) for r in out}
    assert got == {2: ("a2", "b2"), 3: ("a3", "b3")}


def test_join_expr_outer(spark, catalog):
    from hadoop_3_0_0_beta1_gaia_spark.operators.join import compile_join_expr

    out = compile_join_expr("outer(a, c)", catalog).collect()
    got = {r["key"]: tuple(r["value"]) for r in out}
    assert got == {
        1: ("a1", None),
        2: ("a2", None),
        3: ("a3", "c3"),
        5: (None, "c5"),
    }


def test_join_expr_override_rightmost_wins(spark, catalog):
    """OverrideRecordReader.java:42-84: rightmost source with the key wins."""
    from hadoop_3_0_0_beta1_gaia_spark.operators.join import compile_join_expr

    out = compile_join_expr("override(a, b, c)", catalog).collect()
    got = {r["key"]: r["value"] for r in out}
    assert got == {1: "a1", 2: "b2", 3: "c3", 4: "b4", 5: "c5"}


def test_join_expr_nested_and_tbl(spark, catalog):
    from hadoop_3_0_0_beta1_gaia_spark.operators.join import compile_join_expr

    out = compile_join_expr(
        'inner(tbl(SequenceFileInputFormat, "a"), override(b, c))', catalog
    ).collect()
    got = {r["key"]: (r["value"]["v_n2s0"], r["value"]["v_n2s1"]) for r in out}
    # override(b,c): {2:b2, 3:c3, 4:b4, 5:c5}; inner with a: keys 2,3
    assert got == {2: ("a2", "b2"), 3: ("a3", "c3")}


def test_join_expr_user_defined_op(spark, catalog):
    """mapreduce.join.define.<ident>: plug a custom op into the grammar."""
    from hadoop_3_0_0_beta1_gaia_spark.operators.join import (
        compile_join_expr,
        composite_inner_join,
    )

    def leftmost(named):  # keep the leftmost source's value for keys in all
        inner = composite_inner_join(named)
        first = f"v_{named[0][0]}"
        return inner.select("key", F.col(first).alias("value"))

    out = compile_join_expr("leftmost(a, b)", catalog, ops={"leftmost": leftmost})
    got = {r["key"]: r["value"] for r in out.collect()}
    assert got == {2: "a2", 3: "a3"}


def test_join_expr_errors(spark, catalog):
    from hadoop_3_0_0_beta1_gaia_spark.operators.join import compile_join_expr

    with pytest.raises(ValueError, match="unknown join op"):
        compile_join_expr("sideways(a, b)", catalog)
    with pytest.raises(KeyError, match="unknown source"):
        compile_join_expr("inner(a, zz)", catalog)
    with pytest.raises(ValueError, match="trailing"):
        compile_join_expr("inner(a, b) x", catalog)


# --------------------------------------------------------- key-field specs


def test_parse_keyfield_spec():
    from hadoop_3_0_0_beta1_gaia_spark.operators.keyfield import parse_keyfield_spec

    ks = parse_keyfield_spec("-k2,2n -k3r")
    assert [(k.first, k.last, k.numeric, k.reverse) for k in ks] == [
        (2, 2, True, False),
        (3, 0, False, True),  # omitted end = to end of line (KeyFieldHelper)
    ]
    ks2 = parse_keyfield_spec("-k1,3")
    assert (ks2[0].first, ks2[0].last) == (1, 3)
    assert not ks2[0].is_slice
    with pytest.raises(ValueError):
        parse_keyfield_spec("-k0")
    with pytest.raises(ValueError):
        parse_keyfield_spec("bogus")


def test_parse_keyfield_char_offsets():
    """Char-offset sub-addressing parses per KeyFieldHelper.java:31-39:
    -k2.3,4.2 = char 3 of field 2 through char 2 of field 4."""
    from hadoop_3_0_0_beta1_gaia_spark.operators.keyfield import parse_keyfield_spec

    (k,) = parse_keyfield_spec("-k2.3,4.2n")
    assert (k.first, k.first_char, k.last, k.last_char) == (2, 3, 4, 2)
    assert k.numeric and not k.reverse and k.is_slice
    (k2,) = parse_keyfield_spec("-k2.1")  # TestKeyFieldHelper's -k2.1 case
    assert (k2.first, k2.first_char, k2.last, k2.last_char) == (2, 1, 0, 0)
    (k3,) = parse_keyfield_spec("-k2.5,2")  # end field, end char = field end
    assert (k3.first, k3.first_char, k3.last, k3.last_char) == (2, 5, 2, 0)
    with pytest.raises(ValueError):
        parse_keyfield_spec("-k2.0")  # char offsets are 1-based


def test_keyfield_char_slice_semantics(spark):
    """The char-offset key is the raw joined-line slice, including clamping
    at the line end and bleeding across separators (KeyFieldHelper
    getStartOffset/getEndOffset semantics)."""
    from pyspark.sql import functions as F

    from hadoop_3_0_0_beta1_gaia_spark.operators.keyfield import (
        keyfield_sort_columns,
        parse_keyfield_spec,
        _slice_key,
    )

    df = spark.createDataFrame([("hello\thow\tare\tyou",)], ["line"])
    arr = F.split(F.col("line"), "\t")

    def slice_of(spec):
        (ks,) = parse_keyfield_spec(spec)
        return df.select(_slice_key(arr, ks, "\t").alias("k")).collect()[0]["k"]

    assert slice_of("-k2.1") == "how\tare\tyou"  # open end = to line end
    assert slice_of("-k2.2,3") == "ow\tare"  # end char 0 = end of field 3
    assert slice_of("-k1.2,2.2") == "ello\tho"  # mid-field to mid-field
    assert slice_of("-k2,2") == "how"  # whole single field
    assert slice_of("-k2.5,3") == "are"  # begin char past field bleeds on
    assert slice_of("-k4.2,4.99") == "ou"  # end char clamps at line end
    assert slice_of("-k1.99") == ""  # begin past line end = empty key

    # sort behavior: field-2 slice to end of line, descending
    rows = spark.createDataFrame(
        [("a\tzz",), ("b\tmm",), ("c\taa",)], ["line"]
    )
    ordered = [
        r["line"]
        for r in rows.orderBy(
            *keyfield_sort_columns("-k2r", F.split(F.col("line"), "\t"))
        ).collect()
    ]
    assert ordered == ["a\tzz", "b\tmm", "c\taa"]


def test_keyfield_sorted_numeric_vs_text(spark):
    from hadoop_3_0_0_beta1_gaia_spark.operators.keyfield import keyfield_sorted

    lines = [("b\t10",), ("a\t9",), ("c\t100",)]
    df = spark.createDataFrame(lines, ["line"])
    # text sort on field 2: "10" < "100" < "9"
    text_order = [r["line"] for r in keyfield_sorted(df, "-k2,2").collect()]
    assert text_order == ["b\t10", "c\t100", "a\t9"]
    # numeric sort on field 2: 9 < 10 < 100
    num_order = [r["line"] for r in keyfield_sorted(df, "-k2,2n").collect()]
    assert num_order == ["a\t9", "b\t10", "c\t100"]
    # reverse numeric
    rev = [r["line"] for r in keyfield_sorted(df, "-k2,2nr").collect()]
    assert rev == ["c\t100", "b\t10", "a\t9"]


# ---------------------------------------------------- field-selection specs


def test_field_select_specs(spark):
    from hadoop_3_0_0_beta1_gaia_spark.operators.fieldsel import field_select

    df = spark.createDataFrame([("f0\tf1\tf2\tf3\tf4",)], ["line"])

    r = field_select(df, "0:1-3").collect()[0]
    assert (r["key"], r["value"]) == ("f0", "f1\tf2\tf3")

    r = field_select(df, "2,0:3-").collect()[0]  # reordering + open range
    assert (r["key"], r["value"]) == ("f2\tf0", "f3\tf4")

    r = field_select(df, ":0-").collect()[0]  # empty key side
    assert (r["key"], r["value"]) == ("", "f0\tf1\tf2\tf3\tf4")

    with pytest.raises(ValueError, match="must contain"):
        field_select(df, "0-2")


def test_parse_field_specs_validation():
    from hadoop_3_0_0_beta1_gaia_spark.operators.fieldsel import parse_field_specs

    assert [(s.start, s.end) for s in parse_field_specs("0-2,4,6-")] == [
        (0, 2),
        (4, 4),
        (6, None),
    ]
    with pytest.raises(ValueError):
        parse_field_specs("5-2")
    with pytest.raises(ValueError):
        parse_field_specs("x")


# ------------------------------------------------- aggregator descriptors


def test_value_aggregate_descriptor_compiler(spark):
    from hadoop_3_0_0_beta1_gaia_spark.operators.aggregate import value_aggregate

    rows = [("a", i, f"u{i % 3}") for i in range(10)] + [("b", 5, "u9")]
    df = spark.createDataFrame(rows, ["k", "v", "u"])
    out = value_aggregate(
        df,
        "k",
        {
            "total": ("LongValueSum", "v"),
            "vmax": ("LongValueMax", "v"),
            "smin": ("StringValueMin", "u"),
            "uniq": ("UniqValueCount", "u"),
            # cap TRUNCATES (not approx); insert-then-check retains cap+1
            # items (UniqValueCount.java:87-92), so 3 distinct under cap=2
            # still reports 3
            "uniq2": ("UniqValueCount:2", "u"),
        },
    ).collect()
    got = {r["k"]: (r["total"], r["vmax"], r["smin"], r["uniq"], r["uniq2"]) for r in out}
    assert got == {"a": (45, 9, "u0", 3, 3), "b": (5, 5, "u9", 1, 1)}


def test_uniq_value_count_cap_fidelity(spark):
    """Pin the reference's cap semantics on an adversarial stream: far more
    distinct values than the cap. UniqValueCount.java:87-92 checks the set
    size AFTER the put, so the retained set reaches cap + 1 before the guard
    trips — the report is min(distinct, cap + 1), independent of arrival
    order (duplicates never grow the TreeMap)."""
    from hadoop_3_0_0_beta1_gaia_spark.operators.aggregate import value_aggregate

    # 20 distinct values, shuffled arrival with interleaved duplicates
    vals = [f"v{i:02d}" for i in range(20)]
    rows = [("k", v) for v in vals + vals[::-1] + vals[5:15]]
    df = spark.createDataFrame(rows, ["k", "u"])
    out = value_aggregate(
        df,
        "k",
        {
            "cap3": ("UniqValueCount:3", "u"),
            "cap19": ("UniqValueCount:19", "u"),
            "cap20": ("UniqValueCount:20", "u"),
            "cap99": ("UniqValueCount:99", "u"),
            "uncapped": ("UniqValueCount", "u"),
        },
    ).collect()[0]
    assert out["cap3"] == 4  # truncated at cap+1, NOT cap, NOT approximate
    assert out["cap19"] == 20  # cap+1 == distinct: indistinguishable from full
    assert out["cap20"] == 20  # cap >= distinct: exact count
    assert out["cap99"] == 20
    assert out["uncapped"] == 20


def test_parse_descriptor():
    from hadoop_3_0_0_beta1_gaia_spark.operators.aggregate import parse_descriptor

    assert parse_descriptor("LongValueSum") == ("LongValueSum", None)
    assert parse_descriptor("UniqValueCount:100") == ("UniqValueCount", 100)
