"""Join correctness on the F2 fixture (FIXTURES.md) — the analog of the
reference's TestJoinDatamerge.java:251-303: sources constructed so every join
cardinality is analytically known, asserted exactly.

src_a contains key iff key%2==0 or key%3==0 (key duplicated when key%4==0);
src_b contains key iff key%2==1 or key%3==0.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N = 100


def _a_keys():
    out = []
    for k in range(N):
        if k % 2 == 0 or k % 3 == 0:
            out.append(k)
            if k % 4 == 0:
                out.append(k)  # duplicate
    return out


def _b_keys():
    return [k for k in range(N) if k % 2 == 1 or k % 3 == 0]


@pytest.fixture()
def sources(spark):
    a = spark.createDataFrame(
        [(k, f"a_{k}_{i}") for i, k in enumerate(_a_keys())], ["key", "value"]
    )
    b = spark.createDataFrame(
        [(k, f"b_{k}_{i}") for i, k in enumerate(_b_keys())], ["key", "value"]
    )
    return a, b


def test_inner_join_cardinality(spark, sources):
    from hadoop_3_0_0_beta1_gaia_spark.operators.join import composite_inner_join

    a, b = sources
    out = composite_inner_join([("a", a), ("b", b)])
    # keys in BOTH sources = multiples of 3 (even∩odd is empty)
    inner_keys = {k for k in range(N) if k % 3 == 0}
    assert {r["key"] for r in out.collect()} == inner_keys
    # per-key row count = (a multiplicity) × (b multiplicity)
    expected_rows = sum((2 if k % 4 == 0 else 1) * 1 for k in inner_keys)
    assert out.count() == expected_rows


def test_outer_join_covers_union(spark, sources):
    from hadoop_3_0_0_beta1_gaia_spark.operators.join import composite_outer_join

    a, b = sources
    out = composite_outer_join([("a", a), ("b", b)])
    rows = out.collect()
    # every key 0..N-1 appears (evens ∪ odds ∪ div3 = all)
    assert {r["key"] for r in rows} == set(range(N))
    # a-only keys have null b values and vice versa
    a_only = {k for k in range(N) if (k % 2 == 0 or k % 3 == 0) and not (k % 2 == 1 or k % 3 == 0)}
    b_only = {k for k in range(N) if (k % 2 == 1 or k % 3 == 0) and not (k % 2 == 0 or k % 3 == 0)}
    for r in rows:
        if r["key"] in a_only:
            assert r["v_a"] is not None and r["v_b"] is None
        if r["key"] in b_only:
            assert r["v_a"] is None and r["v_b"] is not None
    # outer-join consistency against source counts (TestJoinDatamerge:279-303):
    # every (key, a-row) pairs with every (key, b-row); keys missing a side
    # contribute their present side's multiplicity.
    expected = 0
    for k in range(N):
        na = (2 if k % 4 == 0 else 1) if (k % 2 == 0 or k % 3 == 0) else 0
        nb = 1 if (k % 2 == 1 or k % 3 == 0) else 0
        expected += (na * nb) if (na and nb) else (na + nb)
    assert len(rows) == expected


def test_override_rightmost_wins(spark, sources):
    from hadoop_3_0_0_beta1_gaia_spark.operators.join import override_join

    a, b = sources
    out = {r["key"]: r["value"] for r in override_join([("a", a), ("b", b)]).collect()}
    for k in range(N):
        in_a = k % 2 == 0 or k % 3 == 0
        in_b = k % 2 == 1 or k % 3 == 0
        if in_b:
            assert out[k].startswith("b_"), f"key {k}: rightmost (b) must win"
        elif in_a:
            assert out[k].startswith("a_")
        else:
            assert k not in out


def test_datajoin_theta_cross_product(spark, sources):
    """Reduce-side tagged join: per-key cross product with a pair predicate."""
    from hadoop_3_0_0_beta1_gaia_spark.operators.join import datajoin_theta

    a, b = sources
    al = a.select(F.col("key"), F.col("value").alias("va"))
    bl = b.select(F.col("key"), F.col("value").alias("vb"))
    theta = F.length("va") >= F.length("vb")
    out = datajoin_theta(al, bl, on=["key"], theta=theta)
    plain = al.join(bl, "key").filter(theta)
    assert out.count() == plain.count()
    # semi/anti derivations from the same tagged sources
    assert al.join(bl, "key", "left_semi").count() == sum(
        (2 if k % 4 == 0 else 1) for k in range(N) if k % 3 == 0
    )
    a_only_keys = {
        k for k in range(N) if (k % 2 == 0 or k % 3 == 0) and k % 3 != 0
    }
    anti = al.join(bl, "key", "left_anti")
    assert {r["key"] for r in anti.collect()} == a_only_keys
