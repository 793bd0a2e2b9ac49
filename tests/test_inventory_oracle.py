"""Replicates the driver's t2 protocol: run every inventory query on Spark AND
its DuckDB oracle on the same parquet tables; compare row count, schema arity
and (column-name-sorted, row-sorted) values.

Floats are compared exactly — both sides round inside the query, so any
mismatch here would also be a hash mismatch in the driver's gate.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from hadoop_3_0_0_beta1_gaia_spark.plans.registry import all_entries

ENTRIES = all_entries()


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", sorted(ENTRIES))
def test_oracle_match(name, spark, sf_dir):
    e = ENTRIES[name]
    df = e.build(spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    if e.oracle is None:
        assert len(spark_rows) >= 0  # rows-only check (non-SQL-expressible op)
        return

    con = _duck_con(sf_dir)
    res = con.execute(e.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    mism = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mism, f"{name}: {len(mism)} differing rows; first: {mism[:3]}"
