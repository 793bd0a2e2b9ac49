"""The sweep harness's engine-side digest must canonicalize identically on
both engines — found broken in r11: Spark's format_string renders a NULL
double as the literal string "null" (Java String.format), while DuckDB's
printf propagates SQL NULL into the 'NULL' coalesce, so any digest-mode
entry with a nullable double column false-FAILED (asof_* at sf10)."""

from __future__ import annotations

import duckdb
import pytest


@pytest.fixture(scope="module")
def digest_pair(spark, tmp_path_factory):
    import tools.sf_sweep as sw

    p = str(tmp_path_factory.mktemp("digest") / "t.parquet")
    rows = [
        (1, 1.5, "a"),
        (2, None, "b"),        # the NULL double that broke the digest
        (3, -0.0000000004, None),  # sub-ulp-of-format negative + NULL string
        (4, 2.0, "a"),
    ]
    spark.createDataFrame(rows, "id long, v double, s string").write.mode(
        "overwrite"
    ).parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{p}/*.parquet'")
    return sw, spark.read.parquet(p), con


def test_engine_side_digests_agree_with_null_doubles(digest_pair):
    sw, df, con = digest_pair
    sp = sw._spark_digest(df)
    dk = sw._duck_digest(con, "SELECT * FROM t")
    assert sp == dk
    assert sp[0] == 4


def test_digest_detects_a_single_value_divergence(digest_pair):
    """The digest is a gate, not a checksum formality: flipping ONE value
    must change it."""
    sw, df, con = digest_pair
    dk = sw._duck_digest(
        con, "SELECT id, CASE WHEN id = 4 THEN 2.5 ELSE v END AS v, s FROM t"
    )
    assert sw._spark_digest(df) != dk
