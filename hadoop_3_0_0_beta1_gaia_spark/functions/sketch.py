"""KMV (k-minimum-values) distinct-count sketch.

The scalable alternative to exact ``count(DISTINCT ...)``:
``approx_count_distinct`` (HLL) is Spark's built-in answer, but its estimate
is implementation-specific — useless for a cross-engine oracle. KMV gives the
same one-pass / mergeable / bounded-state properties with a DETERMINISTIC
estimate both engines reproduce exactly:

- hash every value to a uniform fraction of [0, 2^60) (md5-derived — the
  engine's portable hash, same as the samplers and generators);
- keep the k smallest distinct hashes per group (bounded state: k longs);
- if fewer than k distinct hashes exist the count is exact; otherwise
  estimate n ≈ (k-1) / (kth_min / 2^60)  (the classic KMV estimator).

Standard error is ~1/sqrt(k-2) (~12.6% at k=64). At 100 TB the k-smallest
set is algebraic (merge = union + re-truncate), so partial aggregation
applies — here expressed as distinct → per-key rank → filter, which Spark
executes as two hash shuffles with map-side partials.

Reference parallel: UniqValueCount.java:35-75 caps its EXACT set at
maxNumItems by silently truncating (covered by the ``uniq_value_count``
inventory entry); KMV is the principled bounded-state version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import duck_md5_long, md5_long
from .rounding import duck_fround, fround

_TWO_60 = float(2**60)


def kmv_distinct(
    df: DataFrame,
    key: str,
    value: str,
    k: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Per-``key`` KMV estimate of distinct ``value`` count.

    Output: (key, n_seen long  — min(k, true distinct), kmv_estimate double).
    """
    hashed = df.select(
        F.col(key), md5_long(F.col(value).cast("string")).alias("__h")
    ).distinct()
    w = Window.partitionBy(key).orderBy("__h")
    kept = hashed.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= k)
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("__kth").cast("double") / F.lit(_TWO_60)))
    return (
        kept.groupBy(key)
        .agg(F.count("*").alias("n_seen"), F.max("__h").alias("__kth"))
        .select(
            key,
            "n_seen",
            fround(est, round_digits).alias("kmv_estimate"),
        )
    )


def duckdb_kmv_distinct(
    table: str,
    key: str,
    value: str,
    k: int = 64,
    round_digits: int = 4,
) -> str:
    h = duck_md5_long(f"{value}::VARCHAR")
    est = (
        f"CASE WHEN n_seen < {k} THEN n_seen::DOUBLE "
        f"ELSE {float(k - 1)} / (kth::DOUBLE / {_TWO_60}) END"
    )
    return f"""
        WITH hashed AS (
            SELECT DISTINCT {key} AS key, {h} AS h FROM {table}
        ),
        kept AS (
            SELECT key, h FROM (
                SELECT key, h, row_number() OVER (PARTITION BY key ORDER BY h) AS r
                FROM hashed
            ) WHERE r <= {k}
        )
        SELECT key AS {key}, n_seen, {duck_fround(est, round_digits)} AS kmv_estimate
        FROM (
            SELECT key, count(*) AS n_seen, max(h) AS kth
            FROM kept GROUP BY key
        )
    """
