"""TeraSort pipeline: generate → total-order sort → validate.

Re-expresses MR-EX/terasort (TeraSort.java, TeraInputFormat.java:82-132
sampling, TeraValidate.java — SURVEY §2.7). On Spark the custom 2-level-trie
partitioner collapses into ``repartitionByRange`` (RangePartitioner samples
keys — the InputSampler job) and the always-on shuffle sort; keys are hex
strings whose lexicographic order equals the unsigned byte order TeraSort
requires.

Validation is scale-correct, mirroring TeraValidate's per-part checks:
- within-partition order is checked with a partition-local window (no global
  single-partition window);
- cross-partition boundaries are checked on the driver over one (min, max)
  row per partition;
- the record checksum is a sum of md5-derived 60-bit hashes mod a prime
  (TeraGen's CRC32 ``CHECKSUM`` counter analog), identical before/after sort.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dedup import md5_long

_CHECKSUM_MOD = 1_000_000_007


def checksum(df: DataFrame, key: str = "kv_key", value: str = "kv_value") -> int:
    """Order-independent record checksum (TeraValidate.java xor-checksum analog)."""
    row = df.select(
        F.sum(md5_long(F.concat(F.col(key), F.col(value))) % _CHECKSUM_MOD).alias("c")
    ).collect()[0]
    return int(row["c"] or 0)


def terasort(df: DataFrame, key: str = "kv_key", num_partitions: int | None = None) -> DataFrame:
    """Total-order sort: RangePartitioning + partition-local sort."""
    if num_partitions:
        return df.repartitionByRange(num_partitions, F.col(key)).sortWithinPartitions(key)
    return df.orderBy(key)


@dataclass(frozen=True)
class TeraValidation:
    n_rows: int
    n_disorder: int  # in-partition inversions
    n_boundary_violations: int  # partition p's max > partition p+1's min
    checksum_in: int
    checksum_out: int

    @property
    def ok(self) -> bool:
        return (
            self.n_disorder == 0
            and self.n_boundary_violations == 0
            and self.checksum_in == self.checksum_out
        )


def teravalidate(
    sorted_df: DataFrame, checksum_in: int, key: str = "kv_key", value: str = "kv_value"
) -> TeraValidation:
    """TeraValidate: per-partition order + boundary keys + checksum equality.

    The disorder window must order by PHYSICAL row position, not by the key:
    a lag over (ORDER BY key) trivially satisfies prev <= key, so it could
    never flag a range-partitioned-but-unsorted-within-partition frame.
    ``monotonically_increasing_id`` is monotone in physical row order inside
    each partition, which is exactly the order TeraValidate reads records in.
    """
    with_pid = sorted_df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__pos", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("__pid").orderBy("__pos")
    stats = with_pid.withColumn("__prev", F.lag(key).over(w)).select(
        F.count("*").alias("n"),
        F.sum(
            F.when(
                F.col("__prev").isNotNull() & (F.col(key) < F.col("__prev")), 1
            ).otherwise(0)
        ).alias("disorder"),
        F.sum(md5_long(F.concat(F.col(key), F.col(value))) % _CHECKSUM_MOD).alias(
            "csum"
        ),
    ).collect()[0]
    bounds = (
        with_pid.groupBy("__pid")
        .agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
        .orderBy("__pid")
        .collect()
    )  # one row per partition — driver-side is scale-safe
    violations = sum(
        1 for a, b in zip(bounds, bounds[1:]) if a["hi"] is not None and a["hi"] > b["lo"]
    )
    return TeraValidation(
        n_rows=int(stats["n"]),
        n_disorder=int(stats["disorder"] or 0),
        n_boundary_violations=violations,
        checksum_in=checksum_in,
        checksum_out=int(stats["csum"] or 0),
    )
