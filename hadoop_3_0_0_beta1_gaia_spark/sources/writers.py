"""Sinks — the OutputFormat surface (SURVEY §2.2).

- ``write_text``            → TextOutputFormat (key ␣sep␣ value lines,
  LIB/output/TextOutputFormat.java; default TAB separator).
- ``write_partitioned``     → MultipleOutputs / MultipleOutputFormat
  (LIB/output/MultipleOutputs.java:311, mapred/lib/MultipleOutputFormat.java:90):
  route records to files derived from a column → ``partitionBy``.
- ``write_named_outputs``   → MultipleOutputs named outputs: disjoint
  subsets to named sub-sinks.
- ``write_sorted``          → MapFileOutputFormat (sorted parts + point
  lookups via parquet min/max pruning instead of an index file).
- ``write_null``            → NullOutputFormat: run the job, discard output.
- ``write_parquet``         → the engine-native container (SequenceFile's
  role; block compression via codec option).

Commit protocol (FileOutputCommitter two-phase, v1/v2) is Spark's built-in
FileCommitProtocol — nothing to port. LazyOutputFormat semantics (no empty
part files) are the parquet writer's default behavior.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_text(
    df: DataFrame, path: str, sep: str = "\t", mode: str = "overwrite"
) -> None:
    """TextOutputFormat: one line per row, columns joined by sep."""
    df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in df.columns]).alias("value")
    ).write.mode(mode).text(path)


def write_parquet(
    df: DataFrame, path: str, compression: str = "snappy", mode: str = "overwrite"
) -> None:
    """The SequenceFile role: splittable compressed container."""
    df.write.mode(mode).option("compression", compression).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """MultipleOutputFormat.generateFileNameForKeyValue → partitionBy:
    records land in <path>/<col>=<value>/ files. Hive-style partition
    pruning replaces the reference's manual path selection."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_named_outputs(
    df: DataFrame,
    base_path: str,
    named: dict[str, Column],
    mode: str = "overwrite",
) -> None:
    """MultipleOutputs.addNamedOutput: each name gets the subset matching its
    predicate, written under <base>/<name>. Predicates need not be disjoint
    (the reference allows writing any record to any named output)."""
    for name, predicate in named.items():
        df.filter(predicate).write.mode(mode).parquet(f"{base_path}/{name}")


def write_sorted(
    df: DataFrame,
    path: str,
    key: str,
    num_partitions: int | None = None,
    mode: str = "overwrite",
    bloom_cols: list[str] | None = None,
) -> None:
    """MapFileOutputFormat / BloomMapFile: globally range-partitioned,
    in-part sorted output. Point lookup = parquet min/max row-group pruning
    on the sort key (the MapFile index analog); ``bloom_cols`` adds parquet
    bloom filters (COMMON/io/BloomMapFile.java's membership filter, now a
    storage-format feature)."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    writer = (
        df.repartitionByRange(int(n), F.col(key))
        .sortWithinPartitions(key)
        .write.mode(mode)
    )
    for c in bloom_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    num_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """CompositeInputFormat's precondition as a storage layout.

    The reference's map-side merge join (LIB/join/CompositeInputFormat.java:
    60-96) requires sources that are IDENTICALLY PARTITIONED AND SORTED; the
    Spark-native equivalent is a bucketed+sorted table. Two tables bucketed
    by the same key into the same bucket count join with NO shuffle exchange
    and no sort (verified by plan in tests) — at 100 TB this is the layout
    you pre-pay once for fact tables joined repeatedly on the same key.
    The repartition puts one file per bucket so readers get one split per
    bucket instead of files × buckets."""
    (
        df.repartition(num_buckets, F.col(key))
        .write.mode(mode)
        .bucketBy(num_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )


def write_null(df: DataFrame) -> int:
    """NullOutputFormat: execute the plan, discard rows. Returns row count
    (the job's only observable effect, like the reference's counters)."""
    return df.count()
