"""Text-line sources — TextInputFormat family (SURVEY §2.1).

- ``read_text_lines``      → TextInputFormat (LIB/input/TextInputFormat.java):
  one row per line; optional byte-offset analog column.
- ``parse_kv_lines``       → KeyValueTextInputFormat / KeyValueLineRecordReader
  (LIB/input/KeyValueTextInputFormat.java): split each line at the FIRST
  separator; a line with no separator becomes (line, "").
- ``read_fixed_length``    → FixedLengthInputFormat
  (LIB/input/FixedLengthInputFormat.java:47): fixed-width binary records.
- ``read_multiple_inputs`` → MultipleInputs/DelegatingInputFormat
  (LIB/input/MultipleInputs.java): per-path reader + per-path transform,
  unioned by name.
- ``scan_filters``         → SequenceFileInputFilter regex/percent/md5 filters
  (LIB/input/SequenceFileInputFilter.java:110-202) as scan-time predicates.

All are built-in-expression paths (no Python UDFs): splits, filters and
projections stay JVM-side and push down into the scan.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_lines(
    spark: SparkSession, path: str, with_offset: bool = False
) -> DataFrame:
    """TextInputFormat: (offset, line). Spark's file splits mirror
    FileInputFormat.getSplits' block-sized splitting via maxPartitionBytes.

    The offset analog is a monotonically increasing id — per-file byte offsets
    are a storage detail no reference job's *semantics* depend on.
    """
    df = spark.read.text(path).withColumnRenamed("value", "line")
    if with_offset:
        df = df.withColumn("offset", F.monotonically_increasing_id())
    return df


def nline_splits(
    df: DataFrame,
    n: int,
    order_by: list,
    num_partitions: int | None = None,
) -> DataFrame:
    """NLineInputFormat (LIB/input/NLineInputFormat.java, SURVEY §2.1): assign
    records to splits of EXACTLY N consecutive lines (the last split may be
    short). "Consecutive" needs a total order standing in for file byte
    order, so callers pass ``order_by`` (typically the record key).

    Adds ``split_id`` (0-based) and ``line_in_split`` (0-based position
    within the split). The index comes from the two-phase ``global_rank``
    (range partition + cumulative offsets — never a single-partition window);
    ``df.repartition(k, "split_id")`` afterwards gives each split its own
    task, the reference's one-mapper-per-N-lines contract.
    """
    from ..operators.sort import global_rank

    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    ranked = global_rank(df, cols, rank_name="__rid", num_partitions=num_partitions)
    return (
        ranked.withColumn(
            "split_id", F.floor((F.col("__rid") - 1) / n).cast("long")
        )
        .withColumn("line_in_split", ((F.col("__rid") - 1) % n).cast("long"))
        .drop("__rid")
    )


def parse_kv_lines(
    df: DataFrame,
    sep: str = "\t",
    line_col: str = "line",
    keep: list[str] | None = None,
) -> DataFrame:
    """Split each line at the FIRST separator into (key, value) —
    KeyValueLineRecordReader semantics: no separator → (whole line, "")."""
    line = F.col(line_col)
    pos = F.instr(line, sep)
    key = F.when(pos == 0, line).otherwise(F.substring(line, F.lit(1), pos - 1))
    value = F.when(pos == 0, F.lit("")).otherwise(
        F.substr(line, pos + F.lit(len(sep)))
    )
    return df.select(
        *[F.col(c) for c in (keep or [])], key.alias("key"), value.alias("value")
    )


def read_fixed_length(
    spark: SparkSession, path: str, record_length: int
) -> DataFrame:
    """FixedLengthInputFormat: fixed-width binary records → one BinaryType
    column ``record``. Uses sc.binaryRecords (record-aligned splits, same
    guarantee as FixedLengthRecordReader)."""
    rdd = spark.sparkContext.binaryRecords(path, record_length)
    return spark.createDataFrame(rdd.map(lambda b: (bytearray(b),)), "record: binary")


def read_multiple_inputs(
    spark: SparkSession,
    inputs: list[tuple[str, Callable[[SparkSession, str], DataFrame]]],
) -> DataFrame:
    """MultipleInputs: (path, reader) pairs; each reader maps its path to a
    common schema, results unioned by name (TaggedInputSplit routing →
    unionByName)."""
    frames = [reader(spark, path) for path, reader in inputs]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def read_xml_records(
    spark: SparkSession,
    path: str,
    begin_tag: str = "<record>",
    end_tag: str = "</record>",
) -> DataFrame:
    """StreamXmlRecordReader (hadoop-streaming StreamXmlRecordReader.java —
    SURVEY §2.1): one row per XML-tag-delimited record.

    Splittable the same way the reference is: the scan splits on ``end_tag``
    (lineSep), so a record never spans split boundaries; content before the
    ``begin_tag`` (inter-record text) is discarded. Returns ``record`` =
    the text between the tags.
    """
    raw = spark.read.option("lineSep", end_tag).text(path)
    after_begin = F.regexp_extract(
        F.col("value"), re.escape(begin_tag) + r"([\s\S]*)", 1
    )
    return (
        raw.filter(F.col("value").contains(begin_tag))
        .select(after_begin.alias("record"))
    )


# --- SequenceFileInputFilter analogs (scan-time row filters) ---------------


def regex_filter(df: DataFrame, key_col: str, pattern: str) -> DataFrame:
    """RegexFilter (SequenceFileInputFilter.java:110): keep rows whose key
    matches."""
    return df.filter(F.col(key_col).rlike(pattern))


def percent_filter(
    df: DataFrame, frequency: int, order_by: list | None = None
) -> DataFrame:
    """PercentFilter (SequenceFileInputFilter.java:153): keep every f-th
    record in a deterministic record order.

    The reference counts records in scan order, which is well-defined for a
    sequence file but NOT for a distributed DataFrame (a monotonic id jumps
    at partition boundaries, so the kept set would depend on partitioning —
    the exact nondeterminism this fix removes). Callers therefore pass
    ``order_by`` — the total order standing in for scan order (typically the
    record key). The row index is assigned by the two-phase ``global_rank``
    (range partition + cumulative offsets), never a single-partition window.

    With ``order_by=None`` the filter degrades to the partitioning-dependent
    monotonic id (kept for parity experiments; do not use where determinism
    matters).
    """
    if order_by is None:
        return (
            df.withColumn("__rid", F.monotonically_increasing_id())
            .filter(F.col("__rid") % frequency == 0)
            .drop("__rid")
        )
    from ..operators.sort import global_rank

    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    ranked = global_rank(df, cols, rank_name="__rid")
    return ranked.filter((F.col("__rid") - 1) % frequency == 0).drop("__rid")


def md5_filter(df: DataFrame, key_col: str, frequency: int) -> DataFrame:
    """MD5Filter (:202): keep rows where hash(key) % f == 0. Uses md5 like the
    reference (deterministic across engines, unlike Spark's murmur hash)."""
    bucket = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
    return df.filter(bucket.cast("long") % frequency == 0)
