"""Hadoop Streaming pipe operator.

Re-expresses hadoop-streaming's PipeMapper/PipeReducer (PipeMapRed.java,
PipeMapper.java:79-81, StreamJob.java:281-283,417-475 — SURVEY §2.3/§3.3):
fork an external command per partition, feed records as separator-joined
lines on stdin, read lines back, split into key/value by the first
``num_key_fields`` fields.

Spark-first: ``rdd.pipe`` is exactly this boundary (one subprocess per
partition, streamed I/O — not per record). Column-oriented callers can use
``pipe_df``; byte-oriented jobs can drop to ``pipe_rdd``.

Scale: subprocess-per-partition is the same process model as the reference
(one pipe per map task); throughput is bounded by the child command, and
partition sizing controls parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def pipe_df(
    df: DataFrame,
    command: str,
    sep: str = "\t",
    num_key_fields: int = 1,
    env: dict[str, str] | None = None,
) -> DataFrame:
    """Pipe a DataFrame through an external command.

    Input lines = all columns cast to string, joined by ``sep`` (the
    ``stream.map.output.field.separator`` default TAB). Output lines are split
    on ``sep``: first ``num_key_fields`` fields → ``key`` (re-joined by sep),
    rest → ``value`` (``stream.num.map.output.key.fields`` semantics,
    PipeMapRed.java).
    """
    spark = df.sparkSession
    line_df = df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in df.columns]).alias(
            "line"
        )
    )
    piped = line_df.rdd.map(lambda r: r[0]).pipe(command, env=env or {})

    def split_line(line: str) -> tuple[str, str]:
        parts = line.split(sep)
        key = sep.join(parts[:num_key_fields])
        value = sep.join(parts[num_key_fields:])
        return key, value

    schema = StructType(
        [
            StructField("key", StringType(), True),
            StructField("value", StringType(), True),
        ]
    )
    return spark.createDataFrame(piped.map(split_line), schema)


def pipe_rdd(df: DataFrame, command: str, sep: str = "\t"):
    """Raw line pipe (``-io rawbytes`` spiritual equivalent): returns the
    RDD[str] of the command's stdout lines."""
    line_rdd = df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in df.columns])
    ).rdd.map(lambda r: r[0])
    return line_rdd.pipe(command)
