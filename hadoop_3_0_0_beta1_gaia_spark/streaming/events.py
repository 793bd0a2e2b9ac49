"""Streaming over the events table: replay, windowed aggregation, late data.

Batch/stream parity is the design goal: ``windowed_counts`` applied to the
batch frame and to a replayed stream must agree (tested in
tests/test_streaming.py) — Structured Streaming's incremental execution of
the same logical plan.

Scale notes: watermark bounds state (late rows beyond 1 hour are dropped);
the shuffle for the windowed groupBy is keyed on (window, event_type) —
at high event-type cardinality add AQE/salting exactly as for batch skew.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Raw schema as stored (ts is parquet TIMESTAMP(NANOS) → read as long under
# the nanosAsLong conf; converted to TIMESTAMP_NTZ below, same as the batch
# path in session.table).
_EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source replay of the events table (readStream over the parquet
    glob; new files arriving under the path would stream incrementally).

    ``ts`` becomes a TIMESTAMP (instant) via exact integer micros — watermarks
    demand instant semantics (TIMESTAMP_NTZ is rejected). The stored naive
    nanos are taken as UTC wall-clock, matching the batch/DuckDB view.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file-stream source requires a DIRECTORY to watch; the testdata table
    # is a single parquet file. Stage a symlink dir (local-mode shim — in a
    # real deployment readStream points at the directory files arrive in).
    src = os.path.realpath(os.path.join(sf_dir, "events.parquet"))
    stage = os.path.join(
        "/tmp/gaia_spark_stream", sf_dir.strip("/").replace("/", "_"), "events"
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    stream = spark.readStream.schema(_EVENTS_RAW).parquet(stage)
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "1 hour") -> DataFrame:
    """Event-time tumbling-window counts with a late-data watermark. Works on
    both batch and streaming frames (streaming adds the state bound).

    ``ts`` must be TIMESTAMP (instant). Tumbling windows are epoch-aligned
    (pure duration arithmetic), and the window label is rebuilt from epoch
    seconds through TIMESTAMP_NTZ — so the output is identical under any
    session timezone (the driver's session may not be UTC).
    """
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    ntz_start = (
        "TIMESTAMP_NTZ '1970-01-01 00:00:00' "
        "+ make_dt_interval(0, 0, 0, unix_timestamp(w.start))"
    )
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.expr(ntz_start), "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_to_memory(stream_df: DataFrame, table_name: str, spark: SparkSession) -> DataFrame:
    """Drain a (bounded) stream into an in-memory sink with availableNow —
    the batch-replay harness used by the tests."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
