"""Hadoop Streaming pipe operator.

Re-expresses hadoop-streaming's PipeMapper/PipeReducer (PipeMapRed.java,
PipeMapper.java:79-81, StreamJob.java:281-283,417-475 — SURVEY §2.3/§3.3):
fork an external command per partition, feed records as separator-joined
lines on stdin, read lines back, split into key/value by the first
``num_key_fields`` fields.

Spark-first: ``rdd.pipe`` is exactly this boundary (one subprocess per
partition, streamed I/O — not per record). Column-oriented callers can use
``pipe_df``; byte-oriented jobs can drop to ``pipe_rdd``.

``io="rawbytes"`` is hadoop-streaming's untyped binary mode (length-prefixed
key/value byte blobs, RawBytes{Input,Output}Reader) — byte-clean transport
with no separator or type semantics.

``io="typedbytes"`` selects hadoop-streaming's binary record mode
(``-io typedbytes``, io/IdentifierResolver.java:36-37): records cross the
pipe as typedbytes frames (TypedBytesInput.java framing) wrapped one-per-line
in base64 (the line transport's analog of the reference's length-prefixed
binary stream), so the child sees and emits TYPED keys/values instead of
separator-joined text.

Scale: subprocess-per-partition is the same process model as the reference
(one pipe per map task); throughput is bounded by the child command, and
partition sizing controls parallelism.
"""

from __future__ import annotations

import base64
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .typedbytes import dumps_b64, loads_b64


def pipe_df(
    df: DataFrame,
    command: str,
    sep: str = "\t",
    num_key_fields: int = 1,
    env: dict[str, str] | None = None,
    io: str = "text",
    out_schema: str | StructType = "key string, value string",
) -> DataFrame:
    """Pipe a DataFrame through an external command.

    ``io="text"`` (default): input lines = all columns cast to string, joined
    by ``sep`` (the ``stream.map.output.field.separator`` default TAB).
    Output lines are split on ``sep``: first ``num_key_fields`` fields →
    ``key`` (re-joined by sep), rest → ``value``
    (``stream.num.map.output.key.fields`` semantics, PipeMapRed.java).

    ``io="typedbytes"``: each record crosses as a typedbytes (key, value)
    frame — key = the first ``num_key_fields`` columns (a single value, or a
    tuple→typedbytes vector when several), value = the remaining columns
    likewise. The child receives/emits base64-wrapped frames one per line
    (see ``typedbytes_child.py`` for the reference child). Decoded output
    rows are materialized under ``out_schema`` (default two strings; pass
    e.g. ``"key bigint, value bigint"`` when the child emits numerics).
    """
    if io == "typedbytes":
        return _pipe_typedbytes(df, command, num_key_fields, env, out_schema)
    if io == "rawbytes":
        return _pipe_rawbytes(df, command, sep, num_key_fields, env)
    if io != "text":
        raise ValueError(f"unknown pipe io mode {io!r} (text|rawbytes|typedbytes)")
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


def _pipe_typedbytes(
    df: DataFrame,
    command: str,
    num_key_fields: int,
    env: dict[str, str] | None,
    out_schema: str | StructType,
) -> DataFrame:
    spark = df.sparkSession
    nk = num_key_fields

    def encode(row) -> str:
        vals = tuple(row)
        key = vals[0] if nk == 1 else vals[:nk]
        rest = vals[nk:]
        value = rest[0] if len(rest) == 1 else rest
        return dumps_b64(key, value)

    piped = df.rdd.map(encode).pipe(command, env=env or {})

    def decode(line: str) -> tuple:
        key, value = loads_b64(line)
        k = (key,) if not isinstance(key, tuple) else key
        v = (value,) if not isinstance(value, tuple) else value
        return k + v

    return spark.createDataFrame(piped.map(decode), schema=out_schema)


def rawbytes_dumps(key: bytes, value: bytes) -> str:
    """One ``-io rawbytes`` record (io/RawBytesOutputReader framing): each of
    key and value as <4-byte big-endian length><raw bytes>, the pair wrapped
    in base64 for the line transport."""
    payload = struct.pack(">i", len(key)) + key + struct.pack(">i", len(value)) + value
    return base64.b64encode(payload).decode("ascii")


def rawbytes_loads(line: str) -> tuple[bytes, bytes]:
    raw = base64.b64decode(line)
    (klen,) = struct.unpack_from(">i", raw, 0)
    key = raw[4 : 4 + klen]
    (vlen,) = struct.unpack_from(">i", raw, 4 + klen)
    value = raw[8 + klen : 8 + klen + vlen]
    return key, value


def _pipe_rawbytes(
    df: DataFrame,
    command: str,
    sep: str,
    num_key_fields: int,
    env: dict[str, str] | None,
) -> DataFrame:
    """``-io rawbytes`` (io/IdentifierResolver.java:36-37, RawBytes{Input,
    Output}Reader): keys/values cross the pipe as length-prefixed raw byte
    blobs — no separator parsing, no typed decoding. Key = the first
    ``num_key_fields`` columns joined by ``sep`` as UTF-8 bytes, value =
    the remaining columns likewise; output frames come back as ``binary``
    columns (the child may emit arbitrary bytes)."""
    spark = df.sparkSession
    nk = num_key_fields

    def encode(row) -> str:
        vals = [("" if v is None else str(v)) for v in row]
        key = sep.join(vals[:nk]).encode("utf-8")
        value = sep.join(vals[nk:]).encode("utf-8")
        return rawbytes_dumps(key, value)

    piped = df.rdd.map(encode).pipe(command, env=env or {})
    return spark.createDataFrame(
        piped.map(rawbytes_loads), schema="key binary, value binary"
    )


def pipe_rdd(df: DataFrame, command: str, sep: str = "\t"):
    """Raw line pipe (``-io rawbytes`` spiritual equivalent): returns the
    RDD[str] of the command's stdout lines."""
    line_rdd = df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in df.columns])
    ).rdd.map(lambda r: r[0])
    return line_rdd.pipe(command)
