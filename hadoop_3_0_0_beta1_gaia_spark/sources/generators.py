"""Deterministic synthetic data generators.

Re-expresses the reference's generator jobs (SURVEY §2.1):
- TeraGen (MR-EX/terasort/TeraGen.java:203-242): N records of 10-byte key +
  90-byte value, seeded, with a job-level CRC32 checksum counter.
- RandomTextWriter / RandomWriter (MR-EX/RandomTextWriter.java,
  RandomWriter.java:79-248): seeded random words/KV.

Spark-first: ``spark.range(n)`` + md5-derived pseudo-randomness — pure
built-in expressions, fully parallel (range splits across the cluster), and
portable: the same record set is expressible in DuckDB SQL, so generator-
consuming pipelines (TeraSort, wordcount) remain oracle-checkable. Keys are
hex strings: lexicographic string order == unsigned byte order of the
underlying bytes, preserving TeraSort's ordering semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TERA_KEY_LEN = 20  # 20 hex chars ≙ TeraGen's 10-byte key
TERA_VALUE_LEN = 90

# Shared vocabulary for the RandomTextWriter analog (the reference embeds a
# 100-word list in RandomTextWriter.java; any fixed list works).
VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu red green blue gold"
).split()


def teragen(spark: SparkSession, n_rows: int, num_partitions: int | None = None) -> DataFrame:
    """Deterministic TeraGen: (kv_key, kv_value) hex-string records."""
    rng = spark.range(0, n_rows, 1, num_partitions) if num_partitions else spark.range(n_rows)
    i = F.col("id").cast("string")
    key = F.substring(F.md5(i), 1, TERA_KEY_LEN)
    value = F.substring(F.repeat(F.md5(F.concat(i, F.lit(":v"))), 3), 1, TERA_VALUE_LEN)
    return rng.select(key.alias("kv_key"), value.alias("kv_value"))


def duckdb_teragen(n_rows: int) -> str:
    return f"""
        SELECT substr(md5(i::VARCHAR), 1, {TERA_KEY_LEN}) AS kv_key,
               substr(repeat(md5(i::VARCHAR || ':v'), 3), 1, {TERA_VALUE_LEN}) AS kv_value
        FROM range(0, {n_rows}) t(i)
    """


def random_text(
    spark: SparkSession,
    n_rows: int,
    words_per_row: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """RandomTextWriter analog: seeded pseudo-random word rows (row_id, text).

    word j of row i = VOCAB[md5_60bit(i ## ':' ## j) % |VOCAB|] — identical in
    any engine with md5 + hex→int.
    """
    rng = spark.range(0, n_rows, 1, num_partitions) if num_partitions else spark.range(n_rows)
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(0), F.lit(words_per_row - 1)),
        lambda j: F.element_at(
            vocab,
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("id").cast("string"), F.lit(":"), j.cast("string"))),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long")
                % len(VOCAB)
            ).cast("int")
            + 1,
        ),
    )
    return rng.select(F.col("id").alias("row_id"), F.array_join(words, " ").alias("text"))


def duckdb_random_text(n_rows: int, words_per_row: int = 10) -> str:
    vocab_sql = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"
    h = "(('0x' || substr(md5(i::VARCHAR || ':' || j::VARCHAR), 1, 15))::BIGINT)"
    return f"""
        SELECT i AS row_id,
               array_to_string(list_transform(range(0, {words_per_row}),
                   j -> list_extract({vocab_sql}, CAST({h} % {len(VOCAB)} AS INT) + 1)), ' ') AS text
        FROM range(0, {n_rows}) t(i)
    """
