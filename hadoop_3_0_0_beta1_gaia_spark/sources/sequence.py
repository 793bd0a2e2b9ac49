"""SequenceFile container I/O.

Re-expresses SequenceFileInputFormat / SequenceFileOutputFormat and the
AsText variants (LIB/input/SequenceFileInputFormat.java,
SequenceFileAsTextInputFormat.java, LIB/output/SequenceFileOutputFormat.java —
SURVEY §2.1/§2.2/§1.3). The engine-native container is Parquet (columnar,
splittable, compressed — strictly stronger than SequenceFile's block
compression); these helpers keep byte-level interop with existing
SequenceFiles via the classic RDD API, which speaks the Writable formats
through Spark's built-in converters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_sequence_file(df: DataFrame, path: str) -> None:
    """SequenceFileOutputFormat: first column → key, second → value (Text/
    primitive Writables chosen by Spark's converters)."""
    cols = df.columns
    if len(cols) != 2:
        raise ValueError(f"sequence file needs exactly (key, value) columns, got {cols}")
    df.rdd.map(lambda r: (r[0], r[1])).saveAsSequenceFile(path)


def read_sequence_file(
    spark: SparkSession, path: str, schema: str = "key string, value string"
) -> DataFrame:
    """SequenceFileInputFormat (AsText flavor): K/V container → 2-column
    DataFrame."""
    rdd = spark.sparkContext.sequenceFile(path)
    return spark.createDataFrame(rdd, schema)
