"""JDBC source/sink — the DBInputFormat / DataDrivenDBInputFormat family.

Re-expresses (SURVEY §2.1/§2.2):
- ``read_jdbc``             → DBInputFormat (LIB/db/DBInputFormat.java:327-356):
  table + fieldNames + WHERE conditions + ORDER BY.
- ``read_jdbc_partitioned`` → DataDrivenDBInputFormat
  (LIB/db/DataDrivenDBInputFormat.java): parallel scan split by per-column
  bounding-query ranges → ``spark.read.jdbc(partitionColumn, lowerBound,
  upperBound, numPartitions)``.
- ``integer_split_points`` / ``text_split_points`` / ``date_split_points`` →
  the splitter algorithms (LIB/db/IntegerSplitter.java:100-133,
  TextSplitter.java:144-226, DateSplitter.java, BigDecimalSplitter.java) —
  returned as boundary lists / WHERE-clause predicates for engines (or
  dialects) where Spark's single-column numeric partitioner isn't enough.
  Spark only supports numeric/date partition columns natively; TextSplitter
  predicates plug into ``spark.read.jdbc(predicates=[...])``.
- ``write_jdbc``            → DBOutputFormat (LIB/db/DBOutputFormat.java):
  batched INSERTs.

The split math is exact (``fractions.Fraction`` stands in for BigDecimal —
1/65536 places are binary fractions, so Fraction reproduces the reference's
arithmetic digit-for-digit).

No JDBC driver jar ships in this container, so the read/write wrappers are
thin pass-throughs exercised only when a driver is present; the splitter
logic (which the reference unit-tests in TestIntegerSplitter/TestTextSplitter)
is pure Python and fully tested.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from fractions import Fraction

from pyspark.sql import DataFrame, SparkSession

ONE_PLACE = 65536  # TextSplitter.ONE_PLACE
MAX_CHARS = 8  # TextSplitter.MAX_CHARS


# ---------------------------------------------------------------- numeric


def integer_split_points(num_splits: int, min_val: int, max_val: int) -> list[int]:
    """IntegerSplitter.split (LIB/db/IntegerSplitter.java:100-133): boundary
    list one longer than the split count; every interval is [lo, hi) except
    the last, which is closed. numSplits is a hint — an extra boundary appears
    when the range doesn't divide cleanly."""
    num_splits = max(1, num_splits)
    split_size = (max_val - min_val) // num_splits
    if split_size < 1:
        split_size = 1
    points: list[int] = []
    cur = min_val
    while cur <= max_val:
        points.append(cur)
        cur += split_size
    if points[-1] != max_val or len(points) == 1:
        points.append(max_val)
    return points


def date_split_points(
    num_splits: int, min_val: datetime, max_val: datetime
) -> list[datetime]:
    """DateSplitter: integer splitting over epoch milliseconds."""
    epoch = datetime(1970, 1, 1)
    lo = int((min_val - epoch).total_seconds() * 1000)
    hi = int((max_val - epoch).total_seconds() * 1000)
    return [epoch + timedelta(milliseconds=p) for p in integer_split_points(num_splits, lo, hi)]


# ------------------------------------------------------------------- text


def _string_to_fraction(s: str) -> Fraction:
    """TextSplitter.stringToBigDecimal: code points as base-65536 fraction
    digits (first MAX_CHARS chars)."""
    result = Fraction(0)
    place = Fraction(1, ONE_PLACE)
    for ch in s[:MAX_CHARS]:
        result += ord(ch) * place
        place /= ONE_PLACE
    return result


def _fraction_to_string(v: Fraction) -> str:
    """TextSplitter.bigDecimalToString: peel base-65536 digits back off."""
    out: list[str] = []
    cur = v
    for _ in range(MAX_CHARS):
        cur *= ONE_PLACE
        digit = int(cur)  # floor toward zero; cur >= 0 always
        cur -= digit
        if digit == 0 and cur == 0:
            break
        out.append(chr(digit))
        if cur == 0:
            break
    return "".join(out)


def _split_fractions(num_splits: int, lo: Fraction, hi: Fraction) -> list[Fraction]:
    """BigDecimalSplitter.split: min + k·(max−min)/n boundaries (exact)."""
    num_splits = max(1, num_splits)
    step = (hi - lo) / num_splits
    if step == 0:
        return [lo, hi]
    points: list[Fraction] = []
    cur = lo
    while cur <= hi:
        points.append(cur)
        cur += step
    if points[-1] != hi or len(points) == 1:
        points.append(hi)
    return points


def text_split_points(num_splits: int, min_string: str, max_string: str) -> list[str]:
    """TextSplitter.split (LIB/db/TextSplitter.java:144-169): shared prefix is
    factored out, the remainders are mapped to base-65536 fractions, split
    numerically, and mapped back to strings. First/last boundaries are forced
    to the user extrema."""
    shared = 0
    for c1, c2 in zip(min_string, max_string):
        if c1 != c2:
            break
        shared += 1
    prefix = min_string[:shared]
    lo_s, hi_s = min_string[shared:], max_string[shared:]
    raw = [
        prefix + _fraction_to_string(p)
        for p in _split_fractions(
            num_splits, _string_to_fraction(lo_s), _string_to_fraction(hi_s)
        )
    ]
    # MAX_CHARS truncation can push interpolated boundaries outside
    # [min, max] when the extrema are longer than 8 chars (the reference
    # carries the same rounding limitation); clamp so the emitted WHERE
    # ranges always tile [min, max] without gaps or inversions.
    inside = sorted({p for p in raw if min_string < p < max_string})
    return [min_string, *inside, max_string]


def text_split_predicates(
    num_splits: int, col: str, min_string: str, max_string: str
) -> list[str]:
    """DataDrivenDBInputSplit WHERE clauses for a text column — feed to
    ``spark.read.jdbc(url, table, predicates=...)`` (Spark's native
    partitioner only handles numeric/date columns)."""
    pts = text_split_points(num_splits, min_string, max_string)

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    preds = []
    for i in range(len(pts) - 1):
        hi_op = "<=" if i == len(pts) - 2 else "<"
        preds.append(f"{col} >= {q(pts[i])} AND {col} {hi_op} {q(pts[i + 1])}")
    return preds


# ----------------------------------------------------------- spark wrappers


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    field_names: list[str] | None = None,
    conditions: str | None = None,
    order_by: str | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """DBInputFormat: SELECT fieldNames FROM table WHERE conditions ORDER BY —
    pushed into the dbtable subquery so the database does the work."""
    cols = ", ".join(field_names) if field_names else "*"
    sql = f"SELECT {cols} FROM {table}"
    if conditions:
        sql += f" WHERE {conditions}"
    if order_by:
        sql += f" ORDER BY {order_by}"
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", f"({sql}) AS t"
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """DataDrivenDBInputFormat: parallel range scan (Spark generates the same
    >=/< clause-per-task split that the reference's splitters emit)."""
    return spark.read.jdbc(
        url,
        table,
        column=partition_column,
        lowerBound=lower_bound,
        upperBound=upper_bound,
        numPartitions=num_partitions,
        properties=properties or {},
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 1000,
    properties: dict[str, str] | None = None,
) -> None:
    """DBOutputFormat: batched INSERTs (batchsize ≙ the reference's statement
    batching in DBOutputFormat.getRecordWriter)."""
    props = {"batchsize": str(batch_size), **(properties or {})}
    df.write.jdbc(url, table, mode=mode, properties=props)
