"""Key-field sort/partition specs — Unix ``sort -k`` semantics.

Re-expresses KeyFieldBasedComparator / KeyFieldBasedPartitioner / KeyFieldHelper
(LIB/partition/KeyFieldBasedComparator.java:41-67, KeyFieldBasedPartitioner.java,
KeyFieldHelper.java — SURVEY §2.4): option strings like

    ``-k2,2n -k3,3r``  (field 2 numeric asc, then field 3 text desc; 1-based)

become Spark sort expressions (``orderBy``) and partition expressions
(``repartition``). We support field-level specs ``-kF[,T][flags]`` with flags
``n`` (numeric) and ``r`` (reverse); char-offset sub-addressing (``-k2.3``)
is intentionally out of scope (not exercised by the reference's own tests we
mirror). The parsed spec also generates matching DuckDB ORDER BY text so
inventory queries stay oracle-checkable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(r"-k\s*(\d+)(?:,(\d+))?([nr]*)")


@dataclass(frozen=True)
class KeyFieldSort:
    first: int  # 1-based first field
    last: int  # 1-based last field (inclusive)
    numeric: bool
    reverse: bool


def parse_keyfield_spec(spec: str) -> list[KeyFieldSort]:
    """Parse '-k1,2n -k3r' into KeyFieldSort entries (KeyFieldHelper.java)."""
    out: list[KeyFieldSort] = []
    pos = 0
    spec = spec.strip()
    while pos < len(spec):
        m = _TOKEN.match(spec, pos)
        if not m:
            if spec[pos].isspace():
                pos += 1
                continue
            raise ValueError(f"bad keyfield spec at {spec[pos:]!r}")
        first = int(m.group(1))
        last = int(m.group(2)) if m.group(2) else first
        flags = m.group(3)
        if first < 1 or last < first:
            raise ValueError(f"bad field numbers in {m.group(0)!r}")
        out.append(KeyFieldSort(first, last, "n" in flags, "r" in flags))
        pos = m.end()
    if not out:
        raise ValueError(f"empty keyfield spec {spec!r}")
    return out


def _field_cols(arr: Column, ks: KeyFieldSort) -> list[Column]:
    cols = []
    for f_idx in range(ks.first, ks.last + 1):
        c = F.element_at(arr, f_idx)
        if ks.numeric:
            c = c.cast("double")
        cols.append(c.desc_nulls_last() if ks.reverse else c.asc_nulls_first())
    return cols


def keyfield_sort_columns(spec: str, arr: Column) -> list[Column]:
    """Sort columns for df.orderBy from a '-k' spec over a split-array column."""
    return [c for ks in parse_keyfield_spec(spec) for c in _field_cols(arr, ks)]


def keyfield_partition_columns(spec: str, arr: Column) -> list[Column]:
    """Partition (grouping) columns from a '-k' spec — the
    KeyFieldBasedPartitioner analog: rows whose selected sub-fields are equal
    land in the same shuffle partition via ``df.repartition(n, *cols)``."""
    cols = []
    for ks in parse_keyfield_spec(spec):
        for f_idx in range(ks.first, ks.last + 1):
            cols.append(F.element_at(arr, f_idx))
    return cols


def keyfield_sorted(
    df: DataFrame, spec: str, sep: str = "\t", line_col: str = "line"
) -> DataFrame:
    """Globally order a line DataFrame by a '-k' spec (RangePartitioning —
    the TotalOrderPartitioner path, see SURVEY §2.4)."""
    arr = F.split(F.col(line_col), re.escape(sep))
    return df.orderBy(*keyfield_sort_columns(spec, arr))


def duckdb_order_by(spec: str, line_sql: str, sep: str = "\t") -> str:
    """DuckDB ORDER BY list equivalent to :func:`keyfield_sort_columns`."""
    parts = f"string_split({line_sql}, '{sep}')"
    terms = []
    for ks in parse_keyfield_spec(spec):
        for f_idx in range(ks.first, ks.last + 1):
            e = f"{parts}[{f_idx}]"
            if ks.numeric:
                e = f"CAST({e} AS DOUBLE)"
            if ks.reverse:
                terms.append(f"{e} DESC NULLS LAST")
            else:
                terms.append(f"{e} ASC NULLS FIRST")
    return ", ".join(terms)
