"""Key-field sort/partition specs — Unix ``sort -k`` semantics.

Re-expresses KeyFieldBasedComparator / KeyFieldBasedPartitioner / KeyFieldHelper
(LIB/partition/KeyFieldBasedComparator.java:41-67, KeyFieldBasedPartitioner.java,
KeyFieldHelper.java:31-39,118-157 — SURVEY §2.4): option strings like

    ``-k2,2n -k3r``      (field 2 numeric asc, then field 3-to-end text desc)
    ``-k2.3,4.2``        (char 3 of field 2 through char 2 of field 4)

become Spark sort expressions (``orderBy``) and partition expressions
(``repartition``). Full grammar ``-kF[.C][,F2[.C2]][flags]`` with flags ``n``
(numeric) and ``r`` (reverse); fields and chars are 1-based. Following the
reference: an omitted end position means "to the end of the line", an end char
of 0 (or omitted) means "to the end of the end field", a begin char past the
line yields an empty key, and an end char past the end field bleeds into the
separator/next field but clamps at the line end (KeyFieldHelper.getEndOffset).
The parsed spec also generates matching DuckDB ORDER BY text so inventory
queries stay oracle-checkable.

Char-offset keys (and open-ended ``-kF`` keys) compare the raw joined slice as
ONE string, exactly like the reference's byte-range comparator; plain bounded
field ranges keep the per-field tuple comparison (equivalent for
separator-free fields, and friendlier to Catalyst pruning).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN = re.compile(r"-k\s*(\d+)(?:\.(\d+))?(?:,(\d+)(?:\.(\d+))?)?([nr]*)")

_LINE_END = 1 << 30  # "to end of line" substring length


@dataclass(frozen=True)
class KeyFieldSort:
    first: int  # 1-based first field
    last: int  # 1-based last field (inclusive); 0 = to end of line
    numeric: bool
    reverse: bool
    first_char: int = 1  # 1-based char offset within the first field
    last_char: int = 0  # 1-based char offset within the last field; 0 = field end

    @property
    def is_slice(self) -> bool:
        """True when the key is a raw line slice (char offsets or open end)
        rather than a whole-field tuple."""
        return self.last == 0 or self.first_char != 1 or self.last_char != 0


def parse_keyfield_spec(spec: str) -> list[KeyFieldSort]:
    """Parse '-k1,2n -k3.2,4.1r' into KeyFieldSort entries (KeyFieldHelper.java)."""
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
        first_char = int(m.group(2)) if m.group(2) else 1
        last = int(m.group(3)) if m.group(3) else 0  # 0 = end of line
        last_char = int(m.group(4)) if m.group(4) else 0  # 0 = end of field
        flags = m.group(5)
        if first < 1 or first_char < 1 or (last and last < first):
            raise ValueError(f"bad field numbers in {m.group(0)!r}")
        out.append(
            KeyFieldSort(first, last, "n" in flags, "r" in flags, first_char, last_char)
        )
        pos = m.end()
    if not out:
        raise ValueError(f"empty keyfield spec {spec!r}")
    return out


def _slice_key(arr: Column, ks: KeyFieldSort, sep: str) -> Column:
    """The raw key slice for char-offset / open-ended specs: the substring of
    the separator-joined line from (first, first_char) through (last,
    last_char), mirroring KeyFieldHelper.getStartOffset/getEndOffset."""
    line = F.array_join(arr, sep)
    sep_len = len(sep)
    if ks.first > 1:
        prefix = F.concat_ws(sep, *[F.element_at(arr, i) for i in range(1, ks.first)])
        start = F.length(prefix) + sep_len + ks.first_char
    else:
        start = F.lit(ks.first_char)
    if ks.last == 0:
        return line.substr(start, F.lit(_LINE_END))
    if ks.last_char == 0:
        # end of the last field == length of the join of fields 1..last
        end = F.length(
            F.concat_ws(sep, *[F.element_at(arr, i) for i in range(1, ks.last + 1)])
        )
    else:
        if ks.last > 1:
            last_prefix = F.concat_ws(
                sep, *[F.element_at(arr, i) for i in range(1, ks.last)]
            )
            field_start = F.length(last_prefix) + sep_len + 1
        else:
            field_start = F.lit(1)
        # an end char past the field bleeds into the separator/next field but
        # clamps at the line end (reference: `return end - 1`)
        end = F.least(field_start + ks.last_char - 1, F.length(line))
    return line.substr(start, F.greatest(end - start + 1, F.lit(0)))


def _field_cols(arr: Column, ks: KeyFieldSort, sep: str = "\t") -> list[Column]:
    if ks.is_slice:
        c = _slice_key(arr, ks, sep)
        if ks.numeric:
            c = c.cast("double")
        return [c.desc_nulls_last() if ks.reverse else c.asc_nulls_first()]
    cols = []
    for f_idx in range(ks.first, ks.last + 1):
        c = F.element_at(arr, f_idx)
        if ks.numeric:
            c = c.cast("double")
        cols.append(c.desc_nulls_last() if ks.reverse else c.asc_nulls_first())
    return cols


def keyfield_sort_columns(spec: str, arr: Column, sep: str = "\t") -> list[Column]:
    """Sort columns for df.orderBy from a '-k' spec over a split-array column."""
    return [c for ks in parse_keyfield_spec(spec) for c in _field_cols(arr, ks, sep)]


def keyfield_partition_columns(spec: str, arr: Column, sep: str = "\t") -> list[Column]:
    """Partition (grouping) columns from a '-k' spec — the
    KeyFieldBasedPartitioner analog: rows whose selected sub-fields are equal
    land in the same shuffle partition via ``df.repartition(n, *cols)``."""
    cols = []
    for ks in parse_keyfield_spec(spec):
        if ks.is_slice:
            cols.append(_slice_key(arr, ks, sep))
            continue
        for f_idx in range(ks.first, ks.last + 1):
            cols.append(F.element_at(arr, f_idx))
    return cols


def keyfield_sorted(
    df: DataFrame, spec: str, sep: str = "\t", line_col: str = "line"
) -> DataFrame:
    """Globally order a line DataFrame by a '-k' spec (RangePartitioning —
    the TotalOrderPartitioner path, see SURVEY §2.4)."""
    arr = F.split(F.col(line_col), re.escape(sep))
    return df.orderBy(*keyfield_sort_columns(spec, arr, sep))


def _duck_slice_key(parts: str, ks: KeyFieldSort, sep: str) -> str:
    """DuckDB twin of :func:`_slice_key` over a string_split list."""
    line = f"array_to_string({parts}, '{sep}')"
    sep_len = len(sep)
    if ks.first > 1:
        prefix = f"array_to_string(list_slice({parts}, 1, {ks.first - 1}), '{sep}')"
        start = f"(length({prefix}) + {sep_len} + {ks.first_char})"
    else:
        start = str(ks.first_char)
    if ks.last == 0:
        return f"substring({line}, {start})"
    if ks.last_char == 0:
        end = f"length(array_to_string(list_slice({parts}, 1, {ks.last}), '{sep}'))"
    else:
        if ks.last > 1:
            last_prefix = (
                f"array_to_string(list_slice({parts}, 1, {ks.last - 1}), '{sep}')"
            )
            field_start = f"(length({last_prefix}) + {sep_len} + 1)"
        else:
            field_start = "1"
        end = f"least({field_start} + {ks.last_char} - 1, length({line}))"
    return f"substring({line}, {start}, greatest({end} - {start} + 1, 0))"


def duckdb_order_by(spec: str, line_sql: str, sep: str = "\t") -> str:
    """DuckDB ORDER BY list equivalent to :func:`keyfield_sort_columns`."""
    parts = f"string_split({line_sql}, '{sep}')"
    terms = []
    for ks in parse_keyfield_spec(spec):
        if ks.is_slice:
            e = _duck_slice_key(parts, ks, sep)
            if ks.numeric:
                e = f"TRY_CAST({e} AS DOUBLE)"
            terms.append(
                f"{e} DESC NULLS LAST" if ks.reverse else f"{e} ASC NULLS FIRST"
            )
            continue
        for f_idx in range(ks.first, ks.last + 1):
            e = f"{parts}[{f_idx}]"
            if ks.numeric:
                e = f"CAST({e} AS DOUBLE)"
            if ks.reverse:
                terms.append(f"{e} DESC NULLS LAST")
            else:
                terms.append(f"{e} ASC NULLS FIRST")
    return ", ".join(terms)
