"""Field-selection operator — `cut(1)`-style projection over delimited lines.

Re-expresses the reference's FieldSelection family
(LIB/fieldsel/FieldSelectionHelper.java:37-71, FieldSelectionMapper.java,
FieldSelectionReducer.java — SURVEY §2.3): a spec string

    ``keyFieldSpecs ':' valueFieldSpecs``

where each side is a comma-separated list of ``n`` (single field),
``a-b`` (inclusive range) or ``a-`` (field a through end of record), all
0-based. The operator splits each line on a separator (default TAB), joins the
selected key fields with the separator into a ``key`` column and the selected
value fields into a ``value`` column.

Spark-first: the whole projection is built-in expressions (split / slice /
concat_ws) — JVM-side, whole-stage-codegen friendly, no Python UDF. The same
parsed spec also generates an equivalent DuckDB SQL expression so inventory
queries stay oracle-checkable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldSpec:
    start: int
    end: int | None  # inclusive; None = through end of record


def parse_field_specs(spec: str) -> list[FieldSpec]:
    """Parse one side of a field-selection spec ("0-2,4,6-")."""
    out: list[FieldSpec] = []
    if not spec:
        return out
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        m = re.fullmatch(r"(\d+)-(\d*)", part)
        if m:
            start = int(m.group(1))
            end = int(m.group(2)) if m.group(2) else None
            if end is not None and end < start:
                raise ValueError(f"bad field range {part!r}")
            out.append(FieldSpec(start, end))
        elif part.isdigit():
            out.append(FieldSpec(int(part), int(part)))
        else:
            raise ValueError(f"bad field spec {part!r}")
    return out


def parse_spec(spec: str) -> tuple[list[FieldSpec], list[FieldSpec]]:
    """Split a full "keySpecs:valueSpecs" spec (FieldSelectionHelper.java:37-71)."""
    if ":" not in spec:
        raise ValueError(f"spec must contain ':' — got {spec!r}")
    key_part, value_part = spec.split(":", 1)
    return parse_field_specs(key_part), parse_field_specs(value_part)


def _select_expr(arr: Column, specs: list[FieldSpec], sep: str) -> Column:
    """Join the selected fields of a split-array with sep (1-based slice math)."""
    pieces = []
    for fs in specs:
        if fs.end is None:
            pieces.append(F.slice(arr, fs.start + 1, F.greatest(F.size(arr) - fs.start, F.lit(0))))
        else:
            pieces.append(F.slice(arr, fs.start + 1, fs.end - fs.start + 1))
    if not pieces:
        return F.lit("")
    return F.array_join(F.flatten(F.array(*pieces)), sep)


def field_select(
    df: DataFrame, spec: str, sep: str = "\t", line_col: str = "line"
) -> DataFrame:
    """Apply a field-selection spec to a one-string-column DataFrame →
    (key string, value string)."""
    key_specs, value_specs = parse_spec(spec)
    arr = F.split(F.col(line_col), re.escape(sep))
    return df.select(
        _select_expr(arr, key_specs, sep).alias("key"),
        _select_expr(arr, value_specs, sep).alias("value"),
    )


# ---------------------------------------------------------------------------
# DuckDB-side codegen (for oracle parity checks)
# ---------------------------------------------------------------------------


def _duckdb_select_expr(parts: str, specs: list[FieldSpec], sep: str) -> str:
    pieces = []
    for fs in specs:
        if fs.end is None:
            pieces.append(f"list_slice({parts}, {fs.start + 1}, len({parts}))")
        else:
            pieces.append(f"list_slice({parts}, {fs.start + 1}, {fs.end + 1})")
    if not pieces:
        return "''"
    inner = pieces[0] if len(pieces) == 1 else "flatten([" + ", ".join(pieces) + "])"
    return f"array_to_string({inner}, '{sep}')"


def duckdb_field_select(line_sql: str, spec: str, sep: str = "\t") -> tuple[str, str]:
    """Generate (key_sql, value_sql) DuckDB expressions equivalent to
    :func:`field_select` over the expression ``line_sql``."""
    key_specs, value_specs = parse_spec(spec)
    parts = f"string_split({line_sql}, '{sep}')"
    return (
        _duckdb_select_expr(parts, key_specs, sep),
        _duckdb_select_expr(parts, value_specs, sep),
    )
