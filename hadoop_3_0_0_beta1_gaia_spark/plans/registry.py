"""Registry of inventory queries.

Every operator from SURVEY §2 that we claim as implemented is declared here as
an ``InventoryEntry``: a Spark builder ``(spark, sf_dir) -> DataFrame`` plus,
where SQL-expressible, an equivalent DuckDB oracle SQL string. The driver runs
both sides at sf=0.01 and hash-compares (order-insensitive, columns sorted by
name) — so every computed column is aliased identically on both sides and
floating-point aggregates are rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class InventoryEntry:
    name: str
    build: SparkBuilder
    oracle: str | None  # DuckDB SQL over pre-registered views; None => rows-only check
    ref: str  # reference file:line citation (SURVEY §2)


_REGISTRY: dict[str, InventoryEntry] = {}


def register(name: str, oracle: str | None = None, ref: str = ""):
    """Decorator: add a Spark builder to the inventory."""

    def deco(fn: SparkBuilder) -> SparkBuilder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate inventory entry {name!r}")
        _REGISTRY[name] = InventoryEntry(name, fn, oracle, ref)
        return fn

    return deco


def all_entries() -> dict[str, InventoryEntry]:
    # Import query modules lazily so registration happens on first use.
    from . import dedup_sim, media_stream, mrops, relational, textops  # noqa: F401

    return dict(_REGISTRY)


def queries() -> dict[str, SparkBuilder]:
    return {name: e.build for name, e in all_entries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: e.oracle for name, e in all_entries().items() if e.oracle}
