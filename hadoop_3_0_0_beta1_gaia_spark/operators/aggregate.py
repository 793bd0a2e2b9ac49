"""ValueAggregator framework — descriptor-driven multi-aggregate compiler.

Re-expresses the reference's declarative aggregation framework
(LIB/aggregate/* — SURVEY §2.5): descriptor strings name an aggregator type
applied per key. The reference registry (ValueAggregatorBaseDescriptor.java:39-83)
maps names → aggregator classes; here the same names map to Catalyst aggregate
expressions, so map-side partial aggregation (the Combiner,
MapTask.java:1594-1704) falls out of Catalyst's partial/final HashAggregate
for free.

Supported aggregator names (reference semantics, incl. the quirky ones):
- LongValueSum / DoubleValueSum            → sum
- LongValueMax / LongValueMin              → max/min over numeric
- StringValueMax / StringValueMin          → lexicographic max/min
- UniqValueCount[:cap]                     → EXACT distinct count; the cap
  TRUNCATES the set (UniqValueCount.java:63-75) — not an approximation —
  and the reference's insert-then-check loop retains cap + 1 items before
  stopping, so the capped report is least(count, cap + 1).
- ValueHistogram                           → stats over the *frequency
  distribution* of values (ValueHistogram.java:38-169): unique item count,
  min/median/max/mean/stddev of per-item frequencies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import duck_fround, fround


def _agg_expr(agg_type: str, value: Column, cap: int | None = None) -> Column:
    t = agg_type
    if t == "LongValueSum":
        return F.sum(value.cast("long"))
    if t == "DoubleValueSum":
        return F.sum(value.cast("double"))
    if t == "LongValueMax":
        return F.max(value.cast("long"))
    if t == "LongValueMin":
        return F.min(value.cast("long"))
    if t == "StringValueMax":
        return F.max(value.cast("string"))
    if t == "StringValueMin":
        return F.min(value.cast("string"))
    if t == "UniqValueCount":
        c = F.countDistinct(value)
        # Byte-exact cap fidelity: UniqValueCount.java:87-92 checks the set
        # size AFTER inserting (`numItems <= maxNumItems` where numItems is
        # the size from the PREVIOUS put), so the retained set grows to
        # maxNumItems + 1 before truncation kicks in — the report for a
        # stream with more than `cap` distinct values is cap + 1, not cap.
        return F.least(c, F.lit(cap + 1)) if cap is not None else c
    raise ValueError(f"unknown aggregator type {agg_type!r}")


def parse_descriptor(desc: str) -> tuple[str, int | None]:
    """Parse 'LongValueSum' or 'UniqValueCount:100' descriptor heads
    (ValueAggregatorBaseDescriptor.java:39-83 name registry)."""
    if ":" in desc:
        head, arg = desc.split(":", 1)
        return head, int(arg)
    return desc, None


def value_aggregate(
    df: DataFrame,
    key: str | Column,
    specs: dict[str, tuple[str, str | Column]],
) -> DataFrame:
    """Compile descriptors into one groupBy().agg().

    ``specs`` maps output column name -> (descriptor, value column). Example::

        value_aggregate(events, "event_type", {
            "total":  ("DoubleValueSum", "value"),
            "users":  ("UniqValueCount:100", "user_id"),
        })
    """
    aggs = []
    for out_name, (desc, value) in specs.items():
        head, cap = parse_descriptor(desc)
        v = F.col(value) if isinstance(value, str) else value
        aggs.append(_agg_expr(head, v, cap).alias(out_name))
    return df.groupBy(key).agg(*aggs)


def value_histogram(
    df: DataFrame, key: str, item: str, round_digits: int = 4, top_n: int = 5
) -> DataFrame:
    """ValueHistogram report per key (ValueHistogram.java:83-134).

    Two-stage: count frequency per (key, item), then summarize the frequency
    distribution. Both stages are shuffle-on-key hash aggregates with map-side
    partial aggregation — scales linearly; no per-key collect.

    Output columns: key, unique_items, min_freq, median_freq, max_freq,
    mean_freq, stddev_freq (population stddev, as the reference computes over
    the full list), plus ``top_items`` — the raw item/count detail list of
    ValueHistogram.getReportDetails (ValueHistogram.java:136-150), truncated
    to the ``top_n`` heaviest items in deterministic (count DESC, item ASC)
    order and rendered ``item=count,...``. The rank runs in the same key
    partitioning as the stats aggregate (no extra shuffle), and only the
    ≤ top_n surviving structs are collected per key (bounded state, unlike
    the reference's whole in-memory TreeMap).
    """
    from pyspark.sql import Window

    freq = df.groupBy(F.col(key).alias(key), F.col(item).alias("__item")).agg(
        F.count("*").alias("__freq")
    )
    w = Window.partitionBy(key).orderBy(F.col("__freq").desc(), F.col("__item"))
    ranked = freq.withColumn("__rk", F.row_number().over(w))
    top_struct = F.when(
        F.col("__rk") <= top_n,
        F.struct(
            F.col("__rk").alias("rk"),
            F.concat_ws(
                "=", F.col("__item").cast("string"), F.col("__freq").cast("string")
            ).alias("s"),
        ),
    )
    return ranked.groupBy(key).agg(
        F.count("*").alias("unique_items"),
        F.min("__freq").alias("min_freq"),
        fround(F.median("__freq"), round_digits).alias("median_freq"),
        F.max("__freq").alias("max_freq"),
        fround(F.avg("__freq"), round_digits).alias("mean_freq"),
        F.round(F.stddev_pop("__freq"), round_digits).alias("stddev_freq"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(top_struct)), lambda x: x["s"]),
            ",",
        ).alias("top_items"),
    )


def duckdb_value_histogram(
    table: str, key: str, item: str, round_digits: int = 4, top_n: int = 5
) -> str:
    """DuckDB oracle equivalent of :func:`value_histogram`."""
    return f"""
        WITH freq AS (
            SELECT {key} AS k, {item} AS item, count(*) AS f
            FROM {table} GROUP BY 1, 2
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY k ORDER BY f DESC, item) AS rk
            FROM freq
        )
        SELECT k AS {key},
               count(*) AS unique_items,
               min(f) AS min_freq,
               {duck_fround('median(f)', round_digits)} AS median_freq,
               max(f) AS max_freq,
               {duck_fround('avg(f)', round_digits)} AS mean_freq,
               round(stddev_pop(f), {round_digits}) AS stddev_freq,
               coalesce(string_agg(
                   CASE WHEN rk <= {top_n}
                        THEN item::VARCHAR || '=' || f::VARCHAR END,
                   ',' ORDER BY rk), '') AS top_items
        FROM ranked GROUP BY k
    """
