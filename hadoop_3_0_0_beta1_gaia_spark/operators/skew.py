"""Skew-mitigation operators: salted two-phase aggregation and an as-of join.

Neither exists in the reference (its answer to skew is "write a smarter
Partitioner", Partitioner.java:58); these are the engine's scale extensions:

- ``salted_agg``: heavy-hitter keys overwhelm one reducer in a plain
  groupBy. Salting splits each key into ``num_salts`` sub-keys for the
  partial aggregate, then combines partials in a second (tiny) aggregate.
  Results are IDENTICAL to the unsalted groupBy — only the shuffle layout
  changes — so every salted query keeps its plain-SQL oracle. (AQE's
  skew-join splitting covers joins; this covers aggregations whose partial
  state is algebraic.)

- ``asof_join``: for each left row, the most recent right row at-or-before
  its timestamp, per key. Implemented scalably as union + last_value
  (ignore nulls) over a key-partitioned time window — one shuffle on the
  key, no per-key collect, no range self-join blowup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    partials: list[tuple[str, Column, Column]],
    num_salts: int = 16,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partials`` is a list of (name, partial_expr, combine_expr): the partial
    runs per (key, salt), the combine merges partials per key — e.g.
    ``("n", F.count("*"), F.sum("n"))`` or ``("s", F.sum("v"), F.sum("s"))``.
    ``salt_source`` picks the salt deterministically (defaults to a stable
    hash of all columns is NOT possible portably, so callers pass a column —
    any value column works; uniformity, not determinism of placement,
    is what matters for skew).
    """
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    if src is None:
        raise ValueError("salt_source column required")
    salt = (F.abs(F.hash(src)) % num_salts).alias("__salt")
    stage1 = df.groupBy(F.col(key), salt).agg(
        *[p.alias(name) for name, p, _ in partials]
    )
    return stage1.groupBy(key).agg(
        *[c.alias(name) for name, _, c in partials]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_salts: int = 8,
    salt_source: str | Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Salted replicated join for skewed keys.

    When one join key dominates (a heavy-hitter customer, a null-ish default),
    the plain shuffle join lands the whole key on one task. Salting spreads
    the BIG side across ``num_salts`` sub-partitions (salt = hash of
    ``salt_source``), replicates every SMALL-side row once per salt value
    (explode — ``num_salts``× the small side, which is the cheap side by
    assumption), and joins on (key, salt). For inner/left-family joins the
    results are IDENTICAL to the plain equi-join — each big row still meets
    exactly one copy of its matching small rows — only the shuffle layout
    changes, so salted queries keep their plain-SQL oracles. Right/full outer
    joins are REJECTED: every unmatched small-side row would be emitted once
    per salt replica (and matched-key/unmatched-salt combinations would add
    spurious null-extended rows). AQE's skew-join split covers the same need
    adaptively; this is the explicit form that also works with AQE off or
    under broadcast-threshold pressure.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left-family joins only, got {how!r}: "
            "the exploded small side would duplicate unmatched right rows "
            "num_salts times under right/full outer semantics"
        )
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    if src is None:
        raise ValueError("salt_source column required")
    b = big.withColumn("__salt_b", (F.abs(F.hash(src)) % num_salts).cast("int"))
    s = small.withColumn(
        "__salt_s", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    cond = (F.col(big_key) == F.col(small_key)) & (
        F.col("__salt_b") == F.col("__salt_s")
    )
    return b.join(s, cond, how).drop("__salt_b", "__salt_s")


def range_join_bucketed(
    probe: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bucket_days: int = 7,
) -> DataFrame:
    """Interval (range) join at scale: probe.ts ∈ [start, end).

    A naive non-equi join is a broadcast-nested-loop (quadratic). Bucketing
    time into ``bucket_days``-wide buckets turns it into an equi-join: each
    interval explodes into the few buckets it covers, each probe row maps to
    exactly one bucket, the bucket equi-join hash-shuffles, and the precise
    [start, end) predicate refines the candidates. Output = probe columns +
    interval columns. Intervals wider than a few buckets should raise
    ``bucket_days``; the explode factor is ceil(interval/bucket) + 1.
    """
    day = lambda c: F.datediff(F.col(c), F.to_date(F.lit("1970-01-01")))  # noqa: E731
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                (day(start) / bucket_days).cast("long"),
                (day(end) / bucket_days).cast("long"),
            )
        ),
    )
    pr = probe.withColumn("__b", (day(ts) / bucket_days).cast("long"))
    return (
        pr.join(iv, "__b")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("__b")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value: str,
    out_name: str | None = None,
) -> DataFrame:
    """As-of join: attach to each left row the latest ``right_value`` whose
    timestamp is <= the left row's timestamp, within the same ``key``.

    Union the sides tagged, then ``last_value(..., ignorenulls=True)`` over
    (key ORDER BY ts, side) with rows-unbounded-preceding — right rows sort
    before left rows at equal ts, giving inclusive (<=) semantics. One
    shuffle, linear state; ties among right rows at one ts resolve to the
    greatest (ts, right_value) pair deterministically.
    """
    out_name = out_name or f"asof_{right_value}"
    lcols = left.columns
    l = left.select(
        *lcols, F.lit(None).cast(right.schema[right_value].dataType).alias("__rv"),
        F.lit(1).alias("__side"),
    )
    r = right.select(
        *[
            F.col(c) if c in (key, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.col(right_value).alias("__rv"),
        F.lit(0).alias("__side"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("__side"), F.col("__rv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn(out_name, F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select(*lcols, out_name)
    )


def asof_tolerance_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value: str,
    tolerance_micros: int,
    out_name: str | None = None,
) -> DataFrame:
    """As-of join, direction='backward' WITH a tolerance (pandas
    ``merge_asof(tolerance=...)`` parity — the remaining public-API gap after
    the backward/forward/nearest trio, VERDICT r3 item 6): attach the latest
    ``right_value`` at-or-before each left row's timestamp, but only when the
    match is within ``tolerance_micros``; staler matches yield NULL (pandas
    keeps the row, nulls the value). The tolerance test is INCLUSIVE
    (dist == tolerance matches), like pandas.

    Same single-shuffle tagged-union construction as :func:`asof_join`, with
    the matched timestamp carried through the window so the tolerance check is
    a per-row integer subtraction — no second join, no range predicate.
    Timestamps compare at MICRO precision (the engine-wide nanos rule).
    Output: left columns + ``out_name`` + ``dist_micros`` (both NULL when no
    match within tolerance).
    """

    def micros(df: DataFrame) -> F.Column:
        kind = df.schema[ts].dataType.simpleString()
        if kind == "bigint":
            return F.expr(f"`{ts}` DIV 1000")
        if kind == "timestamp_ntz":
            return F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts}`)"
            )
        return F.unix_micros(F.col(ts))

    out_name = out_name or f"asof_{right_value}"
    lcols = left.columns
    l = left.select(
        *lcols,
        micros(left).alias("__t"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("__rv"),
        F.lit(None).cast("long").alias("__rt"),
        F.lit(1).alias("__side"),
    )
    r = right.select(
        *[
            F.col(c) if c == key else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        micros(right).alias("__t"),
        F.col(right_value).alias("__rv"),
        micros(right).alias("__rt"),
        F.lit(0).alias("__side"),
    )
    u = l.unionByName(r)
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("__t"), F.col("__side"), F.col("__rv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = (
        u.withColumn("__bv", F.last("__rv", ignorenulls=True).over(wb))
        .withColumn("__bt", F.last("__rt", ignorenulls=True).over(wb))
        .filter(F.col("__side") == 1)
    )
    dist = F.col("__t") - F.col("__bt")
    within = F.col("__bt").isNotNull() & (dist <= F.lit(tolerance_micros))
    return m.select(
        *lcols,
        F.when(within, F.col("__bv")).alias(out_name),
        F.when(within, dist).alias("dist_micros"),
    )


def asof_nearest_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value: str,
    tolerance_micros: int,
) -> DataFrame:
    """As-of join, direction='nearest' (the pandas merge_asof surface
    :func:`asof_join` doesn't cover): attach the ``right_value`` whose
    timestamp is CLOSEST to each left row's — backward or forward — within
    ``tolerance_micros``; exact ties prefer the backward (earlier-or-equal)
    match, pandas semantics.

    Same single-shuffle construction as :func:`asof_join` — union the tagged
    sides once, then TWO frames over the same (key, ts, side) sort: a
    backward rows-unbounded-preceding last_value and a forward
    rows-unbounded-following first_value. At equal micro timestamps right
    rows sort before left rows, so an equal-ts right row is backward
    (distance 0), never double-counted forward. No range self-join, linear
    state, one exchange — identical cost to the backward-only operator.

    Timestamps compare at MICRO precision (the engine-wide nanos rule).
    Output: left columns + nearest_value, direction ('backward'/'forward',
    NULL when nothing within tolerance), dist_micros.
    """
    def micros(df: DataFrame) -> F.Column:
        kind = df.schema[ts].dataType.simpleString()
        if kind == "bigint":
            return F.expr(f"`{ts}` DIV 1000")
        if kind == "timestamp_ntz":
            return F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts}`)"
            )
        return F.unix_micros(F.col(ts))

    lcols = left.columns
    l = left.select(
        *lcols,
        micros(left).alias("__t"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("__rv"),
        F.lit(None).cast("long").alias("__rt"),
        F.lit(1).alias("__side"),
    )
    r = right.select(
        *[
            F.col(c) if c == key else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        micros(right).alias("__t"),
        F.col(right_value).alias("__rv"),
        micros(right).alias("__rt"),
        F.lit(0).alias("__side"),
    )
    u = l.unionByName(r)
    order = [F.col("__t"), F.col("__side"), F.col("__rv")]
    wb = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    m = (
        u.withColumn("__bv", F.last("__rv", ignorenulls=True).over(wb))
        .withColumn("__bt", F.last("__rt", ignorenulls=True).over(wb))
        .withColumn("__fv", F.first("__rv", ignorenulls=True).over(wf))
        .withColumn("__ft", F.first("__rt", ignorenulls=True).over(wf))
        .filter(F.col("__side") == 1)
    )
    db = F.col("__t") - F.col("__bt")
    df_ = F.col("__ft") - F.col("__t")
    use_b = F.col("__bt").isNotNull() & (
        F.col("__ft").isNull() | (db <= df_)
    )
    use_f = F.col("__ft").isNotNull() & (
        F.col("__bt").isNull() | (df_ < db)
    )
    tol = F.lit(tolerance_micros)
    pick_b = use_b & (db <= tol)
    pick_f = use_f & (df_ <= tol)
    return m.select(
        *lcols,
        F.when(pick_b, F.col("__bv")).when(pick_f, F.col("__fv")).alias(
            "nearest_value"
        ),
        F.when(pick_b, F.lit("backward"))
        .when(pick_f, F.lit("forward"))
        .alias("direction"),
        F.when(pick_b, db).when(pick_f, df_).alias("dist_micros"),
    )
