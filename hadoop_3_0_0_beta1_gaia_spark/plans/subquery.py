"""Subquery / decision-support surface (SURVEY §2.5-§2.6 composition).

The reference expresses every decision-support shape as a chain of MR jobs
(join job → aggregate job → filter job, e.g. the datajoin and aggregate
example drivers); Catalyst plans the same shapes from a single declarative
query. This module adds the subquery idioms the rest of the inventory doesn't
exercise: EXISTS (semi join + grouped count), NOT IN (Spark's null-aware anti
join, planned from real SQL), scalar subqueries (aggregate threshold compared
via exact integer cross-multiplication — no float boundary), HAVING over a
grouped pre-aggregate joined back to facts, conditional (CASE) aggregation,
argmax-per-group, and the percent_rank/cume_dist window surface.

Portability rules follow NOTES.md: money goes through DECIMAL(18,2) and is
emitted as exact BIGINT cents; integral double sums (l_quantity) CAST to
BIGINT; ratios of exact integers use the shared fround contract; DuckDB
BIGINT sums are re-CAST to BIGINT (its sum() widens to HUGEINT, which the
driver hashes as decimal128).

100 TB posture: every query here is a shuffle-join/aggregate pipeline whose
small side (negative-balance suppliers, the 1-row scalar aggregate, the
HAVING survivors) broadcasts under AQE; nothing collects to the driver and
no window runs unpartitioned.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import duck_fround, fround
from ..session import table as T
from .registry import register

_CENTS = "CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _cents(col: str) -> F.Column:
    return (F.col(col).cast("decimal(18,2)") * 100).cast("long")


# ---------------------------------------------------------------------------
# Q14 shape: conditional (CASE) aggregation over a fact-dim join
# ---------------------------------------------------------------------------


@register(
    "promo_revenue_monthly",
    oracle=f"""
        SELECT month,
               CAST(promo_units AS BIGINT) AS promo_units,
               CAST(total_units AS BIGINT) AS total_units,
               {duck_fround("CAST(promo_units AS DOUBLE) / total_units", 6)} AS promo_share
        FROM (
            SELECT strftime(l_shipdate, '%Y-%m') AS month,
                   sum(CASE WHEN p_type = 'PROMO'
                            THEN {_CENTS.format(c='l_extendedprice')}
                                 * (100 - {_CENTS.format(c='l_discount')})
                            ELSE 0 END) AS promo_units,
                   sum({_CENTS.format(c='l_extendedprice')}
                       * (100 - {_CENTS.format(c='l_discount')})) AS total_units
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY month
        )
    """,
    ref="TPC-H Q14 shape — the reference's conditional-sum idiom is a Mapper "
    "emitting tagged values into LongSumReducer (LIB/map/RegexMapper.java + "
    "aggregate framework); here one CASE inside the agg. Revenue is exact integer "
    "'cents x (100 - discount cents)' units so the promo share is a ratio of exact "
    "BIGINTs (fround-portable), never a float-sum ratio. Part is a bounded dim -> "
    "broadcast under AQE; the only shuffle is the monthly groupBy.",
)
def promo_revenue_monthly(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    units = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    joined = li.join(p, li.l_partkey == p.p_partkey).select(
        F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        F.when(F.col("p_type") == "PROMO", units).otherwise(F.lit(0)).alias("pu"),
        units.alias("tu"),
    )
    return joined.groupBy("month").agg(
        F.sum("pu").alias("promo_units"),
        F.sum("tu").alias("total_units"),
    ).select(
        "month",
        "promo_units",
        "total_units",
        fround(F.col("promo_units").cast("double") / F.col("total_units"), 6).alias(
            "promo_share"
        ),
    )


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS -> semi join, grouped count
# ---------------------------------------------------------------------------


@register(
    "order_priority_exists",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    ref="TPC-H Q4 shape — the reference's existence test is a reduce-side join "
    "keeping keys present on both inputs (datajoin DataJoinReducerBase.java "
    "cross-product with a presence guard); Spark plans EXISTS as LeftSemi, "
    "deduplicating the probe side inside the join (no distinct pre-shuffle).",
)
def order_priority_exists(spark, sf_dir):
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    returned = (
        T(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Q16 shape: NOT IN -> null-aware anti join, planned from real SQL
# ---------------------------------------------------------------------------


@register(
    "supplier_cnt_notin",
    oracle="""
        SELECT p_brand, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type <> 'PROMO'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
    """,
    ref="TPC-H Q16 shape — the reference excludes a blacklist via a replicated "
    "hash-set lookup in the mapper (DistributedCache + setup(), SURVEY §2.6); "
    "Spark plans the NOT IN subquery as a null-aware anti join with the tiny "
    "blacklist broadcast. Expressed as real SQL (temp views) so the planner, not "
    "the author, picks NullAwareAntiJoin vs LeftAnti.",
)
def supplier_cnt_notin(spark, sf_dir):
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    T(spark, sf_dir, "part").createOrReplaceTempView("sq_part")
    T(spark, sf_dir, "supplier").createOrReplaceTempView("sq_supplier")
    return spark.sql(
        """
        SELECT p_brand, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM sq_lineitem JOIN sq_part ON p_partkey = l_partkey
        WHERE p_type <> 'PROMO'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM sq_supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
        """
    )


# ---------------------------------------------------------------------------
# Q18 shape: HAVING over a grouped pre-aggregate, joined back to the facts
# ---------------------------------------------------------------------------


@register(
    "large_volume_customers",
    oracle=f"""
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               {_CENTS.format(c='o_totalprice')} AS totalprice_cents,
               CAST(sum_qty AS BIGINT) AS sum_qty
        FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 250) big
        JOIN orders   ON o_orderkey = big.l_orderkey
        JOIN customer ON c_custkey = o_custkey
    """,
    ref="TPC-H Q18 shape — the reference chains an aggregate job (sum per key), a "
    "filter job (threshold), then a join job back to two fact tables (JobControl "
    "DAG, SURVEY §2.9); one declarative chain here. The HAVING survivors are a "
    "tiny frame -> AQE broadcasts them into both joins. l_quantity is integral in "
    "the testdata so the double sum is exact and CASTs losslessly to BIGINT.",
)
def large_volume_customers(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _cents("o_totalprice").alias("totalprice_cents"),
            F.col("sum_qty").cast("long").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 shape: scalar subquery threshold + NOT EXISTS anti join
# ---------------------------------------------------------------------------


@register(
    "idle_customers_topbal",
    oracle="""
        WITH avg_bal AS (
            SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_cents,
                   count(*) AS n
            FROM customer WHERE c_acctbal > 0
        )
        SELECT c_mktsegment,
               count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) * 100 AS BIGINT) AS bal_cents
        FROM customer c, avg_bal
        WHERE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * n > sum_cents
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment
    """,
    ref="TPC-H Q22 shape — the reference computes the global average in a first "
    "job, ships it via the job conf, and filters in a second mapper (SURVEY §2.9 "
    "counter/conf plumbing); here the 1-row aggregate cross-joins (broadcast) into "
    "the filter. The above-average test is exact integer cross-multiplication "
    "(acctbal_cents * n > sum_cents) so no float-average boundary can flip a row "
    "between engines; the recency test is a NOT EXISTS anti join.",
)
def idle_customers_topbal(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(F.col("c_acctbal").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("sum_cents"),
            F.count("*").alias("n"),
        )
    )
    recent = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(_cents("c_acctbal") * F.col("n") > F.col("sum_cents"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum(F.col("c_acctbal").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("bal_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Argmax-per-group (the reference's secondary-sort "pick max per key" idiom)
# ---------------------------------------------------------------------------


@register(
    "top_supplier_per_part",
    oracle="""
        SELECT partkey, suppkey, qty
        FROM (
            SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                   CAST(sum(l_quantity) AS BIGINT) AS qty,
                   CAST(max(CAST(sum(l_quantity) AS BIGINT))
                        OVER (PARTITION BY l_partkey) AS BIGINT) AS mx
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#2'
            GROUP BY l_partkey, l_suppkey
        ) WHERE qty = mx
    """,
    ref="secondary-sort argmax idiom (SecondarySort example, SURVEY §2.4: sort "
    "values within a key, reducer keeps the first) re-expressed as grouped sum + "
    "windowed max + equality filter — ties kept, exactly the reference's "
    "grouping-comparator behavior when several values share the max. The window "
    "partitions on the grouping key, so it reuses the groupBy shuffle (no extra "
    "exchange at scale).",
)
def top_supplier_per_part(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    ps = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        ps.withColumn("mx", F.max("qty").over(w))
        .filter(F.col("qty") == F.col("mx"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "qty",
        )
    )


# ---------------------------------------------------------------------------
# percent_rank / cume_dist window surface
# ---------------------------------------------------------------------------


@register(
    "customer_balance_percentile",
    oracle=f"""
        SELECT c_custkey, c_mktsegment,
               {duck_fround("percent_rank() OVER w", 6)} AS bal_pct_rank,
               {duck_fround("cume_dist() OVER w", 6)} AS bal_cume_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
    """,
    ref="rank-distribution window surface (complements order_price_deciles' ntile "
    "and global_sort_rank's rank): percent_rank/cume_dist are ratios of exact "
    "integer ranks so fround is bit-portable; tied acctbals get identical values "
    "in both engines regardless of physical order, so the output is total-order "
    "independent. Partitioned window — never a single-partition sort.",
)
def customer_balance_percentile(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        fround(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        fround(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    )


# ---------------------------------------------------------------------------
# RANGE-interval window frame (value-based, not row-based)
# ---------------------------------------------------------------------------


@register(
    "customer_30d_order_value",
    oracle=f"""
        SELECT o_orderkey, o_custkey, day,
               CAST(sum(price_cents) OVER (
                   PARTITION BY o_custkey ORDER BY day
                   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS trailing_30d_cents
        FROM (
            SELECT o_orderkey, o_custkey,
                   CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day,
                   {_CENTS.format(c='o_totalprice')} AS price_cents
            FROM orders
        )
    """,
    ref="RANGE-frame window (value-based frame — complements running_total_"
    "supplier's ROWS frame): per customer, the trailing-30-day order value. "
    "RANGE frames are tie-safe by construction (all orders on the same day "
    "share the frame, so the sum is order-free — no nanos-tie exposure), and "
    "the frame key is integer epoch-days so both engines bound it exactly. "
    "Money is exact BIGINT cents; window partitions hold one customer's "
    "orders — bounded, never a global sort",
)
def customer_30d_order_value(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)").alias("day"),
        _cents("o_totalprice").alias("price_cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day",
        F.sum("price_cents").over(w).cast("long").alias("trailing_30d_cents"),
    )


# ---------------------------------------------------------------------------
# unpivot (wide -> long), the inverse of events_pivot_daily
# ---------------------------------------------------------------------------


@register(
    "unpivot_flag_metrics",
    oracle=f"""
        WITH wide AS (
            SELECT l_returnflag AS flag,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
                       AS sum_price_cents,
                   count(*) AS n_items
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT flag, metric, value
        FROM wide
        UNPIVOT (value FOR metric IN (sum_qty, sum_price_cents, n_items))
    """,
    ref="unpivot / melt (wide -> long, the inverse of events_pivot_daily's "
    "pivot): three per-flag aggregates become (flag, metric, value) rows via "
    "DataFrame.unpivot — map-side reshaping of the already-aggregated frame, "
    "zero additional shuffle. All measures are exact BIGINT so the shared "
    "value column has one type on both engines",
)
def unpivot_flag_metrics(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    wide = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("long")
        .alias("sum_price_cents"),
        F.count("*").alias("n_items"),
    )
    return wide.unpivot(
        ids=["flag"],
        values=["sum_qty", "sum_price_cents", "n_items"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# multiset EXCEPT ALL (bag semantics — complements the DISTINCT set ops)
# ---------------------------------------------------------------------------


@register(
    "set_except_all_parts",
    oracle="""
        SELECT l_partkey FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
        EXCEPT ALL
        SELECT l_partkey FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P')
    """,
    ref="EXCEPT ALL — bag semantics (each duplicate consumed once), vs "
    "set_except's DISTINCT semantics: part keys shipped in completed ('F') "
    "orders minus, with multiplicity, those in pending ('P') orders. Spark "
    "plans exceptAll as a counted anti-pattern (aggregate multiplicities, "
    "subtract, re-expand) — one shuffle per side plus the merge, no distinct "
    "pre-pass. The semi-join order filters push into both scans",
)
def set_except_all_parts(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")

    def side(status):
        keys = o.filter(F.col("o_orderstatus") == status).select("o_orderkey")
        return li.join(keys, li.l_orderkey == keys.o_orderkey, "leftsemi").select(
            "l_partkey"
        )

    return side("F").exceptAll(side("P"))


# ---------------------------------------------------------------------------
# monotone frontier (running-record detection via an exclusive RANGE frame)
# ---------------------------------------------------------------------------


@register(
    "record_breaking_orders",
    oracle=f"""
        SELECT o_orderkey, day, price_cents
        FROM (
            SELECT o_orderkey, day, price_cents,
                   max(price_cents) OVER (
                       ORDER BY day
                       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS prior_max
            FROM (
                SELECT o_orderkey,
                       CAST(epoch(o_orderdate) // 86400 AS BIGINT) AS day,
                       {_CENTS.format(c='o_totalprice')} AS price_cents
                FROM orders
            )
        ) WHERE prior_max IS NULL OR price_cents > prior_max
    """,
    ref="running-record / monotone-frontier detection (the 2-D skyline "
    "degenerate): an order is a record if it beats the max price of every "
    "STRICTLY earlier day. Scale shape: the corpus first collapses to ONE "
    "row per day (hash agg with map-side partials — the time dimension is "
    "bounded, ~hundreds of rows per year, at ANY corpus size), the exclusive "
    "frontier window (ROWS UNBOUNDED PRECEDING TO 1 PRECEDING over distinct "
    "days) runs on that bounded frame, and the per-day prior_max broadcasts "
    "back onto the fact scan — so no fact-sized single-partition window ever "
    "exists, unlike the naive RANGE-frame-over-orders formulation. Same-day "
    "ties are frame-invisible by construction (the frame sees only earlier "
    "DAYS), so the result is physical-order-free on both engines",
)
def record_breaking_orders(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)").alias("day"),
        _cents("o_totalprice").alias("price_cents"),
    )
    daymax = o.groupBy("day").agg(F.max("price_cents").alias("day_max"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    prior = daymax.select(
        "day", F.max("day_max").over(w).alias("prior_max")
    )
    return (
        o.join(F.broadcast(prior), "day")
        .filter(F.col("prior_max").isNull() | (F.col("price_cents") > F.col("prior_max")))
        .select("o_orderkey", "day", "price_cents")
    )


# ---------------------------------------------------------------------------
# bitset aggregation (bounded-state presence encoding via bit_or)
# ---------------------------------------------------------------------------


@register(
    "user_hour_bitmap",
    oracle="""
        WITH bm AS (
            SELECT user_id,
                   bit_or(1::BIGINT << CAST(hour(ts) AS INT)) AS bitmap
            FROM events GROUP BY user_id
        )
        SELECT CAST(bit_count(bitmap) AS BIGINT) AS active_hours,
               count(*) AS n_users,
               CAST(min(user_id) AS BIGINT) AS min_user
        FROM bm GROUP BY 1
    """,
    ref="bitmap presence aggregation (the roaring-bitmap idiom at its exact "
    "small-domain core): each user's 24 hour-of-day slots fold into ONE "
    "BIGINT via bit_or — commutative, associative, 8 bytes of state per "
    "group, the ideal partial-aggregation shape at 100 TB (vs collect_set's "
    "unbounded state). bit_count then buckets users by how many distinct "
    "hours they were active. The reference's analog is a BitSet-valued "
    "Writable folded in a combiner",
)
def user_hour_bitmap(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    bm = ev.groupBy("user_id").agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(hour(ts) AS INT))")
        ).alias("bitmap")
    )
    return bm.groupBy(
        F.bit_count("bitmap").cast("long").alias("active_hours")
    ).agg(
        F.count("*").alias("n_users"),
        F.min("user_id").cast("long").alias("min_user"),
    )
