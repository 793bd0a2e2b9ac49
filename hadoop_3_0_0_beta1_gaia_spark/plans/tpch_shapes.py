"""Decision-support join/agg shapes (TPC-H Q5/Q7/Q10/Q12/Q19/Q21 analogs).

The reference expresses each of these as a JobControl DAG of join jobs
(CompositeInputFormat / datajoin, SURVEY §2.6) feeding aggregate jobs
(LongSumReducer family, SURVEY §2.5); Catalyst plans the same shapes from one
declarative chain. This module complements ``subquery.py`` (Q4/Q14/Q16/Q18/Q22
shapes) with the remaining classic shapes: the star snowflake with an
intra-row equality constraint (Q5), the nation-pair volume matrix (Q7), the
grouped top-k join-back (Q10), derived-flag conditional counting (Q12), an
OR-of-ANDs multi-predicate scan (Q19), and the double-EXISTS exclusivity test
(Q21).

Portability: money through DECIMAL(18,2) -> exact BIGINT cents (revenue is
'cents x (100 - discount cents)' integer units, as promo_revenue_monthly);
counts CAST to BIGINT on the DuckDB side (HUGEINT otherwise); dates compare
against TIMESTAMP literals on both engines; years extract via year() on the
NTZ timestamp (tz-independent).

100 TB posture: bounded dims (region 5, nation 25) are broadcast-hinted;
customer/supplier/orders are left to AQE (they grow with SF — a forced
broadcast would OOM on a cluster). The only shuffles are the fact-key join
exchanges and the final grouped aggregates, all with map-side partials. The
Q21-analog's per-order exclusivity test aggregates lineitem once per order
(bit-style any/count flags) instead of two correlated EXISTS probes — one
shuffle, no repeated fact scans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..session import table as T
from .registry import register

_CENTS = "CAST(CAST({c} AS DECIMAL(18,2)) * 100 AS BIGINT)"
_REV = (
    f"{_CENTS.format(c='l_extendedprice')} * (100 - {_CENTS.format(c='l_discount')})"
)


def _cents(col: str) -> F.Column:
    return (F.col(col).cast("decimal(18,2)") * 100).cast("long")


def _rev_units() -> F.Column:
    return _cents("l_extendedprice") * (100 - _cents("l_discount"))


# ---------------------------------------------------------------------------
# Q5 shape: snowflake join with an intra-row equality (local supplier volume)
# ---------------------------------------------------------------------------


@register(
    "local_supplier_volume",
    oracle=f"""
        SELECT n_name, CAST(sum({_REV}) AS BIGINT) AS revenue_units
        FROM customer
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
        WHERE r_name IN ('ASIA', 'EUROPE')
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    ref="TPC-H Q5 shape — the reference chains four reduce-side join jobs then a "
    "sum job (JobControl DAG, SURVEY §2.9); the defining twist is the intra-row "
    "constraint s_nationkey = c_nationkey (customer and supplier in the SAME "
    "nation), which the reference implements as a reducer-side filter on the "
    "tagged tuple (datajoin DataJoinReducerBase). Here it's an extra equi-join "
    "key, so Catalyst co-partitions on it. region/nation broadcast (bounded "
    "dims); customer/orders/supplier shuffle under AQE. Revenue is exact integer "
    "units = cents x (100 - discount-cents).",
)
def local_supplier_volume(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", _rev_units().alias("rev")
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(F.sum("rev").alias("revenue_units"))
    )


# ---------------------------------------------------------------------------
# Q7 shape: nation-pair shipping volume matrix by year
# ---------------------------------------------------------------------------


@register(
    "volume_shipping_nations",
    oracle=f"""
        SELECT supp_nation, cust_nation, ship_year,
               CAST(sum(rev) AS BIGINT) AS revenue_units
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS ship_year,
                   {_REV} AS rev
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON n1.n_nationkey = s_nationkey
            JOIN nation n2 ON n2.n_nationkey = c_nationkey
            WHERE n1.n_nationkey <> n2.n_nationkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
        )
        GROUP BY supp_nation, cust_nation, ship_year
    """,
    ref="TPC-H Q7 shape — cross-nation trade volume: every (supplier nation, "
    "customer nation, year) cell of the trade matrix, excluding domestic trade. "
    "The reference tags each lineitem with both nations via two replicated "
    "map-side joins (DistributedCache idiom, SURVEY §2.6) then sums per cell; "
    "here the two nation dims broadcast (25 rows each, aliased independently) "
    "and the <> predicate is a join-output filter. Output is bounded at "
    "25x24xyears cells regardless of SF — the ideal partial-agg shape.",
)
def volume_shipping_nations(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("ship_year"),
        _rev_units().alias("rev"),
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("nk1") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("nk2") == c.c_nationkey)
        .filter(F.col("nk1") != F.col("nk2"))
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(F.sum("rev").alias("revenue_units"))
    )


# ---------------------------------------------------------------------------
# Q10 shape: returned-item revenue per customer, top 20 join-back
# ---------------------------------------------------------------------------


@register(
    "returned_item_customers",
    oracle=f"""
        SELECT c_custkey, c_name, n_name, acctbal_cents,
               CAST(sum({_REV}) AS BIGINT) AS revenue_units
        FROM (SELECT c_custkey, c_name, c_nationkey,
                     {_CENTS.format(c='c_acctbal')} AS acctbal_cents
              FROM customer) c
        JOIN orders   ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON n_nationkey = c_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
        GROUP BY c_custkey, c_name, n_name, acctbal_cents
        ORDER BY revenue_units DESC, c_custkey
        LIMIT 20
    """,
    ref="TPC-H Q10 shape — customers who returned the most revenue in a window: "
    "join -> grouped sum -> global top-20. The reference runs a join job, a sum "
    "job, then a single-reducer top-k job; Spark's TakeOrderedAndProject keeps "
    "k rows per partition and merges on the driver (no global sort, no single "
    "reducer — SURVEY §2.7 limit/top-k). Deterministic tie-break on c_custkey "
    "so LIMIT is stable across engines. Grouping carries c_name/n_name as keys "
    "(functionally dependent on c_custkey); acctbal_cents is likewise carried "
    "as a grouping key — one customer row per group, so the group is "
    "unchanged.",
)
def returned_item_customers(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", _cents("c_acctbal").alias("acctbal_cents")
    )
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    ).select("o_orderkey", "o_custkey")
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", _rev_units().alias("rev")
    )
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("n_nationkey") == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "acctbal_cents")
        .agg(F.sum("rev").alias("revenue_units"))
        .orderBy(F.col("revenue_units").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 shape: derived lateness flag, conditional priority counting
# ---------------------------------------------------------------------------


@register(
    "late_shipment_priority",
    oracle="""
        SELECT lateness,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM (
            SELECT o_orderpriority,
                   CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY
                        THEN 'LATE' ELSE 'ON_TIME' END AS lateness
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
        )
        GROUP BY lateness
    """,
    ref="TPC-H Q12 shape (shipmode -> derived lateness bucket; the testdata has "
    "no commit/receipt dates, so 'late' = shipped 90+ days after order date — "
    "same derived-flag-then-conditional-count semantics). The reference computes "
    "the flag in the mapper and feeds two counters per group into LongSumReducer "
    "(aggregate framework, SURVEY §2.5); here two CASE sums in one agg. The "
    "date arithmetic stays on NTZ timestamps (tz-independent interval add).",
)
def late_shipment_priority(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_orderkey", "l_shipdate")
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .select(
            F.when(
                F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                F.lit("LATE"),
            )
            .otherwise(F.lit("ON_TIME"))
            .alias("lateness"),
            F.when(hi, 1).otherwise(0).alias("hi"),
            F.when(hi, 0).otherwise(1).alias("lo"),
        )
        .groupBy("lateness")
        .agg(
            F.sum("hi").cast("long").alias("high_line_count"),
            F.sum("lo").cast("long").alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q19 shape: OR-of-ANDs multi-predicate scan (discounted revenue)
# ---------------------------------------------------------------------------


@register(
    "discounted_revenue_brands",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum({_REV}) AS BIGINT) AS revenue_units
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 15 AND 35)
           OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50
               AND l_quantity BETWEEN 25 AND 50)
    """,
    ref="TPC-H Q19 shape — disjunction of three conjunctive brand/size/quantity "
    "clauses over the part join. The reference ANDs a RegexMapper-style filter "
    "per branch and unions three job outputs (MultipleInputs, SURVEY §2.1); "
    "Catalyst keeps it one scan: the common p_brand IN (...) and l_quantity "
    "range implied by the disjunction are inferred and pushed to the parquet "
    "scans, the residual OR evaluates post-join. One job, not three.",
)
def discounted_revenue_brands(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", _rev_units().alias("rev")
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#14") & sz.between(10, 30) & q.between(15, 35))
        | ((F.col("p_brand") == "Brand#25") & sz.between(20, 50) & q.between(25, 50))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("rev").alias("revenue_units"),
        )
    )


# ---------------------------------------------------------------------------
# Q21 shape: per-order exclusivity (only supplier whose lines were returned)
# ---------------------------------------------------------------------------


@register(
    "waiting_suppliers",
    oracle="""
        WITH order_supp AS (
            SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_ret
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey AND o_orderstatus = 'F'
            GROUP BY l_orderkey, l_suppkey
        ),
        order_stats AS (
            SELECT l_orderkey,
                   count(*) AS n_supp,
                   sum(has_ret) AS n_ret_supp
            FROM order_supp GROUP BY l_orderkey
        )
        SELECT s_name, n_name, CAST(count(*) AS BIGINT) AS numwait
        FROM order_supp os
        JOIN order_stats st ON st.l_orderkey = os.l_orderkey
        JOIN supplier ON s_suppkey = os.l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        WHERE os.has_ret = 1 AND st.n_supp > 1 AND st.n_ret_supp = 1
        GROUP BY s_name, n_name
        ORDER BY numwait DESC, s_name
        LIMIT 25
    """,
    ref="TPC-H Q21 shape — the sole-blame test: suppliers who were the ONLY "
    "supplier with returned lines in a multi-supplier finished order. The "
    "canonical form is EXISTS(other supplier) AND NOT EXISTS(other returned "
    "supplier) — two correlated fact probes; the reference would run two extra "
    "join jobs. Re-expressed as ONE grouped pass: per (order, supplier) fold the "
    "returned flag, then per-order supplier/returned-supplier counts via a "
    "window partitioned on l_orderkey — the fact table is scanned ONCE (a "
    "groupBy-then-self-join would scan and aggregate it twice at 100 TB), and "
    "filter has_ret=1 AND n_supp>1 AND n_ret_supp=1 — equivalent semantics, "
    "two shuffles total. Top-25 via TakeOrdered with s_name tie-break.",
)
def waiting_suppliers(spark, sf_dir):
    from pyspark.sql.window import Window

    fo = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    order_supp = (
        li.join(fo, li.l_orderkey == fo.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("has_ret")
        )
    )
    w = Window.partitionBy("l_orderkey")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        order_supp.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_ret_supp", F.sum("has_ret").over(w))
        .filter(
            (F.col("has_ret") == 1) & (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )
