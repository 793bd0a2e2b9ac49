"""The remaining decision-support shapes — completes all 22 TPC-H query
shapes across the registry (Q1/Q3 in relational.py, Q4/Q14/Q16/Q18/Q22 in
subquery.py, Q5/Q7/Q10/Q12/Q19/Q21 in tpch_shapes.py; this module adds the
Q2/Q6/Q8/Q9/Q11/Q13/Q15/Q17/Q20 analogs).

The reference expresses each as a JobControl DAG (SURVEY §2.9) of
CompositeInputFormat / datajoin join jobs (SURVEY §2.6) feeding
LongSumReducer-family aggregate jobs (SURVEY §2.5); here each is one
declarative Catalyst chain. The testdata has no ``partsupp`` table, so the
supply-side shapes (Q2/Q9/Q11/Q20) derive their supplier-part facts from
lineitem — the join/subquery SHAPE (correlated min, fraction-of-global
HAVING, majority-share semi join) is preserved exactly; only the fact source
differs.

Portability (NOTES.md oracle-portability rules): money flows as exact BIGINT
cents (DECIMAL(18,2) -> *100 -> BIGINT on both engines); quantities in this
testdata are integral doubles (1.0..50.0 — verified) so CAST to BIGINT is
exact on both engines; ratio outputs divide two BIGINTs (double on both) and
fround; fractional HAVING/averages are rewritten as integer cross products
(5*qty*cnt < sum, 20*value > total) so no float comparison can diverge.

100 TB posture: bounded dims (region 5, nation 25) broadcast-hinted;
part/supplier/customer/orders left to AQE. Correlated aggregates
(Q2 min-offer, Q17 per-part avg, Q20 majority share) are windows or
join-backs over ONE fact aggregation — never a second fact scan. Global
scalars (Q11 total, Q15 max) are 1-row aggregates crossJoin-broadcast back,
the engine's standard bounded-scalar idiom.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import duck_fround, fround
from ..session import table as T
from .registry import register

# Money/quantity unit helpers are shared with tpch_shapes.py — one
# definition of the cents convention, no drift between shape modules.
from .tpch_shapes import _CENTS, _REV, _cents, _rev_units

_QTY = "CAST(l_quantity AS BIGINT)"  # integral doubles — exact on both engines


def _qty() -> F.Column:
    return F.col("l_quantity").cast("long")


# ---------------------------------------------------------------------------
# Q6 shape: single-scan predicate aggregate (forecast revenue change)
# ---------------------------------------------------------------------------


@register(
    "forecast_revenue_change",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum({_CENTS.format(c='l_extendedprice')}
                        * {_CENTS.format(c='l_discount')}) AS BIGINT)
                   AS discount_units
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND {_CENTS.format(c='l_discount')} BETWEEN 5 AND 7
          AND l_quantity < 24
    """,
    ref="TPC-H Q6 shape — the pure scan-filter-sum: no join at all; the "
    "reference is a single map (filter) + LongSumReducer job "
    "(SURVEY §2.3/2.5). All four predicates push to the parquet scan "
    "(PushedFilters) and the sum folds map-side; at 100 TB this is the "
    "I/O-bound floor every other query builds on. Discount compared in exact "
    "cents (BETWEEN 5 AND 7), never as a float.",
)
def forecast_revenue_change(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & _cents("l_discount").between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(_cents("l_extendedprice") * _cents("l_discount")).alias(
                "discount_units"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Q2 shape: correlated MIN subquery (min-cost supplier per part)
# ---------------------------------------------------------------------------


@register(
    "min_cost_supplier_per_part",
    oracle=f"""
        WITH offers AS (
            SELECT l_partkey AS pk, l_suppkey AS sk,
                   min({_CENTS.format(c='l_extendedprice')}) AS offer_cents
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN region   ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
            GROUP BY l_partkey, l_suppkey
        ),
        best AS (
            SELECT pk, min(offer_cents) AS offer_cents FROM offers GROUP BY pk
        ),
        chosen AS (
            SELECT o.pk, o.offer_cents, min(o.sk) AS sk
            FROM offers o JOIN best b ON b.pk = o.pk
                           AND b.offer_cents = o.offer_cents
            GROUP BY o.pk, o.offer_cents
        )
        SELECT p_partkey, offer_cents, s_name, n_name
        FROM chosen
        JOIN part ON p_partkey = pk
             AND p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
        JOIN supplier ON s_suppkey = sk
        JOIN nation   ON n_nationkey = s_nationkey
    """,
    ref="TPC-H Q2 shape — the correlated scalar-MIN subquery: for each "
    "qualifying part, the EUROPE supplier offering the minimum cost (offer = "
    "min lineitem price per part-supplier; the testdata has no partsupp, so "
    "lineitem is the supply-offer fact — same correlated-min shape). The "
    "reference runs a min-aggregate job then a reduce-side join-back "
    "(SURVEY §2.5+2.6); here ONE grouped aggregate feeds a min join-back, "
    "with min(s_suppkey) as the deterministic tie-break the spec's "
    "ORDER-BY-LIMIT implies. region/nation broadcast; the part filter "
    "semi-prunes the offer frame before the name joins.",
)
def min_cost_supplier_per_part(spark, sf_dir):
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", _cents("l_extendedprice").alias("ext_cents")
    )
    offers = (
        li.join(s.select("s_suppkey", "s_nationkey"), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.min("ext_cents").alias("offer_cents"))
    )
    best = offers.groupBy(F.col("pk").alias("bpk")).agg(
        F.min("offer_cents").alias("best_cents")
    )
    chosen = (
        offers.join(
            best,
            (F.col("pk") == F.col("bpk"))
            & (F.col("offer_cents") == F.col("best_cents")),
        )
        .groupBy("pk", "offer_cents")
        .agg(F.min("sk").alias("sk"))
    )
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    ).select("p_partkey")
    return (
        chosen.join(p, p.p_partkey == chosen.pk)
        .join(s.select("s_suppkey", "s_name", "s_nationkey"),
              F.col("s_suppkey") == F.col("sk"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .select("p_partkey", "offer_cents", "s_name", "n_name")
    )


# ---------------------------------------------------------------------------
# Q8 shape: market-share ratio (conditional sum / total sum per group)
# ---------------------------------------------------------------------------


@register(
    "national_market_share",
    oracle=f"""
        SELECT o_year,
               {duck_fround(
                   "CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END)"
                   " AS BIGINT) / CAST(sum(rev) AS BIGINT)", 6)} AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   n2.n_name AS supp_nation, {_REV} AS rev
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey AND p_type = 'ECONOMY'
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON n1.n_nationkey = c_nationkey
            JOIN region   ON r_regionkey = n1.n_regionkey AND r_name = 'AMERICA'
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation n2 ON n2.n_nationkey = s_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
        )
        GROUP BY o_year
    """,
    ref="TPC-H Q8 shape — national market share: within AMERICA-customer "
    "ECONOMY-part order volume, the fraction supplied by NATION_3, per order "
    "year. The reference needs a two-pass job (conditional sum + total sum "
    "per year, then a ratio job); one grouped agg with a CASE sum does both "
    "in a single shuffle here. The ratio divides two exact BIGINT cents sums "
    "(double division is the last step on both engines) and frounds — the "
    "NOTES.md exact-ratio rule.",
)
def national_market_share(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _rev_units().alias("rev")
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk1"), "n_regionkey"
    )
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("nk1") == c.c_nationkey)
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("nk2") == s.s_nationkey)
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("rev")).otherwise(0)
            ).alias("nat"),
            F.sum("rev").alias("tot"),
        )
        .select("o_year", fround(F.col("nat") / F.col("tot"), 6).alias("mkt_share"))
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year
# ---------------------------------------------------------------------------


@register(
    "product_type_profit",
    oracle=f"""
        SELECT n_name, o_year, CAST(sum(amount) AS BIGINT) AS profit_units
        FROM (
            SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   {_REV} - {_QTY} * {_CENTS.format(c='p_retailprice')} * 100
                       AS amount
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey AND p_name LIKE '%widget%'
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN orders   ON o_orderkey = l_orderkey
        )
        GROUP BY n_name, o_year
    """,
    ref="TPC-H Q9 shape — profit on a part-name-filtered product line, per "
    "supplier nation per year: amount = revenue - cost (cost analog = "
    "quantity x part retail cents; no partsupp in the testdata). Both terms "
    "are in the SAME cents-x-percent integer units (revenue carries the "
    "(100 - discount) percent factor, so cost is scaled by 100 — a unit "
    "mismatch here makes profit ~= revenue and masks the negative-profit "
    "semantics; caught in review, value-pinned in tests). The reference "
    "chains four join jobs + a sum job; Catalyst plans one chain where the "
    "LIKE filter semi-prunes lineitem through the part join before the wide "
    "orders join. Negative amounts (discounted price below retail) are "
    "exactly what Q9's profit asks.",
)
def product_type_profit(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        (_rev_units()).alias("rev"),
        _qty().alias("qty"),
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", _cents("p_retailprice").alias("retail_cents")
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("n_nationkey") == s.s_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "n_name",
            "o_year",
            (F.col("rev") - F.col("qty") * F.col("retail_cents") * 100).alias(
                "amount"
            ),
        )
        .groupBy("n_name", "o_year")
        .agg(F.sum("amount").alias("profit_units"))
    )


# ---------------------------------------------------------------------------
# Q11 shape: HAVING against a fraction of the global total
# ---------------------------------------------------------------------------


@register(
    "important_nation_value",
    oracle=f"""
        WITH value_by_nation AS (
            SELECT n_name, CAST(sum({_REV}) AS BIGINT) AS value_units
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            GROUP BY n_name
        )
        SELECT n_name, value_units
        FROM value_by_nation
        WHERE value_units * 20 > (SELECT CAST(sum(value_units) AS BIGINT)
                                  FROM value_by_nation)
    """,
    ref="TPC-H Q11 shape — groups whose value exceeds a FRACTION of the "
    "global total (supply value per supplier nation > 1/20 of world value; "
    "partsupp-less analog of ps_supplycost*ps_availqty). The reference runs "
    "the per-group sum job, a global-sum job, then a filter job against the "
    "broadcast scalar (DistributedCache idiom); here the grouped frame is "
    "aggregated once and the 1-row total crossJoins back (broadcast "
    "nested-loop on a single row — the engine's bounded-scalar idiom). The "
    "fraction compare is exact integer cross-multiplication (value*20 > "
    "total), never a float threshold.",
)
def important_nation_value(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").select("l_suppkey", _rev_units().alias("rev"))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    by_nation = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("n_nationkey") == s.s_nationkey)
        .groupBy("n_name")
        .agg(F.sum("rev").alias("value_units"))
    )
    total = by_nation.agg(F.sum("value_units").alias("total_units"))
    return (
        by_nation.crossJoin(F.broadcast(total))
        .filter(F.col("value_units") * 20 > F.col("total_units"))
        .select("n_name", "value_units")
    )


# ---------------------------------------------------------------------------
# Q13 shape: order-count distribution including zero-order customers
# ---------------------------------------------------------------------------


@register(
    "cust_order_count_distribution",
    oracle="""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT JOIN orders ON o_custkey = c_custkey
                 AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
    ref="TPC-H Q13 shape — the distribution of customers by order count, "
    "INCLUDING zero-order customers: the filter must live in the LEFT JOIN's "
    "ON clause (a WHERE would silently drop the zeros — the classic Q13 "
    "trap, pinned by the oracle). The reference needs an outer reduce-side "
    "join (TupleWritable empty-side handling, SURVEY §2.6) then two count "
    "jobs; here one outer join and two grouped counts. count(o_orderkey) "
    "counts non-NULL matches only, on both engines.",
)
def cust_order_count_distribution(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q15 shape: rows equal to the global MAX of an aggregate (top supplier)
# ---------------------------------------------------------------------------


@register(
    "top_revenue_supplier",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(sum({_REV}) AS BIGINT) AS total_units
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_units
        FROM revenue JOIN supplier ON s_suppkey = supplier_no
        WHERE total_units = (SELECT max(total_units) FROM revenue)
    """,
    ref="TPC-H Q15 shape — the view-then-max-equality query: quarterly "
    "revenue per supplier, return the supplier(s) achieving the maximum "
    "(ALL ties, per spec). The reference materializes the revenue view as a "
    "job output, runs a max job, then re-reads the view filtered to the max "
    "(three jobs + an HDFS round trip); here the grouped frame is computed "
    "once, its 1-row max crossJoins back, and equality keeps every tied row. "
    "No window/sort needed — max-equality beats rank() when k=1 with ties.",
)
def top_revenue_supplier(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    ).select("l_suppkey", _rev_units().alias("rev"))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum("rev").alias("total_units")
    )
    mx = revenue.agg(F.max("total_units").alias("max_units"))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_units") == F.col("max_units"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_units")
    )


# ---------------------------------------------------------------------------
# Q17 shape: correlated per-group average threshold (small-quantity revenue)
# ---------------------------------------------------------------------------


@register(
    "small_qty_order_revenue",
    oracle=f"""
        WITH lines AS (
            SELECT l_partkey, {_QTY} AS qty,
                   {_CENTS.format(c='l_extendedprice')} AS ext_cents
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
                 AND p_brand = 'Brand#3' AND p_type = 'SMALL'
        ),
        stats AS (
            SELECT l_partkey,
                   sum(qty) OVER (PARTITION BY l_partkey) AS sum_qty,
                   count(*) OVER (PARTITION BY l_partkey) AS cnt,
                   qty, ext_cents
            FROM lines
        )
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(ext_cents) AS BIGINT) AS revenue_cents
        FROM stats
        WHERE 5 * qty * cnt < sum_qty
    """,
    ref="TPC-H Q17 shape — lines whose quantity is below 20% of the "
    "per-part average: the correlated AVG subquery. The reference runs an "
    "avg job keyed by part then a reduce-side join-back filter; here ONE "
    "window over l_partkey supplies sum/count to every line (single "
    "shuffle, no second fact scan — the join-back form scans lineitem "
    "twice at 100 TB). The 20%-of-avg test is the exact integer "
    "cross-product 5*qty*cnt < sum_qty (quantities are integral doubles) — "
    "no float average ever materializes, so the engines cannot diverge.",
)
def small_qty_order_revenue(spark, sf_dir):
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", _qty().alias("qty"), _cents("l_extendedprice").alias("ext_cents")
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .withColumn("sum_qty", F.sum("qty").over(w))
        .withColumn("cnt", F.count("*").over(w))
        .filter(5 * F.col("qty") * F.col("cnt") < F.col("sum_qty"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("ext_cents").alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 shape: nested correlated aggregates -> semi join (majority suppliers)
# ---------------------------------------------------------------------------


@register(
    "promotion_part_suppliers",
    oracle=f"""
        WITH red_parts AS (
            SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
        ),
        shipped AS (
            SELECT l_partkey, l_suppkey, sum({_QTY}) AS supp_qty
            FROM lineitem
            JOIN red_parts ON p_partkey = l_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY l_partkey, l_suppkey
        ),
        majority AS (
            SELECT DISTINCT l_suppkey
            FROM (
                SELECT l_suppkey, supp_qty,
                       sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
                FROM shipped
            )
            WHERE 2 * supp_qty > part_qty
        )
        SELECT s_name, n_name
        FROM supplier
        JOIN majority ON l_suppkey = s_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
    """,
    ref="TPC-H Q20 shape — the nested-subquery supplier screen: suppliers "
    "who shipped the MAJORITY of some red part's 1996 volume (partsupp-less "
    "analog of availqty > 0.5 * shipped-qty; same nested correlated-agg -> "
    "IN -> semi-join shape). The reference nests three jobs (per-part-"
    "supplier sum, per-part sum join-back, distinct + replicated join to "
    "supplier); here the fact aggregates ONCE, a window over l_partkey "
    "supplies the per-part total, and DISTINCT suppliers join to names. The "
    "majority test is integer cross-multiplication. Two shuffles + the name "
    "join, one fact scan.",
)
def promotion_part_suppliers(spark, sf_dir):
    red = T(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).select("l_partkey", "l_suppkey", _qty().alias("qty"))
    shipped = (
        li.join(red, li.l_partkey == red.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    majority = (
        shipped.withColumn("part_qty", F.sum("supp_qty").over(w))
        .filter(2 * F.col("supp_qty") > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(majority, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("n_nationkey") == s.s_nationkey)
        .select("s_name", "n_name")
    )
