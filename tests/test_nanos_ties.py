"""Nano-precision tie regression tests (VERDICT r2 item 6).

Driver testdata is parquet TIMESTAMP(NANOS). Spark's reader truncates to
microseconds; DuckDB keeps full nanos. Any order-sensitive or
inequality-compared timestamp therefore has a divergence class: two values
EQUAL at micro precision but DISTINCT at nano precision sort/compare
differently unless the oracle truncates its key to micros too (epoch_ns //
1000 or date_trunc('microseconds', …)) — exactly how running_total_supplier
went red at sf0.1 in round 2.

These tests build a tiny synthetic sf-dir whose parquet carries adversarial
nano ties (pyarrow writes timestamp[ns] directly — Spark cannot) and run the
REAL registry entries against their REAL oracles on it. A teeth-check
asserts the raw-nanos ordering would diverge, proving the fixtures actually
contain the tie.
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hadoop_3_0_0_beta1_gaia_spark.plans.registry import all_entries

ENTRIES = all_entries()

# Base instants (ns since epoch). MICRO = one microsecond in ns.
T0 = 1_700_000_000_000_000_000
MICRO = 1_000
DAY = 86_400_000_000_000


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _find_orderkey(mod: int, start: int = 1) -> int:
    k = start
    while _md5_60(str(k)) % mod != 0:
        k += 1
    return k


def _find_lineitem_key(start: int = 1) -> tuple[int, int]:
    k = start
    while _md5_60(f"{k}:1") % 64 != 0:
        k += 1
    return k, 1


def _ns_array(vals):
    return pa.array(vals, type=pa.timestamp("ns"))


@pytest.fixture(scope="module")
def tie_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nanos_sf")

    # events: user 1 has a purchase NANO-later but MICRO-equal to the click —
    # prior-or-equal at the engine's (micro) precision on both sides.
    HOUR = 3_600_000_000_000  # asof_tolerance_purchase's tolerance, in ns
    events = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10], type=pa.int64()),
            "user_id": pa.array([1, 1, 2, 2, 3, 3, 4, 4, 5, 5], type=pa.int64()),
            "event_type": pa.array(
                ["click", "purchase", "click", "purchase", "click", "purchase",
                 "click", "purchase", "click", "purchase"]
            ),
            "value": pa.array(
                [0.0, 10.0, 0.0, 7.5, 0.0, 99.0, 0.0, 11.0, 0.0, 12.0],
                type=pa.float64(),
            ),
            "ts": _ns_array(
                [
                    T0 + 100,              # u1 click
                    T0 + 900,              # u1 purchase: micro-tied, nano-later
                    T0,                    # u2 click
                    T0 - 5 * 10**9,        # u2 purchase: clearly before
                    T0,                    # u3 click
                    T0 + 2 * 10**9,        # u3 purchase: clearly after (no match)
                    T0 + HOUR + 100,       # u4 click: EXACTLY tolerance after
                    T0 + 100,              # u4 purchase (dist == tolerance)
                    T0 + HOUR + MICRO + 100,  # u5 click: one micro PAST it
                    T0 + 100,              # u5 purchase (dist == tolerance + 1)
                ]
            ),
        }
    )
    pq.write_table(events, os.path.join(d, "events.parquet"))

    # lineitem: supplier 1 has two rows micro-tied on l_shipdate whose
    # nano order is the REVERSE of the (orderkey, linenumber) tiebreak.
    ok_probe, ln_probe = _find_lineitem_key()
    S = T0 + 10 * DAY
    ok_order = _find_orderkey(16)
    D = T0 + 800  # order date: micro-tied with the probe shipdate below
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([2, 1, 3, ok_probe], type=pa.int64()),
            # probe row gets its own supplier so supplier 1's running totals
            # stay the three crafted rows
            "l_suppkey": pa.array([1, 1, 1, 9], type=pa.int64()),
            "l_linenumber": pa.array([1, 1, 1, ln_probe], type=pa.int32()),
            "l_extendedprice": pa.array([10.0, 20.0, 40.0, 80.0], type=pa.float64()),
            "l_shipdate": _ns_array(
                [
                    S + 500,  # orderkey 2: nano-EARLIER
                    S + 900,  # orderkey 1: nano-later, micro-tied with above
                    S + 10**9,
                    D - 600,  # probe row: micro-tied with order date D,
                              # nano-BEFORE it — window membership must be
                              # decided at micros (in) on both engines
                ]
            ),
        }
    )
    pq.write_table(lineitem, os.path.join(d, "lineitem.parquet"))

    orders = pa.table(
        {
            "o_orderkey": pa.array([ok_order], type=pa.int64()),
            "o_custkey": pa.array([1], type=pa.int64()),
            "o_orderdate": _ns_array([D]),
        }
    )
    pq.write_table(orders, os.path.join(d, "orders.parquet"))
    return str(d)


def _duck(tie_dir):
    con = duckdb.connect()
    for t in ("events", "lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(tie_dir, t)}.parquet'"
        )
    return con


def _norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


def _compare(name, spark, tie_dir):
    e = ENTRIES[name]
    df = e.build(spark, tie_dir)
    con = _duck(tie_dir)
    res = con.execute(e.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()
    spark_rows = [tuple(r) for r in df.collect()]
    assert _norm(spark_rows, df.columns) == _norm(duck_rows, duck_cols), name
    return spark_rows


def test_running_total_nano_tie(spark, tie_dir):
    rows = _compare("running_total_supplier", spark, tie_dir)
    # micro-tied rows order by the orderkey tiebreak: orderkey 1 first
    by_key = {(r[0], r[1], r[2]): r[3] for r in rows}
    assert by_key[(1, 1, 1)] == 2000  # 20.00 first
    assert by_key[(1, 2, 1)] == 3000  # then 10.00


def test_running_total_raw_nanos_would_diverge(tie_dir):
    """Teeth: the parquet really stores nano-distinct, micro-tied values, and
    ordering by RAW nanos (the round-2 bug) differs from ordering by the
    engine contract key (micros, orderkey). Checked over the raw pyarrow
    values — NOT through DuckDB — because DuckDB's nanos behavior is
    version-dependent (1.0 truncates TIMESTAMP(NANOS) to micros on read;
    newer versions keep TIMESTAMP_NS, which is why every oracle must
    truncate explicitly via epoch_ns // 1000 to be portable across both)."""
    t = pq.read_table(os.path.join(tie_dir, "lineitem.parquet"))
    rows = [
        (r["l_orderkey"], r["l_shipdate"].value)  # .value = raw ns
        for r in t.to_pylist()
        if r["l_suppkey"] == 1
    ]
    nano_tied = [
        (a, b)
        for i, (a, na) in enumerate(rows)
        for (b, nb) in rows[i + 1 :]
        if na != nb and na // 1000 == nb // 1000
    ]
    assert nano_tied, "fixture lost its nano tie"
    raw_order = [k for k, _ in sorted(rows, key=lambda r: r[1])]
    contract_order = [k for k, _ in sorted(rows, key=lambda r: (r[1] // 1000, r[0]))]
    assert raw_order != contract_order
    assert contract_order.index(1) < contract_order.index(2)


def test_asof_nano_tie(spark, tie_dir):
    rows = _compare("asof_purchase_value", spark, tie_dir)
    vals = {r[0]: r[2] for r in rows}
    # u1: purchase micro-tied (nano-later) with the click — still "prior or
    # equal" at engine precision; raw nanos would have said no match
    assert vals[1] == 10.0
    assert vals[3] == 7.5
    assert vals[5] is None


def test_asof_tolerance_boundary(spark, tie_dir):
    """The tolerance test is INCLUSIVE at exact micro precision: a purchase
    exactly one hour stale matches; one micro staler nulls out (pandas
    merge_asof(tolerance=...) semantics). Oracle parity checked on the same
    adversarial fixture."""
    rows = _compare("asof_tolerance_purchase", spark, tie_dir)
    vals = {r[0]: (r[2], r[3]) for r in rows}
    assert vals[1] == (10.0, 0)                 # micro-tied: distance 0
    assert vals[3] == (7.5, 5_000_000)          # 5 s stale, well within
    assert vals[5] == (None, None)              # no prior purchase at all
    assert vals[7] == (11.0, 3_600_000_000)     # dist == tolerance: kept
    assert vals[9] == (None, None)              # one micro past: nulled


def test_range_join_nano_tie(spark, tie_dir):
    rows = _compare("range_join_ship_windows", spark, tie_dir)
    # the probe shipdate is micro-equal (nano-before) the window start:
    # membership decided at micros ⇒ exactly one joined pair
    assert len(rows) == 1
