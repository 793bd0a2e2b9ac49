#!/usr/bin/env python3
"""Driver-protocol replica: run inventory entries EXACTLY the way the driver
does — a PLAIN SparkSession (none of the engine's session confs), non-UTC
session timezone, default 200 shuffle partitions, sf0.01 parquet — and
compare each entry against its DuckDB oracle with the driver's semantics
(row count, column set, Arrow field-type equality, column-name-sorted
row-sorted stringified values).

This is the pre-rotation gate for the first-50 driver window: every entry
rotated into the window must pass HERE first, because the repo's pytest gate
runs under the engine session (get_session) and a conf the engine sets could
mask a divergence the driver would see.

Usage:
  python tools/driver_check.py name1 name2 ...
  python tools/driver_check.py --window          # current first-50 window
  python tools/driver_check.py --never           # entries with no CORRECTNESS row yet
  python tools/driver_check.py --all
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


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


def _bare_fields(schema):
    return sorted((f.name, str(f.type)) for f in schema)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    from hadoop_3_0_0_beta1_gaia_spark.plans.registry import all_entries
    from hadoop_3_0_0_beta1_gaia_spark.session import release_owned

    entries = all_entries()
    args = sys.argv[1:]
    if "--window" in args:
        names = list(entries)[:50]
    elif "--all" in args:
        names = list(entries)
    elif "--never" in args:
        seen: set[str] = set()
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for f in sorted(os.listdir(repo)):
            if f.startswith("CORRECTNESS_r") and f.endswith(".json"):
                with open(os.path.join(repo, f)) as fh:
                    seen |= set(json.load(fh))
        names = [n for n in entries if n not in seen]
    else:
        names = args
        unknown = [n for n in names if n not in entries]
        if unknown:
            print(f"unknown entries: {unknown}", file=sys.stderr)
            return 2

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(SF_DIR, t)}.parquet'"
        )

    failures = []
    for name in names:
        e = entries[name]
        t0 = time.perf_counter()
        try:
            df = e.build(spark, SF_DIR)
            spark_cols = df.columns
            spark_tbl = df.toArrow()  # Arrow schema = what the driver hashes
            spark_rows = [tuple(r) for r in df.collect()]
            if e.oracle is None:
                print(f"PASS? {name}: rows-only ({len(spark_rows)}) "
                      f"[{time.perf_counter()-t0:.1f}s]")
                continue
            duck_tbl = con.execute(e.oracle).arrow()
            res = con.execute(e.oracle)
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
            problems = []
            if sorted(spark_cols) != sorted(duck_cols):
                problems.append(f"cols {spark_cols} vs {duck_cols}")
            sf_fields, df_fields = (
                _bare_fields(spark_tbl.schema),
                _bare_fields(duck_tbl.schema),
            )
            if sf_fields != df_fields:
                problems.append(f"arrow types {sf_fields} vs {df_fields}")
            if len(spark_rows) != len(duck_rows):
                problems.append(f"rows {len(spark_rows)} vs {len(duck_rows)}")
            elif _norm(spark_rows, spark_cols) != _norm(duck_rows, duck_cols):
                ns, nd = _norm(spark_rows, spark_cols), _norm(duck_rows, duck_cols)
                first = next((a, b) for a, b in zip(ns, nd) if a != b)
                problems.append(f"values differ; first: {first}")
            status = "FAIL" if problems else "PASS"
            if problems:
                failures.append((name, problems))
            print(f"{status}  {name}: {len(spark_rows)} rows "
                  f"[{time.perf_counter()-t0:.1f}s]"
                  + ("" if not problems else f"  {problems[0][:300]}"))
        except Exception as ex:  # noqa: BLE001
            failures.append((name, [repr(ex)[:500]]))
            print(f"ERROR {name}: {repr(ex)[:300]}")
        spark.catalog.clearCache()
        release_owned()

    print(f"\n{len(names) - len(failures)}/{len(names)} pass")
    for name, problems in failures:
        print(f"  FAIL {name}: {problems[0][:500]}")
    con.close()
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
