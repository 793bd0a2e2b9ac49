#!/usr/bin/env python3
"""Scale-step the full inventory gate (VERDICT r3 item 4): run EVERY registry
entry and its oracle at a big SF (default /tmp/sf1 from tools/scale_testdata.py
— 10x the bench SF), under the ENGINE session, recording per-entry wall time
and parity incrementally to a JSONL file. A watchdog cancels both engines past
a per-entry cap so one superlinear entry cannot stall the sweep; timeouts are
recorded, not hidden — a TIMEOUT at sf1 is exactly the "degrades
superlinearly, gets a named fix (or a documented by-contract anchor)" signal
this sweep exists to surface.

Usage: python tools/sf_sweep.py [out.jsonl] [cap_seconds] [names...]

Per-entry comparison modes for VERY large SFs (sf10+), via env vars:
  SWEEP_COUNT_ONLY=a,b  compare row COUNTS only (spark count vs
                        SELECT count(*) FROM (<oracle>)) — for entries whose
                        output explodes past what a full-row Python compare
                        can hold (e.g. 100M+ pair sets); full-row parity for
                        these is established by the sf1 sweep.
  SWEEP_SPARK_ONLY=c,d  run the Spark side only (timing + row count) — for
                        entries whose DuckDB oracle is itself super-linear
                        (recursive-CTE graph iterations) and would measure
                        the oracle, not the engine, at the target SF.
  SWEEP_DIGEST=e,f      compare an ENGINE-SIDE digest (count + bit_xor +
                        mod-sum of a 60-bit md5 row hash, computed INSIDE
                        Spark and INSIDE DuckDB over identically-canonicalized
                        rows) instead of full-row collect (VERDICT r7 item 3:
                        the r7 c4_line_filter row billed 500k rows of
                        collect()+Python compare to the engine — 12.2 s
                        artifact vs 3.1 s same-session A/B). Full-row parity
                        for digest-mode entries is established by the sf1
                        sweep; the digest still FAILS on any value divergence.
  SWEEP_BOUNDARY_PINNED=g,h
                        skip these entries with an explicit boundary-pinned
                        record (VERDICT r7 item 6: the uncapped components
                        family's sf10 wall is measured twice — r6 GC, r7 652 s
                        disk spill — and pinned in SCALE.md; re-probing it
                        every sweep burns budget to re-learn a decided fact).
Modes are recorded in the JSONL (mode field) so the artifact shows exactly
which gate each entry got. Any PASS row whose spark_s exceeds
SWEEP_RETIME_MIN_S (default 30) is re-timed twice more in the same session
(fresh watchdog each) and carries a ``runs`` array ([cold, warm, warm]) with
spark_cold_s = the first run and spark_s = min — single cold samples of
heavy entries swing 27-135 s on this host (VERDICT r7 item 7), and for
small entries the fresh-session scan/JVM constant reads as an engine
deficit the committed A/Bs disprove (VERDICT r8 item 2): sf10 digest sweeps
set SWEEP_RETIME_MIN_S=0 so every row reports its warm engine cost.
"""

from __future__ import annotations

import json
import math
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/tmp/sf1")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Documented by-contract quadratic/procedural anchors + their known-heavy kin:
# run LAST so the linear bulk of the sweep lands first.
HEAVY_LAST = [
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_substring_spans",
    "dedup_simhash_hamming",
    "knn_cosine_topk",
    "lsh_recall_vs_exact",
    "ann_recall_at_k",
    "dedup_embedding_cosine",
    "order_gaps_pandas",
]


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


_DIGEST_MOD = 1_000_000_007


def _spark_digest(df):
    """(count, bit_xor(h), sum(h % p)) over a canonical 60-bit row hash.

    Canonical row string: columns sorted by name, '|'-joined, NULL -> 'NULL',
    DOUBLE/FLOAT via printf('%.9f') (both engines use C-printf semantics for
    the values these entries emit; full-row sf1 parity remains the ground
    truth — digest mode only replaces the COLLECT at huge SFs). XOR alone
    cancels even multiplicities, so the mod-sum rides along; count pins
    cardinality."""
    from pyspark.sql import functions as F

    parts = []
    for c in sorted(df.columns):
        dt = df.schema[c].dataType.simpleString()
        col = F.col(c)
        if dt in ("double", "float"):
            # format_string renders a NULL argument as the literal string
            # "null" (Java String.format semantics) instead of propagating
            # SQL NULL, so the coalesce below would never fire and the row
            # string diverges from DuckDB's printf (which propagates NULL)
            # — found by the first digest-mode sweep over an entry with a
            # nullable double column (asof_* at sf10, r11)
            s = F.when(col.isNotNull(), F.format_string("%.9f", col))
        else:
            s = col.cast("string")
        parts.append(F.coalesce(s, F.lit("NULL")))
    h = F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10).cast(
        "long"
    )
    row = (
        df.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(h)").alias("x"),
            F.sum(F.col("h") % _DIGEST_MOD).alias("s"),
        )
        .collect()[0]
    )
    return (row["n"], row["x"], row["s"])


def _duck_digest(con, oracle: str):
    """Same digest computed INSIDE DuckDB over the oracle's rows."""
    # description type_codes collapse DOUBLE/BIGINT to 'NUMBER'; DESCRIBE
    # yields the real logical types
    desc = con.execute(f"DESCRIBE SELECT * FROM ({oracle}) LIMIT 0").fetchall()
    parts = []
    for name, col_type, *_ in sorted(desc, key=lambda d: d[0]):
        q = f'"{name}"'
        fmt = (
            f"printf('%.9f', {q})"
            if col_type.upper() in ("FLOAT", "DOUBLE", "REAL")
            else f"CAST({q} AS VARCHAR)"
        )
        parts.append(f"coalesce({fmt}, 'NULL')")
    h = f"(('0x' || substr(md5(concat_ws('|', {', '.join(parts)})), 1, 15))::BIGINT)"
    n, x, s = con.execute(
        f"SELECT count(*), bit_xor(h), sum(h % {_DIGEST_MOD}) "
        f"FROM (SELECT {h} AS h FROM ({oracle}))"
    ).fetchone()
    return (n, x, s)


def _retime(rec: dict, spark, e, cap: float, action) -> None:
    """Spread + warm-cost visibility (VERDICT r7 item 7 / r8 item 2): a PASS
    row whose first Spark-side run took > SWEEP_RETIME_MIN_S (default 30)
    gets two more timed runs in the SAME session (fresh watchdog each) — rec
    gains a ``runs`` array ([cold, warm, warm]: the first run pays
    fresh-session scan/JVM constants the re-runs don't), ``spark_cold_s``
    keeps the cold first run, and spark_s becomes the min, matching
    bench.py's protocol. Single cold samples swing 27-135 s on this host,
    and for SMALL entries the cold constant reads as an engine deficit the
    committed A/B runs disprove — set SWEEP_RETIME_MIN_S=0 to give every
    row the warm protocol (the sf10 digest-sweep configuration)."""
    from hadoop_3_0_0_beta1_gaia_spark.session import force_release_all

    min_s = float(os.environ.get("SWEEP_RETIME_MIN_S", "30"))
    if rec.get("status") != "PASS" or (rec.get("spark_s") or 0) <= min_s:
        return
    runs = [rec["spark_s"]]
    for _ in range(2):
        wd = threading.Timer(cap, spark.sparkContext.cancelAllJobs)
        wd.start()
        t0 = time.perf_counter()
        try:
            action(e.build(spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 1))
        except Exception:  # noqa: BLE001 - a failed re-run is recorded as null
            runs.append(None)
        finally:
            wd.cancel()
            force_release_all(spark)
    rec["runs"] = runs
    rec["spark_cold_s"] = runs[0]
    rec["spark_s"] = min(r for r in runs if r is not None)


def main() -> int:
    import duckdb

    from hadoop_3_0_0_beta1_gaia_spark.plans.registry import all_entries
    from hadoop_3_0_0_beta1_gaia_spark.session import force_release_all
    from hadoop_3_0_0_beta1_gaia_spark.session import get_session

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_sweep.jsonl"
    cap = float(sys.argv[2]) if len(sys.argv) > 2 else 600.0
    entries = all_entries()
    explicit = sys.argv[3:]
    names = explicit or (
        [n for n in entries if n not in HEAVY_LAST]
        + [n for n in HEAVY_LAST if n in entries]
    )

    spark = get_session(app_name="gaia-spark-sf-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        # partial fixtures are legitimate (/tmp/sf30 is documents-only);
        # register the views that exist and let an entry touching a missing
        # table fail loudly at its own row rather than killing the sweep
        path = os.path.join(SF_DIR, t) + ".parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        else:
            print(f"note: {t} absent in {SF_DIR}; view not registered", flush=True)

    # Resume skips only already-recorded names from an AUTO run; explicitly
    # requested names always re-run (retrying a failed entry must not be
    # silently filtered out by its own stale failure record).
    existing: list[dict] = (
        [json.loads(l) for l in open(out_path)] if os.path.exists(out_path) else []
    )
    if existing and not explicit:
        seen = {r["name"] for r in existing if not r.get("superseded")}
        names = [n for n in names if n not in seen]
        print(f"resuming: {len(existing)} entries already recorded")

    def emit(rec: dict) -> None:
        # one row per entry per artifact: a re-run SUPERSEDES earlier rows
        # for the same name, explicitly flagged (VERDICT r6 item 8 — the r6
        # artifact carried a stale TIMEOUT next to its PASS rerun with no
        # marker); the whole file is atomically rewritten so a duplicate
        # unmarked row can never appear
        for old in existing:
            if old["name"] == rec["name"] and not old.get("superseded"):
                old["superseded"] = True
        existing.append(rec)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            for r in existing:
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, out_path)
    fails = 0
    for idx, name in enumerate(names):
        e = entries[name]
        rec = {"name": name, "status": "PASS"}
        timed_out = threading.Event()

        def _kill():
            timed_out.set()
            spark.sparkContext.cancelAllJobs()
            con.interrupt()

        count_only = name in os.environ.get("SWEEP_COUNT_ONLY", "").split(",")
        spark_only = name in os.environ.get("SWEEP_SPARK_ONLY", "").split(",")
        digest_mode = name in os.environ.get("SWEEP_DIGEST", "").split(",")
        if name in os.environ.get("SWEEP_BOUNDARY_PINNED", "").split(","):
            rec["status"] = "SKIP"
            rec["mode"] = "boundary-pinned"
            rec["err"] = (
                "uncapped posture pinned as a permanent boundary (SCALE.md); "
                "capped twin is the production config — not re-probed"
            )
            emit(rec)
            print(f"[{idx + 1}/{len(names)}] SKIP {name} (boundary-pinned)")
            continue
        watchdog = threading.Timer(cap, _kill)
        watchdog.start()
        t0 = time.perf_counter()
        try:
            df = e.build(spark, SF_DIR)
            if digest_mode and e.oracle is not None:
                rec["mode"] = "digest"
                sd = _spark_digest(df)
                rec["spark_s"] = round(time.perf_counter() - t0, 1)
                rec["rows"] = sd[0]
                rec["digest_spark"] = list(sd)
                t1 = time.perf_counter()
                dd = _duck_digest(con, e.oracle)
                rec["duck_s"] = round(time.perf_counter() - t1, 1)
                rec["digest_duck"] = list(dd)
                if sd != dd:
                    rec["status"] = "FAIL"
                    rec["err"] = f"digest {sd} vs {dd}"
                watchdog.cancel()
                force_release_all(spark)
                _retime(rec, spark, e, cap, lambda d: _spark_digest(d)[0])
                if rec["status"] != "PASS":
                    fails += 1
                emit(rec)
                print(f"[{idx + 1}/{len(names)}] {rec['status']} {name} "
                      f"(digest) spark={rec.get('spark_s')}s "
                      f"duck={rec.get('duck_s')}s rows={rec.get('rows')} "
                      f"{rec.get('err', '')}")
                continue
            if count_only or spark_only:
                rec["mode"] = "count" if count_only else "spark-only"
                if spark_only:
                    # a bare count() lets Catalyst prune every computed
                    # column (a per-doc scoring entry undertimed 5-10x in
                    # the r10 slope probes) — spark-only rows force full
                    # value evaluation through the engine-side digest
                    sd = _spark_digest(df)
                    n_spark = sd[0]
                    rec["digest_spark"] = list(sd)
                else:
                    n_spark = df.count()
                rec["spark_s"] = round(time.perf_counter() - t0, 1)
                rec["rows"] = n_spark
                if count_only and e.oracle is not None:
                    t1 = time.perf_counter()
                    (n_duck,) = con.execute(
                        f"SELECT count(*) FROM ({e.oracle})"
                    ).fetchone()
                    rec["duck_s"] = round(time.perf_counter() - t1, 1)
                    if n_duck != n_spark:
                        rec["status"] = "FAIL"
                        rec["err"] = f"counts {n_spark} vs {n_duck}"
                watchdog.cancel()
                force_release_all(spark)
                action = (
                    (lambda d: _spark_digest(d)[0]) if spark_only
                    else (lambda d: d.count())
                )
                _retime(rec, spark, e, cap, action)
                if rec["status"] != "PASS":
                    fails += 1
                emit(rec)
                print(f"[{idx + 1}/{len(names)}] {rec['status']} {name} "
                      f"({rec['mode']}) spark={rec.get('spark_s')}s "
                      f"duck={rec.get('duck_s')}s rows={rec.get('rows')} "
                      f"{rec.get('err', '')}")
                continue
            spark_rows = [tuple(r) for r in df.collect()]
            rec["spark_s"] = round(time.perf_counter() - t0, 1)
            rec["rows"] = len(spark_rows)
            if e.oracle is not None:
                t1 = time.perf_counter()
                res = con.execute(e.oracle)
                duck_cols = [d[0] for d in res.description]
                duck_rows = res.fetchall()
                rec["duck_s"] = round(time.perf_counter() - t1, 1)
                if len(duck_rows) != len(spark_rows):
                    rec["status"] = "FAIL"
                    rec["err"] = f"rows {len(spark_rows)} vs {len(duck_rows)}"
                elif _norm(spark_rows, df.columns) != _norm(duck_rows, duck_cols):
                    rec["status"] = "FAIL"
                    rec["err"] = "values differ"
        except Exception as ex:  # noqa: BLE001
            rec["status"] = "TIMEOUT" if timed_out.is_set() else "ERROR"
            rec["err"] = repr(ex)[:300]
            # Never clobber an already-recorded spark_s: if the Spark side
            # finished (rows present) and the ORACLE overran the cap, the
            # engine time must survive — total_s carries the full elapsed.
            # (Pre-fix records conflated the two: a TIMEOUT row with rows
            # recorded had spark_s = spark + oracle-until-interrupt.)
            rec.setdefault("spark_s", round(time.perf_counter() - t0, 1))
            rec["total_s"] = round(time.perf_counter() - t0, 1)
        finally:
            watchdog.cancel()
            if timed_out.is_set():
                # a fired watchdog races the cap-overrunning entry's still-
                # submitting jobs; cancel again and let canceled stages drain
                # so the NEXT entry's jobs don't get caught in the sweep
                # (observed: entry N's 600 s cancel killed entry N+1's
                # collect at sf10)
                try:
                    spark.sparkContext.cancelAllJobs()
                except Exception:
                    pass
                time.sleep(3)
        force_release_all(spark)
        _retime(rec, spark, e, cap, lambda d: d.collect())
        if rec["status"] != "PASS":
            fails += 1
        emit(rec)
        print(f"[{idx + 1}/{len(names)}] {rec['status']} {name} "
              f"spark={rec.get('spark_s')}s duck={rec.get('duck_s')}s "
              f"rows={rec.get('rows')} {rec.get('err', '')}")
    print(f"done: {fails} non-pass")
    con.close()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
