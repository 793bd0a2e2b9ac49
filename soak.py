#!/usr/bin/env python3
"""Scale soak — the LargeSorter / BigMapOutput / GenericMRLoadGenerator
analog (reference benchmark harnesses, SURVEY §6): stress the engine well
past the pytest scale and self-validate, printing one JSON line per stage.

Stages:
  terasort   N×100-byte records: generate → checksum → total-order sort →
             TeraValidate (order within partitions, boundary keys, checksum).
  dedup      MinHash-LSH near-dup over documents at $SPARK_GRAFT_SF_DIR.
  rank       two-phase global rank over lineitem (no single-partition window).

Usage: python soak.py [n_tera_rows]   (default 2,000,000 ≈ 200 MB of records)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_TERA = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from hadoop_3_0_0_beta1_gaia_spark.functions.dedup import minhash_lsh_pairs
    from hadoop_3_0_0_beta1_gaia_spark.operators.sort import global_rank
    from hadoop_3_0_0_beta1_gaia_spark.operators.terasort import (
        checksum,
        terasort,
        teravalidate,
    )
    from hadoop_3_0_0_beta1_gaia_spark.session import get_session, table as T
    from hadoop_3_0_0_beta1_gaia_spark.sources.generators import teragen

    spark = get_session(app_name="gaia-spark-soak")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}

    t0 = time.perf_counter()
    gen = teragen(spark, N_TERA, num_partitions=32)
    csum = checksum(gen)
    v = teravalidate(terasort(gen, num_partitions=32), csum)
    results["terasort"] = {
        "rows": v.n_rows,
        "ok": v.ok,
        "sec": round(time.perf_counter() - t0, 2),
    }
    assert v.ok, v

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(T(spark, SF_DIR, "documents")).count()
    results["dedup"] = {"pairs": pairs, "sec": round(time.perf_counter() - t0, 2)}
    spark.catalog.clearCache()  # drop stage-persisted frames between stages

    t0 = time.perf_counter()
    from hadoop_3_0_0_beta1_gaia_spark.plans.registry import queries as _qs

    winnow = _qs()["doc_winnow_near_dup"](spark, SF_DIR).count()
    results["winnow"] = {"rows": winnow, "sec": round(time.perf_counter() - t0, 2)}
    spark.catalog.clearCache()

    t0 = time.perf_counter()
    li = T(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    ranked = global_rank(
        li, [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]
    )
    top = ranked.agg(F.max("rank").alias("m"), F.count("*").alias("n")).collect()[0]
    assert top["m"] == top["n"], (top["m"], top["n"])  # dense 1..N global rank
    results["rank"] = {"rows": int(top["n"]), "sec": round(time.perf_counter() - t0, 2)}

    print(json.dumps({"soak": results, "n_tera": N_TERA, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
