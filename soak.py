#!/usr/bin/env python3
"""Scale soak — the LargeSorter / BigMapOutput / GenericMRLoadGenerator
analog (reference benchmark harnesses, SURVEY §6): stress the engine well
past the pytest scale and self-validate, printing one JSON line per stage.

Stages:
  terasort   N×100-byte records: generate → checksum → total-order sort →
             TeraValidate (order within partitions, boundary keys, checksum).
  dedup      MinHash-LSH near-dup over documents at $SPARK_GRAFT_SF_DIR.
  winnow     winnowing near-dup over documents (2nd-heaviest text pipeline).
  rank       two-phase global rank over lineitem (no single-partition window).
  io         TestDFSIO analog (MR-JC fs/TestDFSIO.java): write N MB parquet,
             read it back, report MB/s each way.
  zorder     z-order layout job over orders (normalize → interleave →
             two-phase rank → file boxes).
  kmeans     k-means Lloyd refinement over embeddings (iterative loop).
  semantic_dedup  SemDeDup cluster-then-dedup over embeddings.
  smalljob   MRBench analog (MR-JC mapred/MRBench.java): repeated tiny
             map+reduce jobs; reports avg ms per job (scheduler overhead).

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

    from hadoop_3_0_0_beta1_gaia_spark.session import (
        cached_entry_count,
        force_release_all,
    )

    spark = get_session(app_name="gaia-spark-soak")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}

    def flat() -> None:
        """Release helper-owned persists + cache between stages and ASSERT
        storage is flat — a full soak pass must end every stage with zero
        cached RDDs (VERDICT r4: returned-frame persists had no owner, so a
        long-lived session accumulated cache until executor eviction).
        force_release_all also sweeps localCheckpoint residue, which
        clearCache cannot reach; stages are independent, so truncated
        lineage is never re-executed."""
        force_release_all(spark)
        n = cached_entry_count(spark)
        assert n == 0, f"storage not flat after stage: {n} persisted RDDs"

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
    flat()  # drop stage-persisted frames between stages; assert flat storage

    t0 = time.perf_counter()
    from hadoop_3_0_0_beta1_gaia_spark.plans.registry import queries as _qs

    winnow = _qs()["doc_winnow_near_dup"](spark, SF_DIR).count()
    results["winnow"] = {"rows": winnow, "sec": round(time.perf_counter() - t0, 2)}
    flat()

    t0 = time.perf_counter()
    li = T(spark, SF_DIR, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    ranked = global_rank(
        li, [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]
    )
    top = ranked.agg(F.max("rank").alias("m"), F.count("*").alias("n")).collect()[0]
    assert top["m"] == top["n"], (top["m"], top["n"])  # dense 1..N global rank
    results["rank"] = {"rows": int(top["n"]), "sec": round(time.perf_counter() - t0, 2)}
    flat()

    # TestDFSIO analog: parquet write/read throughput over generated rows.
    io_dir = "/tmp/gaia_spark_soak_io"
    n_io = 2_000_000  # ~32 MB of (long, double, string) rows
    io_df = spark.range(n_io).select(
        F.col("id"),
        (F.col("id") * 1.5).alias("x"),
        F.md5(F.col("id").cast("string")).alias("s"),
    )
    t0 = time.perf_counter()
    io_df.repartition(32).write.mode("overwrite").parquet(io_dir)
    w_sec = time.perf_counter() - t0
    size_mb = sum(
        os.path.getsize(os.path.join(io_dir, f))
        for f in os.listdir(io_dir)
        if f.endswith(".parquet")
    ) / 1e6
    t0 = time.perf_counter()
    back = spark.read.parquet(io_dir)
    n_back = back.count()
    assert n_back == n_io, (n_back, n_io)
    r_sec = time.perf_counter() - t0
    results["io"] = {
        "mb": round(size_mb, 1),
        "write_mb_s": round(size_mb / w_sec, 1),
        "read_mb_s": round(size_mb / r_sec, 1),
    }

    # layout + clustering stages: the two newest multi-phase pipelines get
    # the same regression tracking as dedup/winnow.
    t0 = time.perf_counter()
    zrows = _qs()["zorder_layout_orders"](spark, SF_DIR).count()
    results["zorder"] = {"files": zrows, "sec": round(time.perf_counter() - t0, 2)}
    flat()

    t0 = time.perf_counter()
    krows = _qs()["kmeans_lloyd_refine"](spark, SF_DIR).count()
    results["kmeans"] = {"rows": krows, "sec": round(time.perf_counter() - t0, 2)}
    flat()

    # SemDeDup: the cluster-then-dedup embedding pipeline (bucketed O(n²/k)
    # within-cluster compares — the heaviest of the new similarity entries).
    t0 = time.perf_counter()
    sd = _qs()["semantic_dedup_keep"](spark, SF_DIR)
    skept = sd.filter("keep").count()
    results["semantic_dedup"] = {
        "kept": skept,
        "sec": round(time.perf_counter() - t0, 2),
    }
    flat()

    # SimHash Hamming pair search: the r4 band-join shape (the collect_set
    # form OOMed at 10x — this stage keeps the streaming join honest).
    # Since r7 the entry runs on its saturation-demo 20% slice (doc_id%5=0),
    # so the pair count here is the bounded-slice output, not the old ~1.5M.
    t0 = time.perf_counter()
    sh = _qs()["dedup_simhash_hamming"](spark, SF_DIR).count()
    results["simhash"] = {"pairs": sh, "sec": round(time.perf_counter() - t0, 2)}
    flat()

    # JPEG codec kernel: encode+decode a 16x16 image per document through
    # the pure-Python T.81 path (numpy DCT) inside mapInPandas.
    t0 = time.perf_counter()
    jp = _qs()["jpeg_decode_blocks"](spark, SF_DIR)
    jok = jp.filter("roundtrip_ok").count()
    jn = jp.count()
    assert jok == jn, (jok, jn)
    results["jpeg"] = {"docs": jn, "sec": round(time.perf_counter() - t0, 2)}
    flat()

    # Video stage: per-doc MJPEG-AVI container build + frame-sampled decode
    # (the full RIFF walk + Huffman/IDCT path under sustained load).
    t0 = time.perf_counter()
    vf = _qs()["video_frames_sample"](spark, SF_DIR)
    vok = vf.filter("roundtrip_ok").count()
    vn = vf.count()
    assert vok == vn, (vok, vn)
    results["video"] = {"frames": vn, "sec": round(time.perf_counter() - t0, 2)}
    flat()

    # MRBench analog: latency of repeated tiny map+reduce jobs.
    reps = 10
    t0 = time.perf_counter()
    for i in range(reps):
        spark.range(100).groupBy((F.col("id") % 7).alias("k")).count().collect()
    results["smalljob"] = {
        "reps": reps,
        "avg_ms": round((time.perf_counter() - t0) / reps * 1000, 1),
    }

    print(json.dumps({"soak": results, "n_tera": N_TERA, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()
