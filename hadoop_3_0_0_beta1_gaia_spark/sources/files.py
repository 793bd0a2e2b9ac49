"""Whole-file reading, distributed copy, and small-file compaction.

Re-expresses (SURVEY §2.1/§2.10):
- ``read_whole_files``   → WholeFileRecordReader (MR-EX/MultiFileWordCount.java):
  one record per file.
- ``distcp``             → DistCp (hadoop-tools/hadoop-distcp/.../DistCp.java:60,
  mapred/CopyMapper.java:48): parallel file copy with -update (skip files whose
  size already matches) and -overwrite semantics. The copy listing is built on
  the driver (like CopyListing), the byte copy runs in executor tasks — the one
  genuinely imperative per-partition job in this engine (RDD escape hatch, as
  CopyMapper is pure side-effecting I/O).
- ``compact_small_files``→ HadoopArchives (hadoop-tools/hadoop-archives):
  many-small-files packing, as a coalesced rewrite into ~target-sized parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_whole_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per file: (path, content string). sc.wholeTextFiles — the
    WholeFileRecordReader contract (never splits a file)."""
    rdd = spark.sparkContext.wholeTextFiles(path_glob)
    return spark.createDataFrame(rdd, "path: string, content: string")


def read_binary_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Binary variant via the binaryFile source: (path, modificationTime,
    length, content binary). Metadata-only plans prune the content column."""
    return spark.read.format("binaryFile").load(path_glob)


def _list_tree(base: str) -> list[tuple[str, int]]:
    """(rel_path, size) listing — the driver-side CopyListing."""
    out: list[tuple[str, int]] = []
    for root, _dirs, files in os.walk(base):
        for name in files:
            p = os.path.join(root, name)
            out.append((os.path.relpath(p, base), os.path.getsize(p)))
    return out


def _file_md5(path: str) -> str:
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def distcp(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    update: bool = True,
    overwrite: bool = False,
    checksum: bool = False,
    num_tasks: int | None = None,
) -> dict[str, int]:
    """Parallel directory copy. Returns counters {copied, skipped, bytes}
    (DistCp's COPY/SKIP/BYTESCOPIED counters).

    - ``update``: skip files whose destination exists with the same size
      (CopyMapper.canSkip — DistCpUtils.checksumsAreEqual analog).
    - ``checksum``: with ``update``, a same-sized destination must ALSO match
      the source's md5 to be skipped (the reference's checksum compare;
      size-only matches the reference's ``-skipcrccheck``). Checksums are
      computed in the copy tasks, never on the driver.
    - ``overwrite``: copy unconditionally.
    Listing is driver-side (CopyListing); copies run per-partition.
    """
    src_dir = os.path.abspath(src_dir)
    dst_dir = os.path.abspath(dst_dir)
    listing = _list_tree(src_dir)

    sc = spark.sparkContext
    n = num_tasks or min(max(1, len(listing)), sc.defaultParallelism)

    def copy_partition(items):
        import shutil

        copied = skipped = nbytes = 0
        for rel, size in items:
            s, d = os.path.join(src_dir, rel), os.path.join(dst_dir, rel)
            if (
                not overwrite
                and update
                and os.path.exists(d)
                and os.path.getsize(d) == size
                and (not checksum or _file_md5(s) == _file_md5(d))
            ):
                skipped += 1
                continue
            os.makedirs(os.path.dirname(d), exist_ok=True)
            shutil.copyfile(s, d)
            copied += 1
            nbytes += size
        yield (copied, skipped, nbytes)

    totals = sc.parallelize(listing, n).mapPartitions(copy_partition).collect()
    copied = sum(t[0] for t in totals)
    skipped = sum(t[1] for t in totals)
    nbytes = sum(t[2] for t in totals)
    return {"copied": copied, "skipped": skipped, "bytes": nbytes}


def distcp_diff(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    num_tasks: int | None = None,
) -> DataFrame:
    """DistCp ``-diff`` report: one row per path present in either tree with
    status ``added`` (source only), ``removed`` (target only), ``changed``
    (both, different size or md5), or ``same``. Listings are driver-side
    (like CopyListing); the md5 comparisons run in executor tasks.
    ``distcp(update=True, checksum=True)`` afterwards converges the target."""
    src_dir = os.path.abspath(src_dir)
    dst_dir = os.path.abspath(dst_dir)
    src = dict(_list_tree(src_dir))
    dst = dict(_list_tree(dst_dir))
    rels = sorted(set(src) | set(dst))

    sc = spark.sparkContext
    n = num_tasks or min(max(1, len(rels)), sc.defaultParallelism)

    def status(rel: str) -> tuple[str, str]:
        in_src, in_dst = rel in src, rel in dst
        if in_src and not in_dst:
            return rel, "added"
        if in_dst and not in_src:
            return rel, "removed"
        if src[rel] != dst[rel]:
            return rel, "changed"
        s, d = os.path.join(src_dir, rel), os.path.join(dst_dir, rel)
        return rel, "changed" if _file_md5(s) != _file_md5(d) else "same"

    rows = sc.parallelize(rels, n).map(status)
    return spark.createDataFrame(rows, "path: string, status: string")


def compact_small_files(
    df: DataFrame,
    dst: str,
    target_partition_bytes: int = 128 * 1024 * 1024,
    mode: str = "overwrite",
) -> int:
    """HAR-style compaction: rewrite a many-small-files dataset into
    ~target-sized parquet parts. Partition count is estimated from the plan's
    size statistics; returns it."""
    stats_bytes = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    n = max(1, int((int(stats_bytes) + target_partition_bytes - 1) // target_partition_bytes))
    df.repartition(n).write.mode(mode).parquet(dst)
    return n
