"""SparkSession factory + table registry.

Maps the reference's job-submission machinery (Job.waitForCompletion →
YARN/MRAppMaster, SURVEY §3.1) onto a single SparkSession: Catalyst is the
planner the reference never had, and the scale knobs below are the analog of
``io.sort.mb`` / ``dfs.blocksize`` / slowstart tuning
(reference: hadoop-mapreduce-client-core .../mapred/MapTask.java:885-1009,
hdfs-default.xml dfs.blocksize=128MB).

100 TB posture (tested on local[32], designed for a 1000-executor cluster):
- AQE on: runtime coalescing of post-shuffle partitions + skew-join splitting
  replaces hand-tuned reducer counts.
- shuffle.partitions default kept moderate locally; on a real cluster set it
  ~2-3x total cores or rely on AQE's initialPartitionNum.
- maxPartitionBytes=128m mirrors the reference's HDFS block-sized splits
  (FileInputFormat.getSplits, LIB/input/FileInputFormat.java:386-444).
- autoBroadcastJoinThreshold raised: every dimension table of the star schema
  (region/nation/customer/supplier/part at sane SFs) should broadcast — the
  reference's DistributedCache replicated-join idiom, now automatic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_session(
    app_name: str = "gaia-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's scale posture."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))),
        )
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Pin the JVM locale (ADVICE r11): the text kernels lower-case with
        # Python str.lower() while their expression twins use JVM
        # String.toLowerCase() under the DEFAULT locale — a tr_TR/az JVM
        # would diverge on ASCII 'I'. en_US is root-equivalent for ASCII.
        # (No effect on an already-running JVM: getOrCreate reuses it, and
        # the fixtures are ASCII-only anyway; this pins fresh deployments.)
        .config("spark.driver.extraJavaOptions", "-Duser.language=en -Duser.country=US")
        .config("spark.executor.extraJavaOptions", "-Duser.language=en -Duser.country=US")
    )
    return builder.getOrCreate()


# Timestamp columns in the driver testdata. The files carry parquet
# TIMESTAMP(NANOS) which Spark refuses to read natively; we read nanos as
# long (legacy conf) and rebuild TIMESTAMP_NTZ values with exact integer
# arithmetic (DIV + decimal seconds — no double rounding at 1e18 nanos).
# NTZ keeps every downstream filter/format independent of the session
# timezone, matching DuckDB's naive-timestamp view of the same files.
_TS_COLS = {
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
    "events": ("ts",),
}

_NANOS_TO_NTZ = (
    "TIMESTAMP_NTZ '1970-01-01 00:00:00' "
    "+ make_dt_interval(0, 0, 0, CAST(`{c}` DIV 1000 AS DECIMAL(20,0)) / 1000000)"
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table (TESTDATA.md)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _TS_COLS.get(name, ()):
        if df.schema[c].dataType.simpleString() == "bigint":
            df = df.withColumn(c, F.expr(_NANOS_TO_NTZ.format(c=c)))
    return df


def instant_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Rebuild ``col`` as an instant TIMESTAMP from either stored shape.

    Parquet TIMESTAMP(NANOS) arrives as bigint nanos under the legacy
    nanosAsLong conf (pyspark <= 4.0) or as TIMESTAMP_NTZ natively
    (pyspark 4.1+, which ignores that conf). Either way the stored wall-clock
    is taken as UTC and converted through exact integer micros — never via an
    NTZ->LTZ cast, which would silently depend on the session timezone.
    """
    kind = df.schema[col].dataType.simpleString()
    if kind == "bigint":
        micros = F.expr(f"`{col}` DIV 1000")
    elif kind == "timestamp_ntz":
        micros = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col}`)"
        )
    elif kind == "timestamp":
        return df
    else:  # pragma: no cover - testdata regression guard
        raise TypeError(f"unexpected stored timestamp type {kind!r} for {col!r}")
    return df.withColumn(col, F.timestamp_micros(micros))


def stage_dir(prefix: str, sf_dir: str, name: str) -> str:
    """Local staging path for queries that exercise a write+read round trip
    (xml/mapfile/codec/partitioned sinks, streaming source dirs): one
    sanitization rule for every stage so concurrent SFs cannot collide.
    Local-mode shim — on a cluster these would be real warehouse paths."""
    return os.path.join(prefix, sf_dir.strip("/").replace("/", "_"), name)


def register_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; return the frames."""
    out = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Spread a narrow scan across the cluster before CPU-heavy map work.

    Small single-file tables arrive as ONE partition (a parquet file with one
    row group can't be split), so every downstream map-side kernel — shingle
    hashing, winnowing, vector kernels — runs on one core. A cheap round-robin
    repartition buys full parallelism; a no-op when the scan already has
    enough partitions (the 100 TB case, where inputs are thousands of files).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


# ---------------------------------------------------------------------------
# Helper-persist ownership ledger
# ---------------------------------------------------------------------------
# One-shot query helpers persist an intermediate that several branches of the
# RETURNED plan consume (shingle frames, bucket-keyed vector frames, range
# partitionings). The helper cannot unpersist before returning — the caller's
# action still needs the cache — so without an owner the entry outlives the
# query and, in a long-lived session running many queries back-to-back,
# cached partitions accumulate until executor-storage eviction. The ledger
# makes release deterministic: helpers register through owned_persist();
# callers (bench.py, soak.py, the oracle gate, any service embedding these
# helpers) call release_owned() after each query's terminal action.
# Unpersisting is always SAFE, never a correctness hazard: a live plan that
# still references the cache falls back to recomputing its lineage.

_OWNED_PERSISTS: list[DataFrame] = []


def owned_persist(df: DataFrame, level=None) -> DataFrame:
    """Persist a helper intermediate and record it for deterministic release.

    Use for frames the RETURNED plan references (no in-function unpersist
    possible); keep plain persist+unpersist for frames fully consumed inside
    the helper (BPE vocab swap, components iteration, hll fine table).
    """
    from pyspark import StorageLevel

    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    _OWNED_PERSISTS.append(df)
    return df


def release_owned() -> int:
    """Unpersist every ledger entry (non-blocking); returns count released."""
    n = 0
    for f in _OWNED_PERSISTS:
        try:
            f.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing left to release
    _OWNED_PERSISTS.clear()
    return n


def cached_entry_count(spark: SparkSession) -> int:
    """Number of RDDs currently persisted in the session — the soak gate
    asserts this returns to zero between stages (storage stays flat)."""
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def force_release_all(spark: SparkSession) -> int:
    """Release EVERYTHING persisted in the session: ledger-owned helper
    persists, catalog-cached relations, and any persistent RDD still left —
    notably ``localCheckpoint`` residue, which ``clearCache()`` cannot reach
    (it is not a catalog relation) and the ContextCleaner frees only after a
    JVM+Python GC of the last reference. Iterative helpers (BPE vocab swap,
    connected components, hll rollup) localCheckpoint per round precisely to
    bound lineage, so a long session accrues these until GC.

    Only safe at STAGE BOUNDARIES: a localCheckpoint'ed frame must not be
    re-executed after this call (its lineage was truncated, so the fallback
    recompute path of plain unpersist does not exist). bench/soak/sweep call
    it between independent queries, where nothing is re-executed.

    Returns the number of RDDs force-unpersisted (post-clearCache residue).
    """
    release_owned()
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    it = jsc.getPersistentRDDs().values().iterator()
    n = 0
    while it.hasNext():
        it.next().unpersist(False)
        n += 1
    return n
