"""Skew-robustness fixture: zipf-keyed data with ANALYTICALLY known answers.

The 100 TB killers are skew-shaped (one mega-customer, a null-ish default
key, a boilerplate near-dup cluster) and the shipped testdata is uniform —
so these tests build a deterministic power-law corpus by construction
(cluster c has ``top >> c`` rows: 50%, 25%, 12.5%, ... of the data) and pin

1. correctness under the hot key: salted_agg / salted_join / the capped-LSH
   bucket drop / range_join_bucketed all return the analytic answer, and
2. the DISTRIBUTION property that is the whole point of salting: the
   hottest shuffle partition's share of rows drops by ~num_salts, so no
   single task inherits the whole heavy hitter.

Reference surface: the reference's only skew answer is a hand-written
Partitioner (MR-CORE .../mapreduce/Partitioner.java:58); these pin the
engine's scale extensions (operators/skew.py, functions/dedup.py caps).
"""

from __future__ import annotations

from pyspark.sql import functions as F

N_KEYS = 8  # key c carries 2**(N_KEYS-1-c) * BASE rows: 128,64,...,1 * BASE
BASE = 50


def _zipf_rows(spark, base=BASE, n_keys=N_KEYS):
    """(key, val) rows where key c has base * 2**(n_keys-1-c) rows and val
    is the within-key index — per-key counts and sums are closed-form."""
    rows = spark.range(base * (2 ** n_keys - 1)).select(F.col("id"))
    # row i belongs to key c iff i in [base*(2**n-2**(n-c)), ...): compute by
    # log2 of the remaining index — declarative, no driver-side data
    n = n_keys
    expr = (
        F.floor(F.log2((F.lit(2 ** n) - F.floor(F.col("id") / base) - 1)))
    )
    return rows.select(
        (F.lit(n - 1) - expr).cast("int").alias("key"),
        F.col("id").alias("val"),
    )


def test_zipf_fixture_shape(spark):
    df = _zipf_rows(spark)
    counts = {r["key"]: r["n"] for r in df.groupBy("key").count().withColumnRenamed("count", "n").collect()}
    assert counts == {c: BASE * 2 ** (N_KEYS - 1 - c) for c in range(N_KEYS)}


def test_salted_agg_zipf_analytic_and_spread(spark):
    """salted_agg returns the exact per-key counts/sums of the zipf corpus
    AND bounds the hottest partial-aggregate partition: with num_salts=16
    no (key, salt) group exceeds ~hot/16, so no task inherits the hot key."""
    from hadoop_3_0_0_beta1_gaia_spark.operators.skew import salted_agg

    df = _zipf_rows(spark)
    out = salted_agg(
        df,
        "key",
        [("n", F.count("*"), F.sum("n")), ("s", F.sum("val"), F.sum("s"))],
        num_salts=16,
        salt_source="val",
    )
    got = {r["key"]: (r["n"], r["s"]) for r in out.collect()}
    # analytic: key c rows are the contiguous id range [lo, lo+cnt)
    lo = 0
    for c in range(N_KEYS):
        cnt = BASE * 2 ** (N_KEYS - 1 - c)
        s = (lo + lo + cnt - 1) * cnt // 2
        assert got[c] == (cnt, s), f"key {c}"
        lo += cnt

    # distribution: the stage-1 groups split the hot key ~uniformly
    salt = (F.abs(F.hash(F.col("val"))) % 16).alias("salt")
    sizes = (
        df.groupBy("key", salt).count().filter(F.col("key") == 0).collect()
    )
    hot = BASE * 2 ** (N_KEYS - 1)
    assert len(sizes) == 16  # every salt bucket populated
    assert max(r["count"] for r in sizes) < hot / 16 * 2  # no task owns the key


def test_salted_join_zipf_analytic_and_spread(spark):
    """salted_join on the zipf fact x 2-rows-per-key dim: row count is the
    analytic fan-out, values match the plain join, and the salted shuffle
    key (key, salt) splits the hot key's rows across partitions."""
    from hadoop_3_0_0_beta1_gaia_spark.operators.skew import salted_join

    big = _zipf_rows(spark)
    small = spark.range(N_KEYS).select(
        F.col("id").cast("int").alias("sk")
    ).withColumn("tag", F.explode(F.array(F.lit("a"), F.lit("b"))))
    out = salted_join(big, small, "key", "sk", num_salts=8, salt_source="val")
    total = BASE * (2 ** N_KEYS - 1)
    assert out.count() == total * 2  # every fact row matches exactly 2 dim rows
    # hot-key slice agrees with the plain join exactly
    plain_hot = (
        big.filter("key = 0").join(small, F.col("key") == F.col("sk")).count()
    )
    assert out.filter("key = 0").count() == plain_hot

    # distribution: physical partitioning on (key, salt) vs key alone
    hot = BASE * 2 ** (N_KEYS - 1)
    salted_parts = (
        big.withColumn("salt", (F.abs(F.hash("val")) % 8).cast("int"))
        .repartition(32, "key", "salt")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    plain_parts = (
        big.repartition(32, "key")
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )
    assert plain_parts >= hot  # unsalted: one partition owns the whole hot key
    assert salted_parts < hot / 2  # salted: no partition owns even half of it


def test_lsh_cap_drops_hot_cluster_keeps_tail(spark):
    """Capped MinHash-LSH under a zipf-shaped near-dup corpus: one
    boilerplate mega-cluster (64 near-identical docs) plus small clusters.
    max_bucket_size drops the mega-cluster's k^2 buckets (counters fire) but
    every small-cluster pair survives — governance for the 100 TB corpus
    where boilerplate would otherwise dominate the banding shuffle."""
    from hadoop_3_0_0_beta1_gaia_spark.functions.dedup import minhash_lsh_pairs

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    rows = []
    # mega-cluster: 64 docs, identical text (ids 0..63)
    rows += [(i, base) for i in range(64)]
    # two small near-dup clusters (ids 100/101, 200/201) + singletons
    rows += [(100, base + " uniform x100"), (101, base + " uniform x100")]
    rows += [(200, "zulu yankee xray whiskey victor " * 4 + "end marker one"),
             (201, "zulu yankee xray whiskey victor " * 4 + "end marker one")]
    rows += [(300 + i, f"completely different text number {i} " * 5)
             for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = minhash_lsh_pairs(docs, max_bucket_size=8)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # small clusters survive intact...
    assert (100, 101) in pairs and (200, 201) in pairs
    # ...and the mega-cluster's quadratic expansion is suppressed: a 64-doc
    # identical cluster would contribute C(64,2)=2016 pairs uncapped
    mega = [p for p in pairs if p[0] < 64 and p[1] < 64]
    assert len(mega) == 0


def test_df_cap_drops_boilerplate_keeps_rare_pairs(spark):
    """max_df on the shingle-join generators (ngram_jaccard / containment):
    a boilerplate sentence shared by 40 docs would contribute C(40,2)-scale
    join pairs per shingle; the df cap drops those shingles (counters fire)
    while a genuine near-dup pair built from RARE shingles keeps its pair —
    and its jaccard is computed over the capped universe."""
    from hadoop_3_0_0_beta1_gaia_spark.functions.dedup import (
        cap_counter,
        ngram_jaccard_pairs,
    )

    boiler = "this content is provided as is without any warranty of any kind"
    rows = [(i, boiler) for i in range(40)]  # 40-doc boilerplate cluster
    rare = "quasar nebula pulsar magnetar blazar kilonova parallax syzygy"
    rows += [(100, rare + " alpha"), (101, rare + " omega")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    diag = {}
    capped = ngram_jaccard_pairs(docs, n=3, threshold=0.4, max_df=4, diag=diag)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in capped.collect()}
    # the rare-shingle near-dup pair survives; every boilerplate pair is gone
    assert (100, 101) in pairs
    assert not [p for p in pairs if p[0] < 40 and p[1] < 40]
    # capped-universe jaccard: 9 tokens/doc -> 7 trigrams, 6 shared rare
    # trigrams (df=2), last trigram of each doc unique => 6/(7+7-6)
    assert pairs[(100, 101)] == round(6 / 8, 4)
    # counters: the boilerplate doc's shingles all have df=40 > 4
    n_boiler_shingles = len(boiler.split()) - 2
    # per-call diag dict: no module-global counter registry to cross-wire
    m = cap_counter(diag)
    assert m["df_dropped_shingles"] == n_boiler_shingles
    assert m["df_dropped_rows"] == 40 * n_boiler_shingles


def test_df_cap_diag_keys_are_per_generator(spark):
    """One diag dict shared across TWO capped generators must keep BOTH
    metrics readable by name (ADVICE r9: the fixed 'observation' key made
    the second build silently clobber the first — the module-global
    cross-wiring class, reproduced at call scope). Unnamed reads stay valid
    for the single-generator case, raise loudly for the shared one, and
    re-running the same generator on one dict is a collision."""
    import pytest as _pytest

    from hadoop_3_0_0_beta1_gaia_spark.functions.dedup import (
        cap_counter,
        containment_pairs,
        ngram_jaccard_pairs,
    )

    boiler = "one two three four five six seven eight nine ten eleven twelve"
    rows = [(i, boiler) for i in range(10)]
    rows += [(100, "rare alpha beta gamma delta"), (101, "rare alpha beta gamma zeta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    diag = {}
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.1, max_df=4, diag=diag)
    con = containment_pairs(docs, n=3, threshold=0.1, max_df=4, diag=diag)
    jac.count()
    con.count()
    m_jac = cap_counter(diag, "shingle_df_cap_ngram_jaccard")
    m_con = cap_counter(diag, "shingle_df_cap_containment")
    n_boiler = len(boiler.split()) - 2
    assert m_jac["df_dropped_shingles"] == n_boiler
    assert m_con["df_dropped_shingles"] == n_boiler  # NOT clobbered
    with _pytest.raises(ValueError, match="name the one to read"):
        cap_counter(diag)
    with _pytest.raises(ValueError, match="fresh dict"):
        ngram_jaccard_pairs(docs, n=3, threshold=0.1, max_df=4, diag=diag)
    # absent name reads as empty, never KeyError
    assert cap_counter(diag, "substring_occ_cap") == {}


def test_df_cap_containment_subset_pair_survives(spark):
    """Containment's defining subset pair (short doc embedded in a long one)
    still surfaces under the df cap when its shingles are rare."""
    from hadoop_3_0_0_beta1_gaia_spark.functions.dedup import containment_pairs

    short = "emerald sapphire obsidian basalt granite quartz"
    long_doc = short + " feldspar mica schist gneiss marble slate limestone"
    boiler = "click here to accept the terms and conditions of this site"
    rows = [(i, boiler) for i in range(20)]
    rows += [(100, short), (101, long_doc)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = {
        (r["id_a"], r["id_b"]): r["cont_max"]
        for r in containment_pairs(docs, n=3, threshold=0.6, max_df=4).collect()
    }
    # all 4 of short's trigrams appear in long_doc => C(short in long) = 1.0
    assert out == {(100, 101): 1.0}


def test_range_join_bucketed_hot_interval(spark):
    """range_join_bucketed with a HOT interval spanning the whole range plus
    narrow ones: the analytic match count holds (hot matches all probes) and
    the plan stays an equi-join on the bucket key, never a nested loop."""
    from hadoop_3_0_0_beta1_gaia_spark.operators.skew import range_join_bucketed

    probes = spark.sql(
        "SELECT id AS pid, date_add(DATE'2024-01-01', CAST(id % 56 AS INT)) AS ts "
        "FROM range(400)"
    )
    intervals = spark.sql(
        """SELECT * FROM VALUES
             (1, DATE'2024-01-01', DATE'2024-03-01'),
             (2, DATE'2024-01-08', DATE'2024-01-15'),
             (3, DATE'2024-02-01', DATE'2024-02-08')
           AS t(iid, start_d, end_d)"""
    )
    out = range_join_bucketed(probes, intervals, "ts", "start_d", "end_d")
    counts = {r["iid"]: r["n"] for r in
              out.groupBy("iid").agg(F.count("*").alias("n")).collect()}
    # hot interval covers all 56 distinct days -> all 400 probes
    assert counts[1] == 400
    # narrow intervals: 7 days x ceil-share of 400 probes over 56 day slots
    assert counts[2] == sum(1 for i in range(400) if 7 <= i % 56 < 14)
    assert counts[3] == sum(1 for i in range(400) if 31 <= i % 56 < 38)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
