"""KMV (k-minimum-values) distinct-count sketch.

The scalable alternative to exact ``count(DISTINCT ...)``:
``approx_count_distinct`` (HLL) is Spark's built-in answer, but its estimate
is implementation-specific — useless for a cross-engine oracle. KMV gives the
same one-pass / mergeable / bounded-state properties with a DETERMINISTIC
estimate both engines reproduce exactly:

- hash every value to a uniform fraction of [0, 2^60) (md5-derived — the
  engine's portable hash, same as the samplers and generators);
- keep the k smallest distinct hashes per group (bounded state: k longs);
- if fewer than k distinct hashes exist the count is exact; otherwise
  estimate n ≈ (k-1) / (kth_min / 2^60)  (the classic KMV estimator).

Standard error is ~1/sqrt(k-2) (~12.6% at k=64). At 100 TB the k-smallest
set is algebraic (merge = union + re-truncate), so partial aggregation
applies — here expressed as distinct → per-key rank → filter, which Spark
executes as two hash shuffles with map-side partials.

Reference parallel: UniqValueCount.java:35-75 caps its EXACT set at
maxNumItems by silently truncating (covered by the ``uniq_value_count``
inventory entry); KMV is the principled bounded-state version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import duck_md5_long, md5_long
from .rounding import duck_fround, fround

_TWO_60 = float(2**60)


def kmv_distinct(
    df: DataFrame,
    key: str,
    value: str,
    k: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Per-``key`` KMV estimate of distinct ``value`` count.

    Output: (key, n_seen long  — min(k, true distinct), kmv_estimate double).
    """
    hashed = df.select(
        F.col(key), md5_long(F.col(value).cast("string")).alias("__h")
    ).distinct()
    w = Window.partitionBy(key).orderBy("__h")
    kept = hashed.withColumn("__r", F.row_number().over(w)).filter(F.col("__r") <= k)
    est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("__kth").cast("double") / F.lit(_TWO_60)))
    return (
        kept.groupBy(key)
        .agg(F.count("*").alias("n_seen"), F.max("__h").alias("__kth"))
        .select(
            key,
            "n_seen",
            fround(est, round_digits).alias("kmv_estimate"),
        )
    )


def duckdb_kmv_distinct(
    table: str,
    key: str,
    value: str,
    k: int = 64,
    round_digits: int = 4,
) -> str:
    h = duck_md5_long(f"{value}::VARCHAR")
    est = (
        f"CASE WHEN n_seen < {k} THEN n_seen::DOUBLE "
        f"ELSE {float(k - 1)} / (kth::DOUBLE / {_TWO_60}) END"
    )
    return f"""
        WITH hashed AS (
            SELECT DISTINCT {key} AS key, {h} AS h FROM {table}
        ),
        kept AS (
            SELECT key, h FROM (
                SELECT key, h, row_number() OVER (PARTITION BY key ORDER BY h) AS r
                FROM hashed
            ) WHERE r <= {k}
        )
        SELECT key AS {key}, n_seen, {duck_fround(est, round_digits)} AS kmv_estimate
        FROM (
            SELECT key, count(*) AS n_seen, max(h) AS kth
            FROM kept GROUP BY key
        )
    """


# ---------------------------------------------------------------------------
# HyperLogLog with a deterministic, cross-engine-exact estimate
# ---------------------------------------------------------------------------
#
# Spark's approx_count_distinct IS HyperLogLog++, but its estimate is
# implementation-specific (dense/sparse encodings, bias tables) — useless for
# an oracle. This is textbook Flajolet HLL over the engine's portable
# md5-derived hash, with every step exact:
#
# - h = md5_long(value)            (60 bits, uniform)
# - register j = h % m             (m = 2^p buckets)
# - w = h DIV m                    (the remaining 60-p bits)
# - rho(w) = leading-zero count + 1, computed EXACTLY via the bit-length of
#   w's binary string (bin() exists in both engines; no float log2, whose
#   boundary error at exact powers of two would flip a register)
# - register value M_j = max rho   (per-group, a plain hash agg)
# - the harmonic denominator sum_j 2^(-M_j) is rescaled by 2^(60-p+1) so
#   every term is an exact BIGINT power of two: the sum is order-free integer
#   arithmetic, and the single double division at the end starts from
#   identical bits on any engine at any parallelism.
#
# No small/large-range corrections: they need ln(), which is not correctly
# rounded and differs between libm builds. The raw estimator plus the
# zero-register count (linear-counting input) are emitted instead; callers
# needing bias correction apply it driver-side to the 1-row-per-group output.
# State is m integers per group — mergeable, bounded, the 100 TB shape.

_HLL_P = 8
_HLL_M = 2**_HLL_P  # 256 registers
_HLL_WBITS = 60 - _HLL_P  # bits in w
_HLL_RMAX = _HLL_WBITS + 1  # rho when w == 0
# alpha_m * m^2 * 2^RMAX as ONE python-float literal shared by both engines
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)
_HLL_NUM = _HLL_ALPHA * _HLL_M * _HLL_M * float(2**_HLL_RMAX)


def hll_distinct(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-``key`` deterministic-HLL estimate of distinct ``value`` count.

    Output: (key, hll_estimate double, zero_registers long, n_exact long).
    n_exact (the exact distinct count) is emitted alongside so the sketch
    error is oracle-visible rather than asserted.
    """
    h = md5_long(F.col(value).cast("string"))
    hashed = df.select(
        F.col(key),
        (h % _HLL_M).alias("__j"),
        # h is a non-negative 60-bit long: integer DIV is exact (no float trip)
        h.alias("__h"),
    ).withColumn("__w", F.expr(f"__h DIV {_HLL_M}")).drop("__h")
    rho = F.when(F.col("__w") == 0, F.lit(_HLL_RMAX)).otherwise(
        F.lit(_HLL_WBITS) - F.length(F.bin(F.col("__w"))) + 1
    )
    regs = (
        hashed.groupBy(key, "__j")
        .agg(F.max(rho).alias("__mj"))
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_RMAX} - __mj AS INT))")
    per_key = regs.groupBy(key).agg(
        F.count("*").alias("__present"),
        F.sum(term).alias("__s_present"),
    )
    # registers never hit contribute 2^RMAX each (M_j = 0)
    s_total = F.col("__s_present") + (
        (F.lit(_HLL_M) - F.col("__present")) * F.lit(2**_HLL_RMAX)
    )
    exact = df.groupBy(key).agg(
        F.count_distinct(F.col(value)).alias("n_exact")
    )
    return (
        per_key.select(
            F.col(key),
            fround(F.lit(_HLL_NUM) / s_total.cast("double"), 4).alias(
                "hll_estimate"
            ),
            (F.lit(_HLL_M) - F.col("__present")).cast("long").alias(
                "zero_registers"
            ),
        )
        .join(exact, key)
    )


def duckdb_hll_distinct(table: str, key: str, value: str) -> str:
    h = duck_md5_long(f"{value}::VARCHAR")
    return f"""
        WITH hashed AS (
            SELECT {key} AS key,
                   {h} % {_HLL_M} AS j,
                   {h} // {_HLL_M} AS w
            FROM {table}
        ),
        regs AS (
            SELECT key, j,
                   max(CASE WHEN w = 0 THEN {_HLL_RMAX}
                            ELSE {_HLL_WBITS} - length(bin(w)) + 1 END) AS mj
            FROM hashed GROUP BY key, j
        ),
        per_key AS (
            SELECT key,
                   count(*) AS present,
                   CAST(sum(1::BIGINT << ({_HLL_RMAX} - mj)) AS BIGINT) AS s_present
            FROM regs GROUP BY key
        ),
        exact AS (
            SELECT {key} AS key, count(DISTINCT {value}) AS n_exact FROM {table}
            GROUP BY {key}
        )
        SELECT key AS {key},
               {duck_fround(
                   f"{_HLL_NUM!r} / CAST(s_present + ({_HLL_M} - present) * {2**_HLL_RMAX}::BIGINT AS DOUBLE)",
                   4,
               )} AS hll_estimate,
               CAST({_HLL_M} - present AS BIGINT) AS zero_registers,
               n_exact
        FROM per_key JOIN exact USING (key)
    """


def hll_merge_demo(df: DataFrame, part: "F.Column", value: str) -> DataFrame:
    """HLL mergeability proof: build one register table PER PARTITION SLICE
    (``part`` — e.g. the event day), merge the slices with a register-wise
    max, and compute the same estimate directly over the full stream. The
    two estimates are equal by algebra (max is associative/commutative), and
    BOTH are emitted so the oracle verifies the merge path, not just asserts
    it.

    This is the property that makes sketches the 100 TB answer: per-day (or
    per-file, per-partition) sketch tables persist as tiny artifacts and
    roll up into any coarser grain without touching the raw data again.
    Output: 1 row (n_slices, merged_estimate, direct_estimate,
    estimates_equal, n_exact).
    """
    h = md5_long(F.col(value).cast("string"))
    hashed = (
        df.select(part.alias("__p"), (h % _HLL_M).alias("__j"), h.alias("__h"))
        .withColumn("__w", F.expr(f"__h DIV {_HLL_M}"))
        .drop("__h")
    )
    rho = F.when(F.col("__w") == 0, F.lit(_HLL_RMAX)).otherwise(
        F.lit(_HLL_WBITS) - F.length(F.bin(F.col("__w"))) + 1
    )
    slice_regs = hashed.groupBy("__p", "__j").agg(F.max(rho).alias("__mj"))
    merged_regs = slice_regs.groupBy("__j").agg(F.max("__mj").alias("__mj"))
    direct_regs = hashed.groupBy("__j").agg(F.max(rho).alias("__mj"))

    def estimate(regs: DataFrame, name: str) -> DataFrame:
        term = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_RMAX} - __mj AS INT))"
        )
        agg = regs.agg(
            F.count("*").alias("__present"), F.sum(term).alias("__s_present")
        )
        s_total = F.col("__s_present") + (
            (F.lit(_HLL_M) - F.col("__present")) * F.lit(2**_HLL_RMAX)
        )
        return agg.select(
            fround(F.lit(_HLL_NUM) / s_total.cast("double"), 4).alias(name)
        )

    n_slices = slice_regs.select("__p").distinct().agg(
        F.count("*").cast("long").alias("n_slices")
    )
    exact = df.agg(F.count_distinct(F.col(value)).alias("n_exact"))
    m = estimate(merged_regs, "merged_estimate")
    d = estimate(direct_regs, "direct_estimate")
    return (
        n_slices.crossJoin(m)
        .crossJoin(d)
        .crossJoin(exact)
        .withColumn(
            "estimates_equal", F.col("merged_estimate") == F.col("direct_estimate")
        )
    )


def duckdb_hll_merge_demo(table: str, part_sql: str, value: str) -> str:
    h = duck_md5_long(f"{value}::VARCHAR")
    est = (
        f"{_HLL_NUM!r} / CAST(s_present + ({_HLL_M} - present) * "
        f"{2**_HLL_RMAX}::BIGINT AS DOUBLE)"
    )
    return f"""
        WITH hashed AS (
            SELECT {part_sql} AS p,
                   {h} % {_HLL_M} AS j,
                   {h} // {_HLL_M} AS w
            FROM {table}
        ),
        rho AS (
            SELECT p, j, CASE WHEN w = 0 THEN {_HLL_RMAX}
                              ELSE {_HLL_WBITS} - length(bin(w)) + 1 END AS r
            FROM hashed
        ),
        slice_regs AS (SELECT p, j, max(r) AS mj FROM rho GROUP BY p, j),
        merged_regs AS (SELECT j, max(mj) AS mj FROM slice_regs GROUP BY j),
        direct_regs AS (SELECT j, max(r) AS mj FROM rho GROUP BY j),
        m AS (
            SELECT count(*) AS present,
                   CAST(sum(1::BIGINT << ({_HLL_RMAX} - mj)) AS BIGINT) AS s_present
            FROM merged_regs
        ),
        d AS (
            SELECT count(*) AS present,
                   CAST(sum(1::BIGINT << ({_HLL_RMAX} - mj)) AS BIGINT) AS s_present
            FROM direct_regs
        )
        SELECT (SELECT CAST(count(DISTINCT p) AS BIGINT) FROM slice_regs) AS n_slices,
               (SELECT {duck_fround(est, 4)} FROM m) AS merged_estimate,
               (SELECT {duck_fround(est, 4)} FROM d) AS direct_estimate,
               (SELECT {duck_fround(est, 4)} FROM m)
                   = (SELECT {duck_fround(est, 4)} FROM d) AS estimates_equal,
               (SELECT count(DISTINCT {value}) FROM {table}) AS n_exact
    """


def hll_rollup(df: DataFrame, type_col: str, day_col: "F.Column", value: str) -> DataFrame:
    """One fine-grained HLL register table serves EVERY coarser grain: build
    (type, day, register) once, then roll registers up by max to per-type,
    per-day, and global estimates — three grains, zero re-reads of the raw
    data (the composition of :func:`hll_merge_demo`'s merge property with
    grouping). Output: (grain, type_key, day_key, estimate) rows.
    """
    h = md5_long(F.col(value).cast("string"))
    hashed = (
        df.select(
            F.col(type_col).alias("__ty"),
            day_col.alias("__dy"),
            (h % _HLL_M).alias("__j"),
            h.alias("__h"),
        )
        .withColumn("__w", F.expr(f"__h DIV {_HLL_M}"))
        .drop("__h")
    )
    rho = F.when(F.col("__w") == 0, F.lit(_HLL_RMAX)).otherwise(
        F.lit(_HLL_WBITS) - F.length(F.bin(F.col("__w"))) + 1
    )
    from pyspark import StorageLevel

    fine = (
        hashed.groupBy("__ty", "__dy", "__j")
        .agg(F.max(rho).alias("__mj"))
        .persist(StorageLevel.MEMORY_AND_DISK)  # three rollups read it
    )

    def estimate_over(regs: DataFrame, keys: list, grain: str) -> DataFrame:
        term = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({_HLL_RMAX} - __mj AS INT))"
        )
        agg = regs.groupBy(*keys).agg(
            F.count("*").alias("__present"), F.sum(term).alias("__s_present")
        )
        s_total = F.col("__s_present") + (
            (F.lit(_HLL_M) - F.col("__present")) * F.lit(2**_HLL_RMAX)
        )
        null_str = F.lit(None).cast("string")
        return agg.select(
            F.lit(grain).alias("grain"),
            (F.col("__ty") if "__ty" in keys else null_str).alias("type_key"),
            (F.col("__dy") if "__dy" in keys else null_str).alias("day_key"),
            fround(F.lit(_HLL_NUM) / s_total.cast("double"), 4).alias("estimate"),
        )

    per_type = estimate_over(
        fine.groupBy("__ty", "__j").agg(F.max("__mj").alias("__mj")), ["__ty"], "type"
    )
    per_day = estimate_over(
        fine.groupBy("__dy", "__j").agg(F.max("__mj").alias("__mj")), ["__dy"], "day"
    )
    overall = estimate_over(
        fine.groupBy("__j").agg(F.max("__mj").alias("__mj")), [], "global"
    )
    # The rollup output is tiny (one row per grain key); materialize it
    # eagerly so the shared register table can be unpersisted here instead of
    # leaking for the session lifetime (ADVICE r3).
    result = (
        per_type.unionByName(per_day).unionByName(overall).localCheckpoint(eager=True)
    )
    fine.unpersist()
    return result


def duckdb_hll_rollup(table: str, type_col: str, day_sql: str, value: str) -> str:
    h = duck_md5_long(f"{value}::VARCHAR")
    est = (
        f"{_HLL_NUM!r} / CAST(s_present + ({_HLL_M} - present) * "
        f"{2**_HLL_RMAX}::BIGINT AS DOUBLE)"
    )

    def grain(keys_sel: str, group: str, grain_name: str, ty: str, dy: str) -> str:
        g = f"GROUP BY {group}" if group else ""
        return f"""
            SELECT '{grain_name}' AS grain, {ty} AS type_key, {dy} AS day_key,
                   {duck_fround(est, 4)} AS estimate
            FROM (
                SELECT {keys_sel + ', ' if keys_sel else ''}count(*) AS present,
                       CAST(sum(1::BIGINT << ({_HLL_RMAX} - mj)) AS BIGINT) AS s_present
                FROM ({{regs}}) {g}
            )"""

    regs_ty = "SELECT ty, j, max(mj) AS mj FROM fine GROUP BY ty, j"
    regs_dy = "SELECT dy, j, max(mj) AS mj FROM fine GROUP BY dy, j"
    regs_all = "SELECT j, max(mj) AS mj FROM fine GROUP BY j"
    return f"""
        WITH hashed AS (
            SELECT {type_col} AS ty, {day_sql} AS dy,
                   {h} % {_HLL_M} AS j,
                   {h} // {_HLL_M} AS w
            FROM {table}
        ),
        fine AS (
            SELECT ty, dy, j,
                   max(CASE WHEN w = 0 THEN {_HLL_RMAX}
                            ELSE {_HLL_WBITS} - length(bin(w)) + 1 END) AS mj
            FROM hashed GROUP BY ty, dy, j
        )
        {grain("ty", "ty", "type", "ty", "NULL::VARCHAR").format(regs=regs_ty)}
        UNION ALL
        {grain("dy", "dy", "day", "NULL::VARCHAR", "dy").format(regs=regs_dy)}
        UNION ALL
        {grain("", "", "global", "NULL::VARCHAR", "NULL::VARCHAR").format(regs=regs_all)}
    """


def kmv_set_overlap(
    dfa: DataFrame,
    dfb: DataFrame,
    value: str,
    k: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """KMV sketch SET ALGEBRA (Beyer et al. 2007): estimate |A ∪ B|,
    |A ∩ B| and Jaccard(A, B) from the two k-minimum-value sketches ALONE —
    the audience-overlap query at 100 TB, where A and B are distinct-value
    sets too large to intersect exactly and only their k-hash sketches are
    retained.

    Construction (every step deterministic integer/md5 arithmetic):
    - sketch each side: k smallest distinct md5 hashes;
    - Kθ = the k smallest of the UNION of the two sketches (a valid KMV
      sketch of A ∪ B — the standard closure property);
    - union_est from Kθ's kth minimum (the usual KMV estimator);
    - jaccard_est = |{h ∈ Kθ : h ∈ sketch(A) ∧ h ∈ sketch(B)}| / |Kθ|;
    - inter_est = round-half-up of jaccard_est × union_est.

    Exact |A|, |B|, |A ∩ B| are emitted alongside for error visibility
    (the hll_distinct/cms pattern). Output: one row.
    """
    ha = dfa.select(md5_long(F.col(value).cast("string")).alias("h")).distinct()
    hb = dfb.select(md5_long(F.col(value).cast("string")).alias("h")).distinct()

    def sketch(h: DataFrame) -> DataFrame:
        w = Window.orderBy("h")
        # bounded input: the window runs over distinct hashes of one side —
        # at true 100 TB scale replace with the two-phase k-smallest
        # (per-partition top-k then merge), same result by exactness of top-k
        return h.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)

    sa = sketch(ha).select(F.col("h").alias("h"), F.lit(1).alias("in_a"))
    sb = sketch(hb).select(F.col("h").alias("h"), F.lit(1).alias("in_b"))
    merged = (
        sa.join(sb, "h", "full")
        .select(
            "h",
            F.coalesce("in_a", F.lit(0)).alias("in_a"),
            F.coalesce("in_b", F.lit(0)).alias("in_b"),
        )
    )
    w = Window.orderBy("h")
    ktheta = merged.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    stats = ktheta.agg(
        F.count("*").alias("n_seen"),
        F.max("h").alias("kth"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    union_est = F.when(
        F.col("n_seen") < k, F.col("n_seen").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("kth").cast("double") / F.lit(_TWO_60)))
    exact = (
        dfa.select(F.col(value).alias("v"))
        .distinct()
        .withColumn("ea", F.lit(1))
        .join(
            dfb.select(F.col(value).alias("v")).distinct().withColumn("eb", F.lit(1)),
            "v",
            "full",
        )
        .agg(
            F.sum("ea").cast("long").alias("n_a_exact"),
            F.sum("eb").cast("long").alias("n_b_exact"),
            F.sum(F.col("ea") * F.col("eb")).cast("long").alias("n_inter_exact"),
        )
    )
    jac = F.col("n_both").cast("double") / F.col("n_seen")
    return stats.crossJoin(F.broadcast(exact)).select(
        fround(union_est, round_digits).alias("union_est"),
        fround(jac, round_digits).alias("jaccard_est"),
        F.floor(jac * union_est + F.lit(0.5)).cast("long").alias("inter_est"),
        F.col("n_both").cast("long").alias("sketch_overlap"),
        "n_a_exact",
        "n_b_exact",
        "n_inter_exact",
    )


def duckdb_kmv_set_overlap(
    a_sql: str,
    b_sql: str,
    value: str,
    k: int = 64,
    round_digits: int = 4,
) -> str:
    h = duck_md5_long(f"{value}::VARCHAR")
    est = (
        f"CASE WHEN n_seen < {k} THEN n_seen::DOUBLE "
        f"ELSE {float(k - 1)} / (kth::DOUBLE / {_TWO_60}) END"
    )
    return f"""
        WITH ha AS (SELECT DISTINCT {h} AS h FROM ({a_sql})),
        hb AS (SELECT DISTINCT {h} AS h FROM ({b_sql})),
        sa AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS r FROM ha)
               WHERE r <= {k}),
        sb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS r FROM hb)
               WHERE r <= {k}),
        merged AS (
            SELECT coalesce(sa.h, sb.h) AS h,
                   CASE WHEN sa.h IS NULL THEN 0 ELSE 1 END AS in_a,
                   CASE WHEN sb.h IS NULL THEN 0 ELSE 1 END AS in_b
            FROM sa FULL JOIN sb ON sa.h = sb.h
        ),
        ktheta AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (ORDER BY h) AS r FROM merged
            ) WHERE r <= {k}
        ),
        stats AS (
            SELECT count(*) AS n_seen, max(h) AS kth,
                   sum(in_a * in_b) AS n_both
            FROM ktheta
        ),
        ex AS (
            SELECT CAST(sum(ea) AS BIGINT) AS n_a_exact,
                   CAST(sum(eb) AS BIGINT) AS n_b_exact,
                   CAST(sum(ea * eb) AS BIGINT) AS n_inter_exact
            FROM (
                SELECT coalesce(a.v, b.v) AS v,
                       CASE WHEN a.v IS NULL THEN NULL ELSE 1 END AS ea,
                       CASE WHEN b.v IS NULL THEN NULL ELSE 1 END AS eb
                FROM (SELECT DISTINCT {value} AS v FROM ({a_sql})) a
                FULL JOIN (SELECT DISTINCT {value} AS v FROM ({b_sql})) b
                  ON a.v = b.v
            )
        )
        SELECT {duck_fround(est, round_digits)} AS union_est,
               {duck_fround("n_both::DOUBLE / n_seen", round_digits)} AS jaccard_est,
               CAST(floor(n_both::DOUBLE / n_seen * ({est}) + 0.5) AS BIGINT)
                   AS inter_est,
               CAST(n_both AS BIGINT) AS sketch_overlap,
               n_a_exact, n_b_exact, n_inter_exact
        FROM stats, ex
    """
