"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, IVF bucket assignment as
the scale path. Dot products stay inside Catalyst (`zip_with` + `aggregate`
fold — element-order summation, which DuckDB's list functions share, so
results are oracle-comparable after rounding).

Scale notes: brute-force is O(Q·N·d) — fine for a re-rank stage or small Q;
the IVF path shrinks N per query to one bucket (centroid assignment is a
broadcast join: centroids are tiny by construction). At 100 TB the pattern is
IVF/LSH-bucket first, brute-force re-rank inside buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rounding import duck_fround, fround


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Element-order left-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = as_double(F.col(vec_col))
    return df.withColumn("__v", v).withColumn("__n2", dot(F.col("__v"), F.col("__v")))


def cosine_topk(
    df: DataFrame,
    k: int = 5,
    query_filter: Column | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k neighbors for each query vector.

    Ranking uses the ROUNDED cosine with the neighbor id as tie-break, so the
    result is stable across engines despite last-ulp float differences.
    """
    base = with_norm(df, vec_col).select(
        F.col(id_col).alias("id"), "__v", "__n2"
    )
    q = base.filter(query_filter) if query_filter is not None else base
    q = q.select(
        F.col("id").alias("q_id"), F.col("__v").alias("qv"), F.col("__n2").alias("qn")
    )
    n = base.select(
        F.col("id").alias("n_id"), F.col("__v").alias("nv"), F.col("__n2").alias("nn")
    )
    # The query side is the small one (a re-rank/query batch): broadcast it so
    # the neighbor scan streams with no shuffle (BroadcastNestedLoopJoin).
    pairs = F.broadcast(q).crossJoin(n).filter(F.col("q_id") != F.col("n_id"))
    cos = fround(
        dot(F.col("qv"), F.col("nv")) / F.sqrt(F.col("qn") * F.col("nn")),
        round_digits,
    )
    scored = pairs.select("q_id", "n_id", cos.alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def duckdb_cosine_topk(
    table: str,
    k: int = 5,
    query_where: str = "TRUE",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> str:
    v = f"list_transform({vec_col}, x -> x::DOUBLE)"
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, {v} AS v,
                   list_dot_product({v}, {v}) AS n2
            FROM {table}
        ),
        q AS (SELECT id AS q_id, v AS qv, n2 AS qn FROM base
              WHERE {query_where.replace(id_col, 'id')}),
        scored AS (
            SELECT q.q_id, n.id AS n_id,
                   {duck_fround('list_dot_product(q.qv, n.v) / sqrt(q.qn * n.n2)', round_digits)} AS cos
            FROM q CROSS JOIN base n
            WHERE q.q_id <> n.id
        )
        SELECT q_id, n_id, cos, rank FROM (
            SELECT q_id, n_id, cos,
                   row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rank
            FROM scored
        ) WHERE rank <= {k}
    """


def cosine_near_dup(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a_id < b_id) with rounded
    cosine >= threshold. Exact O(n²) baseline — the correctness anchor for
    the bucketed variants (MinHash/IVF); at 100 TB run IVF bucket assignment
    first and this join only within buckets (same ``cos`` expression)."""
    base = with_norm(df, vec_col).select(F.col(id_col).alias("id"), "__v", "__n2")
    a = base.select(
        F.col("id").alias("a_id"), F.col("__v").alias("av"), F.col("__n2").alias("an")
    )
    b = base.select(
        F.col("id").alias("b_id"), F.col("__v").alias("bv"), F.col("__n2").alias("bn")
    )
    pairs = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
    cos = fround(
        dot(F.col("av"), F.col("bv")) / F.sqrt(F.col("an") * F.col("bn")),
        round_digits,
    )
    return (
        pairs.select("a_id", "b_id", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def duckdb_cosine_near_dup(
    table: str,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> str:
    v = f"list_transform({vec_col}, x -> x::DOUBLE)"
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, {v} AS v, list_dot_product({v}, {v}) AS n2
            FROM {table}
        )
        SELECT a_id, b_id, cos FROM (
            SELECT a.id AS a_id, b.id AS b_id,
                   {duck_fround('list_dot_product(a.v, b.v) / sqrt(a.n2 * b.n2)', round_digits)} AS cos
            FROM base a JOIN base b ON a.id < b.id
        ) WHERE cos >= {threshold}
    """


def ivf_assign(
    df: DataFrame,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF coarse quantizer, deterministic seeding: the first
    ``num_centroids`` vectors (by id) are the centroids; every vector is
    assigned to its max-cosine centroid (rounded, centroid-id tie-break).
    The centroid side is broadcast — the scan side streams, no shuffle."""
    base = with_norm(df, vec_col).select(F.col(id_col).alias("id"), "__v", "__n2")
    cents = (
        base.orderBy("id").limit(num_centroids).select(
            F.col("id").alias("c_id"), F.col("__v").alias("cv"), F.col("__n2").alias("cn")
        )
    )
    pairs = base.crossJoin(F.broadcast(cents))
    cos = fround(
        dot(F.col("__v"), F.col("cv")) / F.sqrt(F.col("__n2") * F.col("cn")),
        round_digits,
    )
    scored = pairs.select("id", "c_id", cos.alias("cos"))
    pick = Window.partitionBy("id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return (
        scored.withColumn("r", F.row_number().over(pick))
        .filter(F.col("r") == 1)
        .select(F.col("id").alias("vec_id"), F.col("c_id").alias("centroid_id"),
                F.col("cos").alias("cos"))
    )


def duckdb_ivf_assign(
    table: str,
    num_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> str:
    v = f"list_transform({vec_col}, x -> x::DOUBLE)"
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, {v} AS v, list_dot_product({v}, {v}) AS n2
            FROM {table}
        ),
        cents AS (
            SELECT id AS c_id, v AS cv, n2 AS cn FROM base ORDER BY id LIMIT {num_centroids}
        ),
        scored AS (
            SELECT base.id, c_id,
                   {duck_fround('list_dot_product(v, cv) / sqrt(n2 * cn)', round_digits)} AS cos
            FROM base CROSS JOIN cents
        )
        SELECT id AS vec_id, c_id AS centroid_id, cos FROM (
            SELECT id, c_id, cos,
                   row_number() OVER (PARTITION BY id ORDER BY cos DESC, c_id) AS r
            FROM scored
        ) WHERE r = 1
    """
