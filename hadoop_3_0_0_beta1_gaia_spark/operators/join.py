"""Join operators — the reference's three join families, Spark-first.

1. Map-side composite joins (LIB/join/CompositeInputFormat.java:60-96,
   InnerJoinRecordReader.java, OuterJoinRecordReader.java,
   OverrideRecordReader.java:42-84 — SURVEY §2.6): a join-expression language
   ``inner(a, b, override(c, d))`` over keyed sources. The reference requires
   identically-partitioned/sorted inputs and merges them map-side; on Spark we
   declare the equi-join and let Catalyst pick SortMergeJoin (or broadcast) —
   bucketed tables recover the co-located no-shuffle property at scale.

2. Reduce-side tagged join (hadoop-datajoin DataJoinReducerBase.java:47):
   per-key cross product of tagged sources with an arbitrary predicate on the
   pair → equi-join + theta filter.

3. Broadcast/replicated join (DistributedCache idiom) → ``F.broadcast``.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_full_outer(left: DataFrame, right: DataFrame) -> DataFrame:
    """Full-outer join two frames on `key`, coalescing the key column."""
    lkeep = [c for c in left.columns if c != "key"]
    rkeep = [c for c in right.columns if c != "key"]
    return (
        left.alias("l")
        .join(right.alias("r"), F.col("l.key") == F.col("r.key"), "full_outer")
        .select(
            F.coalesce(F.col("l.key"), F.col("r.key")).alias("key"),
            *[F.col(f"l.{c}") for c in lkeep],
            *[F.col(f"r.{c}") for c in rkeep],
        )
    )


def _keyed(df: DataFrame, key: str, value: str, alias: str) -> DataFrame:
    return df.select(F.col(key).alias("key"), F.col(value).alias(f"v_{alias}"))


def composite_inner_join(
    sources: list[tuple[str, DataFrame]], key: str = "key", value: str = "value"
) -> DataFrame:
    """N-way inner composite (InnerJoinRecordReader.java:34-45): emit only
    keys present in ALL sources; one value column per source (``v_<name>``)."""
    frames = [_keyed(df, key, value, name) for name, df in sources]
    return reduce(lambda a, b: a.join(b, "key", "inner"), frames)


def composite_outer_join(
    sources: list[tuple[str, DataFrame]], key: str = "key", value: str = "value"
) -> DataFrame:
    """Full-outer N-way composite (OuterJoinRecordReader.java:34-45): one row
    per key in any source, one value column per source (null when absent) —
    TupleWritable's written-bitmask becomes plain SQL NULLs."""
    frames = [_keyed(df, key, value, name) for name, df in sources]
    return reduce(_merge_full_outer, frames)


def override_join(
    sources: list[tuple[str, DataFrame]], key: str = "key", value: str = "value"
) -> DataFrame:
    """Rightmost-source-wins join (OverrideRecordReader.java:42-84).

    One row per key present in ANY source; the value comes from the rightmost
    source containing the key: full-outer merge + coalesce in reverse order.
    """
    merged = composite_outer_join(sources, key, value)
    vcols = [f"v_{name}" for name, _ in sources]
    return merged.select(
        "key", F.coalesce(*[F.col(c) for c in reversed(vcols)]).alias("value")
    )


def datajoin_theta(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | Column,
    theta: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Reduce-side tagged join (DataJoinReducerBase.java:47): group both
    sides by key, per-key cross-product, arbitrary predicate on each pair.
    Spark-first form: equi-join on the key + theta filter — Catalyst keeps the
    equi part hash/merge-joinable instead of a true cross product."""
    j = left.join(right, on, how)
    return j.filter(theta) if theta is not None else j


def broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
    max_bytes: int | None = 512 << 20,
) -> DataFrame:
    """Replicated join — DistributedCache idiom (SURVEY §2.6) →
    BroadcastHashJoin hint; at 100 TB this is how every star-schema dimension
    should join.

    A forced hint overrides Spark's autoBroadcastJoinThreshold, so a dimension
    that grows with SF (e.g. TPC-H ``part``) would OOM executors at cluster
    scale. ``max_bytes`` guards against that: if Catalyst's optimized-plan size
    estimate exceeds it, fall back to a plain join and let AQE choose the
    strategy. Pass ``max_bytes=None`` to force the hint unconditionally (the
    literal DistributedCache semantics — caller asserts the dim is bounded).
    """
    if max_bytes is not None:
        try:
            est = int(dim._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        except Exception:  # Spark Connect or stats unavailable — keep the hint
            est = -1
        if est > max_bytes:
            return fact.join(dim, on, how)
    return fact.join(F.broadcast(dim), on, how)


# ---------------------------------------------------------------------------
# Join-expression language: inner(tbl(fmt,"a"), override(tbl(fmt,"b"), c))
# ---------------------------------------------------------------------------

_TOKENS = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*|\(|\)|,|\"[^\"]*\")")


def _tokenize(expr: str) -> list[str]:
    pos, out = 0, []
    while pos < len(expr):
        if expr[pos].isspace():
            pos += 1
            continue
        m = _TOKENS.match(expr, pos)
        if not m:
            raise ValueError(f"bad join expression at {expr[pos:]!r}")
        out.append(m.group(1))
        pos = m.end()
    return out


class _Parser:
    """Recursive-descent parser for the CompositeInputFormat expression
    grammar (CompositeInputFormat.java:70-80), adapted so ``tbl(Format,
    "name")`` resolves a named (key, value) DataFrame from a catalog and bare
    identifiers are shorthand. Every node yields a (key, value) frame —
    inner/outer pack per-source values into a struct ``value`` column,
    mirroring TupleWritable nesting; override yields the single winning value.
    """

    def __init__(
        self,
        tokens: list[str],
        catalog: dict[str, DataFrame],
        ops: dict | None = None,
    ):
        self.toks = tokens
        self.i = 0
        self.catalog = catalog
        self.ops = ops or {}
        self.n_node = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def eat(self, expected: str | None = None) -> str:
        if self.i >= len(self.toks):
            raise ValueError("unexpected end of join expression")
        tok = self.toks[self.i]
        if expected is not None and tok != expected:
            raise ValueError(f"expected {expected!r}, got {tok!r}")
        self.i += 1
        return tok

    def parse(self) -> DataFrame:
        df = self.expr()
        if self.peek() is not None:
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return df

    def expr(self) -> DataFrame:
        head = self.eat()
        if self.peek() != "(":
            return self._leaf(head)
        self.eat("(")
        if head == "tbl":
            self.eat()  # format name — storage detail, irrelevant on Spark
            self.eat(",")
            name = self.eat().strip('"')
            self.eat(")")
            return self._leaf(name)
        children = [self.expr()]
        while self.peek() == ",":
            self.eat(",")
            children.append(self.expr())
        self.eat(")")
        self.n_node += 1
        named = [(f"n{self.n_node}s{idx}", df) for idx, df in enumerate(children)]
        if head == "inner":
            out = composite_inner_join(named)
        elif head == "outer":
            out = composite_outer_join(named)
        elif head == "override":
            return override_join(named)
        elif head in self.ops:
            # user-defined op (mapreduce.join.define.<ident> analog,
            # CompositeInputFormat.java:44-47): fn(named_sources) -> DataFrame
            return self.ops[head](named)
        else:
            raise ValueError(f"unknown join op {head!r}")
        vcols = [c for c in out.columns if c != "key"]
        return out.select("key", F.struct(*vcols).alias("value"))

    def _leaf(self, name: str) -> DataFrame:
        if name not in self.catalog:
            raise KeyError(f"unknown source {name!r} in join expression")
        df = self.catalog[name]
        if set(df.columns) != {"key", "value"}:
            raise ValueError(f"source {name!r} must have (key, value) columns")
        return df.select("key", "value")


def compile_join_expr(
    expr: str, catalog: dict[str, DataFrame], ops: dict | None = None
) -> DataFrame:
    """Compile a CompositeInputFormat-style join expression to a DataFrame.

    Sources in ``catalog`` are (key, value) DataFrames. Returns a DataFrame
    with ``key`` plus a ``value`` column (struct for inner/outer composites,
    scalar for override). ``ops`` registers user-defined join operators
    (``mapreduce.join.define.<ident>``, CompositeInputFormat.java:44-47):
    name → fn(list of (name, keyed DataFrame)) → DataFrame.
    """
    return _Parser(_tokenize(expr), catalog, ops).parse()


def bucketed_colocated_join(
    spark,
    left: DataFrame,
    right: DataFrame,
    key: str,
    num_buckets: int = 8,
    table_prefix: str = "gaia_bucketed",
) -> DataFrame:
    """Exchange-free merge join over pre-bucketed, pre-sorted tables — the
    TRUE CompositeInputFormat semantics (LIB/join/CompositeInputFormat.java:
    60-96: N sources "identically partitioned and sorted" merge map-side
    with no shuffle).

    Both sides are written as bucketed+sorted tables on the join key (the
    write pays one shuffle ONCE — the analog of the reference requiring its
    inputs laid out by a previous job's partitioner), then the merge-hinted
    join reads co-located buckets back and Catalyst plans SortMergeJoin with
    ZERO Exchange on either side (plan-asserted in tests). At 100 TB this is
    how repeated joins on the same key amortize: the nth join is
    shuffle-free, which is exactly why the reference's map-side join family
    exists.

    Bucket counts must match on both sides (Spark requirement, same as the
    reference's "same number of partitions" precondition).
    """
    import os

    names = []
    for side, df in (("l", left), ("r", right)):
        name = f"{table_prefix}_{side}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.repartition(num_buckets, F.col(key))
            .write.bucketBy(num_buckets, key)
            .sortBy(key)
            # external location: keep staged buckets out of the caller's cwd
            # warehouse (a local-mode shim, like the other /tmp stages)
            .option("path", os.path.join("/tmp/gaia_spark_bucketed", name))
            .mode("overwrite")
            .saveAsTable(name)
        )
        names.append(name)
    lt, rt = (spark.table(n) for n in names)
    return lt.hint("merge").join(rt, key)
