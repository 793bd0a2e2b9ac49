"""Source/sink unit tests: JDBC splitters (mirroring the reference's
TestIntegerSplitter/TestTextSplitter), sequence-file roundtrip, whole-file
reading, distcp counters, compaction, and the text-source family.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ JDBC splitters


def test_integer_split_points_even():
    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import integer_split_points

    # clean division: n+1 boundaries, evenly spaced
    assert integer_split_points(10, 0, 100) == [0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100]


def test_integer_split_points_remainder_and_degenerate():
    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import integer_split_points

    # non-dividing range: "may need an extra task" (IntegerSplitter comment)
    pts = integer_split_points(3, 0, 10)
    assert pts[0] == 0 and pts[-1] == 10
    assert pts == [0, 3, 6, 9, 10]
    # min == max
    assert integer_split_points(4, 5, 5) == [5, 5]
    # range smaller than numSplits: splitSize clamps to 1
    assert integer_split_points(10, 0, 3) == [0, 1, 2, 3]


def test_date_split_points_monotone():
    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import date_split_points

    lo, hi = datetime(2024, 1, 1), datetime(2024, 1, 31)
    pts = date_split_points(6, lo, hi)
    assert pts[0] == lo and pts[-1] == hi
    assert all(a < b for a, b in zip(pts, pts[1:]))


def test_text_split_points_roundtrip_order():
    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import text_split_points

    pts = text_split_points(4, "alpha", "omega")
    assert pts[0] == "alpha" and pts[-1] == "omega"
    # boundaries are lexicographically ordered — the splitter's contract
    assert all(a <= b for a, b in zip(pts, pts[1:]))
    assert len(pts) >= 5


def test_text_split_points_shared_prefix():
    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import text_split_points

    pts = text_split_points(3, "useraaa", "userzzz")
    assert all(p.startswith("user") for p in pts)
    assert pts[0] == "useraaa" and pts[-1] == "userzzz"


def test_text_fraction_roundtrip():
    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import (
        _fraction_to_string,
        _string_to_fraction,
    )

    for s in ["a", "abc", "zebra", "Hello Wo"]:
        assert _fraction_to_string(_string_to_fraction(s)) == s


def test_text_split_predicates_cover_range():
    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import text_split_predicates

    preds = text_split_predicates(3, "name", "aaa", "zzz")
    assert preds[0].startswith("name >= 'aaa'")
    assert preds[-1].endswith("<= 'zzz'")
    assert all("AND" in p for p in preds)


# --------------------------------------------------------------------- jdbc


def test_jdbc_roundtrip_dbcountpageview(spark, tmp_path):
    """DBCountPageView analog (MR-EX/DBCountPageView.java): JDBC in →
    group-count → JDBC out, verified against the in-DB expected counts —
    runs on the Derby embedded driver that ships with Spark."""
    from pyspark.sql import functions as F

    from hadoop_3_0_0_beta1_gaia_spark.sources.jdbc import (
        read_jdbc,
        read_jdbc_partitioned,
        write_jdbc,
    )

    # Derby resolves unquoted identifiers as uppercase; use uppercase names so
    # Spark's quoted DDL and our raw-SQL fragments agree.
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    views = spark.createDataFrame(
        [(i, f"/page{i % 7}") for i in range(200)], ["ACCESS_ID", "URL"]
    )
    write_jdbc(views, url, "PAGE_ACCESS", mode="overwrite")

    # DBInputFormat-style scan with fieldNames + conditions
    filtered = read_jdbc(
        spark, url, "PAGE_ACCESS", field_names=["URL"], conditions="ACCESS_ID < 100"
    )
    assert filtered.count() == 100

    # DataDrivenDBInputFormat-style parallel range scan
    part = read_jdbc_partitioned(
        spark, url, "PAGE_ACCESS", "ACCESS_ID", 0, 200, num_partitions=4
    )
    assert part.rdd.getNumPartitions() == 4
    counts = part.groupBy("URL").agg(F.count("*").alias("PAGEVIEW"))
    write_jdbc(counts, url, "PAGEVIEW_TBL", mode="overwrite")

    back = {
        r["URL"]: r["PAGEVIEW"]
        for r in read_jdbc(spark, url, "PAGEVIEW_TBL").collect()
    }
    expected = {f"/page{k}": (29 if k < 4 else 28) for k in range(7)}  # 200/7
    assert back == expected


# --------------------------------------------------------------- containers


def test_sequence_file_roundtrip(spark, tmp_path):
    from hadoop_3_0_0_beta1_gaia_spark.sources.sequence import (
        read_sequence_file,
        write_sequence_file,
    )

    df = spark.createDataFrame(
        [("k1", "v1"), ("k2", "v2"), ("k3", "v3")], ["key", "value"]
    )
    path = str(tmp_path / "seq")
    write_sequence_file(df, path)
    back = read_sequence_file(spark, path)
    assert sorted((r["key"], r["value"]) for r in back.collect()) == [
        ("k1", "v1"),
        ("k2", "v2"),
        ("k3", "v3"),
    ]


def test_whole_files(spark, tmp_path):
    from hadoop_3_0_0_beta1_gaia_spark.sources.files import read_whole_files

    (tmp_path / "a.txt").write_text("first file\nwith two lines")
    (tmp_path / "b.txt").write_text("second")
    df = read_whole_files(spark, str(tmp_path))
    rows = {r["path"].rsplit("/", 1)[-1]: r["content"] for r in df.collect()}
    assert rows == {"a.txt": "first file\nwith two lines", "b.txt": "second"}


def test_distcp_update_and_overwrite(spark, tmp_path):
    from hadoop_3_0_0_beta1_gaia_spark.sources.files import distcp

    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "one.dat").write_bytes(b"x" * 100)
    (src / "sub" / "two.dat").write_bytes(b"y" * 50)
    dst = tmp_path / "dst"

    c1 = distcp(spark, str(src), str(dst))
    assert c1 == {"copied": 2, "skipped": 0, "bytes": 150}
    assert (dst / "sub" / "two.dat").read_bytes() == b"y" * 50

    # -update: second run skips same-size files
    c2 = distcp(spark, str(src), str(dst))
    assert c2 == {"copied": 0, "skipped": 2, "bytes": 0}

    # changed source file is re-copied
    (src / "one.dat").write_bytes(b"z" * 120)
    c3 = distcp(spark, str(src), str(dst))
    assert c3["copied"] == 1 and c3["skipped"] == 1
    assert (dst / "one.dat").read_bytes() == b"z" * 120

    # -overwrite: everything copied unconditionally
    c4 = distcp(spark, str(src), str(dst), overwrite=True)
    assert c4["copied"] == 2


def test_distcp_checksum_and_diff(spark, tmp_path):
    """CopyMapper.canSkip checksum compare (-update without -skipcrccheck) and
    the -diff listing: same-size-different-content files must be detected."""
    from hadoop_3_0_0_beta1_gaia_spark.sources.files import distcp, distcp_diff

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.dat").write_bytes(b"a" * 64)
    (src / "b.dat").write_bytes(b"b" * 64)
    dst = tmp_path / "dst"
    distcp(spark, str(src), str(dst))

    # corrupt b at the target WITHOUT changing its size
    (dst / "b.dat").write_bytes(b"B" * 64)
    (dst / "stale.dat").write_bytes(b"s")  # target-only file
    (src / "new.dat").write_bytes(b"n" * 8)  # source-only file

    statuses = {
        r["path"]: r["status"]
        for r in distcp_diff(spark, str(src), str(dst)).collect()
    }
    assert statuses == {
        "a.dat": "same",
        "b.dat": "changed",
        "new.dat": "added",
        "stale.dat": "removed",
    }

    # size-only update misses the corruption; checksum mode repairs it
    c_size = distcp(spark, str(src), str(dst))
    assert c_size["skipped"] == 2 and (dst / "b.dat").read_bytes() == b"B" * 64
    c_sum = distcp(spark, str(src), str(dst), checksum=True)
    assert c_sum["copied"] == 1 and (dst / "b.dat").read_bytes() == b"b" * 64


def test_nline_splits_exact_packing(spark):
    """NLineInputFormat contract: every split has exactly N lines except the
    last, lines are consecutive in the given order, split ids are dense."""
    from pyspark.sql import functions as F

    from hadoop_3_0_0_beta1_gaia_spark.sources.text import nline_splits

    df = spark.range(0, 1003).select(F.col("id").alias("k"))
    s = nline_splits(df, 100, order_by=["k"])
    per = (
        s.groupBy("split_id")
        .agg(F.count("*").alias("n"), F.min("k").alias("lo"), F.max("k").alias("hi"))
        .orderBy("split_id")
        .collect()
    )
    assert [r["split_id"] for r in per] == list(range(11))
    assert [r["n"] for r in per] == [100] * 10 + [3]
    for r in per:  # consecutive: the range exactly fills the split
        assert r["hi"] - r["lo"] + 1 == r["n"]
    # position within split is 0..n-1
    pos = s.filter(F.col("split_id") == 0).agg(
        F.min("line_in_split"), F.max("line_in_split")
    ).collect()[0]
    assert (pos[0], pos[1]) == (0, 99)


def test_group_by_comparator_first_key_and_order(spark):
    """The reducer sees the group's FIRST full key and values in full-key
    order (SecondarySort FirstGroupingComparator semantics)."""
    from pyspark.sql import functions as F

    from hadoop_3_0_0_beta1_gaia_spark.operators.pair import group_by_comparator

    df = spark.createDataFrame(
        [(1, 30, "c"), (1, 10, "a"), (1, 20, "b"), (2, 5, "z")],
        ["g", "sub", "value"],
    )
    out = {
        r["group"]: r
        for r in group_by_comparator(
            df, F.col("g"), [F.col("sub")]
        ).collect()
    }
    assert out[1]["first_key"]["sub"] == 10
    assert out[1]["values"] == ["a", "b", "c"]
    assert out[2]["values"] == ["z"]


def test_compact_small_files(spark, tmp_path):
    from hadoop_3_0_0_beta1_gaia_spark.sources.files import compact_small_files

    src = str(tmp_path / "small")
    spark.range(10_000).repartition(50).write.parquet(src)  # 50 small parts
    df = spark.read.parquet(src)
    dst = str(tmp_path / "compact")
    n = compact_small_files(df, dst, target_partition_bytes=10 * 1024 * 1024)
    assert n < 50
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    import glob

    assert len(glob.glob(f"{dst}/part-*")) == n


def test_multiple_inputs_per_path_readers(spark, tmp_path):
    """MultipleInputs: per-path reader + transform, unioned by name."""
    from hadoop_3_0_0_beta1_gaia_spark.sources.text import (
        parse_kv_lines,
        read_multiple_inputs,
        read_text_lines,
    )

    (tmp_path / "tsv.txt").write_text("a\t1\nb\t2")
    (tmp_path / "csv.txt").write_text("c,3\nd,4")

    def tsv_reader(spark, path):
        return parse_kv_lines(read_text_lines(spark, path), sep="\t")

    def csv_reader(spark, path):
        return parse_kv_lines(read_text_lines(spark, path), sep=",")

    df = read_multiple_inputs(
        spark,
        [(str(tmp_path / "tsv.txt"), tsv_reader), (str(tmp_path / "csv.txt"), csv_reader)],
    )
    assert sorted((r["key"], r["value"]) for r in df.collect()) == [
        ("a", "1"), ("b", "2"), ("c", "3"), ("d", "4"),
    ]


def test_binary_files_metadata_pruning(spark, tmp_path):
    from hadoop_3_0_0_beta1_gaia_spark.sources.files import read_binary_files

    (tmp_path / "x.bin").write_bytes(b"\x00" * 64)
    df = read_binary_files(spark, str(tmp_path))
    row = df.select("length", "content").collect()[0]
    assert row["length"] == 64 and bytes(row["content"]) == b"\x00" * 64


def test_write_sorted_bloom_and_pruning(spark, tmp_path):
    """BloomMapFile analog: bloom-filtered sorted parquet; the point lookup
    pushes an equality filter into the scan."""
    from hadoop_3_0_0_beta1_gaia_spark.sources.writers import write_sorted

    df = spark.range(10_000).select(F.col("id"), F.md5(F.col("id").cast("string")).alias("h"))
    path = str(tmp_path / "bloomed")
    write_sorted(df, path, "id", num_partitions=4, bloom_cols=["h"])
    back = spark.read.parquet(path)
    target = back.filter(F.col("id") == 1234).collect()
    assert len(target) == 1
    probe = back.filter(F.col("h") == target[0]["h"])
    assert probe.count() == 1
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "h" in plan


def test_xml_records(spark, tmp_path):
    from hadoop_3_0_0_beta1_gaia_spark.sources.text import read_xml_records

    p = tmp_path / "data.xml"
    p.write_text(
        "<root>\n"
        "<record>alpha\nbeta</record>\n"
        "<record>gamma</record>\n"
        "junk between records\n"
        "<record>delta </record>\n"
        "</root>"
    )
    df = read_xml_records(spark, str(p))
    assert sorted(r["record"] for r in df.collect()) == ["alpha\nbeta", "delta ", "gamma"]


def test_parquet_compression_codecs(spark, tmp_path):
    """Codec surface (COMMON/io/compress — gzip/snappy/zstd analogs)."""
    from hadoop_3_0_0_beta1_gaia_spark.sources.writers import write_parquet

    df = spark.range(1000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    for codec in ["snappy", "gzip", "zstd", "none"]:
        path = str(tmp_path / f"c_{codec}")
        write_parquet(df, path, compression=codec)
        assert spark.read.parquet(path).count() == 1000


# ------------------------------------------------------- text source family


def test_parse_kv_lines_first_separator(spark):
    from hadoop_3_0_0_beta1_gaia_spark.sources.text import parse_kv_lines

    df = spark.createDataFrame(
        [("a\tb\tc",), ("nosep",), ("k\t",)], ["line"]
    )
    rows = sorted(
        (r["key"], r["value"]) for r in parse_kv_lines(df).collect()
    )
    assert rows == [("a", "b\tc"), ("k", ""), ("nosep", "")]


def test_fixed_length_reader(spark, tmp_path):
    from hadoop_3_0_0_beta1_gaia_spark.sources.text import read_fixed_length

    p = tmp_path / "fixed.bin"
    p.write_bytes(b"AAAABBBBCCCC")
    df = read_fixed_length(spark, str(p), 4)
    assert sorted(bytes(r["record"]) for r in df.collect()) == [b"AAAA", b"BBBB", b"CCCC"]


def test_scan_filters(spark):
    from hadoop_3_0_0_beta1_gaia_spark.sources.text import (
        md5_filter,
        percent_filter,
        regex_filter,
    )

    df = spark.createDataFrame([(f"key{i}",) for i in range(100)], ["k"])
    assert regex_filter(df, "k", "^key1$|^key2$").count() == 2
    assert percent_filter(df, 10).count() == 10
    n = md5_filter(df, "k", 4).count()
    assert 10 <= n <= 45  # ~25 expected, deterministic


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed+sorted on the join key must SortMergeJoin with no
    Exchange on either side — the CompositeInputFormat map-side merge join."""
    import io
    from contextlib import redirect_stdout

    from hadoop_3_0_0_beta1_gaia_spark.session import table as T
    from hadoop_3_0_0_beta1_gaia_spark.sources.writers import write_bucketed

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    for name in ("bkt_orders", "bkt_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed(o, "bkt_orders", str(tmp_path / "bo"), "o_custkey", 8)
    write_bucketed(c, "bkt_customer", str(tmp_path / "bc"), "c_custkey", 8)

    bo, bc = spark.table("bkt_orders"), spark.table("bkt_customer")
    # disable broadcast so the join strategy is decided by layout, not size
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle either side
        # results still correct
        assert joined.count() == o.join(c, o.o_custkey == c.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("bkt_orders", "bkt_customer"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
