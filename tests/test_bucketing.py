"""Bucketed co-located join: the write-time shuffle amortization story.

At 100 TB, the single biggest repeated cost is re-shuffling the same fact
tables on the same join key query after query.  Bucketing moves that
shuffle to write time: both sides land hash-partitioned on the key, and
every later join/agg on it runs Exchange-free.  This test proves the
engine's bucketed write produces plans with ZERO shuffles for the
fact-to-fact join that normally sort-merge-shuffles both sides.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import io

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/bdb'")
    li = io.read_testdata(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = io.read_testdata(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    io.write_bucketed(li, "bdb.li_b", 8, ["l_orderkey"], sort_cols=["l_orderkey"])
    io.write_bucketed(o, "bdb.o_b", 8, ["o_orderkey"], sort_cols=["o_orderkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bdb.li_b").join(
            spark.table("bdb.o_b"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaces both shuffles
        assert j.count() == li.count()  # every lineitem matches its order
        # and a group-by on the bucket key is shuffle-free too
        agg = spark.table("bdb.li_b").groupBy("l_orderkey").agg(F.sum("l_quantity"))
        agg_plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in agg_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bdb.li_b")
        spark.sql("DROP TABLE IF EXISTS bdb.o_b")
        spark.sql("DROP DATABASE IF EXISTS bdb")


def test_read_parquet_evolved_merges_schemas(spark, tmp_path):
    """Files written before a column existed read back with that column
    NULL — the schema-evolution posture a long-lived table needs."""
    from pyspark.sql import Row

    from data_engineering_challenge_spark.sources import io

    path = str(tmp_path / "tbl")
    spark.createDataFrame([Row(id=1, a="x")]).write.mode("append").parquet(path)
    spark.createDataFrame([Row(id=2, a="y", b=7)]).write.mode("append").parquet(path)

    got = io.read_parquet_evolved(spark, path)
    assert set(got.columns) == {"id", "a", "b"}
    rows = {r.id: (r.a, r.b) for r in got.collect()}
    assert rows == {1: ("x", None), 2: ("y", 7)}


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    """Compaction rewrites an accreted many-file table into target_files
    parquet files with identical contents."""
    import glob

    from data_engineering_challenge_spark.sources import io

    path = str(tmp_path / "tbl")
    for i in range(6):  # simulate per-batch appends
        spark.range(i * 10, i * 10 + 10).write.mode("append").parquet(path)
    before = spark.read.parquet(path)
    n_before = len(glob.glob(f"{path}/part-*.parquet"))
    assert n_before >= 6
    total = sorted(r.id for r in before.collect())

    io.compact_parquet(spark, path, target_files=2)
    n_after = len(glob.glob(f"{path}/part-*.parquet"))
    assert n_after == 2
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == total
    import os

    assert [d for d in os.listdir(tmp_path) if "._" in d] == []


def test_compact_parquet_crash_window_recoverable(spark, tmp_path):
    """Crash-injection for the compact swap (the old in-place overwrite had
    an unrecoverable window: localCheckpoint then delete-and-rewrite).  A
    crash between the two renames leaves the complete compacted table in
    ``._inprogress``; the next compact call recovers it instead of failing
    or compacting nothing."""
    import glob
    import os

    from data_engineering_challenge_spark.sources import io

    path = str(tmp_path / "tbl")
    for i in range(4):
        spark.range(i * 10, i * 10 + 10).write.mode("append").parquet(path)
    total = sorted(r.id for r in spark.read.parquet(path).collect())

    # simulate the between-renames crash: compacted copy fully written to
    # ._inprogress, original moved to ._replaced, target absent
    spark.read.parquet(path).repartition(1).write.parquet(
        path + "._inprogress"
    )
    os.rename(path, path + "._replaced")

    io.compact_parquet(spark, path, target_files=2)
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == total
    assert len(glob.glob(f"{path}/part-*.parquet")) == 2
    assert [d for d in os.listdir(tmp_path) if "._" in d] == []


def test_publish_atomic_refuses_to_clobber_recovery_copies(spark, tmp_path):
    """publish_atomic must not delete ._inprogress/._replaced siblings when
    the target itself is absent — they hold the only copies of the table."""
    import pytest

    from data_engineering_challenge_spark.sources import io

    path = str(tmp_path / "tbl")
    spark.range(5).write.parquet(path + "._inprogress")
    with pytest.raises(IOError):
        io.publish_atomic(spark.range(3), path)
    # recovery copy untouched
    assert spark.read.parquet(path + "._inprogress").count() == 5


def test_zorder_value_interleaves_bits(spark):
    """Known 2-bit example: bucket x=0b01, y=0b10 interleaves to
    z = x0<<0 | y0<<1 | x1<<2 | y1<<3 = 1 + 0 + 0 + 8 = 9."""
    from pyspark.sql import Row

    from data_engineering_challenge_spark.sources import io

    # domains [0,4) with 2 bits -> bucket == floor(value): x=1 -> 01, y=2 -> 10
    df = spark.createDataFrame([Row(x=1.0, y=2.0)])
    z = df.select(
        io.zorder_value(["x", "y"], bits=2, mins=[0.0, 0.0], maxs=[4.0, 4.0])
        .alias("z")
    ).collect()[0].z
    assert z == 9


def test_zorder_write_bounds_per_file_spans(spark, tmp_path):
    """Z-ordered layout must give every file a NARROW span in BOTH
    clustered columns (the min/max-skipping property); a single-column
    sort leaves the other column spanning ~the full domain."""
    import glob

    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.sources import io

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).cast("double").alias("x"),
        F.floor(F.col("id") / 64).cast("double").alias("y"),
    )
    zpath = str(tmp_path / "z")
    io.zorder_write(df, zpath, ["x", "y"], bits=6, target_files=16)
    assert sorted(
        r[0] for r in spark.read.parquet(zpath).groupBy("x", "y").count()
        .select(F.count("*")).collect()
    )  # content intact (no row lost)
    assert spark.read.parquet(zpath).count() == n

    spans = []
    for f in glob.glob(f"{zpath}/part-*.parquet"):
        s = spark.read.parquet(f).agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        ).collect()[0]
        spans.append((s.sx, s.sy))
    assert len(spans) >= 8
    # every file's span is a fraction of the 0..63 domain in BOTH dims —
    # 16 files over a 64x64 grid gives ~16x16 tiles (span ~<= 24 with
    # boundary slack); a 1-D sort would leave one dim at span 63
    assert all(sx <= 32 and sy <= 32 for sx, sy in spans), spans


def test_zorder_skips_more_files_than_1d_sort(spark, tmp_path):
    """MEASURED file skipping, not just span bounds: for a conjunctive
    2-column predicate, count the files a min/max-stats reader must open
    (files whose [min,max] box intersects the predicate box — exactly the
    skip decision parquet row-group stats give a scan with pushed
    filters).  The Z-ordered layout must need strictly fewer files than a
    single-column sort of the same data into the same file count, and the
    query answers must be identical."""
    import glob

    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.sources import io

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).cast("double").alias("x"),
        F.floor(F.col("id") / 64).cast("double").alias("y"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    io.zorder_write(df, zpath, ["x", "y"], bits=6, target_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(spath)
    )

    # predicate: x in [0,31] AND y in [8,15] — constrains BOTH dims
    def candidate_files(path):
        hits = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            s = spark.read.parquet(f).agg(
                F.min("x").alias("x0"), F.max("x").alias("x1"),
                F.min("y").alias("y0"), F.max("y").alias("y1"),
            ).collect()[0]
            if s.x0 <= 31 and s.x1 >= 0 and s.y0 <= 15 and s.y1 >= 8:
                hits += 1
        return hits, len(glob.glob(f"{path}/part-*.parquet"))

    z_hits, z_total = candidate_files(zpath)
    s_hits, s_total = candidate_files(spath)
    assert z_total == s_total == 16
    # the x-sort's files all span the full y domain -> nearly all overlap;
    # the z-layout confines the predicate box to a few tiles
    assert z_hits < s_hits, (z_hits, s_hits)
    assert z_hits <= s_hits // 2, (z_hits, s_hits)

    # the predicate reaches the scan (PushedFilters) so the runtime reader
    # actually gets to use those stats
    q = spark.read.parquet(zpath).filter(
        (F.col("x") >= 0) & (F.col("x") <= 31)
        & (F.col("y") >= 8) & (F.col("y") <= 15)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # (the rendered filter list truncates; assert on an early entry)
    assert "PushedFilters" in plan and "GreaterThanOrEqual(x,0.0)" in plan
    # identical answers from both layouts
    zs = {(r.x, r.y) for r in q.collect()}
    ss = {
        (r.x, r.y)
        for r in spark.read.parquet(spath)
        .filter((F.col("x") <= 31) & (F.col("y") >= 8) & (F.col("y") <= 15))
        .collect()
    }
    assert zs == ss and len(zs) == 32 * 8


def test_sorted_write_global_total_order(spark, tmp_path):
    """sorted_write must produce NON-OVERLAPPING per-file key ranges
    (repartitionByRange) with in-file ordering — i.e. a globally sorted
    table — and lose no rows."""
    import glob

    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.sources import io

    n = 5000
    df = spark.range(n).select(
        F.xxhash64("id").alias("k"), F.col("id").alias("payload")
    )
    path = str(tmp_path / "sorted")
    io.sorted_write(df, path, ["k"], target_files=8)

    assert spark.read.parquet(path).count() == n
    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        pdf = spark.read.parquet(f).select("k").toPandas()
        ks = pdf["k"].tolist()
        assert ks == sorted(ks)  # in-file order
        if ks:
            ranges.append((ks[0], ks[-1]))
    ranges.sort()
    assert len(ranges) >= 4
    for (lo_a, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b  # files cover disjoint key ranges
