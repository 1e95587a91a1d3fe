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
