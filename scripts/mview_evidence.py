#!/usr/bin/env python
"""Measure the materialized-view O(delta + view) refresh claim.

`refresh_mview` consumes the change data feed: a refresh after K
changed rows costs the CDF read of those commits plus a merge into the
(small) stored view — while the naive alternative recomputes the
aggregate over the WHOLE table every time.  This script turns the
claim into numbers at growing table sizes:

1. build a `sales`-shaped snapshot table of ``--base`` rows from the
   sf orders fixture and register it plus an mview
   (GROUP BY status, COUNT(*) + SUM(price));
2. per round: append ``--delta-rows`` new rows, then time
   (a) `refresh_mview` (incremental, CDF-driven) and
   (b) the from-scratch recompute of the same aggregate;
3. repeat as the table doubles — the incremental refresh should stay
   ~flat while the recompute grows with the table.

Results land in BENCH_NOTES.md by hand — this script only prints JSON.

Usage: python scripts/mview_evidence.py [--sf DIR] [--base N]
       [--rounds K] [--delta-rows M]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--base", type=int, default=300_000)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--delta-rows", type=int, default=2_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from data_engineering_challenge_spark.sources import catalog as cat
    from data_engineering_challenge_spark.sources import snapshots as sn

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="mview_ev_")
    try:
        orders = spark.read.parquet(
            os.path.join(args.sf, "orders.parquet")
        ).select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_custkey").alias("k"),
            F.col("o_totalprice").cast("decimal(28,10)").alias("price"),
        )
        base = orders.limit(args.base).persist()
        actual_base = base.count()
        cdir = f"{tmp}/catalog"
        root = f"{tmp}/sales"
        sn.snapshot_overwrite(base.repartition(8), root)
        cat.catalog_register(cdir, "sales", root)
        cat.catalog_register_mview(
            cdir, "mv", "sales", ["status"], ["price"]
        )
        cat.refresh_mview(spark, cdir, "mv")  # initial materialization
        results = []
        rows = actual_base
        for i in range(args.rounds):
            # grow the table: double it each round so the recompute has
            # a moving target, then land one small delta commit
            if i > 0:
                sn.snapshot_append(
                    sn.read_snapshot(spark, root), root
                )
                rows *= 2
                # bring the view PAST the doubling commit untimed, so
                # the timed refresh below consumes EXACTLY the 2k-row
                # delta — not the growth commit (the claim under test
                # is cost ∝ delta, so the delta must be the input)
                cat.refresh_mview(spark, cdir, "mv")
            delta = base.limit(args.delta_rows).withColumn(
                "k", F.col("k") + F.lit(10_000_000)
            )
            sn.snapshot_append(delta, root)
            rows += args.delta_rows

            t0 = time.monotonic()
            _, mode = cat.refresh_mview(spark, cdir, "mv")
            t_inc = time.monotonic() - t0

            t0 = time.monotonic()
            full = (
                sn.read_snapshot(spark, root)
                .groupBy("status")
                .agg(
                    F.count("*").alias("n"),
                    F.sum("price").alias("price"),
                )
            )
            n_groups = full.count()
            t_full = time.monotonic() - t0
            results.append(
                {
                    "round": i,
                    "table_rows": rows,
                    "delta_rows": args.delta_rows,
                    "refresh_mode": mode,
                    "refresh_s": round(t_inc, 3),
                    "recompute_s": round(t_full, 3),
                    "groups": n_groups,
                }
            )
        print(
            json.dumps(
                {
                    "base_rows": actual_base,
                    "base_rows_requested": args.base,
                    "rounds": results,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
