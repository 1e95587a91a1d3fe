#!/usr/bin/env python
"""Measure the change-data-feed O(delta) claim.

`read_snapshot_cdf`'s selling point is that an incremental consumer of a
MoR/CDC table pays per-DELTA cost: insert events read only the commit's
added files and equality-delete events semi-join the as-of-parent read
against a broadcast key list — while the fallback (diff of two
time-traveled MoR reads, `diff_tables`-style) scans the WHOLE table
twice per poll no matter how small the change.  This script turns that
claim into numbers:

1. build a base table of ``--base`` orders rows — RANGE-CLUSTERED on
   the key (`snapshot_append_clustered`), the layout that lets the
   CDF's stats pruning actually skip files (a hash-scattered base makes
   every file overlap every key range: stats recorded, nothing
   skippable — measured, see BENCH_NOTES);
2. apply ``--batches`` key-range DELETE commits
   (`snapshot_delete_where`, each a disjoint ``--batch-rows`` slice);
3. after each commit, time (a) `read_snapshot_cdf(prev, cur)` —
   whose delete-event pre-image scan should prune to ~1 file — and
   (b) the full-diff fallback (two `read_snapshot_mor` reads
   exceptAll'd both ways) producing the same information.

Expected: the CDF poll stays flat and file-bounded; the full-diff poll
scans and shuffles the whole table twice per poll.  Results land in
BENCH_NOTES.md by hand — this script only prints JSON.

Usage: python scripts/cdf_evidence.py [--sf DIR] [--base N]
       [--batches K] [--batch-rows M]
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
    ap.add_argument("--base", type=int, default=200_000)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--batch-rows", type=int, default=2_000)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.sources import snapshots as sn

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("cdf_evidence")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    tmp = tempfile.mkdtemp(prefix="cdf_ev_")
    root = os.path.join(tmp, "tbl")
    try:
        src = spark.read.parquet(
            os.path.join(args.sf, "orders.parquet")
        ).select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").alias("v"),
        )
        # DETERMINISTIC selection: base = lowest --base keys; poll b
        # deletes the b-th lowest --batch-rows key slice — disjoint
        # ranges, every row a genuine delete, pinned across runs
        o = src.orderBy("k").limit(args.base)
        keys = [r.k for r in o.select("k").collect()]
        keys.sort()
        sn.snapshot_append_clustered(o, root, ["k"])  # v0, range-disjoint
        actual_base = sn.read_snapshot_mor(spark, root).count()
        results = []
        for b in range(1, args.batches + 1):
            lo = keys[(b - 1) * args.batch_rows]
            hi = keys[b * args.batch_rows - 1]
            sn.snapshot_delete_where(
                spark,
                root,
                f"k >= {lo} AND k <= {hi}",
                keys=["k"],
            )  # vb
            t0 = time.time()
            n_cdf = sn.read_snapshot_cdf(spark, root, b - 1, b).count()
            t_cdf = time.time() - t0
            # the fallback an engine without CDF would run: diff two
            # full time-traveled MoR reads (rows leaving + arriving)
            t0 = time.time()
            old = sn.read_snapshot_mor(spark, root, b - 1)
            new = sn.read_snapshot_mor(spark, root, b)
            n_diff = (
                old.exceptAll(new).count() + new.exceptAll(old).count()
            )
            t_diff = time.time() - t0
            results.append(
                {
                    "batch": b,
                    "cdf_events": n_cdf,
                    "cdf_s": round(t_cdf, 3),
                    "diff_rows": n_diff,
                    "full_diff_s": round(t_diff, 3),
                }
            )
        print(
            json.dumps(
                {
                    # the MATERIALIZED size — limit() caps at the
                    # fixture's row count, so the requested --base can
                    # overstate what was actually measured
                    "base_rows": actual_base,
                    "base_rows_requested": args.base,
                    "batch_rows": args.batch_rows,
                    "polls": results,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
