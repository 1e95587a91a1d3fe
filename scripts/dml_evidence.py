#!/usr/bin/env python
"""Measure the round-8 DML + clone scale claims.

1. ``snapshot_update_where`` claims O(matched) commit cost — the commit
   writes only the matched rows' post-image group + a delete list,
   never the table.  Measured: bytes written per update commit at
   three table sizes with a FIXED match count — flat means O(matched).
2. ``snapshot_clone`` (link mode) claims metadata-cost cloning — the
   table's data bytes are hard-linked, not copied.  Measured: clone
   wall time and NEW disk bytes (st_nlink==1 files under the clone
   root) at the same three sizes — flat-and-tiny means zero-copy.
3. ``snapshot_merge_into`` claims O(touched files), never O(table),
   when no BY SOURCE clause is given.  Measured: bytes written by a
   key-local 200-row MATCHED merge on a table clustered over 8 files
   (expected ~1/8 of the table + the scan/check jobs' wall time), and
   separately an INSERT-ONLY merge (expected ~0 rewrite — all base
   files ride by reference).  The two timings are different plans by
   design; compare bytes, not seconds, across them.
4. CHECK-constraint enforcement runs INSIDE the write job (assert_true
   filters, no extra scan).  Measured: append wall time with 0 vs 2
   live constraints on the largest size — the gap is the per-row
   predicate cost, expected within run-to-run noise.
5. Z-ORDER bounds EVERY clustered column's per-file span where a 1-D
   sort only bounds its leading column.  Measured: files opened by a
   ~3%-selectivity range lookup on each dimension, z-ordered vs
   1-D-sorted layout, 16 files.

Results land in BENCH_NOTES.md by hand — this script only prints JSON.

Usage: python scripts/dml_evidence.py [--sf DIR] [--sizes a,b,c]
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


def _tree_bytes(root: str, linked_only: bool = False) -> int:
    total = 0
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            st = os.stat(p)
            if linked_only and st.st_nlink > 1:
                continue  # shared inode: not new bytes
            total += st.st_size
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--sizes", default="30000,120000,480000")
    ap.add_argument("--matched", type=int, default=1000)
    args = ap.parse_args()
    sizes = [int(x) for x in args.sizes.split(",")]

    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.session import get_spark
    from data_engineering_challenge_spark.sources import snapshots as sn

    spark = get_spark()
    orders = spark.read.parquet(os.path.join(args.sf, "orders.parquet"))
    out: dict = {"sizes": sizes, "matched_rows": args.matched, "runs": []}
    for n in sizes:
        base = (
            orders.select("o_orderkey", "o_totalprice")
            .limit(n)
            .repartition(8)
        )
        tmp = tempfile.mkdtemp(prefix="dml_ev_")
        try:
            root = f"{tmp}/tbl"
            # clustered on the merge/update key: touched-file economics
            # are a LAYOUT property (a hash-scattered table's random
            # keys touch every file — same honesty as the CDF pruning
            # evidence)
            sn.snapshot_append_clustered(
                base, root, ["o_orderkey"], n_files=8
            )
            table_bytes = _tree_bytes(os.path.join(root, "data"))
            before = _tree_bytes(root)
            t0 = time.monotonic()
            sn.snapshot_update_where(
                spark,
                root,
                f"o_orderkey % {max(n // args.matched, 1)} = 0",
                {"o_totalprice": "o_totalprice + 1"},
                keys=["o_orderkey"],
            )
            upd_s = time.monotonic() - t0
            upd_bytes = _tree_bytes(root) - before

            clone = f"{tmp}/clone"
            t0 = time.monotonic()
            sn.snapshot_clone(root, clone)
            clone_s = time.monotonic() - t0
            clone_new_bytes = _tree_bytes(clone, linked_only=True)

            # a KEY-LOCAL batch (contiguous o_orderkey range): the
            # realistic shape touched-file pruning is built for
            lo_keys = [
                r[0]
                for r in base.select("o_orderkey")
                .orderBy("o_orderkey")
                .limit(200)
                .collect()
            ]
            src = base.filter(
                F.col("o_orderkey") <= lo_keys[-1]
            ).select(
                "o_orderkey",
                (F.col("o_totalprice") + 5).alias("o_totalprice"),
            )
            before_m = _tree_bytes(root)
            t0 = time.monotonic()
            sn.snapshot_merge_into(
                spark,
                root,
                src,
                on=["o_orderkey"],
                when_matched=[
                    ("update", None, {"o_totalprice": "s.o_totalprice"})
                ],
                # pin the touched-files path: this script MEASURES its
                # economics; the small-target fast path would bypass it
                # at the smaller scale points
                small_target_rows=0,
            )
            merge_matched_s = time.monotonic() - t0
            merge_bytes = _tree_bytes(root) - before_m
            t0 = time.monotonic()
            sn.snapshot_merge_into(
                spark,
                root,
                src.select(
                    (F.col("o_orderkey") + 900_000_000).alias("o_orderkey"),
                    "o_totalprice",
                ),
                on=["o_orderkey"],
                when_not_matched=("insert", None, "all"),
                small_target_rows=0,
            )
            merge_insert_only_s = time.monotonic() - t0
            out["runs"].append(
                {
                    "rows": n,
                    "table_bytes": table_bytes,
                    "update_where_s": round(upd_s, 3),
                    "update_where_bytes": upd_bytes,
                    "update_bytes_pct_of_table": round(
                        100.0 * upd_bytes / table_bytes, 2
                    ),
                    "clone_s": round(clone_s, 3),
                    "clone_new_bytes": clone_new_bytes,
                    "merge_matched_s": round(merge_matched_s, 3),
                    "merge_200row_bytes": merge_bytes,
                    "merge_bytes_pct_of_table": round(
                        100.0 * merge_bytes / table_bytes, 2
                    ),
                    "merge_insert_only_s": round(merge_insert_only_s, 3),
                }
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # check-enforcement overhead: same append, 0 vs 2 live constraints
    base = orders.select("o_orderkey", "o_totalprice").limit(sizes[-1])
    batch = base.limit(50_000).repartition(8)
    tmp = tempfile.mkdtemp(prefix="dml_ev_chk_")
    try:
        for tag, with_checks in (("plain", False), ("checked", True)):
            root = f"{tmp}/{tag}"
            sn.snapshot_overwrite(batch.limit(1), root)
            if with_checks:
                sn.snapshot_set_check(
                    spark, root, "key_set", "o_orderkey IS NOT NULL",
                    validate=False,
                )
                sn.snapshot_set_check(
                    spark, root, "price_pos", "o_totalprice > 0",
                    validate=False,
                )
            t0 = time.monotonic()
            for _ in range(3):
                sn.snapshot_append(batch, root)
            out[f"append_3x50k_{tag}_s"] = round(time.monotonic() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # z-order vs 1-D sort: files opened per single-dimension lookup
    full = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    bounds = full.agg(
        F.max("o_custkey").alias("ck"), F.max("o_totalprice").alias("tp")
    ).collect()[0]
    tmp = tempfile.mkdtemp(prefix="dml_ev_z_")
    try:
        zroot, sroot = f"{tmp}/z", f"{tmp}/s"
        sn.snapshot_append_zordered(
            full, zroot, ["o_custkey", "o_totalprice"], n_files=16
        )
        sn.snapshot_append_clustered(
            full, sroot, ["o_custkey"], n_files=16,
            stats_cols=["o_totalprice"],
        )
        zread = {}
        for root, tag in ((zroot, "zorder"), (sroot, "sorted_1d")):
            for col, hi in (
                ("o_custkey", bounds["ck"]), ("o_totalprice", bounds["tp"])
            ):
                df = sn.read_snapshot_pruned(
                    spark, root, col, 0, float(hi) * 0.03
                )
                zread[f"{tag}:{col}"] = len(df.inputFiles())
        out["lookup_files_of_16"] = zread
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
