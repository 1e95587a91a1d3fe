#!/usr/bin/env python
"""Measure the merge-on-read vs copy-on-write write-cost claim.

`snapshot_mor_merge`'s selling point is O(batch) commit cost — each merge
writes only its upsert rows plus an equality-delete key list — while the
CoW `snapshot_merge_keys` rewrites the whole table every commit, so CoW
per-batch cost grows with accumulated table size and MoR's stays flat.
This script turns that claim into numbers:

1. build a base table of ``--base`` orders rows;
2. apply ``--batches`` fixed-size update batches (same feed for both
   paths: half updates to existing keys, half fresh inserts);
3. time each commit for CoW and MoR separately, then time the MoR read
   and the post-compaction read (the cost MoR defers to the read side).

Expected: CoW per-commit time climbs as the table accretes; MoR
per-commit time is roughly constant; the MoR read pays a bounded
anti-join premium that compaction removes.  Results land in
BENCH_NOTES.md by hand — this script only prints JSON.

Usage: python scripts/mor_evidence.py [--sf DIR] [--base N]
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
    ap.add_argument("--base", type=int, default=120_000)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--batch-rows", type=int, default=2_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.session import get_spark
    from data_engineering_challenge_spark.sources import snapshots as sn

    spark = get_spark(app_name="mor-evidence")
    orders = (
        spark.read.parquet(os.path.join(args.sf, "orders.parquet"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(args.base)
        .cache()
    )
    n_base = orders.count()  # force the cache

    def batch_feed(i: int):
        """Half updates to existing keys, half fresh inserts; disjoint
        across batches so accumulated table size grows like production."""
        upd = (
            orders.filter(F.col("o_orderkey") % args.batches == i)
            .limit(args.batch_rows // 2)
            .withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
            .withColumn("_op", F.lit("U"))
        )
        # per-batch offsets of 10M keep insert keys disjoint from the
        # base key range AND from every other batch's inserts (base
        # o_orderkey spans far more than batch_rows, so a small offset
        # would silently turn later inserts into updates)
        ins = orders.limit(args.batch_rows // 2).select(
            (F.col("o_orderkey") + (i + 1) * 10_000_000).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
            F.lit("I").alias("_op"),
        )
        return upd.unionByName(ins)

    feeds = [batch_feed(i).cache() for i in range(args.batches)]
    for f in feeds:
        f.count()

    tmp = tempfile.mkdtemp(prefix="mor_ev_")
    out: dict = {"base_rows": n_base, "batch_rows": args.batch_rows}
    for mode in ("cow", "mor"):
        root = f"{tmp}/{mode}"
        t0 = time.monotonic()
        sn.snapshot_overwrite(orders, root)
        out[f"{mode}_bootstrap_s"] = round(time.monotonic() - t0, 3)
        def tree_bytes() -> int:
            total = 0
            for dirpath, _dirs, names in os.walk(root):
                for n in names:
                    if n.endswith(".parquet"):
                        total += os.path.getsize(os.path.join(dirpath, n))
            return total

        def meta_bytes() -> int:
            mdir = os.path.join(root, "_manifests")
            return sum(
                os.path.getsize(os.path.join(mdir, n))
                for n in os.listdir(mdir)
            )

        times, written, meta_written = [], [], []
        before, mbefore = tree_bytes(), meta_bytes()
        for i, f in enumerate(feeds):
            t0 = time.monotonic()
            if mode == "cow":
                sn.snapshot_merge_keys(spark, root, f, ["o_orderkey"])
            else:
                sn.snapshot_mor_merge(spark, root, f, ["o_orderkey"])
            times.append(round(time.monotonic() - t0, 3))
            after, mafter = tree_bytes(), meta_bytes()
            written.append(after - before)  # bytes this commit added
            meta_written.append(mafter - mbefore)  # manifest bytes added
            before, mbefore = after, mafter
        out[f"{mode}_commit_s"] = times
        # the scale-honest signal: seconds are overhead-dominated at toy
        # scale, but bytes-written-per-commit IS the asymptotic cost —
        # CoW rewrites the accumulated table every commit, MoR writes
        # only the batch
        out[f"{mode}_commit_bytes"] = written
        # round 8: commit METADATA is O(delta) too — two-level manifests
        # mean the Nth commit's manifest bytes (small version payload +
        # one entry file per file group) must stay FLAT as the table
        # accretes, where the round-7 format re-serialized the full
        # file/stats/sequence inventory into every version's JSON
        out[f"{mode}_commit_meta_bytes"] = meta_written

        t0 = time.monotonic()
        n = sn.read_snapshot_mor(spark, root).count()
        out[f"{mode}_read_s"] = round(time.monotonic() - t0, 3)
        out[f"{mode}_final_rows"] = n
    # the deferred cost: fold MoR deletes, then read again
    t0 = time.monotonic()
    sn.snapshot_compact(spark, f"{tmp}/mor", target_files=8)
    out["mor_compact_s"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    sn.read_snapshot_mor(spark, f"{tmp}/mor").count()
    out["mor_read_after_compact_s"] = round(time.monotonic() - t0, 3)

    assert out["cow_final_rows"] == out["mor_final_rows"]
    mmb = out["mor_commit_meta_bytes"]
    assert mmb[-1] < mmb[0] * 3 + 4096, (
        "MoR commit metadata must stay flat as the table accretes: "
        f"{mmb}"
    )

    # --- maintenance-cost evidence (round 7): bin-packing compaction ---
    # bytes rewritten by maintenance must be proportional to small files
    # + the deletes' blast radius, NEVER to the table.  Build a table of
    # 8 clustered base files (key stats recorded), add K tiny appends
    # and ONE narrow equality delete; compact with a threshold that
    # classifies the base files as good.  Expected: the tiny tail and
    # the single delete-intersecting base file are rewritten, the other
    # base files survive by reference byte-identical.
    root = f"{tmp}/binpack"
    sn.snapshot_append_clustered(orders, root, ["o_orderkey"], n_files=8)

    def tree_bytes(r: str) -> int:
        total = 0
        for dirpath, _dirs, names in os.walk(r):
            for n in names:
                if n.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(dirpath, n))
        return total

    m0 = sn._read_manifest(root, sn.current_version(root))
    base_bytes = sum(
        os.path.getsize(os.path.join(root, f)) for f in m0["files"]
    )
    min_base = min(
        os.path.getsize(os.path.join(root, f)) for f in m0["files"]
    )
    for i in range(args.batches):  # tiny dirty tail
        sn.snapshot_append(
            orders.limit(50).withColumn(
                "o_orderkey", F.col("o_orderkey") + (i + 1) * 50_000_000
            ),
            root,
        )
    # one narrow delete: ~100 consecutive keys out of the whole range
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    sn.snapshot_delete_where(
        spark,
        root,
        f"o_orderkey between {lo} and {lo + 100}",
        keys=["o_orderkey"],
    )
    dirty_bytes = tree_bytes(root) - base_bytes
    before = tree_bytes(root)
    t0 = time.monotonic()
    v = sn.snapshot_compact(spark, root, target_file_bytes=min_base)
    out["binpack_compact_s"] = round(time.monotonic() - t0, 3)
    out["binpack_table_bytes"] = base_bytes
    out["binpack_dirty_bytes"] = dirty_bytes
    out["binpack_maintenance_bytes"] = tree_bytes(root) - before
    mv = sn._read_manifest(root, v)
    out["binpack_base_files_kept"] = sum(
        1 for f in m0["files"] if f in set(mv["files"])
    )
    out["binpack_base_files"] = len(m0["files"])
    # the claim, asserted: all but the one delete-intersecting base
    # file survived by reference, and the maintenance write is bounded
    # by the dirty tail + one file, not the table
    assert out["binpack_base_files_kept"] == out["binpack_base_files"] - 1
    assert out["binpack_maintenance_bytes"] < base_bytes // 2

    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
