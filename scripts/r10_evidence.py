"""Round-10 scale evidence — MEASURED, not guessed:

1. MoR x evolution: commit bytes/time for post-evolve MoR DML are
   O(batch) — the field-id binding adds metadata bytes only (the
   composition must not smuggle in a rewrite).
2. OPTIMIZE ZORDER on a partitioned table: files opened for a
   (partition_eq + 2-D range) lookup before vs after the rewrite —
   partition pruning composing with within-partition z-order.
3. Stats-driven merge: wall time of a small upsert into a SMALL table
   with the touched-files scan pinned on vs the snapshot_plan_hints
   fast path (one Spark job saved), and into a LARGE table where the
   hints correctly keep the touched path.

Run: python scripts/r10_evidence.py   (prints one JSON per section)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from data_engineering_challenge_spark.sources import snapshots as sn  # noqa: E402


def _tree_bytes(root: str) -> int:
    total = 0
    for dp, _dn, fn in os.walk(root):
        for n in fn:
            total += os.path.getsize(os.path.join(dp, n))
    return total


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="r10ev_")

    # ---- 1. MoR x evolution commit cost stays O(batch) ---------------
    out1 = {"section": "mor_evolution_commit_cost", "runs": []}
    for n in (50_000, 200_000, 800_000):
        root = f"{d}/ev_{n}"
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )
        sn.snapshot_append(df, root)
        sn.snapshot_evolve(
            root, renames={"v": "val"}, adds={"tier": ("string", "std")}
        )
        before = _tree_bytes(root)
        t0 = time.monotonic()
        sn.snapshot_delete_where(
            spark, root, "k % 97 = 3 AND k < 2000", keys=["k"]
        )
        dt = time.monotonic() - t0
        out1["runs"].append(
            {
                "table_rows": n,
                "post_evolve_delete_s": round(dt, 3),
                "commit_bytes": _tree_bytes(root) - before,
            }
        )
    print(json.dumps(out1))

    # ---- 2. partition pruning composes with within-partition zorder --
    root = f"{d}/pz"
    df = spark.range(400_000).select(
        (F.col("id") % 8).alias("tenant"),
        (F.col("id") % 1000).alias("a"),
        ((F.col("id") * 7) % 1000).alias("b"),
        F.col("id").alias("payload"),
    )
    sn.snapshot_append_partitioned(
        df, root, {"t": "CAST(tenant AS STRING)"}
    )

    def _opened(version):
        m = sn._read_manifest(root, version)
        st, pv = m.get("stats") or {}, m.get("partition_values") or {}
        part = [f for f in m["files"] if pv.get(f, {}).get("t") == "3"]
        keep = [
            f
            for f in part
            if not (
                (r := (st.get(f) or {}).get("a"))
                and (r[0] > 60 or r[1] < 40)
            )
            and not (
                (r := (st.get(f) or {}).get("b"))
                and (r[0] > 420 or r[1] < 380)
            )
        ]
        return len(keep), len(part), len(m["files"])

    pre = _opened(sn.current_version(root))
    v = sn.snapshot_rewrite_zordered(spark, root, ["a", "b"], n_files=32, bits=7)
    post = _opened(v)
    got = sn.read_snapshot_pruned(
        spark, root,
        ranges={"a": (40, 60), "b": (380, 420)}, partition_eq={"t": 3},
    ).count()
    print(
        json.dumps(
            {
                "section": "partitioned_zorder_pruning",
                "lookup": "t=3 AND a in [40,60] AND b in [380,420]",
                "pre_rewrite": {
                    "opened": pre[0], "partition_files": pre[1],
                    "total_files": pre[2],
                },
                "post_rewrite": {
                    "opened": post[0], "partition_files": post[1],
                    "total_files": post[2],
                },
                "rows": got,
            }
        )
    )

    # ---- 3. stats-driven merge fast path ------------------------------
    out3 = {"section": "merge_small_target_fast_path", "runs": []}
    for n, label in ((20_000, "small"), (2_000_000, "large")):
        src = spark.createDataFrame(
            [(i, 999) for i in range(0, 50)], "k long, v long"
        )
        times = {}
        for mode, knob in (("touched_pinned", 0), ("hints_default", 100_000)):
            root = f"{d}/mg_{n}_{mode}"
            sn.snapshot_append_clustered(
                spark.range(n).select(
                    F.col("id").alias("k"), (F.col("id") * 2).alias("v")
                ),
                root, ["k"], n_files=8,
            )
            t0 = time.monotonic()
            sn.snapshot_merge_into(
                spark, root, src, ["k"],
                when_matched=[("update", None, {"v": "s.v"})],
                small_target_rows=knob,
            )
            times[mode] = round(time.monotonic() - t0, 3)
        out3["runs"].append({"table_rows": n, "label": label, **times})
    print(json.dumps(out3))


if __name__ == "__main__":
    main()
