"""Round-12 scale evidence — MEASURED, not guessed:

1. LEFT-join statement pruning: per-side files opened for the
   canonical BI shape `fact LEFT JOIN dim ... WHERE fact.ts window`
   at sf0.1 — round 11 paid a full fact attach here.
2. Disjunction claims: files opened for a bloom-backed equality OR
   and a range-union envelope — round 11 full-scanned every OR.
3. Hybrid metadata COUNT/MIN/MAX under a range WHERE: files opened
   and wall time vs the same statement with the metadata path
   disabled (pruned scan) — interior files never open.
4. Partition-grain GROUP BY: wall time from the manifest vs the real
   aggregation, zero data reads.

Run: python scripts/r12_evidence.py   (prints one JSON per section)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_challenge_spark.session import get_spark  # noqa: E402
from data_engineering_challenge_spark.sources import catalog as cat  # noqa: E402
from data_engineering_challenge_spark.sources import snapshots as sn  # noqa: E402
from data_engineering_challenge_spark import sql_exec as sx  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _probe_files(spark, cdir, stmt, tables):
    """Per-table inputFiles under the statement's pruned attach."""
    entries = sx._attach(spark, cdir, stmt)
    pruned = sx._pruned_attach(spark, cdir, stmt, entries)
    n = {t: len(spark.table(t).inputFiles()) for t in tables}
    if pruned:
        cat.attach_catalog(spark, cdir, names=pruned)
    return n, sorted(pruned or [])


def _timed(fn, runs=3):
    best = float("inf")
    out = None
    for _ in range(runs):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return out, best


def main() -> None:
    spark = get_spark(app_name="r12-evidence")
    tmp = tempfile.mkdtemp(prefix="r12ev_")
    cdir = f"{tmp}/catalog"

    # shared build: ts-clustered orders fact + key-clustered customers
    o = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    sn.snapshot_append_clustered(
        o, f"{tmp}/orders", ["o_orderdate"], n_files=16,
        stats_cols=["o_orderkey"],
    )
    c = spark.read.parquet(
        os.path.join(SF_DIR, "customer.parquet")
    ).select("c_custkey", "c_mktsegment")
    sn.snapshot_append_clustered(
        c, f"{tmp}/customer", ["c_custkey"], n_files=8
    )
    cat.catalog_register(cdir, "ev_orders", f"{tmp}/orders")
    cat.catalog_register(cdir, "ev_customer", f"{tmp}/customer")

    win = (
        "o_orderdate >= '1996-01-01 00:00:00' "
        "AND o_orderdate < '1996-04-01 00:00:00'"
    )
    # -- 1. LEFT-join statement pruning -------------------------------
    stmt = (
        "SELECT ev_orders.o_orderkey, ev_customer.c_mktsegment "
        "FROM ev_orders LEFT JOIN ev_customer "
        f"ON o_custkey = c_custkey WHERE {win}"
    )
    n, pruned = _probe_files(spark, cdir, stmt, ["ev_orders", "ev_customer"])
    print(json.dumps({
        "section": "left_join_pruning",
        "fact_files_total": 16,
        "fact_files_opened": n["ev_orders"],
        "dim_files_opened_plain": n["ev_customer"],
        "pruned_tables": pruned,
    }))

    # -- 2. disjunction claims ----------------------------------------
    # hash-scattered ids: clustered on segment (useless for ids), so
    # only the BLOOMS can prune the equality OR
    c2 = spark.read.parquet(
        os.path.join(SF_DIR, "customer.parquet")
    ).select("c_custkey", "c_acctbal")
    sn.snapshot_append_clustered(
        c2, f"{tmp}/customer2", ["c_acctbal"], n_files=8,
        bloom_cols=["c_custkey"], bloom_bits=65536,
    )
    cat.catalog_register(cdir, "ev_customer2", f"{tmp}/customer2")
    or_eq = (
        "SELECT COUNT(*) AS n FROM ev_customer2 "
        "WHERE c_custkey = 11 OR c_custkey = 14981"
    )
    n1, _ = _probe_files(spark, cdir, or_eq, ["ev_customer2"])
    or_rng = (
        "SELECT COUNT(*) AS n FROM ev_orders "
        "WHERE o_orderdate BETWEEN '1996-01-01' AND '1996-01-20' "
        "OR o_orderdate BETWEEN '1996-03-01' AND '1996-03-20'"
    )
    n2, _ = _probe_files(spark, cdir, or_rng, ["ev_orders"])
    print(json.dumps({
        "section": "or_disjunction_pruning",
        "bloom_or_eq_files_opened": n1["ev_customer2"],
        "bloom_or_eq_files_total": len(
            sn._read_manifest(
                f"{tmp}/customer2",
                sn.current_version(f"{tmp}/customer2"),
            )["files"]
        ),
        "range_union_files_opened": n2["ev_orders"],
        "range_union_files_total": 16,
    }))

    # -- 3. hybrid metadata aggregate under a range WHERE -------------
    # a WIDE window (2.5 of ~7 years) so whole files sit INSIDE it:
    # interior files fold from the manifest, only the edges scan
    wide = (
        "o_orderdate >= '1994-01-01 00:00:00' "
        "AND o_orderdate < '1996-07-01 00:00:00'"
    )
    agg = (
        "SELECT COUNT(*) AS n, MIN(o_orderkey) AS lo, "
        f"MAX(o_orderkey) AS hi FROM ev_orders WHERE {wide}"
    )
    fast, t_fast = _timed(
        lambda: tuple(sx.execute_sql(spark, agg, cdir).first())
    )
    orig = sx._metadata_range_count

    def _disabled(*a, **k):
        return None

    sx._metadata_range_count = _disabled
    try:
        slow, t_slow = _timed(
            lambda: tuple(sx.execute_sql(spark, agg, cdir).first())
        )
    finally:
        sx._metadata_range_count = orig
    # classify exactly as the hybrid does: how many files does each
    # route OPEN?  (wall clock at sf0.1 is scheduling floor for both)
    import datetime as dt

    bounds = {
        "o_orderdate": (
            dt.datetime(1994, 1, 1), False, dt.datetime(1996, 7, 1), True
        )
    }
    m = sn._read_manifest(
        f"{tmp}/orders", sn.current_version(f"{tmp}/orders")
    )
    interior = excluded = bdry = 0
    for f in m["files"]:
        st = (m["stats"].get(f) or {}).get("o_orderdate")
        lo, _ls, hi, _hs = bounds["o_orderdate"]
        slo = sn._typed_stat(st[0], lo) if st else None
        shi = sn._typed_stat(st[1], lo) if st else None
        if slo is None or shi is None:
            bdry += 1
        elif slo >= hi or shi < lo:
            excluded += 1
        elif slo >= lo and shi < hi:
            interior += 1
        else:
            bdry += 1
    print(json.dumps({
        "section": "metadata_range_agg",
        "answer_equal": fast == slow,
        "files_total": len(m["files"]),
        "files_opened_hybrid_boundary_scan": bdry,
        "files_folded_interior": interior,
        "files_folded_excluded": excluded,
        "hybrid_best_s": round(t_fast, 3),
        "pruned_scan_best_s": round(t_slow, 3),
    }))

    # -- 4. partition-grain GROUP BY ----------------------------------
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet")).select(
        "ts", "value"
    )
    sn.snapshot_append_partitioned(
        ev, f"{tmp}/events_p", {"d": "DAY(ts)"}
    )
    cat.catalog_register(cdir, "ev_events", f"{tmp}/events_p")
    grp = (
        "SELECT DAY(ts) AS d, COUNT(*) AS n FROM ev_events "
        "GROUP BY DAY(ts)"
    )
    fast_rows, t_fast2 = _timed(
        lambda: sorted(map(tuple, sx.execute_sql(spark, grp, cdir).collect()))
    )
    orig2 = sx._metadata_partition_group
    sx._metadata_partition_group = _disabled
    try:
        slow_rows, t_slow2 = _timed(
            lambda: sorted(
                map(tuple, sx.execute_sql(spark, grp, cdir).collect())
            )
        )
    finally:
        sx._metadata_partition_group = orig2
    print(json.dumps({
        "section": "partition_group_by",
        "answer_equal": fast_rows == slow_rows,
        "groups": len(fast_rows),
        "manifest_best_s": round(t_fast2, 3),
        "scan_best_s": round(t_slow2, 3),
    }))


if __name__ == "__main__":
    main()
