"""ANALYZE/size statistics CONSUMED by the planner (round 10, verdict
item 4): `snapshot_plan_hints` exposes stale-safe size estimates —
manifest byte/row sums (exact, never stale) plus the last ANALYZE
rowcount with a currency certificate — and two physical decisions read
them: `snapshot_merge_into`'s small-target fast path (skip
findTouchedFiles, rewrite outright) and `attach_snapshot_view`'s
auto-broadcast hint for engine-merged reads Catalyst cannot size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import snapshots as sn


def _mk(spark, root, n=100):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    sn.snapshot_append(df, root)
    return df


def test_plan_hints_exactness_and_staleness(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root, 100)
    h = sn.snapshot_plan_hints(root)
    assert h["rows"] == 100 and h["bytes"] and h["analyzed_rows"] is None
    sn.snapshot_analyze(spark, root, columns=["k"])
    h = sn.snapshot_plan_hints(root)
    assert h["analyzed_rows"] == 100 and h["analyze_current"] is True
    # rowcount-preserving commits keep the certificate
    sn.snapshot_update_where(spark, root, "k = 1", {"v": "v + 1"})
    sn.snapshot_set_check(spark, root, "pos", "v >= 0")
    h = sn.snapshot_plan_hints(root)
    assert h["analyzed_rows"] == 100 and h["analyze_current"] is True
    # an APPEND invalidates it (rows grew); manifest sums stay exact
    sn.snapshot_append(
        spark.range(5).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        ),
        root,
    )
    h = sn.snapshot_plan_hints(root)
    assert h["analyze_current"] is False
    assert h["rows"] == 105 + 1  # +1: the update's post-image file row
    # a DELETE invalidates it too (conservative: count shrank)
    sn.snapshot_analyze(spark, root, columns=["k"])
    sn.snapshot_delete_where(spark, root, "k = 2", keys=["k"])
    assert sn.snapshot_plan_hints(root)["analyze_current"] is False


def test_attach_auto_broadcast_flips_join_strategy(spark, tmp_path):
    """A small MoR (delete-carrying) table's attached view cannot be
    sized by Catalyst (the merged read hides the scan behind
    anti-joins) — the manifest-bytes hint flips a join against it to
    BroadcastHashJoin; with broadcasting disabled the hint stays off
    and the join shuffles."""
    root = str(tmp_path / "dim")
    _mk(spark, root, 50)
    sn.snapshot_delete_where(spark, root, "k = 1", keys=["k"])  # MoR
    spark.range(200_000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("x")
    ).createOrReplaceTempView("big_fact")

    def _plan():
        return (
            spark.sql(
                "SELECT f.k, COUNT(*) AS n, SUM(d.v) AS s FROM big_fact f "
                "JOIN dim_t d ON f.k = d.k GROUP BY f.k"
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # NOTE: the MoR read's INTERNAL seq-map/delete-side joins are
        # explicitly-hinted broadcasts and appear in every plan — the
        # flip under test is the TOP fact⋈dim join, visible as the
        # presence/absence of a SortMergeJoin
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        sn.attach_snapshot_view(spark, "dim_t", root)
        p = _plan()
        assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p
        # disabled threshold: no hint, the top join shuffles both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        sn.attach_snapshot_view(spark, "dim_t", root)
        assert "SortMergeJoin" in _plan()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_merge_small_target_skips_touched_scan(spark, tmp_path, monkeypatch):
    """The stats-driven merge choice: a provably small target skips
    the findTouchedFiles job and rewrites outright; pinning
    small_target_rows=0 (or an unprovable size) keeps the scan."""
    root = str(tmp_path / "t")
    _mk(spark, root, 80)
    calls: list[int] = []
    orig = sn._merge_touched_files

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(sn, "_merge_touched_files", counting)
    src = spark.createDataFrame([(3, 999)], "k long, v long")
    sn.snapshot_merge_into(
        spark, root, src, ["k"],
        when_matched=[("update", None, {"v": "s.v"})],
    )
    assert calls == [], "small target must not run the touched scan"
    got = {r.k: r.v for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got[3] == 999 and len(got) == 80
    sn.snapshot_merge_into(
        spark, root, src, ["k"],
        when_matched=[("update", None, {"v": "s.v + 1"})],
        small_target_rows=0,
    )
    assert calls == [1], "pinned: the touched scan runs"


def test_merge_small_target_keeps_noop_contract(spark, tmp_path):
    """An update/delete-only merge matching NOTHING commits NOTHING on
    the fast path too — a no-op cron must not churn versions."""
    root = str(tmp_path / "t")
    _mk(spark, root, 10)
    v0 = sn.current_version(root)
    v = sn.snapshot_merge_into(
        spark, root,
        spark.createDataFrame([(999, 1)], "k long, v long"), ["k"],
        when_matched=[("update", None, {"v": "s.v"})],
    )
    assert v == v0 and sn.current_version(root) == v0
