"""Idempotent file ingestion (`snapshot_copy_into`): the COPY INTO
shape — a cron can re-run the same glob forever and only NEW file
versions land.  Identities are recorded atomically with the rows (in
the commit payload), so exactly-once is a property of the lineage, not
of an external bookkeeping file."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from data_engineering_challenge_spark.sources import snapshots as sn


def _write_src(spark, path, lo, hi):
    spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _count(spark, root):
    return sn.read_snapshot(spark, root).count()


def test_copy_into_loads_once(spark, tmp_path):
    src = str(tmp_path / "landing")
    _write_src(spark, f"{src}/a", 0, 50)
    _write_src(spark, f"{src}/b", 50, 80)
    root = str(tmp_path / "tbl")
    r1 = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert len(r1["loaded"]) == 2 and r1["skipped"] == 0
    assert _count(spark, root) == 80
    # identical re-run: commits NOTHING
    r2 = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert r2["loaded"] == [] and r2["skipped"] == 2
    assert r2["version"] == r1["version"]
    assert _count(spark, root) == 80
    # a new file arrives: only it loads
    _write_src(spark, f"{src}/c", 80, 100)
    r3 = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert len(r3["loaded"]) == 1 and r3["skipped"] == 2
    assert _count(spark, root) == 100


def test_copy_into_rewritten_file_is_a_new_version(spark, tmp_path):
    src = str(tmp_path / "landing")
    _write_src(spark, f"{src}/a", 0, 10)
    root = str(tmp_path / "tbl")
    sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert _count(spark, root) == 10
    time.sleep(0.01)  # ensure a distinct mtime_ns
    _write_src(spark, f"{src}/a", 100, 115)  # in-place rewrite, new size
    r = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert len(r["loaded"]) == 1
    # the OLD rows stay (append semantics — dedup is per file VERSION)
    assert _count(spark, root) == 25


def test_copy_into_force_reloads(spark, tmp_path):
    src = str(tmp_path / "landing")
    _write_src(spark, f"{src}/a", 0, 10)
    root = str(tmp_path / "tbl")
    sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    r = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet", force=True)
    assert len(r["loaded"]) == 1
    assert _count(spark, root) == 20


def test_copy_into_rollback_reloads(spark, tmp_path):
    """A copy undone by rollback drops out of the lineage walk — the
    re-run loads the files again."""
    src = str(tmp_path / "landing")
    root = str(tmp_path / "tbl")
    sn.snapshot_append(
        spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v")),
        root,
    )
    _write_src(spark, f"{src}/a", 100, 110)
    r1 = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert _count(spark, root) == 15
    sn.rollback(root, 0)
    assert _count(spark, root) == 5
    # re-running the IDENTICAL batch from the IDENTICAL parent resumes
    # the original commit through its tag marker (same content, zero new
    # bytes) — indistinguishable from a crash-replay, and the net state
    # is exactly what a fresh load would produce
    r2 = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert len(r2["loaded"]) == 1 and r2["version"] == r1["version"]
    assert _count(spark, root) == 15
    # an INTERVENING commit changes the parent: the re-copy after a
    # rollback then loads fresh
    sn.rollback(root, 0)
    sn.snapshot_append(
        spark.range(2).select(F.col("id").alias("k"), F.col("id").alias("v")),
        root,
    )
    r3 = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert len(r3["loaded"]) == 1 and r3["version"] not in (
        r1["version"],
        r2["version"],
    )
    assert _count(spark, root) == 17


def test_copy_into_restore_unloads(spark, tmp_path):
    """`snapshot_restore` (the history-preserving undo) must un-load a
    copy just like rollback: the identity walk jumps through the
    restore hop to the restored version's history."""
    src = str(tmp_path / "landing")
    root = str(tmp_path / "tbl")
    sn.snapshot_append(
        spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v")),
        root,
    )
    _write_src(spark, f"{src}/a", 100, 110)
    sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert _count(spark, root) == 15
    sn.snapshot_restore(root, 0)  # undo the copy, history stays linear
    assert _count(spark, root) == 5
    r = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert len(r["loaded"]) == 1
    assert _count(spark, root) == 15
    # and a copy BEFORE the restored version stays deduped
    r2 = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert r2["loaded"] == []


def test_copied_set_consolidates_through_manifest_compaction(spark, tmp_path):
    """`compact_manifests` folds the accumulated identity set forward,
    so the walk terminates at the consolidation point — and the re-run
    still no-ops."""
    src = str(tmp_path / "landing")
    root = str(tmp_path / "tbl")
    for i in range(4):
        _write_src(spark, f"{src}/b{i}", i * 10, i * 10 + 10)
        sn.snapshot_copy_into(spark, root, f"{src}/b{i}/*.parquet")
    v = sn.compact_manifests(root)
    meta = sn._read_manifest_meta(root, v)
    assert len(meta.get("copied_all") or []) == 4
    r = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert r["loaded"] == [] and r["skipped"] == 4
    assert _count(spark, root) == 40


def test_copy_into_inherits_layout_policy(spark, tmp_path):
    """A table whose layout declares bloom/stats columns keeps getting
    prunable files from policy-less COPY INTO calls (the SQL surface
    cannot pass per-call args)."""
    src = str(tmp_path / "landing")
    root = str(tmp_path / "tbl")
    sn.snapshot_append(
        spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v")),
        root,
        stats_cols=["k"],
        bloom_cols=["k"],
        bloom_bits=16384,
    )
    _write_src(spark, f"{src}/a", 100, 200)
    sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    m = sn._read_manifest(root, sn.current_version(root))
    blooms = m.get("blooms") or {}
    assert set(blooms) == set(m["files"])  # ingested files claim too
    # inherited sizing, not the default
    assert all(b["k"]["m"] == 16384 for b in blooms.values())
    # (per-commit stats_cols is NOT a layout policy — only the bloom
    # declaration rides the layout; clustered appends declare stats)


def test_evolve_remaps_bloom_policy(spark, tmp_path):
    """A rename carries the layout's bloom policy with it, so
    compaction keeps re-deriving filters for rewritten files."""
    df = (
        spark.range(0, 2000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .repartition(4, "k")
    )
    root = str(tmp_path / "tbl")
    sn.snapshot_append(df, root, bloom_cols=["k"])
    sn.snapshot_evolve(root, renames={"k": "kk"})
    lay = sn._read_manifest_meta(root, sn.current_version(root))["layout"]
    assert lay["bloom_cols"] == ["kk"]
    v = sn.snapshot_compact(spark, root, target_files=2)
    m = sn._read_manifest(root, v)
    assert set(m.get("blooms") or {}) == set(m["files"])
    got = sn.read_snapshot_pruned(spark, root, point_eq={"kk": 777}).collect()
    assert [r.kk for r in got] == [777]


def test_copy_into_csv_needs_schema(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("1,alpha\n2,beta\n")
    root = str(tmp_path / "tbl")
    with pytest.raises(ValueError, match="schema"):
        sn.snapshot_copy_into(spark, root, str(src), source_format="csv")
    schema = StructType(
        [StructField("k", LongType()), StructField("name", StringType())]
    )
    r = sn.snapshot_copy_into(
        spark, root, str(src), source_format="csv", schema=schema
    )
    assert len(r["loaded"]) == 1
    rows = sorted(
        (x.k, x.name) for x in sn.read_snapshot(spark, root).collect()
    )
    assert rows == [(1, "alpha"), (2, "beta")]
    # idempotent for csv too
    assert sn.snapshot_copy_into(
        spark, root, str(src), source_format="csv", schema=schema
    )["loaded"] == []


def test_copy_into_refusals(spark, tmp_path):
    root = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError, match="matched no files"):
        sn.snapshot_copy_into(spark, root, str(tmp_path / "nope*"))
    p = tmp_path / "x.parquet"
    p.write_text("not really parquet")
    with pytest.raises(ValueError, match="unsupported format"):
        sn.snapshot_copy_into(spark, root, str(p), source_format="avro")


def test_copy_into_composes_with_blooms(spark, tmp_path):
    src = str(tmp_path / "landing")
    _write_src(spark, f"{src}/a", 0, 1000)
    root = str(tmp_path / "tbl")
    sn.snapshot_copy_into(
        spark, root, f"{src}/*/*.parquet", bloom_cols=["k"]
    )
    got = sn.read_snapshot_pruned(spark, root, point_eq={"k": 123}).collect()
    assert [r.k for r in got] == [123]


def test_sql_copy_into_statement(spark, tmp_path):
    """The SQL surface: COPY INTO <name> FROM '<glob>'."""
    from data_engineering_challenge_spark.sources import catalog as cat
    from data_engineering_challenge_spark.sql_exec import execute_sql

    cdir = str(tmp_path / "catalog")
    src = str(tmp_path / "landing")
    _write_src(spark, f"{src}/a", 0, 30)
    execute_sql(
        spark, "CREATE TABLE lake AS SELECT CAST(99999 AS BIGINT) AS k,"
        " CAST(0 AS BIGINT) AS v", cdir
    )
    v = execute_sql(
        spark, f"COPY INTO lake FROM '{src}/*/*.parquet'", cdir
    )
    assert isinstance(v, int)
    n = execute_sql(spark, "SELECT COUNT(*) AS n FROM lake", cdir).first().n
    assert n == 31
    # re-run no-ops
    execute_sql(spark, f"COPY INTO lake FROM '{src}/*/*.parquet'", cdir)
    assert (
        execute_sql(spark, "SELECT COUNT(*) AS n FROM lake", cdir).first().n
        == 31
    )
    # csv format variant reads under the TABLE's schema
    csv = tmp_path / "more.csv"
    csv.write_text("7,70\n8,80\n")
    execute_sql(
        spark, f"COPY INTO lake FROM '{csv}' FORMAT CSV", cdir
    )
    assert (
        execute_sql(spark, "SELECT COUNT(*) AS n FROM lake", cdir).first().n
        == 33
    )


def test_copy_into_survives_vacuum(spark, tmp_path):
    """expire_versions stamps a ``copied_all`` consolidation marker
    onto every survivor whose parent-chain hop crosses the retention
    boundary — the SQL-only cron story (COPY INTO + VACUUM, no
    compact_manifests) must keep ingesting, and must still SKIP every
    identity recorded in the expired history."""
    src = str(tmp_path / "landing")
    root = str(tmp_path / "tbl")
    for i in range(5):
        _write_src(spark, f"{src}/f{i}", i * 10, i * 10 + 10)
        sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert _count(spark, root) == 50
    expired = sn.expire_versions(root, keep_last=2)
    assert expired  # the walk below the boundary really is gone
    # identical re-run on the vacuumed table: nothing reloads
    r = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert r["loaded"] == [] and r["skipped"] == 5
    assert _count(spark, root) == 50
    # new file still lands exactly once
    _write_src(spark, f"{src}/f9", 90, 95)
    r2 = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert len(r2["loaded"]) == 1 and r2["skipped"] == 5
    assert _count(spark, root) == 55
    # a second vacuum over the stamped lineage composes
    sn.expire_versions(root, keep_last=1)
    r3 = sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    assert r3["loaded"] == [] and r3["skipped"] == 6


def test_copy_into_refuses_on_legacy_gap(spark, tmp_path):
    """A table vacuumed by a PRE-consolidation build (manifest gap, no
    marker above it) must refuse COPY INTO loudly — guessing an empty
    history would re-load every previously-ingested file."""
    src = str(tmp_path / "landing")
    root = str(tmp_path / "tbl")
    for i in range(3):
        _write_src(spark, f"{src}/f{i}", i * 10, i * 10 + 10)
        sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    # simulate the legacy vacuum: remove an ancestor manifest directly
    head = sn.current_version(root)
    victim = sn._read_manifest_meta(root, head)["parent"]
    os.remove(sn._manifest_path(root, victim))
    with pytest.raises(RuntimeError, match="consolidation marker"):
        sn.snapshot_copy_into(spark, root, f"{src}/*/*.parquet")
    # force=True is the documented escape (skips the identity walk)
    r = sn.snapshot_copy_into(
        spark, root, f"{src}/*/*.parquet", force=True
    )
    assert len(r["loaded"]) == 3
