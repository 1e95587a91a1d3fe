"""`snapshot_clone` — Delta ``CREATE TABLE … CLONE`` analog: zero-copy
(hard-linked) or physical-copy clone of one snapshot table state into a
new independent lineage, carrying MoR deletes, sequences, layout,
partition values and CHECK constraints verbatim."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import snapshots as sn


def _mor_tbl(spark, tmp_path):
    """A table with real MoR history: insert, delete, RE-INSERT one key
    (the sequence-rule stress shape)."""
    root = str(tmp_path / "src")
    for b in (
        [Row(k=1, v=10, _op="I"), Row(k=2, v=20, _op="I"),
         Row(k=3, v=30, _op="I")],
        [Row(k=2, v=0, _op="D")],
        [Row(k=2, v=22, _op="I")],  # re-insert AFTER its delete
    ):
        sn.snapshot_mor_merge(spark, root, spark.createDataFrame(b), ["k"])
    return root


def test_clone_zero_copy_and_content_equal(spark, tmp_path):
    root = _mor_tbl(spark, tmp_path)
    dst = str(tmp_path / "dst")
    v = sn.snapshot_clone(root, dst)
    got = {(r.k, r.v) for r in sn.read_snapshot_mor(spark, dst).collect()}
    assert got == {(1, 10), (2, 22), (3, 30)}
    # the clone landed under the SOURCE's version number (sequence
    # coherence) and is the head of its own lineage
    assert v == sn.current_version(root)
    assert sn.current_version(dst) == v
    # zero-copy: every data file shares the source's inode
    m = sn._read_manifest(dst, v)
    for f in m["files"]:
        assert (
            os.stat(os.path.join(dst, f)).st_ino
            == os.stat(os.path.join(root, f)).st_ino
        )


def test_clone_sequence_rule_survives_new_writes(spark, tmp_path):
    """THE clone-numbering pin: a key deleted pre-clone and re-inserted
    AFTER the clone must survive — if the clone renumbered from 0, the
    carried delete list (higher sequence) would kill the new insert."""
    root = str(tmp_path / "src")
    for b in (
        [Row(k=1, v=10, _op="I"), Row(k=2, v=20, _op="I")],
        [Row(k=2, v=0, _op="D")],
    ):
        sn.snapshot_mor_merge(spark, root, spark.createDataFrame(b), ["k"])
    dst = str(tmp_path / "dst")
    sn.snapshot_clone(root, dst)
    sn.snapshot_mor_merge(
        spark, dst,
        spark.createDataFrame([Row(k=2, v=222, _op="I")]), ["k"],
    )
    got = {(r.k, r.v) for r in sn.read_snapshot_mor(spark, dst).collect()}
    assert got == {(1, 10), (2, 222)}


def test_clone_diverges_independently(spark, tmp_path):
    root = _mor_tbl(spark, tmp_path)
    dst = str(tmp_path / "dst")
    sn.snapshot_clone(root, dst)
    sn.snapshot_append(
        spark.createDataFrame([Row(k=9, v=90, _op="I")]).drop("_op"), root
    )
    sn.snapshot_delete_where(spark, dst, "k = 1", keys=["k"])
    src_got = {r.k for r in sn.read_snapshot_mor(spark, root).collect()}
    dst_got = {r.k for r in sn.read_snapshot_mor(spark, dst).collect()}
    assert src_got == {1, 2, 3, 9}
    assert dst_got == {2, 3}


def test_clone_survives_source_maintenance(spark, tmp_path):
    """Source-side compaction + expiry + vacuum unlink the source's
    paths; the clone's hard links keep the inodes alive."""
    root = _mor_tbl(spark, tmp_path)
    dst = str(tmp_path / "dst")
    sn.snapshot_clone(root, dst)
    sn.snapshot_compact(spark, root)
    sn.expire_versions(root, keep_last=1)
    removed = sn.vacuum_orphans(root, min_age_s=0)
    assert removed  # maintenance actually reclaimed source files
    got = {(r.k, r.v) for r in sn.read_snapshot_mor(spark, dst).collect()}
    assert got == {(1, 10), (2, 22), (3, 30)}


def test_clone_modes_and_refusals(spark, tmp_path):
    root = _mor_tbl(spark, tmp_path)
    dst = str(tmp_path / "copy")
    sn.snapshot_clone(root, dst, mode="copy")
    m = sn._read_manifest(dst, sn.current_version(dst))
    f = m["files"][0]
    assert (
        os.stat(os.path.join(dst, f)).st_ino
        != os.stat(os.path.join(root, f)).st_ino
    )
    with pytest.raises(FileExistsError, match="already holds"):
        sn.snapshot_clone(root, dst)
    with pytest.raises(ValueError, match="mode"):
        sn.snapshot_clone(root, str(tmp_path / "x"), mode="mirror")
    with pytest.raises(FileNotFoundError):
        sn.snapshot_clone(str(tmp_path / "nope"), str(tmp_path / "y"))


def test_clone_specific_version_and_checks_carry(spark, tmp_path):
    root = str(tmp_path / "src")
    sn.snapshot_append(
        spark.createDataFrame([(1, 10)], "k INT, v INT"), root
    )
    sn.snapshot_set_check(spark, root, "v_positive", "v > 0")
    sn.snapshot_append(
        spark.createDataFrame([(2, 20)], "k INT, v INT"), root
    )
    # clone the PRE-constraint version: no checks carried
    d0 = str(tmp_path / "d0")
    sn.snapshot_clone(root, d0, version=0)
    assert sn._table_checks(d0) == {}
    assert sn.read_snapshot(spark, d0).count() == 1
    # clone the head: constraint carried and enforced
    d2 = str(tmp_path / "d2")
    sn.snapshot_clone(root, d2)
    assert sn._table_checks(d2) == {"v_positive": "v > 0"}
    with pytest.raises(Exception, match="v_positive"):
        sn.snapshot_append(
            spark.createDataFrame([(3, -3)], "k INT, v INT"), d2
        )


def test_clone_partitioned_metadata_carries(spark, tmp_path):
    root = str(tmp_path / "src")
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 2) + 1:02d}") for i in range(20)],
        "id INT, d STRING",
    ).select("id", F.col("d").cast("date").alias("d"))
    sn.snapshot_append_partitioned(df, root, {"day": "d"})
    dst = str(tmp_path / "dst")
    sn.snapshot_clone(root, dst)
    rows = {
        r["partition"]["day"]: r["row_count"]
        for r in sn.snapshot_partitions(spark, dst).collect()
    }
    assert rows == {"2024-01-01": 10, "2024-01-02": 10}
    # pruned reads keep working through the carried partition values
    pruned = sn.read_snapshot_pruned(
        spark, dst, partition_eq={"day": "2024-01-01"}
    )
    assert pruned.count() == 10


def test_torn_clone_retry_repairs(spark, tmp_path):
    """A clone crashed between the manifest claim and the _LATEST move
    must be completable by re-running the same clone (the tagged-commit
    torn-window repair, clone-flavored) — and a RETRY must also survive
    already-linked data files instead of crashing on EEXIST."""
    root = _mor_tbl(spark, tmp_path)
    dst = str(tmp_path / "dst")
    v = sn.snapshot_clone(root, dst)
    # simulate the torn window: manifest exists, pointer lost
    os.remove(sn._latest_path(dst))
    assert sn.current_version(dst) is None
    v2 = sn.snapshot_clone(root, dst)  # idempotent completion
    assert v2 == v and sn.current_version(dst) == v
    got = {(r.k, r.v) for r in sn.read_snapshot_mor(spark, dst).collect()}
    assert got == {(1, 10), (2, 22), (3, 30)}
    # a torn clone of a DIFFERENT source refuses instead of clobbering
    other = str(tmp_path / "other")
    for i in range(v + 1):  # other must HAVE a version v to clone
        sn.snapshot_append(
            spark.createDataFrame([Row(k=7 + i, v=70)]), other
        )
    os.remove(sn._latest_path(dst))
    with pytest.raises(FileExistsError, match="different commit"):
        sn.snapshot_clone(other, dst, version=v)


# --------------------------------------------------------- z-order


def _grid(spark, n=40):
    return spark.createDataFrame(
        [(x, y, x * 1000 + y) for x in range(n) for y in range(n)],
        "x INT, y INT, payload INT",
    )


def test_zordered_append_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order's whole point: a 1-D sort on x leaves y spanning the
    full domain in every file (no pruning on y); the Morton layout
    bounds BOTH, so narrow ranges on either column skip most files."""
    from data_engineering_challenge_spark.sources import snapshots as sn

    n_files = 16
    zroot = str(tmp_path / "z")
    sn.snapshot_append_zordered(
        _grid(spark), zroot, ["x", "y"], n_files=n_files
    )
    sroot = str(tmp_path / "s")
    sn.snapshot_append_clustered(
        _grid(spark), sroot, ["x"], n_files=n_files, stats_cols=["y"]
    )

    def files_read(root, col, lo, hi):
        return len(
            sn.read_snapshot_pruned(spark, root, col, lo, hi).inputFiles()
        )

    # x-range: both layouts prune
    assert files_read(zroot, "x", 0, 4) <= n_files // 2
    assert files_read(sroot, "x", 0, 4) <= 2
    # y-range: only the z-order layout prunes
    assert files_read(sroot, "y", 0, 4) == n_files
    assert files_read(zroot, "y", 0, 4) <= n_files // 2
    # correctness unaffected by the layout
    assert (
        sn.read_snapshot_pruned(spark, zroot, "y", 0, 4).count()
        == 40 * 5
    )


def test_zorder_layout_survives_compaction_and_refuses_mixing(
    spark, tmp_path
):
    from data_engineering_challenge_spark.sources import snapshots as sn

    root = str(tmp_path / "z")
    sn.snapshot_append_zordered(_grid(spark), root, ["x", "y"], n_files=16)
    with pytest.raises(ValueError, match="(?i)z-order layout"):
        sn.snapshot_append_clustered(_grid(spark), root, ["x"])
    sn.snapshot_delete_where(spark, root, "payload % 11 = 0", keys=["payload"])
    sn.snapshot_compact(spark, root)
    m = sn._read_manifest(root, sn.current_version(root))
    assert m["layout"]["zorder_cols"] == ["x", "y"]
    assert not m["delete_files"]
    # the rewrite re-zordered: both dimensions still prune
    for col in ("x", "y"):
        pruned = sn.read_snapshot_pruned(spark, root, col, 0, 4)
        assert len(pruned.inputFiles()) < 16
        assert pruned.count() == sum(
            1
            for x in range(40)
            for y in range(40)
            if (x if col == "x" else y) <= 4
            and (x * 1000 + y) % 11 != 0
        )
    # and the reverse mixing refusal
    sroot = str(tmp_path / "s")
    sn.snapshot_append_clustered(_grid(spark), sroot, ["x"])
    with pytest.raises(ValueError, match="1-D sort layout"):
        sn.snapshot_append_zordered(_grid(spark), sroot, ["x", "y"])


def test_zorder_refuses_partition_mixing_and_evolve_remaps(
    spark, tmp_path
):
    from data_engineering_challenge_spark.sources import snapshots as sn

    # partitioned table refuses a z-order append (and vice versa)
    proot = str(tmp_path / "p")
    sn.snapshot_append_partitioned(
        _grid(spark, 6), proot, {"pz": "x % 2"}
    )
    with pytest.raises(ValueError, match="hidden partitioning"):
        sn.snapshot_append_zordered(_grid(spark, 6), proot, ["x", "y"])
    zroot = str(tmp_path / "z")
    sn.snapshot_append_zordered(_grid(spark, 6), zroot, ["x", "y"])
    with pytest.raises(ValueError, match="(?i)z-order layout"):
        sn.snapshot_append_partitioned(
            _grid(spark, 6), zroot, {"pz": "x % 2"}
        )
    # evolve remaps the z-order policy so maintenance keeps working
    sn.snapshot_evolve(zroot, renames={"x": "a"})
    m = sn._read_manifest(zroot, sn.current_version(zroot))
    assert m["layout"]["zorder_cols"] == ["a", "y"]
    sn.snapshot_compact(spark, zroot, target_files=2)
    assert sn.read_snapshot_mor(spark, zroot).count() == 36
