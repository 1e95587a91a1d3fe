"""ADD COLUMN with initial defaults (`snapshot_evolve(adds=...)`):
metadata-only column adds — files written before the add project the
declared default (or a typed NULL) at read, rows written after carry
their own values, and an explicit NULL is never masked (the Iceberg
initial-default contract, not a read-side coalesce)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import snapshots as sn


def _base(spark, root, n=4):
    sn.snapshot_append(
        spark.range(n).select(F.col("id").alias("k")), root
    )


def test_add_column_with_default(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root)
    v = sn.snapshot_evolve(
        root, adds={"tier": ("string", "bronze"), "score": "double"}
    )
    df = sn.read_snapshot(spark, root)
    assert df.schema.simpleString() == (
        "struct<k:bigint,tier:string,score:double>"
    )
    rows = sorted((r.k, r.tier, r.score) for r in df.collect())
    assert rows == [(i, "bronze", None) for i in range(4)]
    # metadata only: the add rewrote nothing
    assert sn._read_manifest(root, v)["files"] == sn._read_manifest(root, 0)[
        "files"
    ]


def test_default_never_masks_explicit_null(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root, 2)
    sn.snapshot_evolve(root, adds={"tier": ("string", "bronze")})
    sn.snapshot_append(
        spark.range(2, 4).select(
            F.col("id").alias("k"),
            F.when(F.col("id") == 2, "gold").alias("tier"),  # 3 -> NULL
        ),
        root,
    )
    rows = sorted(
        (r.k, r.tier) for r in sn.read_snapshot(spark, root).collect()
    )
    assert rows == [(0, "bronze"), (1, "bronze"), (2, "gold"), (3, None)]


def test_time_travel_across_add(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root)
    sn.snapshot_evolve(root, adds={"flag": ("int", 7)})
    assert sn.read_snapshot(spark, root, version=0).columns == ["k"]
    assert sn.read_snapshot(spark, root, version=1).columns == ["k", "flag"]


def test_add_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root)
    with pytest.raises(ValueError, match="collides"):
        sn.snapshot_evolve(root, adds={"k": ("bigint", 0)})
    with pytest.raises(ValueError, match="JSON scalar"):
        sn.snapshot_evolve(root, adds={"x": ("string", [1, 2])})
    with pytest.raises(ValueError, match="type string"):
        sn.snapshot_evolve(root, adds={"x": (None, 1)})
    with pytest.raises(ValueError, match="type string or"):
        sn.snapshot_evolve(root, adds={"x": 42})


def test_post_add_append_without_column_reads_null(spark, tmp_path):
    """Iceberg INITIAL-default (not write-default) semantics: a file
    written AFTER the add that omits the column reads a typed NULL —
    a legacy writer pipeline that hasn't picked up the new column must
    not silently fabricate the default for new rows."""
    root = str(tmp_path / "t")
    _base(spark, root, 2)
    sn.snapshot_evolve(root, adds={"tier": ("string", "bronze")})
    sn.snapshot_append(
        spark.range(2, 4).select(F.col("id").alias("k")), root
    )
    rows = sorted(
        (r.k, r.tier) for r in sn.read_snapshot(spark, root).collect()
    )
    assert rows == [(0, "bronze"), (1, "bronze"), (2, None), (3, None)]
    # and the pre-add epoch still reads the default after ANOTHER add
    sn.snapshot_evolve(root, adds={"w": ("int", 9)})
    rows = sorted(
        (r.k, r.tier, r.w)
        for r in sn.read_snapshot(spark, root).collect()
    )
    assert rows == [
        (0, "bronze", 9), (1, "bronze", 9), (2, None, 9), (3, None, 9),
    ]


def test_invalid_type_or_default_refuses_before_commit(spark, tmp_path):
    """A typo'd DDL type or an uncastable default must refuse at
    evolve time — committing it would leave an unreadable table head
    (every subsequent read fails at cast analysis)."""
    root = str(tmp_path / "t")
    _base(spark, root, 2)
    head = sn.current_version(root)
    with pytest.raises(ValueError, match="unreadable as declared"):
        sn.snapshot_evolve(root, adds={"x": ("strng", "a")})
    with pytest.raises(ValueError, match="unreadable as declared|NULL"):
        sn.snapshot_evolve(root, adds={"n": ("int", "abc")})
    with pytest.raises(ValueError, match="unreadable as declared"):
        sn.snapshot_evolve(root, adds={"y": ("int not null", 1)})
    assert sn.current_version(root) == head  # nothing committed
    assert sorted(r.k for r in sn.read_snapshot(spark, root).collect()) == [
        0, 1,
    ]


def test_case_insensitive_collision_refused(spark, tmp_path):
    """Spark resolves columns case-insensitively by default, so `k`
    and `K` in one schema would make every read AMBIGUOUS_REFERENCE —
    the collision check must match Spark's resolution rules."""
    root = str(tmp_path / "t")
    _base(spark, root, 2)
    with pytest.raises(ValueError, match="collides.*case-insensitive"):
        sn.snapshot_evolve(root, adds={"K": ("int", 5)})
    sn.snapshot_evolve(root, adds={"v": ("int", 1)})
    with pytest.raises(ValueError, match="collides.*case-insensitive"):
        sn.snapshot_evolve(root, renames={"k": "V"})
    # a pure case-change rename of a column onto ITSELF is fine
    sn.snapshot_evolve(root, renames={"k": "K"})
    assert sn.read_snapshot(spark, root).columns == ["K", "v"]


def test_add_composes_with_rename_and_drop(spark, tmp_path):
    root = str(tmp_path / "t")
    _base(spark, root)
    sn.snapshot_evolve(root, renames={"k": "key"})
    sn.snapshot_evolve(root, adds={"w": ("bigint", 5)})
    rows = sorted(
        (r.key, r.w) for r in sn.read_snapshot(spark, root).collect()
    )
    assert rows == [(i, 5) for i in range(4)]
    # drop then re-add the NAME: a NEW field — the old default does not
    # resurface, the new one applies everywhere
    sn.snapshot_evolve(root, drops=["w"])
    sn.snapshot_evolve(root, adds={"w": ("string", "fresh")})
    rows = sorted(
        (r.key, r.w) for r in sn.read_snapshot(spark, root).collect()
    )
    assert rows == [(i, "fresh") for i in range(4)]


def test_compaction_materializes_defaults(spark, tmp_path):
    """Compaction rewrites small files THROUGH the logical schema, so
    rewritten files carry the defaulted column physically — and reads
    agree before and after."""
    root = str(tmp_path / "t")
    for i in range(3):
        sn.snapshot_append(
            spark.range(i * 10, i * 10 + 10).select(F.col("id").alias("k")),
            root,
        )
    sn.snapshot_evolve(root, adds={"tier": ("string", "bronze")})
    before = sorted(
        (r.k, r.tier) for r in sn.read_snapshot(spark, root).collect()
    )
    sn.snapshot_compact(spark, root, target_files=1)
    after = sorted(
        (r.k, r.tier) for r in sn.read_snapshot(spark, root).collect()
    )
    assert before == after and len(after) == 30


def test_pruned_read_on_defaulted_table(spark, tmp_path):
    root = str(tmp_path / "t")
    sn.snapshot_append_clustered(
        spark.range(100).select(F.col("id").alias("k")), root, ["k"],
        n_files=4,
    )
    sn.snapshot_evolve(root, adds={"tier": ("string", "bronze")})
    got = sn.read_snapshot_pruned(spark, root, "k", 10, 12).collect()
    assert sorted((r.k, r.tier) for r in got) == [
        (10, "bronze"), (11, "bronze"), (12, "bronze"),
    ]
