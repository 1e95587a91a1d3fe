"""File-level Bloom filters in the snapshot manifest
(`snapshot_append(bloom_cols=...)` → `read_snapshot_pruned(point_eq=...)`):
point-lookup file skipping where min/max stats cannot prune (hash-
scattered keys).  Soundness contract: a bloom miss is PROOF of absence
(never a wrong skip), a hit or a missing bloom reads the file, and the
re-applied predicate decides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import snapshots as sn


def _scattered(spark, n=4000, parts=8):
    """Keys hash-scattered across files: every file's [min, max] spans
    the whole domain, so range stats keep nothing out."""
    return (
        spark.range(0, n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("v"),
            F.concat(F.lit("u"), F.col("id")).alias("name"),
        )
        .repartition(parts, "k")
    )


def _bloom_kept(root, col, value, version=None):
    """How many manifest files would the bloom keep for an equality
    probe (internal accounting for the tests' skip assertions)."""
    v = sn.current_version(root) if version is None else version
    m = sn._read_manifest(root, v)
    blooms = m.get("blooms") or {}
    kept = 0
    for f in m["files"]:
        b = (blooms.get(f) or {}).get(col)
        if b is None or sn._bloom_maybe_contains(b, value):
            kept += 1
    return kept, len(m["files"])


def test_bloom_prunes_scattered_point_lookups(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_append(
        _scattered(spark), root, stats_cols=["k"], bloom_cols=["k", "name"]
    )
    # no false negatives over a key sweep; substantial skipping
    total_kept = 0
    for k in range(0, 4000, 271):
        got = sn.read_snapshot_pruned(
            spark, root, point_eq={"k": k}
        ).collect()
        assert [(r.k, r.name) for r in got] == [(k, f"u{k}")]
        kept, n = _bloom_kept(root, "k", k)
        total_kept += kept
        assert n == 8
    # with 500 distinct keys per 8192-bit file the FPP is tiny: the
    # sweep must average well under 2 kept files of 8
    assert total_kept <= 2 * len(range(0, 4000, 271))
    # string-column blooms prune too
    got = sn.read_snapshot_pruned(
        spark, root, point_eq={"name": "u1234"}
    ).collect()
    assert [(r.k, r.name) for r in got] == [(1234, "u1234")]
    kept, _ = _bloom_kept(root, "name", "u1234")
    assert kept <= 2
    # an absent key returns empty (usually via pure metadata)
    assert (
        sn.read_snapshot_pruned(spark, root, point_eq={"k": 999_999}).count()
        == 0
    )


def test_bloomless_files_always_read(spark, tmp_path):
    """A commit without bloom_cols makes no claims — its files are
    always kept, and lookups stay correct across mixed lineages."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_scattered(spark, 2000), root, bloom_cols=["k"])
    extra = spark.range(10_000, 10_400).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    ).repartition(4, "k")
    sn.snapshot_append(extra, root)  # no blooms on this group
    got = sn.read_snapshot_pruned(spark, root, point_eq={"k": 10_123}).collect()
    assert [r.k for r in got] == [10_123]
    kept, n = _bloom_kept(root, "k", 10_123)
    assert n == 12
    # the 4 bloomless files are always kept; the 8 bloomed ones skip
    assert 4 <= kept <= 5


def test_bloom_type_and_argument_refusals(spark, tmp_path):
    root = str(tmp_path / "tbl")
    dbl = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("x")
    )
    with pytest.raises(ValueError, match="canonical string"):
        sn.snapshot_append(dbl, root, bloom_cols=["x"])
    with pytest.raises(ValueError, match="not in the batch"):
        sn.snapshot_append(dbl, root, bloom_cols=["nope"])
    with pytest.raises(ValueError, match="bloom_bits"):
        sn.snapshot_append(dbl, root, bloom_cols=["k"], bloom_bits=100)
    sn.snapshot_append(dbl, root, bloom_cols=["k"])
    with pytest.raises(ValueError, match="non-null"):
        sn.read_snapshot_pruned(spark, root, point_eq={"k": None})
    with pytest.raises(ValueError, match="non-empty"):
        sn.read_snapshot_pruned(spark, root, point_eq={})
    with pytest.raises(ValueError, match="both ranges and point_eq"):
        sn.read_snapshot_pruned(
            spark, root, ranges={"k": (0, 3)}, point_eq={"k": 1}
        )


def test_bloom_null_semantics(spark, tmp_path):
    """NULLs are excluded from blooms (equality never matches NULL);
    an all-NULL file carries an empty bloom and every probe skips it."""
    root = str(tmp_path / "tbl")
    with_nulls = spark.range(0, 100).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    ).coalesce(1)
    all_nulls = spark.range(100, 120).select(
        F.lit(None).cast("bigint").alias("k"), F.col("id").alias("v")
    ).coalesce(1)
    sn.snapshot_append(with_nulls, root, bloom_cols=["k"])
    sn.snapshot_append(all_nulls, root, bloom_cols=["k"])
    got = sn.read_snapshot_pruned(spark, root, point_eq={"k": 7}).collect()
    assert [(r.k, r.v) for r in got] == [(7, 7)]
    # the all-null file is provably skippable for ANY key
    kept, n = _bloom_kept(root, "k", 7)
    assert (kept, n) == (1, 2)


def test_bloom_composes_with_mor_dml(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_scattered(spark, 1000), root, bloom_cols=["k"])
    sn.snapshot_delete_where(spark, root, "k = 123", keys=["k"])
    assert (
        sn.read_snapshot_pruned(spark, root, point_eq={"k": 123}).count() == 0
    )
    sn.snapshot_update_where(spark, root, "k = 200", {"v": "v + 1000"})
    got = sn.read_snapshot_pruned(spark, root, point_eq={"k": 200}).collect()
    assert [(r.k, r.v) for r in got] == [(200, 1000 + 200 % 97)]


def test_compaction_rederives_blooms(spark, tmp_path):
    """The bloom policy rides the layout: `snapshot_compact` recomputes
    filters for the files it rewrites, so point lookups keep pruning
    after maintenance."""
    root = str(tmp_path / "tbl")
    for lo in range(0, 4000, 500):
        batch = spark.range(lo, lo + 500).select(
            F.col("id").alias("k"),
            (F.col("id") % 97).alias("v"),
            F.concat(F.lit("u"), F.col("id")).alias("name"),
        ).repartition(2, "k")
        sn.snapshot_append(batch, root, bloom_cols=["k"])
    v = sn.snapshot_compact(spark, root, target_files=4)
    m = sn._read_manifest(root, v)
    assert len(m["files"]) <= 6
    blooms = m.get("blooms") or {}
    assert set(blooms) == set(m["files"])  # every live file re-claimed
    for k in (3, 1777, 3999):
        got = sn.read_snapshot_pruned(
            spark, root, point_eq={"k": k}
        ).collect()
        assert [r.k for r in got] == [k]
        kept, n = _bloom_kept(root, "k", k)
        assert kept < n  # still skipping after the rewrite


def test_bloom_survives_rename_via_field_ids(spark, tmp_path):
    """Blooms are keyed by PHYSICAL column names like stats; the probe
    translates the logical name through each file's field-id binding,
    so pruning survives a rename."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_scattered(spark, 1000), root, bloom_cols=["k"])
    sn.snapshot_evolve(root, renames={"k": "kk"})
    got = sn.read_snapshot_pruned(spark, root, point_eq={"kk": 555}).collect()
    assert [r.kk for r in got] == [555]
    m = sn._read_manifest(root, sn.current_version(root))
    blooms = m.get("blooms") or {}
    kept = 0
    for f in m["files"]:
        b = (blooms.get(f) or {}).get("k")  # physical name
        if b is None or sn._bloom_maybe_contains(b, 555):
            kept += 1
    assert kept < len(m["files"])


def test_point_eq_composes_with_ranges(spark, tmp_path):
    """A clustered dimension (range stats) and a scattered dimension
    (bloom) prune TOGETHER — the multi-dim skip."""
    root = str(tmp_path / "tbl")
    df = spark.range(0, 4000).select(
        F.col("id").alias("seq"),
        ((F.col("id") * 2654435761) % 10_000).alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    clustered = df.repartitionByRange(8, "seq").sortWithinPartitions("seq")
    sn.snapshot_append(clustered, root, stats_cols=["seq"], bloom_cols=["k"])
    row = (
        sn.read_snapshot(spark, root)
        .filter(F.col("seq") == 1234)
        .collect()[0]
    )
    got = sn.read_snapshot_pruned(
        spark, root, ranges={"seq": (1000, 1400)}, point_eq={"k": row.k}
    ).collect()
    assert (row.seq, row.k) in {(r.seq, r.k) for r in got}
    assert all(1000 <= r.seq <= 1400 and r.k == row.k for r in got)
