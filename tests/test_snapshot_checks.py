"""Persistent CHECK constraints (Delta `ALTER TABLE ADD CONSTRAINT`
analog) + expectations-gated appends (the DLT expect/expect_or_drop/
quarantine family) on snapshot tables.

Reference parity: the reference has no constraint surface — a bad feed
only aborts at read time (reference pipeline.py:98-100); here the table
itself carries the contract and every write path enforces it in-job."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_challenge_spark.operators.quality import (
    RowRule,
    rule_between,
    rule_not_null,
)
from data_engineering_challenge_spark.sources import snapshots as sn


def _tbl(spark, tmp_path, name="tbl"):
    root = str(tmp_path / name)
    sn.snapshot_append(
        spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT"), root
    )
    return root


# ----------------------------------------------------------- CHECKs


def test_check_refuses_violating_append(spark, tmp_path):
    root = _tbl(spark, tmp_path)
    v = sn.snapshot_set_check(spark, root, "v_positive", "v > 0")
    assert v == 1
    with pytest.raises(Exception, match="v_positive"):
        sn.snapshot_append(
            spark.createDataFrame([(3, -5)], "k INT, v INT"), root
        )
    # nothing committed and no orphan version landed
    assert sn.current_version(root) == 1
    assert sn.snapshot_versions(root) == [0, 1]
    # a valid append still flows, and the check survives it (inherited)
    sn.snapshot_append(spark.createDataFrame([(3, 5)], "k INT, v INT"), root)
    with pytest.raises(Exception, match="v_positive"):
        sn.snapshot_append(
            spark.createDataFrame([(4, 0)], "k INT, v INT"), root
        )


def test_check_null_passes_sql_semantics(spark, tmp_path):
    root = _tbl(spark, tmp_path)
    sn.snapshot_set_check(spark, root, "v_positive", "v > 0")
    # SQL CHECK: NULL result passes — pair with IS NOT NULL to reject
    sn.snapshot_append(
        spark.createDataFrame([Row(k=9, v=None)], "k INT, v INT"), root
    )
    sn.snapshot_set_check(spark, root, "v_set", "v IS NOT NULL",
                          validate=False)
    with pytest.raises(Exception, match="v_set"):
        sn.snapshot_append(
            spark.createDataFrame([Row(k=10, v=None)], "k INT, v INT"),
            root,
        )


def test_check_validates_existing_rows(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_append(
        spark.createDataFrame([(1, -1), (2, 20)], "k INT, v INT"), root
    )
    with pytest.raises(ValueError, match="existing rows violate"):
        sn.snapshot_set_check(spark, root, "v_positive", "v > 0")
    # validate=False records it for NEW writes only
    sn.snapshot_set_check(spark, root, "v_positive", "v > 0",
                          validate=False)
    with pytest.raises(Exception, match="v_positive"):
        sn.snapshot_append(
            spark.createDataFrame([(3, -3)], "k INT, v INT"), root
        )


def test_check_enforced_on_every_write_path(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_append(
        spark.createDataFrame([(1, 10), (2, 20)], "k INT, v INT"), root
    )
    sn.snapshot_set_check(spark, root, "v_cap", "v <= 1000")
    bad = spark.createDataFrame([(7, 5000)], "k INT, v INT")
    with pytest.raises(Exception, match="v_cap"):
        sn.snapshot_overwrite(bad, root)
    with pytest.raises(Exception, match="v_cap"):
        sn.snapshot_merge_keys(
            spark, root, bad.withColumn("_op", F.lit("I")), ["k"]
        )
    with pytest.raises(Exception, match="v_cap"):
        sn.snapshot_mor_merge(
            spark, root, bad.withColumn("_op", F.lit("I")), ["k"]
        )
    with pytest.raises(Exception, match="v_cap"):
        sn.snapshot_update_where(
            spark, root, "k = 1", {"v": "v + 100000"}
        )
    with pytest.raises(Exception, match="v_cap"):
        sn.snapshot_merge_into(
            spark, root, bad, on=["k"],
            when_not_matched=("insert", None, "all"),
        )
    with pytest.raises(Exception, match="v_cap"):
        sn.snapshot_append_partitioned(
            bad, root, {"bucket": "k % 2"}
        )
    # the table is untouched by all six refusals
    got = {r.k: r.v for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got == {1: 10, 2: 20}
    # and every path still works with valid rows
    sn.snapshot_update_where(spark, root, "k = 1", {"v": "v + 1"})
    assert sn.read_snapshot_mor(spark, root).filter("k=1").first().v == 11


def test_drop_check_and_time_travel_metadata(spark, tmp_path):
    root = _tbl(spark, tmp_path)
    v_set = sn.snapshot_set_check(spark, root, "v_positive", "v > 0")
    with pytest.raises(ValueError, match="no live check"):
        sn.snapshot_drop_check(root, "nope")
    v_drop = sn.snapshot_drop_check(root, "v_positive")
    # post-drop: violating writes flow again
    sn.snapshot_append(
        spark.createDataFrame([(3, -5)], "k INT, v INT"), root
    )
    assert sn.read_snapshot_mor(spark, root).count() == 3
    # history keeps the contract each version committed under
    assert sn._table_checks(root, v_set) == {"v_positive": "v > 0"}
    assert sn._table_checks(root, v_drop) == {}
    # metadata-only commits added no data files and changed no content
    assert (
        sn.read_snapshot_mor(spark, root, v_set).count()
        == sn.read_snapshot_mor(spark, root, 0).count()
    )


def test_check_hop_invisible_to_cdf_and_compaction_carries(spark, tmp_path):
    root = _tbl(spark, tmp_path)
    sn.snapshot_set_check(spark, root, "v_positive", "v > 0")
    sn.snapshot_append(spark.createDataFrame([(3, 30)], "k INT, v INT"),
                       root)
    # CDF across the metadata-only hop: zero events for it
    ev = sn.read_snapshot_cdf(spark, root, 0, sn.current_version(root))
    by_ver = {
        r["commit_version"]: r["n"]
        for r in ev.groupBy("_commit_version")
        .agg(F.count("*").alias("n"))
        .withColumnRenamed("_commit_version", "commit_version")
        .collect()
    }
    assert 1 not in by_ver and by_ver.get(2) == 1
    # compaction inherits the check (meta travels) and still enforces
    sn.snapshot_delete_where(spark, root, "k = 2", keys=["k"])
    sn.snapshot_compact(spark, root)
    assert sn._table_checks(root) == {"v_positive": "v > 0"}
    with pytest.raises(Exception, match="v_positive"):
        sn.snapshot_append(
            spark.createDataFrame([(8, -8)], "k INT, v INT"), root
        )


# ----------------------------------------------------- expectations


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "good text here", "en", 140),
            (2, "short", "en", 5),
            (3, "unknown lang doc", "xx", 160),
            (4, None, "de", 120),
            (5, "fine doc", "de", 200),
        ],
        "doc_id INT, text STRING, lang STRING, n_chars INT",
    )


_RULES = [
    rule_not_null("text"),
    rule_between("n_chars", 100, 100000),
    RowRule("lang_known", lambda: F.col("lang").isin("en", "de", "fr")),
]


def test_expect_fail_mode_refuses_batch(spark, tmp_path):
    root = str(tmp_path / "tbl")
    with pytest.raises(ValueError, match="violate expectations"):
        sn.snapshot_append_expect(spark, _docs(spark), root, _RULES)
    assert sn.current_version(root) is None  # nothing committed


def test_expect_drop_and_quarantine_modes(spark, tmp_path):
    root = str(tmp_path / "tbl")
    qroot = str(tmp_path / "quar")
    res = sn.snapshot_append_expect(
        spark, _docs(spark), root, _RULES,
        on_violation="quarantine", quarantine_root=qroot,
    )
    assert res["admitted"] == 2 and res["quarantined"] == 3
    assert res["violations"] == {
        "not_null(text)": 1,
        "between(n_chars,100,100000)": 1,
        "lang_known": 1,
    }
    got = {r.doc_id for r in sn.read_snapshot(spark, root).collect()}
    assert got == {1, 5}
    quar = sn.read_snapshot(spark, qroot).collect()
    tags = {r.doc_id: set(r._violations) for r in quar}
    assert tags == {
        2: {"between(n_chars,100,100000)"},
        3: {"lang_known"},
        4: {"not_null(text)"},
    }
    # drop mode: same admit set, no quarantine table involved
    root2 = str(tmp_path / "tbl2")
    res2 = sn.snapshot_append_expect(
        spark, _docs(spark), root2, _RULES, on_violation="drop"
    )
    assert res2["admitted"] == 2 and res2["quarantine_version"] is None
    assert sn.read_snapshot(spark, root2).count() == 2


def test_expect_tag_idempotent_replay(spark, tmp_path):
    root = str(tmp_path / "tbl")
    qroot = str(tmp_path / "quar")
    for _ in range(2):  # replayed epoch: both appends dedupe on tags
        sn.snapshot_append_expect(
            spark, _docs(spark), root, _RULES,
            on_violation="quarantine", quarantine_root=qroot,
            tag="epoch-7",
        )
    assert sn.read_snapshot(spark, root).count() == 2
    assert sn.read_snapshot(spark, qroot).count() == 3


def test_expect_composes_with_table_checks(spark, tmp_path):
    """Expectations gate the batch; CHECK constraints are the table's
    last line of defense — a rule set weaker than the checks still
    cannot sneak a violating row through."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append_expect(
        spark, _docs(spark), root, _RULES, on_violation="drop"
    )
    sn.snapshot_set_check(spark, root, "has_text", "text IS NOT NULL")
    weak = [rule_between("n_chars", 0, 100000)]  # lets NULL text pass
    with pytest.raises(Exception, match="has_text"):
        sn.snapshot_append_expect(
            spark, _docs(spark), root, weak, on_violation="drop"
        )


# ------------------------------------------- review-finding regressions


def test_checks_survive_manifest_compaction(spark, tmp_path):
    """compact_manifests is a direct payload commit — it must carry the
    table's CHECK constraints like layout/fields, or the janitor would
    silently erase the contract."""
    root = _tbl(spark, tmp_path)
    sn.snapshot_set_check(spark, root, "v_positive", "v > 0")
    for i in range(3, 6):
        sn.snapshot_append(
            spark.createDataFrame([(i, i)], "k INT, v INT"), root
        )
    sn.compact_manifests(root, max_entries=1)
    assert sn._table_checks(root) == {"v_positive": "v > 0"}
    with pytest.raises(Exception, match="v_positive"):
        sn.snapshot_append(
            spark.createDataFrame([(9, -9)], "k INT, v INT"), root
        )


def test_concurrent_set_check_aborts_in_flight_write(
    spark, tmp_path, monkeypatch
):
    """A batch validated under the OLD constraint set must not commit
    under a NEW one: a set-check landing between the data write and the
    commit aborts the write (Delta's concurrent-metadata-change
    conflict), instead of rebasing unvalidated rows under the check."""
    root = _tbl(spark, tmp_path)
    orig = sn._write_files
    state = {"fired": False}

    def hooked(df, r, stats_cols=None, kind="data"):
        out = orig(df, r, stats_cols=stats_cols, kind=kind)
        if not state["fired"]:
            state["fired"] = True  # constraint lands AFTER the write
            sn.snapshot_set_check(spark, root, "v_positive", "v > 0")
        return out

    monkeypatch.setattr(sn, "_write_files", hooked)
    with pytest.raises(sn.SnapshotConflictError, match="CHECK constraints"):
        sn.snapshot_append(
            spark.createDataFrame([(3, -5)], "k INT, v INT"), root
        )
    # the table holds the contract and never saw the unvalidated row
    assert sn._table_checks(root) == {"v_positive": "v > 0"}
    got = {r.k: r.v for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got == {1: 10, 2: 20}


def test_set_check_refuses_silent_replace(spark, tmp_path):
    root = _tbl(spark, tmp_path)
    sn.snapshot_set_check(spark, root, "v_positive", "v > 0")
    with pytest.raises(ValueError, match="already exists"):
        sn.snapshot_set_check(spark, root, "v_positive", "v > -100")
    sn.snapshot_set_check(
        spark, root, "v_positive", "v > 5", replace=True
    )
    with pytest.raises(Exception, match="v_positive"):
        sn.snapshot_append(
            spark.createDataFrame([(3, 4)], "k INT, v INT"), root
        )
