"""General DML on snapshot tables: UPDATE…WHERE (O(matched) MoR
commits) and full MERGE INTO (ordered clause semantics, cardinality
check), plus the metadata-only read surfaces they feed
(`snapshot_stats_agg`, `snapshot_partitions`).

Reference parity: the reference mutates rows with SQL UPDATE/INSERT OR
REPLACE against SQLite (pipeline/db_operations.py); here every DML is a
new snapshot version — time-travelable, rollback-able, CDC-visible."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import snapshots as sn


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


# ---------------------------------------------------------------- UPDATE


def test_update_where_position_exact(spark, tmp_path):
    """Position-path UPDATE touches exactly the matched rows — on a
    table with DUPLICATE values, where an equality delete could not be
    exact."""
    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30), (3, 40)], "k INT, val INT"
    )
    sn.snapshot_overwrite(base.coalesce(1), root)
    v = sn.snapshot_update_where(
        spark, root, "val >= 20 AND val <= 30", {"val": "val + 1000"}
    )
    assert v == 1
    got = _rows(sn.read_snapshot_mor(spark, root), "k", "val")
    assert got == [(1, 10), (1, 1020), (2, 1030), (3, 40)]
    # pre-update version unchanged (time travel)
    assert _rows(sn.read_snapshot_mor(spark, root, 0), "k", "val") == [
        (1, 10),
        (1, 20),
        (2, 30),
        (3, 40),
    ]


def test_update_where_is_o_matched_not_o_table(spark, tmp_path):
    """The UPDATE commit must not rewrite existing data files: every
    base file survives byte-identical (mtime + size), and the commit
    adds only the post-image group + one delete list."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 1000).repartition(4), root)
    m0 = sn._read_manifest(root, 0)
    before = {
        f: os.stat(os.path.join(root, f)).st_mtime_ns
        for f in m0["files"]
    }
    sn.snapshot_update_where(spark, root, "id < 10", {"v": "v + 1"})
    m1 = sn._read_manifest(root, 1)
    for f, mt in before.items():
        assert f in m1["files"]
        assert os.stat(os.path.join(root, f)).st_mtime_ns == mt
    assert len(set(m1["files"]) - set(m0["files"])) >= 1
    assert all(d["kind"] == "position" for d in m1["delete_files"])


def test_update_where_equality_path(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 20), root)
    sn.snapshot_update_where(
        spark, root, "id % 5 = 0", {"v": "v * 10"}, keys=["id"]
    )
    got = dict(_rows(sn.read_snapshot_mor(spark, root), "id"))
    assert got[0] == 0 and got[5] == 100 and got[10] == 200
    assert got[1] == 2  # untouched
    assert len(got) == 20


def test_update_where_zero_match_no_commit(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 5), root)
    v = sn.snapshot_update_where(spark, root, "id > 99", {"v": "0"})
    assert v == 0
    assert sn.snapshot_versions(root) == [0]
    # no orphaned delete list flipped the table into MoR mode
    assert sn._read_manifest(root, 0).get("delete_files") in ([], None)


def test_update_where_type_preserved(spark, tmp_path):
    """An INT-typed SQL literal on a BIGINT column must not split the
    parquet schema (the F.lit(7) gotcha): post-image files carry the
    table's types."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 10), root)  # id/v are BIGINT
    sn.snapshot_update_where(spark, root, "id = 3", {"v": "7"})
    out = sn.read_snapshot_mor(spark, root)
    assert dict(out.dtypes)["v"] == "bigint"
    assert dict(_rows(out, "id"))[3] == 7


def test_update_where_unknown_column_refused(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 5), root)
    with pytest.raises(ValueError, match="not in the table"):
        sn.snapshot_update_where(spark, root, "id = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="keys not in the table"):
        sn.snapshot_update_where(
            spark, root, "id = 1", {"v": "1"}, keys=["nope"]
        )
    with pytest.raises(ValueError, match="empty set_exprs"):
        sn.snapshot_update_where(spark, root, "id = 1", {})


def test_update_where_flows_through_cdf(spark, tmp_path):
    """An update commit is CDC-visible as delete(pre) + insert(post)."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 6).coalesce(1), root)
    v = sn.snapshot_update_where(spark, root, "id = 2", {"v": "99"})
    ev = sn.read_snapshot_cdf(spark, root, from_version=0, to_version=v)
    got = sorted(
        (r["_change_type"], r["id"], r["v"]) for r in ev.collect()
    )
    assert got == [("delete", 2, 4), ("insert", 2, 99)]


def test_update_where_tag_idempotent(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 10), root)
    v1 = sn.snapshot_update_where(
        spark, root, "id = 1", {"v": "v + 1"}, tag="epoch-1"
    )
    v2 = sn.snapshot_update_where(
        spark, root, "id = 1", {"v": "v + 1"}, tag="epoch-1"
    )
    assert v1 == v2  # replay no-ops, no double increment
    assert dict(_rows(sn.read_snapshot_mor(spark, root), "id"))[1] == 3


def test_update_where_stats_keep_pruning(spark, tmp_path):
    """stats_cols on the update keeps the post-image group prunable."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append_clustered(
        _df(spark, 0, 1000), root, ["id"], n_files=4
    )
    sn.snapshot_update_where(
        spark,
        root,
        "id BETWEEN 10 AND 19",
        {"v": "v + 1"},
        stats_cols=["id"],
    )
    m = sn._read_manifest(root, 1)
    new = sorted(set(m["files"]) - set(sn._read_manifest(root, 0)["files"]))
    # empty part-files claim nothing (the multi-partition-write shape);
    # every post-image file that HOLDS rows must carry fresh id stats
    nonempty = [f for f in new if m["rows"][f] > 0]
    assert nonempty
    assert all(m["stats"].get(f, {}).get("id") for f in nonempty)


# ------------------------------------------------------------ MERGE INTO


def _target(spark, tmp_path, name="tbl"):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(1, 100, "A"), (2, 200, "A"), (3, 300, "B"), (4, 400, "B")],
        "k INT, amt INT, seg STRING",
    )
    sn.snapshot_overwrite(df.coalesce(1), root)
    return root


def test_merge_into_full_clause_matrix(spark, tmp_path):
    root = _target(spark, tmp_path)
    src = spark.createDataFrame(
        [
            (2, 250, "upd"),   # matched -> update
            (3, 0, "del"),     # matched -> delete
            (9, 900, "new"),   # not matched -> insert
        ],
        "k INT, amt INT, op STRING",
    )
    sn.snapshot_merge_into(
        spark,
        root,
        src,
        on=["k"],
        when_matched=[
            ("delete", "s.op = 'del'", None),
            ("update", None, {"amt": "s.amt"}),
        ],
        when_not_matched=("insert", None, {"k": "s.k", "amt": "s.amt",
                                           "seg": "'C'"}),
        when_not_matched_by_source=[("delete", "t.k = 4", None)],
    )
    got = _rows(sn.read_snapshot_mor(spark, root), "k")
    assert got == [(1, 100, "A"), (2, 250, "A"), (9, 900, "C")]


def test_merge_into_clause_order_matters(spark, tmp_path):
    """First matching clause wins — update-before-delete keeps the row
    the delete-first variant kills."""
    root = _target(spark, tmp_path)
    src = spark.createDataFrame([(2, 999, "del")], "k INT, amt INT, op STRING")
    sn.snapshot_merge_into(
        spark,
        root,
        src,
        on=["k"],
        when_matched=[
            ("update", None, {"amt": "s.amt"}),
            ("delete", "s.op = 'del'", None),
        ],
    )
    assert dict(
        (r[0], r[1]) for r in _rows(sn.read_snapshot_mor(spark, root), "k")
    )[2] == 999


def test_merge_into_insert_all_and_source_only_cond(spark, tmp_path):
    root = _target(spark, tmp_path)
    src = spark.createDataFrame(
        [(8, 800, "X"), (9, 900, "Y")], "k INT, amt INT, seg STRING"
    )
    sn.snapshot_merge_into(
        spark, root, src, on=["k"],
        when_not_matched=("insert", "s.amt > 850", "all"),
    )
    got = _rows(sn.read_snapshot_mor(spark, root), "k")
    assert (9, 900, "Y") in got and all(r[0] != 8 for r in got)
    assert len(got) == 5


def test_merge_into_cardinality_violation_raises(spark, tmp_path):
    root = _target(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, 1, "a"), (2, 2, "b")], "k INT, amt INT, op STRING"
    )
    with pytest.raises(ValueError, match="multiple source rows"):
        sn.snapshot_merge_into(
            spark, root, src, on=["k"],
            when_matched=[("update", None, {"amt": "s.amt"})],
        )
    # duplicates that DON'T match any target row + insert-only merge:
    # both rows insert (standard SQL), no error
    src2 = spark.createDataFrame(
        [(7, 1, "a"), (7, 2, "b")], "k INT, amt INT, op STRING"
    )
    sn.snapshot_merge_into(
        spark, root, src2, on=["k"],
        when_not_matched=("insert", None, {"k": "s.k", "amt": "s.amt",
                                           "seg": "'Z'"}),
    )
    assert sn.read_snapshot_mor(spark, root).filter("k = 7").count() == 2


def test_merge_into_null_keys_never_match(spark, tmp_path):
    """SQL MERGE ON uses plain equality: NULL keys on either side fall
    into the not-matched branches, never match each other."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(
        spark.createDataFrame(
            [(None, 1), (5, 2)], "k INT, val INT"
        ).coalesce(1),
        root,
    )
    src = spark.createDataFrame([(None, 99)], "k INT, val INT")
    sn.snapshot_merge_into(
        spark, root, src, on=["k"],
        when_matched=[("update", None, {"val": "s.val"})],
        when_not_matched=("insert", None, "all"),
        when_not_matched_by_source=[("update", "t.k IS NULL",
                                     {"val": "t.val + 10"})],
    )
    got = sorted(
        ((r[0], r[1]) for r in sn.read_snapshot_mor(spark, root).collect()),
        key=lambda x: (x[0] is None, x[0] or 0, x[1]),
    )
    # target NULL row updated via BY SOURCE clause (11); source NULL row
    # inserted (99); key 5 untouched
    assert got == [(5, 2), (None, 11), (None, 99)]


def test_merge_into_insert_all_missing_column_refused(spark, tmp_path):
    root = _target(spark, tmp_path)
    src = spark.createDataFrame([(9, 1)], "k INT, amt INT")  # no seg
    with pytest.raises(ValueError, match="missing target column"):
        sn.snapshot_merge_into(
            spark, root, src, on=["k"],
            when_not_matched=("insert", None, "all"),
        )


def test_merge_into_requires_committed_table_and_clauses(spark, tmp_path):
    root = str(tmp_path / "none")
    src = spark.createDataFrame([(1, 2)], "k INT, amt INT")
    with pytest.raises(FileNotFoundError):
        sn.snapshot_merge_into(
            spark, root, src, on=["k"],
            when_not_matched=("insert", None, "all"),
        )
    root2 = _target(spark, tmp_path, "t2")
    with pytest.raises(ValueError, match="at least one clause"):
        sn.snapshot_merge_into(spark, root2, src, on=["k"])


def test_merge_into_history_and_cdf_visible(spark, tmp_path):
    """The merge is one overwrite version: parents stay readable and
    the table's CoW history remains time-travelable."""
    root = _target(spark, tmp_path)
    src = spark.createDataFrame([(1, 111, "x")], "k INT, amt INT, op STRING")
    v = sn.snapshot_merge_into(
        spark, root, src, on=["k"],
        when_matched=[("update", None, {"amt": "s.amt"})],
    )
    assert v == 1
    assert _rows(sn.read_snapshot_mor(spark, root, 0), "k")[0] == (
        1, 100, "A",
    )
    assert _rows(sn.read_snapshot_mor(spark, root), "k")[0] == (1, 111, "A")


# ------------------------------------------------- metadata-only reads


def test_stats_agg_metadata_only(spark, tmp_path):
    """count/min/max answered from the manifest with ZERO data-file
    reads — pinned by chmod-ing the data files unreadable."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append_clustered(
        _df(spark, 0, 500), root, ["id"], n_files=4, stats_cols=["id", "v"]
    )
    sn.snapshot_append_clustered(
        _df(spark, 500, 900), root, ["id"], n_files=2, stats_cols=["id", "v"]
    )
    m = sn._read_manifest(root, 1)
    modes = {}
    for f in m["files"]:
        p = os.path.join(root, f)
        modes[p] = os.stat(p).st_mode
        os.chmod(p, 0)
    try:
        out = sn.snapshot_stats_agg(spark, root, ["id", "v"])
        row = out.collect()[0].asDict()
    finally:
        for p, mode in modes.items():
            os.chmod(p, mode)
    assert row == {
        "n_rows": 900,
        "min_id": 0,
        "max_id": 899,
        "min_v": 0,
        "max_v": 1798,
    }


def test_stats_agg_refuses_dirty_or_statless(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_append_clustered(
        _df(spark, 0, 100), root, ["id"], n_files=2, stats_cols=["id"]
    )
    with pytest.raises(ValueError, match="no recorded stats"):
        sn.snapshot_stats_agg(spark, root, ["v"])  # v never recorded
    sn.snapshot_delete_where(spark, root, "id = 5", keys=["id"])
    with pytest.raises(ValueError, match="delete files"):
        sn.snapshot_stats_agg(spark, root, ["id"])


def test_stats_agg_count_only_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 50), root)
    sn.snapshot_append(_df(spark, 50, 80), root)
    assert sn.snapshot_stats_agg(spark, root, []).collect()[0][0] == 80
    assert (
        sn.snapshot_stats_agg(spark, root, [], version=0).collect()[0][0]
        == 50
    )


def test_stats_agg_survives_compaction(spark, tmp_path):
    """Post-compaction files carry fresh stats + rows — the metadata
    answer is unchanged."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append_clustered(
        _df(spark, 0, 300), root, ["id"], n_files=6, stats_cols=["id"]
    )
    sn.snapshot_delete_where(spark, root, "id < 10", keys=["id"])
    sn.snapshot_compact(spark, root)
    out = sn.snapshot_stats_agg(spark, root, ["id"]).collect()[0]
    assert tuple(out) == (290, 10, 299)


def test_partitions_metadata_table(spark, tmp_path):
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 3) + 1:02d}") for i in range(90)],
        "id INT, d STRING",
    ).select("id", F.col("d").cast("date").alias("d"))
    sn.snapshot_append_partitioned(df, root, {"day": "d"})
    out = sn.snapshot_partitions(spark, root)
    rows = {
        r["partition"]["day"]: (r["file_count"], r["row_count"])
        for r in out.collect()
    }
    assert set(rows) == {"2024-01-01", "2024-01-02", "2024-01-03"}
    assert all(v[1] == 30 for v in rows.values())
    total_bytes = sum(r["total_bytes"] for r in out.collect())
    m = sn._read_manifest(root, 0)
    assert total_bytes == sum(m["sizes"].values())


def test_partitions_mixed_and_refusals(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 10).coalesce(1), root)  # no spec
    out = sn.snapshot_partitions(spark, root)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["partition"] == {}
    assert rows[0]["row_count"] == 10
    sn.snapshot_delete_where(spark, root, "id = 1", keys=["id"])
    with pytest.raises(ValueError, match="delete files"):
        sn.snapshot_partitions(spark, root)


# ------------------------------------------- review-finding regressions


def test_merge_into_insert_only_dup_keys_keep_target_once(spark, tmp_path):
    """With NO when_matched clause the cardinality check doesn't run —
    duplicate source keys that match a target row must still keep the
    unchanged target row exactly ONCE (the full-outer join fans it out;
    one copy survives), while duplicate UNMATCHED keys all insert."""
    root = _target(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, 5, "x"), (1, 6, "x"), (9, 900, "x"), (9, 901, "x")],
        "k INT, amt INT, op STRING",
    )
    sn.snapshot_merge_into(
        spark, root, src, on=["k"],
        when_not_matched=("insert", None,
                          {"k": "s.k", "amt": "s.amt", "seg": "'N'"}),
    )
    got = _rows(sn.read_snapshot_mor(spark, root), "k", "amt")
    assert got == [
        (1, 100, "A"),            # matched: kept once, unchanged
        (2, 200, "A"), (3, 300, "B"), (4, 400, "B"),
        (9, 900, "N"), (9, 901, "N"),  # unmatched dups BOTH insert
    ]


def test_merge_into_by_source_only_dup_keys_no_fanout(spark, tmp_path):
    """Same fan-out hazard for a when_not_matched_by_source-only merge:
    matched rows (untouched by every clause family) stay single."""
    root = _target(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, 5, "x"), (1, 6, "x")], "k INT, amt INT, op STRING"
    )
    sn.snapshot_merge_into(
        spark, root, src, on=["k"],
        when_not_matched_by_source=[("delete", "t.k = 4", None)],
    )
    got = _rows(sn.read_snapshot_mor(spark, root), "k")
    assert got == [(1, 100, "A"), (2, 200, "A"), (3, 300, "B")]


def test_merge_into_conflict_retries_against_new_head(
    spark, tmp_path, monkeypatch
):
    """SERIALIZABLE merge: a concurrent append landing between the
    target read and the commit must trigger a re-evaluating retry — the
    stale CoW file list would silently erase the sibling's rows."""
    root = _target(spark, tmp_path)
    orig = sn._write_files
    state = {"fired": False}

    def hooked(df, r, stats_cols=None, kind="data"):
        if not state["fired"]:
            state["fired"] = True  # set BEFORE the nested append recurses
            sn.snapshot_append(
                spark.createDataFrame([(50, 500, "C")],
                                      "k INT, amt INT, seg STRING"),
                root,
            )
        return orig(df, r, stats_cols=stats_cols, kind=kind)

    monkeypatch.setattr(sn, "_write_files", hooked)
    src = spark.createDataFrame([(1, 111, "x")], "k INT, amt INT, op STRING")
    sn.snapshot_merge_into(
        spark, root, src, on=["k"],
        when_matched=[("update", None, {"amt": "s.amt"})],
    )
    got = _rows(sn.read_snapshot_mor(spark, root), "k")
    # the update applied AND the concurrently appended row survived
    assert got == [
        (1, 111, "A"), (2, 200, "A"), (3, 300, "B"), (4, 400, "B"),
        (50, 500, "C"),
    ]


def test_partitions_null_partition_values(spark, tmp_path):
    """NULL partition values (__HIVE_DEFAULT_PARTITION__) must group and
    sort cleanly instead of TypeError-ing the metadata table."""
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, None), (3, "2024-01-02"), (4, None)],
        "id INT, d STRING",
    ).select("id", F.col("d").cast("date").alias("d"))
    sn.snapshot_append_partitioned(df, root, {"day": "d"})
    rows = {
        r["partition"]["day"]: r["row_count"]
        for r in sn.snapshot_partitions(spark, root).collect()
    }
    assert rows == {"2024-01-01": 1, "2024-01-02": 1, None: 2}


def test_merge_keys_conflict_retries_against_new_head(
    spark, tmp_path, monkeypatch
):
    """The CoW CDC merge gets the same serialize guarantee: a sibling
    append landing mid-merge survives into the merged version."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    sn.snapshot_append(
        spark.createDataFrame([Row(id=1, v=10), Row(id=2, v=20)]), root
    )
    orig = sn._write_files
    state = {"fired": False}

    def hooked(df, r, stats_cols=None, kind="data"):
        if not state["fired"]:
            state["fired"] = True
            sn.snapshot_append(
                spark.createDataFrame([Row(id=9, v=90)]), root
            )
        return orig(df, r, stats_cols=stats_cols, kind=kind)

    monkeypatch.setattr(sn, "_write_files", hooked)
    sn.snapshot_merge_keys(
        spark, root,
        spark.createDataFrame([Row(id=1, v=11, _op="U")]), ["id"],
    )
    got = {r.id: r.v for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got == {1: 11, 2: 20, 9: 90}


def test_partitions_approximate_on_mor(spark, tmp_path):
    """`approximate=True` serves the PARTITIONS table on a MoR-dirty
    table: counts come from recorded per-file rows, so deleted-but-
    uncompacted rows still count (the documented Iceberg caveat) —
    compaction brings the numbers back exact."""
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"g{i % 2}") for i in range(10)], "id INT, g STRING"
    )
    sn.snapshot_append_partitioned(df, root, {"grp": "g"})
    sn.snapshot_delete_where(spark, root, "id < 4", keys=["id"])
    rows = {
        r["partition"]["grp"]: r["row_count"]
        for r in sn.snapshot_partitions(spark, root, approximate=True)
        .collect()
    }
    assert rows == {"g0": 5, "g1": 5}  # overcounts: deletes not folded
    sn.snapshot_compact(spark, root)
    rows2 = {
        r["partition"]["grp"]: r["row_count"]
        for r in sn.snapshot_partitions(spark, root).collect()
    }
    assert rows2 == {"g0": 3, "g1": 3}


def test_concurrent_dml_serialize_loses_nothing(spark, tmp_path):
    """STRESS pin for the serializable DML family: threads running
    UPDATE…WHERE over DISJOINT key ranges race each other and an
    appender; since updates commute across disjoint ranges, the final
    state is deterministic — every update applied exactly once, every
    appended row present, no lost writes under contention."""
    from concurrent.futures import ThreadPoolExecutor

    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, 0) for i in range(30)], "k INT, v INT"
    )
    sn.snapshot_overwrite(base.coalesce(2), root)
    N = 3  # writers, each owning keys [w*10, w*10+10)

    def updater(w: int) -> None:
        for _ in range(2):  # two +100 updates on its own range
            for attempt in range(6):
                try:
                    sn.snapshot_update_where(
                        spark,
                        root,
                        f"k >= {w * 10} AND k < {w * 10 + 10}",
                        {"v": "v + 100"},
                        keys=["k"],
                    )
                    break
                except sn.SnapshotConflictError:
                    continue  # heavy contention — re-evaluate
            else:
                raise AssertionError("update never landed")

    def appender() -> None:
        for b in range(3):
            sn.snapshot_append(
                spark.createDataFrame(
                    [(1000 + b, -1)], "k INT, v INT"
                ),
                root,
            )

    with ThreadPoolExecutor(max_workers=N + 1) as ex:
        afut = ex.submit(appender)
        futs = [ex.submit(updater, w) for w in range(N)]
        for f in futs:
            f.result()
        afut.result()
    got = {r.k: r.v for r in sn.read_snapshot_mor(spark, root).collect()}
    want = {i: 200 for i in range(30)}
    want.update({1000 + b: -1 for b in range(3)})
    assert got == want, "disjoint updates must all land exactly once"


def test_snapshot_detail_summary(spark, tmp_path):
    """DESCRIBE DETAIL analog: counts/bytes/rows from manifests only,
    layout + checks + refs surfaced in one row."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append_clustered(
        _df(spark, 0, 100), root, ["id"], n_files=4
    )
    sn.snapshot_set_check(spark, root, "v_ok", "v >= 0")
    sn.snapshot_delete_where(spark, root, "id < 5", keys=["id"])
    sn.snapshot_create_tag(root, "audit", sn.current_version(root))
    d = sn.snapshot_detail(spark, root).collect()[0]
    assert d.num_files == 4 and d.num_delete_files == 1
    assert d.num_rows == 100  # recorded rows, deletes not folded
    assert d.sort_cols == ["id"] and d.zorder_cols is None
    assert d.checks == {"v_ok": "v >= 0"}
    assert d.num_tags == 1 and d.num_branches == 0
    assert d.version == sn.current_version(root)
    m = sn._read_manifest(root, d.version)
    assert d.total_bytes == sum(m["sizes"][f] for f in m["files"])


def test_merge_into_rewrites_only_touched_files(spark, tmp_path):
    """Delta's findTouchedFiles shape: a small merge into a multi-file
    table rewrites ONLY the files holding matching keys — every other
    file rides by reference, byte-identical; an insert-only merge keeps
    ALL base files; a provably no-change merge commits nothing."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append_clustered(
        spark.createDataFrame(
            [(i, i * 10, "A") for i in range(80)], "k INT, amt INT, seg STRING"
        ),
        root, ["k"], n_files=8,
    )
    m0 = sn._read_manifest(root, 0)
    assert len(m0["files"]) == 8
    src = spark.createDataFrame([(3, 999, "x")], "k INT, amt INT, op STRING")
    # small_target_rows=0: this test pins the touched-files MACHINERY,
    # which the stats-driven small-target fast path would bypass here
    sn.snapshot_merge_into(
        spark, root, src, on=["k"],
        when_matched=[("update", None, {"amt": "s.amt"})],
        small_target_rows=0,
    )
    m1 = sn._read_manifest(root, 1)
    kept = set(m0["files"]) & set(m1["files"])
    assert len(kept) == 7, "one touched file rewritten, seven kept"
    for f in kept:  # by-reference means the same bytes, not a copy
        assert os.path.getsize(os.path.join(root, f)) == m0["sizes"][f]
    got = {r.k: r.amt for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got[3] == 999 and got[4] == 40 and len(got) == 80

    # insert-only merge: zero files rewritten, one group added
    sn.snapshot_merge_into(
        spark, root, spark.createDataFrame(
            [(1000, 1, "x")], "k INT, amt INT, op STRING"
        ),
        on=["k"], when_not_matched=("insert", None,
                                    {"k": "s.k", "amt": "s.amt",
                                     "seg": "'N'"}),
        small_target_rows=0,
    )
    m2 = sn._read_manifest(root, 2)
    assert set(m1["files"]) <= set(m2["files"])
    assert sn.read_snapshot_mor(spark, root).count() == 81

    # a merge that provably changes nothing commits nothing
    v = sn.snapshot_merge_into(
        spark, root, spark.createDataFrame(
            [(99999, 1, "x")], "k INT, amt INT, op STRING"
        ),
        on=["k"],
        when_matched=[("update", None, {"amt": "s.amt"})],
        small_target_rows=0,
    )
    assert v == 2 and sn.current_version(root) == 2


def test_merge_into_touched_files_on_mor_table(spark, tmp_path):
    """Touched-file merges CARRY MoR delete files: kept files keep
    their sequences (deletes still apply), the rewrite's new files
    outnumber every delete sequence (nothing double-deleted), and a
    pre-merge deleted key stays dead."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    sn.snapshot_append_clustered(
        spark.createDataFrame([(i, i * 10) for i in range(40)],
                              "k INT, v INT"),
        root, ["k"], n_files=4,
    )
    sn.snapshot_delete_where(spark, root, "k = 7", keys=["k"])
    sn.snapshot_merge_into(
        spark, root,
        spark.createDataFrame([Row(k=20, v=2000)]), on=["k"],
        when_matched=[("update", None, {"v": "s.v"})],
        small_target_rows=0,
    )
    got = {r.k: r.v for r in sn.read_snapshot_mor(spark, root).collect()}
    assert 7 not in got and got[20] == 2000 and len(got) == 39
    # delete files survived the merge commit (carried, not folded)
    m = sn._read_manifest(root, sn.current_version(root))
    assert m["delete_files"], "MoR deletes must ride through the merge"


def test_merge_insert_t_refs_resolve_on_every_path(spark, tmp_path):
    """Insert expressions may reference t.<col> (NULL for inserts): the
    no-file-touched path must resolve them exactly like the touched
    path, not crash data-dependently."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(
        spark.createDataFrame([(1, 100)], "k INT, v INT").coalesce(1), root
    )
    ins = (
        "insert", None, {"k": "s.k", "v": "coalesce(t.v, s.v + 1)"}
    )
    # touched path: source matches a row AND inserts a new key
    sn.snapshot_merge_into(
        spark, root,
        spark.createDataFrame([Row(k=1, v=5), Row(k=2, v=6)]), on=["k"],
        when_matched=[("update", None, {"v": "s.v"})],
        when_not_matched=ins,
    )
    # UNtouched path: nothing matches — t refs must still resolve
    sn.snapshot_merge_into(
        spark, root,
        spark.createDataFrame([Row(k=9, v=90)]), on=["k"],
        when_matched=[("update", None, {"v": "s.v"})],
        when_not_matched=ins,
    )
    got = {r.k: r.v for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got == {1: 5, 2: 7, 9: 91}


def test_merge_into_user_file_pos_columns_fall_back_to_cow(spark, tmp_path):
    """A table whose user columns collide with the touched-scan's
    internal _file/_pos names must still merge (full-CoW fallback),
    matching the pre-optimization behavior."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(
        spark.createDataFrame(
            [(1, "a.parquet"), (2, "b.parquet")], "k INT, _file STRING"
        ).coalesce(1),
        root,
    )
    sn.snapshot_merge_into(
        spark, root,
        spark.createDataFrame([(1, "c.parquet")], "k INT, _file STRING"),
        on=["k"],
        when_matched=[("update", None, {"_file": "s._file"})],
    )
    got = {r.k: r._file for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got == {1: "c.parquet", 2: "b.parquet"}


def test_attach_snapshot_meta_views(spark, tmp_path):
    """Metadata tables by NAME in plain SQL: files/partitions/history/
    detail views over one consistent manifest snapshot."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append_partitioned(
        spark.createDataFrame(
            [(i, f"g{i % 2}") for i in range(20)], "id INT, g STRING"
        ),
        root, {"grp": "g"},
    )
    sn.snapshot_delete_where(spark, root, "id = 3", keys=["id"])
    v = sn.attach_snapshot_meta_views(spark, "t", root)
    assert v == sn.current_version(root)
    files = spark.sql(
        "SELECT content, COUNT(*) AS n FROM t__files GROUP BY content"
    ).collect()
    got = {r.content: r.n for r in files}
    assert got["data"] == 2 and got["deletes"] == 1
    parts = spark.sql(
        "SELECT partition['grp'] AS g, row_count FROM t__partitions "
        "ORDER BY g"
    ).collect()
    # approximate view on a MoR table: recorded counts, delete not folded
    assert [(r.g, r.row_count) for r in parts] == [("g0", 10), ("g1", 10)]
    assert spark.sql("SELECT COUNT(*) FROM t__history").collect()[0][0] == 2
    d = spark.sql(
        "SELECT num_files, num_delete_files, num_versions_retained "
        "FROM t__detail"
    ).collect()[0]
    assert tuple(d) == (2, 1, 2)
    # __stats is EMPTY until the first ANALYZE, then one row per column
    assert spark.sql("SELECT COUNT(*) FROM t__stats").collect()[0][0] == 0
    sn.snapshot_compact(spark, root)  # fold deletes for the MoR read
    sn.snapshot_analyze(spark, root, approx=False)
    sn.attach_snapshot_meta_views(spark, "t", root)
    st = spark.sql(
        "SELECT column, ndv, nulls, table_rows FROM t__stats "
        "ORDER BY column"
    ).collect()
    assert [(r.column, r.ndv, r.nulls, r.table_rows) for r in st] == [
        ("g", 2, 0, 19), ("id", 19, 0, 19),
    ]


def test_analyze_table_stats(spark, tmp_path):
    """ANALYZE records table/column statistics as inherited metadata:
    exact NDV/nulls/min/max match the data, stats ride subsequent
    commits (stale-but-present, like Delta), a column subset merges,
    and the analyze hop is transparent to lineage walks."""
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.sources import snapshots as sn

    root = str(tmp_path / "t")
    df = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("v"),
        (F.col("id") % 3).cast("string").alias("s"),
    )
    sn.snapshot_append(df, root)
    assert sn.snapshot_table_stats(root) is None
    v = sn.snapshot_analyze(spark, root, approx=False)
    st = sn.snapshot_table_stats(root)
    assert st["rows"] == 100
    assert st["version"] == v - 1  # the content the scan described
    assert st["cols"]["k"] == {
        "ndv": 10, "nulls": 0, "approx": False, "min": 0, "max": 9,
        "v": v - 1,
    }
    assert st["cols"]["v"]["nulls"] == 20
    assert st["cols"]["v"]["ndv"] == 80
    assert st["cols"]["s"]["min"] == "0" and st["cols"]["s"]["max"] == "2"
    # stats INHERIT (stale) across a later append; time travel sees them
    sn.snapshot_append(df.limit(5), root)
    assert sn.snapshot_table_stats(root)["rows"] == 100  # stale by design
    assert sn.snapshot_table_stats(root, version=v)["rows"] == 100
    # a column-subset re-analyze merges per column, stamping PROVENANCE
    sn.snapshot_analyze(spark, root, columns=["k"], approx=False)
    st = sn.snapshot_table_stats(root)
    assert st["rows"] == 105 and st["cols"]["k"]["ndv"] == 10
    assert st["cols"]["v"]["ndv"] == 80  # untouched column kept...
    assert st["cols"]["v"]["v"] == v - 1  # ...with its old provenance
    assert st["cols"]["k"]["v"] == st["version"] > v - 1
    # the returned dict is a DEEP copy — mutating it never corrupts
    # the shared manifest cache or later commits
    st["cols"]["k"]["ndv"] = -1
    assert sn.snapshot_table_stats(root)["cols"]["k"]["ndv"] == 10
    # approx path records the flag and lands in the right ballpark
    sn.snapshot_analyze(spark, root, columns=["v"])
    st = sn.snapshot_table_stats(root)
    assert st["cols"]["v"]["approx"] is True
    assert 60 <= st["cols"]["v"]["ndv"] <= 100
    # unknown column refuses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in the table"):
        sn.snapshot_analyze(spark, root, columns=["nope"])
    # the analyze hops are transparent to the delta walk
    assert (
        sn.read_snapshot_changes(spark, root, 0, sn.current_version(root))
        .count() == 5
    )


def test_optimize_zorder_rewrite(spark, tmp_path):
    """OPTIMIZE ZORDER converts a plain (or 1-D-sorted) table to
    multi-dimensional clustering: content identical, deletes folded,
    the declared policy makes BOTH dimensions prunable, maintenance
    keeps it, and a live stream checkpoint CROSSES the rewrite hop
    (row-content-preserving, operation='compact')."""
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.sources import snapshots as sn
    from data_engineering_challenge_spark.sources.snapshot_source import (
        register_snapshot_source,
    )
    from data_engineering_challenge_spark.streaming import incremental as st

    root = str(tmp_path / "t")
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("bigint").alias("y"),
        F.col("id").alias("payload"),
    )
    # a 1-D-sorted table (the policy the zorder APPEND writer refuses)
    sn.snapshot_append_clustered(df, root, ["x"], n_files=4)
    sn.snapshot_delete_where(spark, root, "payload = 7")
    before = sorted(
        tuple(r) for r in sn.read_snapshot_mor(spark, root).collect()
    )
    # drain a stream BEFORE the rewrite (initial snapshot refuses MoR —
    # compact first, like any delete-carrying table)
    sn.snapshot_compact(spark, root)
    register_snapshot_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("snapshot_table").option("root", root).load()
    )
    st.run_available_now(stream, out, ckpt)
    n0 = spark.read.parquet(out).count()
    v = sn.snapshot_rewrite_zordered(
        spark, root, ["x", "y"], n_files=16, bits=6
    )
    after = sorted(
        tuple(r) for r in sn.read_snapshot(spark, root).collect()
    )
    assert after == before, "rewrite preserves row content exactly"
    lay = sn._read_manifest_meta(root, v)["layout"]
    assert lay["zorder_cols"] == ["x", "y"] and not lay.get("sort_cols")
    # both dimensions prune now
    nx = len(sn.read_snapshot_pruned(spark, root, "x", 3, 3).inputFiles())
    ny = len(sn.read_snapshot_pruned(spark, root, "y", 3, 3).inputFiles())
    assert nx < 16 and ny < 16, (nx, ny)
    # the checkpointed stream crosses the rewrite hop, replaying nothing
    sn.snapshot_append(
        spark.range(5000, 5010).select(
            (F.col("id") % 64).alias("x"),
            F.lit(99).cast("bigint").alias("y"),
            F.col("id").alias("payload"),
        ),
        root,
    )
    st.run_available_now(stream, out, ckpt)
    assert spark.read.parquet(out).count() == n0 + 10
    # compaction RE-zorders under the declared policy
    sn.snapshot_compact(spark, root, target_files=8)
    assert sorted(
        tuple(r) for r in sn.read_snapshot(spark, root).collect()
    ) == sorted(after + [
        (k % 64, 99, k) for k in range(5000, 5010)
    ])
    # partitioned tables COMPOSE since round 10: the rewrite
    # re-clusters within each partition, values preserved
    p = str(tmp_path / "p")
    sn.snapshot_append_partitioned(
        spark.range(10).select(F.col("id").alias("k")), p,
        {"b": "k % 2"},
    )
    vz = sn.snapshot_rewrite_zordered(spark, p, ["k"])
    assert sn._read_manifest(p, vz)["partition_values"]
    assert sn._read_manifest_meta(p, vz)["layout"]["zorder_cols"] == ["k"]
    assert sn.read_snapshot_mor(spark, p).count() == 10


def test_optimize_zorder_preserves_schema_stats_blooms(spark, tmp_path):
    """The rewrite is a compaction with a policy change: heterogeneous
    file groups keep every column (merge_schema), prior pruning
    evidence unions into the recorded stats, the declared bloom policy
    re-derives filters, and a cron re-run is a NO-OP fixed point."""
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.sources import snapshots as sn

    root = str(tmp_path / "t")
    sn.snapshot_append_clustered(
        spark.range(256).select(
            (F.col("id") % 16).alias("x"),
            (F.col("id") / 16).cast("bigint").alias("y"),
            F.col("id").alias("ts"),
        ),
        root,
        ["x"],
        n_files=2,
        stats_cols=["ts"],
    )
    # bloom policy + an ADDITIVE append introducing a new column
    sn.snapshot_append(
        spark.range(256, 260).select(
            (F.col("id") % 16).alias("x"),
            (F.col("id") / 16).cast("bigint").alias("y"),
            F.col("id").alias("ts"),
            F.lit("late").alias("extra"),
        ),
        root,
        bloom_cols=["ts"],
    )
    v = sn.snapshot_rewrite_zordered(spark, root, ["x", "y"], bits=6)
    df = sn.read_snapshot(spark, root)
    assert "extra" in df.columns, "additive column survives the rewrite"
    assert df.count() == 260
    assert df.filter(F.col("extra") == "late").count() == 4
    m = sn._read_manifest(root, v)
    lay = m["layout"]
    # prior stats evidence (ts) unions with the zorder cols
    assert set(lay["stats_cols"]) >= {"x", "y", "ts"}
    assert all("ts" in st for st in m["stats"].values())
    # the declared bloom policy re-derived filters for every new file
    assert lay["bloom_cols"] == ["ts"]
    assert set(m.get("blooms") or {}) == set(m["files"])
    # fixed point: the same OPTIMIZE again commits NOTHING
    assert sn.snapshot_rewrite_zordered(spark, root, ["x", "y"], bits=6) == v
    assert sn.current_version(root) == v
    # a different policy is a genuine rewrite again
    v2 = sn.snapshot_rewrite_zordered(spark, root, ["y", "x"], bits=6)
    assert v2 == v + 1
    # zero-row table: no crash, content stays empty (a 0-row part file
    # still counts as a file; a FILE-less manifest no-ops — guarded)
    e = str(tmp_path / "e")
    sn.snapshot_overwrite(
        spark.range(1).filter("id < 0").select(F.col("id").alias("k")), e
    )
    sn.snapshot_rewrite_zordered(spark, e, ["k"])
    assert sn.read_snapshot(spark, e).count() == 0


def test_cdf_tolerates_empty_position_delete_parts(spark, tmp_path):
    """A multi-partition DELETE whose hits live in one partition emits
    position-list part-files with ZERO rows (the num_rows==0 shape);
    the CDF pre-image path must skip them — a zero-path parquet scan
    crashed here before the fix."""
    root = str(tmp_path / "t")
    sn.snapshot_overwrite(_df(spark, 0, 1).coalesce(1), root)
    # the insert lands in its own file; the delete's hit frame spans
    # several shuffle partitions, most of them empty
    sn.snapshot_append(_df(spark, 1, 2).repartition(4), root)
    v = sn.snapshot_delete_where(spark, root, "id = 1")
    m = sn._read_manifest(root, v)
    import pyarrow.parquet as pq

    n_empty = sum(
        1
        for d in m["delete_files"]
        if pq.read_metadata(os.path.join(root, d["file"])).num_rows == 0
    )
    assert n_empty >= 1, "fixture must produce an empty list part-file"
    ev = sn.read_snapshot_cdf(spark, root, from_version=1, to_version=v)
    got = sorted((r["_change_type"], r["id"]) for r in ev.collect())
    assert got == [("delete", 1)]


def test_merge_auto_evolve_adds_insert_columns(spark, tmp_path):
    """MERGE WITH SCHEMA EVOLUTION (round 10 — Delta autoMerge): NOT
    MATCHED INSERT columns the target lacks evolve it (typed adds,
    NULL over pre-merge files); off by default the extra source
    columns are ignored (Delta's default)."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    sn.snapshot_append(
        spark.range(5).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
        root,
    )
    src = spark.createDataFrame(
        [(3, 333, "x"), (9, 900, "y")], "k long, v long, tag string"
    )
    clauses = dict(
        when_matched=[("update", None, {"v": "s.v"})],
        when_not_matched=("insert", None, "all"),
    )
    # default: extra source columns ignored, schema unchanged
    sn.snapshot_merge_into(spark, root, src, ["k"], **clauses)
    assert sn.read_snapshot_mor(spark, root).columns == ["k", "v"]
    # opt-in: the target evolves; pre-merge rows read NULL; composes
    # with a MoR delete-carrying target
    root2 = str(tmp_path / "t2")
    sn.snapshot_append(
        spark.range(5).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
        root2,
    )
    sn.snapshot_delete_where(spark, root2, "k = 0", keys=["k"])
    sn.snapshot_merge_into(
        spark, root2, src, ["k"], auto_evolve=True, **clauses
    )
    res = {
        r["k"]: (r["v"], r["tag"])
        for r in sn.read_snapshot_mor(spark, root2).collect()
    }
    assert res[9] == (900, "y") and res[3] == (333, None)
    assert res[1] == (10, None) and 0 not in res
    # idempotent: a second auto-evolve merge finds nothing missing
    sn.snapshot_merge_into(
        spark, root2, src, ["k"], auto_evolve=True, **clauses
    )
    assert len(sn.read_snapshot_mor(spark, root2).columns) == 3


def test_merge_auto_evolve_dict_insert_and_sql(spark, tmp_path):
    from data_engineering_challenge_spark.sources import catalog as cat
    from data_engineering_challenge_spark.sql_exec import execute_sql

    cdir = str(tmp_path / "cat")
    execute_sql(
        spark, "CREATE TABLE t AS SELECT id AS k, id * 10 AS v FROM RANGE(4)",
        cdir,
    )
    execute_sql(
        spark, "CREATE TABLE s AS SELECT 2 AS k, 222 AS v, 'zz' AS tag",
        cdir,
    )
    execute_sql(
        spark,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag "
        "WHEN NOT MATCHED THEN INSERT *",
        cdir,
    )
    rows = sorted(
        tuple(r)
        for r in execute_sql(spark, "SELECT k, v, tag FROM t", cdir).collect()
    )
    assert (2, 222, "zz") in rows and (1, 10, None) in rows
    # dict-mode: the new column types from its source-resolvable expr
    root = cat.catalog_entries(cdir)["t"]["root"]
    src = spark.createDataFrame([(77, 7.5)], "k long, score double")
    sn.snapshot_merge_into(
        spark, root, src, ["k"], auto_evolve=True,
        when_not_matched=(
            "insert", None,
            {"k": "s.k", "score2": "s.score * 2"},
        ),
    )
    got = {r["k"]: r["score2"] for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got[77] == 15.0 and got[1] is None
