"""Versioned-manifest snapshots: time travel, rollback, snapshot
isolation from immutability, orphan invisibility, O(delta) appends."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import snapshots as sn


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def test_snapshot_append_time_travel_rollback(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v0 = sn.snapshot_overwrite(_df(spark, 0, 10), root)
    v1 = sn.snapshot_append(_df(spark, 10, 15), root)
    v2 = sn.snapshot_overwrite(_df(spark, 100, 102), root)
    assert (v0, v1, v2) == (0, 1, 2)
    assert sn.snapshot_versions(root) == [0, 1, 2]

    assert sn.read_snapshot(spark, root, 0).count() == 10
    assert sn.read_snapshot(spark, root, 1).count() == 15
    assert sn.read_snapshot(spark, root, 2).count() == 2
    assert sn.read_snapshot(spark, root).count() == 2  # latest

    sn.rollback(root, 1)
    assert sn.read_snapshot(spark, root).count() == 15
    # newer version still time-travelable after rollback
    assert sn.read_snapshot(spark, root, 2).count() == 2
    # a commit after rollback branches from the rolled-back head but
    # takes a FRESH version number — the abandoned lineage's manifest
    # survives and stays readable
    v3 = sn.snapshot_append(_df(spark, 15, 16), root)
    assert v3 == 3
    assert sn._read_manifest(root, 3)["parent"] == 1
    assert sn.read_snapshot(spark, root).count() == 16
    assert sn.read_snapshot(spark, root, 2).count() == 2


def test_snapshot_append_references_not_rewrites(spark, tmp_path):
    """Append must not rewrite the parent's files: v0's physical files
    (paths + mtimes) are byte-identical members of v1."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 10), root)
    before = {
        f: os.path.getmtime(os.path.join(root, f))
        for f in sn._read_manifest(root, 0)["files"]
    }
    sn.snapshot_append(_df(spark, 10, 12), root)
    m1 = sn._read_manifest(root, 1)["files"]
    assert set(before) < set(m1), "v1 must reference v0's files"
    for f, mt in before.items():
        assert os.path.getmtime(os.path.join(root, f)) == mt


def test_snapshot_orphan_files_invisible(spark, tmp_path):
    """A crashed write (file group with no manifest) must be invisible
    to every reader."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 5), root)
    # simulate a crash: files written, commit never happened
    sn._write_files(_df(spark, 1000, 2000), root)
    assert sn.read_snapshot(spark, root).count() == 5


def test_snapshot_read_empty_table_raises(spark, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        sn.read_snapshot(spark, str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        sn.rollback(str(tmp_path / "nope"), 0)


def test_vacuum_removes_only_orphans(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 5), root)
    sn.snapshot_append(_df(spark, 5, 8), root)
    sn.rollback(root, 0)
    # crashed commit: data files, no manifest
    sn._write_files(_df(spark, 100, 200), root)
    removed = sn.vacuum_orphans(root, min_age_s=0.0)
    assert removed, "the orphaned group must be collected"
    # every committed version still fully readable (incl. rolled-back-from)
    assert sn.read_snapshot(spark, root, 0).count() == 5
    assert sn.read_snapshot(spark, root, 1).count() == 8
    assert sn.read_snapshot(spark, root).count() == 5
    # idempotent
    assert sn.vacuum_orphans(root, min_age_s=0.0) == []


def test_incremental_scan_reads_only_the_delta(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 10), root)   # v0
    sn.snapshot_append(_df(spark, 10, 15), root)     # v1
    sn.snapshot_append(_df(spark, 15, 17), root)     # v2
    delta = sn.read_snapshot_changes(spark, root, 0, 2)
    assert sorted(r.id for r in delta.collect()) == list(range(10, 17))
    # plan-level: the scan must reference ONLY the delta's files
    files = {
        r.f.rsplit("/data/", 1)[-1]
        for r in delta.selectExpr("input_file_name() AS f").distinct().collect()
    }
    v0_files = {f.rsplit("data/", 1)[-1] for f in sn._read_manifest(root, 0)["files"]}
    assert files.isdisjoint(v0_files)
    # empty delta
    assert sn.read_snapshot_changes(spark, root, 2, 2).count() == 0
    # an overwrite breaks append lineage -> loud failure
    sn.snapshot_overwrite(_df(spark, 0, 3), root)    # v3
    import pytest

    with pytest.raises(ValueError, match="not append-only|ancestor"):
        sn.read_snapshot_changes(spark, root, 0, 3)


def test_streaming_snapshot_sink_exactly_once(spark, tmp_path):
    """Two micro-batches commit two tagged appends; a REPLAYED epoch is
    a no-op (same version returned, no new rows); per-batch deltas are
    incrementally scannable."""
    root = str(tmp_path / "tbl")
    src = _df(spark, 0, 20)
    src.filter("id < 10").coalesce(1).write.parquet(str(tmp_path / "src" / "b0"))
    src.filter("id >= 10").coalesce(1).write.parquet(str(tmp_path / "src" / "b1"))
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "src" / "b*"))
    )
    sn.run_streaming_snapshot_sink(stream, root, str(tmp_path / "ckpt"))

    assert sn.read_snapshot(spark, root).count() == 20
    versions = sn.snapshot_versions(root)
    assert len(versions) == 2

    # replay of an already-committed epoch UNDER THE SAME STREAM
    # IDENTITY (tags are scoped by checkpoint path): no-op, no dupes
    app = sn._stream_app_id(str(tmp_path / "ckpt"))
    v = sn.snapshot_append(
        _df(spark, 0, 10), root, tag=f"append-{app}-epoch-0"
    )
    assert v in versions
    assert sn.snapshot_versions(root) == versions
    assert sn.read_snapshot(spark, root).count() == 20

    # a DIFFERENT stream identity starting at epoch 0 must NOT be
    # swallowed by this stream's tags (the txnAppId property)
    app2 = sn._stream_app_id(str(tmp_path / "ckpt2"))
    v2 = sn.snapshot_append(
        _df(spark, 100, 105), root, tag=f"append-{app2}-epoch-0"
    )
    assert v2 not in versions
    assert sn.read_snapshot(spark, root).count() == 25

    # each batch's delta is incrementally scannable
    delta = sn.read_snapshot_changes(spark, root, versions[0], versions[1])
    assert sorted(r.id for r in delta.collect()) == list(range(10, 20))


def test_snapshot_merge_keys_audit_trail(spark, tmp_path):
    """CoW CDC merge: upserts/deletes commit a new version while every
    prior version stays readable (the audit trail); rollback undoes a
    bad feed in O(1); tags make replays no-ops; malformed ops fail."""
    import pytest
    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 5), root)  # v0: ids 0..4, v=2*id

    feed = spark.createDataFrame(
        [(1, 999, "U"), (2, None, "D"), (9, 18, "I")],
        "id bigint, v bigint, _op string",
    )
    v1 = sn.snapshot_merge_keys(spark, root, feed, ["id"], tag="b1")
    got = {r.id: r.v for r in sn.read_snapshot(spark, root).collect()}
    assert got == {0: 0, 1: 999, 3: 6, 4: 8, 9: 18}
    # audit trail: pre-merge state intact
    assert {r.id: r.v for r in sn.read_snapshot(spark, root, 0).collect()} == {
        0: 0, 1: 2, 2: 4, 3: 6, 4: 8
    }
    # replay is a no-op
    assert sn.snapshot_merge_keys(spark, root, feed, ["id"], tag="b1") == v1
    assert sn.read_snapshot(spark, root).count() == 5
    # rollback undoes the feed
    sn.rollback(root, 0)
    assert sn.read_snapshot(spark, root).count() == 5
    assert {r.id: r.v for r in sn.read_snapshot(spark, root).collect()}[2] == 4
    # malformed op fails loudly
    bad = spark.createDataFrame([(1, 1, "X")], "id bigint, v bigint, _op string")
    with pytest.raises(ValueError, match="must be 'I'/'U'/'D'"):
        sn.snapshot_merge_keys(spark, root, bad, ["id"])


def test_snapshot_compact_layout_only(spark, tmp_path):
    """Many tiny appends -> one compaction commit: same rows, fewer
    files, full history intact."""
    root = str(tmp_path / "tbl")
    for i in range(5):
        sn.snapshot_append(_df(spark, i * 4, i * 4 + 4), root)
    pre_files = len(sn._read_manifest(root, 4)["files"])
    v = sn.snapshot_compact(spark, root, target_files=1)
    post_files = len(sn._read_manifest(root, v)["files"])
    assert post_files < pre_files and post_files == 1
    assert sn.read_snapshot(spark, root).count() == 20
    assert sorted(r.id for r in sn.read_snapshot(spark, root).collect()) == list(
        range(20)
    )
    # pre-compaction versions untouched
    assert sn.read_snapshot(spark, root, 2).count() == 12


def test_snapshot_schema_evolution_read(spark, tmp_path):
    """An append with a NEW column evolves the table; merge_schema reads
    old file groups with the column NULL, history still reads with its
    own schema."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 3), root)
    evolved = _df(spark, 3, 5).withColumn("w", F.lit("new"))
    sn.snapshot_append(evolved, root)
    got = sn.read_snapshot(spark, root, merge_schema=True)
    assert set(got.columns) == {"id", "v", "w"}
    rows = {r.id: r.w for r in got.collect()}
    assert rows[0] is None and rows[3] == "new" and len(rows) == 5
    # time travel to v0 shows the ORIGINAL schema
    assert set(sn.read_snapshot(spark, root, 0).columns) == {"id", "v"}


def test_snapshot_change_feed_between_versions(spark, tmp_path):
    """Change-data-feed on demand: generate_cdc_feed over two
    time-traveled reads yields the row-level changes a CoW merge made."""
    from data_engineering_challenge_spark import queries_scale as qsc

    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 4), root)  # v0
    feed = spark.createDataFrame(
        [(1, 999, "U"), (2, None, "D"), (7, 14, "I")],
        "id bigint, v bigint, _op string",
    )
    sn.snapshot_merge_keys(spark, root, feed, ["id"])
    cdf = qsc.generate_cdc_feed(
        sn.read_snapshot(spark, root, 0), sn.read_snapshot(spark, root), ["id"]
    )
    got = {(r.id, r._op) for r in cdf.collect()}
    assert got == {(1, "U"), (2, "D"), (7, "I")}


def test_vacuum_grace_period_protects_inflight(spark, tmp_path):
    """Freshly-written unmanifested files survive the default grace
    window (an in-flight commit must not be collected)."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 3), root)
    sn._write_files(_df(spark, 10, 20), root)  # commit in flight
    assert sn.vacuum_orphans(root) == []  # default min_age_s spares it
    assert sn.vacuum_orphans(root, min_age_s=0.0) != []


def test_torn_tagged_commit_resumes_on_replay(spark, tmp_path):
    """Crash between manifest+marker write and the _LATEST move: the
    replayed tagged append must COMPLETE the commit (pointer moves to
    the committed version) instead of no-opping and dropping the epoch
    from the lineage."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 5), root)  # v0
    sn.snapshot_append(_df(spark, 5, 8), root, tag="epoch-1")  # v1
    # simulate the torn window: pointer back at v0, manifest+marker durable
    sn._set_latest(root, 0)
    v = sn.snapshot_append(_df(spark, 5, 8), root, tag="epoch-1")  # replay
    assert v == 1
    assert sn.current_version(root) == 1
    assert sn.read_snapshot(spark, root).count() == 8
    # next epoch builds on the completed lineage
    sn.snapshot_append(_df(spark, 8, 9), root, tag="epoch-2")
    assert sn.read_snapshot(spark, root).count() == 9


def test_concurrent_version_claim_never_clobbers(spark, tmp_path):
    """Writer-writer safety: if another committer claims the version
    number first (simulated by pre-creating the manifest), the commit
    retries with the next number — no manifest is overwritten."""
    import json
    import os

    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 3), root)  # v0
    # a rival committer claims v1
    rival = {"version": 1, "parent": 0, "files": [], "tag": None}
    with open(os.path.join(sn._manifest_dir(root), "v1.json"), "w") as fh:
        json.dump(rival, fh)
    v = sn.snapshot_append(_df(spark, 3, 5), root)
    assert v == 2, "collision must push the commit to the next number"
    with open(os.path.join(sn._manifest_dir(root), "v1.json")) as fh:
        assert json.load(fh) == rival, "rival's manifest must be untouched"
    assert sn.read_snapshot(spark, root, 2).count() == 5


def test_merge_bootstrap_empty_table(spark, tmp_path):
    """First-ever CDC batch against a never-committed root: MERGE treats
    the target as empty and inserts just work."""
    root = str(tmp_path / "tbl")
    feed = spark.createDataFrame(
        [(1, 10, "I"), (2, 20, "I"), (3, 1, "D")],
        "id bigint, v bigint, _op string",
    )
    sn.snapshot_merge_keys(spark, root, feed, ["id"])
    got = {r.id: r.v for r in sn.read_snapshot(spark, root).collect()}
    assert got == {1: 10, 2: 20}


def test_stats_pruned_read_skips_files(spark, tmp_path):
    """Each append commits a disjoint id range with manifest stats; a
    range predicate must open ONLY the intersecting files
    (input_file_name-asserted) while returning exactly the right rows,
    and a file committed WITHOUT stats is always read (no evidence, no
    skipping)."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    for i in range(4):  # ids [0,10) [10,20) [20,30) [30,40), stats on id
        sn.snapshot_append(
            _df(spark, i * 10, (i + 1) * 10).coalesce(1),
            root,
            stats_cols=["id"],
        )
    out = sn.read_snapshot_pruned(spark, root, "id", 12, 18)
    assert sorted(r.id for r in out.collect()) == list(range(12, 19))
    files = {
        r.f for r in out.selectExpr("input_file_name() AS f").distinct().collect()
    }
    assert len(files) == 1, "only the [10,20) file may be opened"

    # empty intersection -> zero rows, zero files
    assert sn.read_snapshot_pruned(spark, root, "id", 100, 200).count() == 0

    # a stats-less append must always be read
    sn.snapshot_append(_df(spark, 1000, 1001).coalesce(1), root)  # no stats
    out2 = sn.read_snapshot_pruned(spark, root, "id", 12, 18)
    files2 = {
        r.f
        for r in out2.selectExpr("input_file_name() AS f").distinct().collect()
    }
    assert len(files2) == 1  # predicate still filters the stats-less rows
    assert sorted(r.id for r in out2.collect()) == list(range(12, 19))
    out3 = sn.read_snapshot_pruned(spark, root, "id", 999, 1001)
    assert [r.id for r in out3.collect()] == [1000]


def test_clustered_append_prunes_to_one_file(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sn.snapshot_append_clustered(_df(spark, 0, 1000), root, ["id"], n_files=8)
    out = sn.read_snapshot_pruned(spark, root, "id", 500, 520)
    assert sorted(r.id for r in out.collect()) == list(range(500, 521))
    files = {
        r.f for r in out.selectExpr("input_file_name() AS f").distinct().collect()
    }
    assert len(files) <= 2, f"range lookup should touch ~1 of 8 files, got {len(files)}"


def test_read_snapshot_pruned_point_in(spark, tmp_path):
    """``point_in`` (round 11): a file skips only when EVERY listed
    value is provably absent — stats per value, blooms per value —
    and the reader re-applies ``isin``."""
    root = str(tmp_path / "tbl")
    for i in range(4):  # ids [0,10) [10,20) [20,30) [30,40)
        sn.snapshot_append(
            _df(spark, i * 10, (i + 1) * 10).coalesce(1),
            root,
            stats_cols=["id"],
            bloom_cols=["id"],
        )
    out = sn.read_snapshot_pruned(spark, root, point_in={"id": [5, 35]})
    assert sorted(r.id for r in out.collect()) == [5, 35]
    files = {
        r.f
        for r in out.selectExpr("input_file_name() AS f").distinct().collect()
    }
    assert len(files) == 2, "values in two files -> exactly two opened"
    # bloom refutes a values-in-range-but-absent probe per value
    out = sn.read_snapshot_pruned(spark, root, point_in={"id": [41, 99]})
    assert out.count() == 0
    with pytest.raises(ValueError, match="non-empty lists"):
        sn.read_snapshot_pruned(spark, root, point_in={"id": []})
    with pytest.raises(ValueError, match="non-null"):
        sn.read_snapshot_pruned(spark, root, point_in={"id": [1, None]})


def test_read_snapshot_pruned_open_ranges_and_prefixes(spark, tmp_path):
    """Round 11: a None bound is OPEN on that side (``id >= a`` alone
    prunes), and ``prefixes`` skips by the exact code-point window
    [pre, next(pre)) of a startswith claim."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    for i in range(4):  # ids [0,10) [10,20) [20,30) [30,40)
        sn.snapshot_append(
            _df(spark, i * 10, (i + 1) * 10)
            .withColumn(
                "s", F.concat(F.lit("k"), F.lpad(F.col("id"), 3, "0"))
            )
            .coalesce(1),
            root,
            stats_cols=["id", "s"],
        )

    def files_of(df):
        return {
            r.f
            for r in df.selectExpr(
                "input_file_name() AS f"
            ).distinct().collect()
        }

    out = sn.read_snapshot_pruned(spark, root, ranges={"id": (30, None)})
    assert sorted(r.id for r in out.collect()) == list(range(30, 40))
    assert len(files_of(out)) == 1
    out = sn.read_snapshot_pruned(spark, root, ranges={"id": (None, 5)})
    assert sorted(r.id for r in out.collect()) == list(range(0, 6))
    assert len(files_of(out)) == 1
    out = sn.read_snapshot_pruned(spark, root, prefixes={"s": "k01"})
    assert sorted(r.id for r in out.collect()) == list(range(10, 20))
    assert len(files_of(out)) == 1
    with pytest.raises(ValueError, match="at least one bound"):
        sn.read_snapshot_pruned(spark, root, ranges={"id": (None, None)})
    with pytest.raises(ValueError, match="non-empty string"):
        sn.read_snapshot_pruned(spark, root, prefixes={"s": ""})
    # exclusive-upper-bound helper: increments and truncates exactly
    assert sn._prefix_upper("abc") == "abd"
    assert sn._prefix_upper("ab" + chr(0x10FFFF)) == "ac"
    assert sn._prefix_upper(chr(0x10FFFF)) is None


def test_read_snapshot_pruned_midnight_datetime_on_date_stats(spark, tmp_path):
    """A MIDNIGHT datetime lo bound on a DATE column (review, round
    11): 'YYYY-MM-DDT00:00:00' sorts ABOVE the same day's date-typed
    stat 'YYYY-MM-DD', so the naive isoformat wrongly skipped the
    boundary file — midnight datetimes now compare as the bare date."""
    import datetime as dt

    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    for day, v in ((1, 10), (2, 20), (5, 50)):
        df = spark.createDataFrame([Row(d=dt.date(2024, 3, day), v=v)])
        sn.snapshot_append(df.coalesce(1), root, stats_cols=["d"])
    out = sn.read_snapshot_pruned(
        spark,
        root,
        ranges={"d": (dt.datetime(2024, 3, 2), dt.datetime(2024, 3, 9))},
    )
    assert sorted(r.v for r in out.collect()) == [20, 50]
    files = {
        r.f
        for r in out.selectExpr("input_file_name() AS f").distinct().collect()
    }
    assert len(files) == 2  # day-1 file still prunes


def test_read_snapshot_pruned_temporal_bounds(spark, tmp_path):
    """datetime/date bounds compare against the ISO-string stats via
    the asymmetric widening (round 11): a file whose min IS the bound
    instant is never skipped — the 'T'-vs-space lexical hazard the
    string literal path used to hit — while disjoint days still
    skip."""
    import datetime as dt

    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    for day, v in ((1, 10), (2, 20), (3, 30)):
        df = spark.createDataFrame(
            [Row(ts=dt.datetime(2024, 3, day, 0, 0, 0), v=v)]
        )
        sn.snapshot_append(df.coalesce(1), root, stats_cols=["ts"])
    # hi bound EQUALS day-2's min instant: its row must survive
    out = sn.read_snapshot_pruned(
        spark,
        root,
        ranges={
            "ts": (dt.datetime(2024, 3, 1), dt.datetime(2024, 3, 2))
        },
    )
    assert sorted(r.v for r in out.collect()) == [10, 20]
    # disjoint window still prunes to one file
    out = sn.read_snapshot_pruned(
        spark,
        root,
        ranges={
            "ts": (
                dt.datetime(2024, 3, 3),
                dt.datetime(2024, 3, 9),
            )
        },
    )
    assert [r.v for r in out.collect()] == [30]
    files = {
        r.f
        for r in out.selectExpr("input_file_name() AS f").distinct().collect()
    }
    assert len(files) == 1


def test_merge_seq_col_orders_collisions(spark, tmp_path):
    """Same-key collisions inside one CoW merge batch resolve by seq_col
    (highest wins) regardless of row order."""
    root = str(tmp_path / "tbl")
    feed = spark.createDataFrame(
        [(1, 111, "U", 2), (1, 999, "U", 5), (1, 222, "U", 1)],
        "id bigint, v bigint, _op string, lsn bigint",
    ).orderBy("v")  # deliberately not lsn order
    sn.snapshot_merge_keys(
        spark, root, feed, ["id"], seq_col="lsn"
    )
    got = sn.read_snapshot(spark, root).drop("lsn").collect()
    assert [(r.id, r.v) for r in got] == [(1, 999)]


def test_multi_column_pruning_with_zorder_layout(spark, tmp_path):
    """Conjunctive 2-D pruning over a Z-ordered commit: ranges dict
    prunes files disjoint in ANY dimension; the zordered layout keeps
    both dimensions' per-file spans bounded so a 2-D box touches few
    files."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    df = spark.range(0, 4096).select(
        "id",
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 7) % 64).alias("y"),
    )
    from data_engineering_challenge_spark.sources.io import zorder_value

    zordered = (
        df.withColumn(
            "_z",
            zorder_value(["x", "y"], bits=6, mins=[0, 0], maxs=[63, 63]),
        )
        .repartitionByRange(16, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    sn.snapshot_append(zordered, root, stats_cols=["x", "y"])
    out = sn.read_snapshot_pruned(
        spark, root, ranges={"x": (10, 13), "y": (10, 13)}
    )
    rows = out.collect()
    assert all(10 <= r.x <= 13 and 10 <= r.y <= 13 for r in rows)
    direct = df.filter(
        F.col("x").between(10, 13) & F.col("y").between(10, 13)
    ).count()
    assert len(rows) == direct
    files = {
        r.f for r in out.selectExpr("input_file_name() AS f").distinct().collect()
    }
    assert len(files) <= 8, f"2-D box should skip most of 16 files, got {len(files)}"


def test_expire_versions_retention(spark, tmp_path):
    """Expire drops old manifests (never the live version), surviving
    versions read fine, and the expired data becomes vacuumable."""
    import pytest

    root = str(tmp_path / "tbl")
    for i in range(5):
        sn.snapshot_overwrite(_df(spark, i * 10, i * 10 + 10), root)
    expired = sn.expire_versions(root, keep_last=2)
    assert expired == [0, 1, 2]
    assert sn.snapshot_versions(root) == [3, 4]
    assert sn.read_snapshot(spark, root).count() == 10
    assert sn.read_snapshot(spark, root, 3).count() == 10
    with pytest.raises(FileNotFoundError):
        sn._read_manifest(root, 0)
    removed = sn.vacuum_orphans(root, min_age_s=0.0)
    assert removed, "expired versions' files must become collectable"
    # live + kept versions still intact after vacuum
    assert sn.read_snapshot(spark, root, 3).count() == 10
    assert sn.read_snapshot(spark, root, 4).count() == 10

    # the LIVE version survives expiry even when old: roll back then expire
    sn.rollback(root, 3)
    assert sn.expire_versions(root, keep_last=1) == []
    assert sn.read_snapshot(spark, root).count() == 10


def test_incremental_agg_refresh_equals_recompute(spark, tmp_path):
    """The maintained view equals a from-scratch aggregation after every
    refresh; an up-to-date refresh is a no-op; a broken (overwrite)
    lineage fails loudly instead of silently corrupting the view."""
    import pytest
    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    view = str(tmp_path / "view")

    def events(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 3).alias("g"), (F.col("id") * 2).alias("v")
        )

    def recompute():
        return {
            (r.g): (r.n, r.v)
            for r in sn.read_snapshot(spark, root)
            .groupBy("g")
            .agg(F.count("*").alias("n"), F.sum("v").alias("v"))
            .collect()
        }

    sn.snapshot_append(events(0, 50), root)
    assert sn.refresh_incremental_agg(spark, root, view, ["g"], ["v"]) == 0
    sn.snapshot_append(events(50, 80), root)
    sn.snapshot_append(events(80, 100), root)
    assert sn.refresh_incremental_agg(spark, root, view, ["g"], ["v"]) == 2
    got = {
        r.g: (r.n, r.v) for r in spark.read.parquet(view).collect()
    }
    assert got == recompute()
    # no-op when current
    assert sn.refresh_incremental_agg(spark, root, view, ["g"], ["v"]) is None
    # lineage break -> loud failure, view untouched
    sn.snapshot_overwrite(events(0, 10), root)
    with pytest.raises(ValueError):
        sn.refresh_incremental_agg(spark, root, view, ["g"], ["v"])
    assert {
        r.g: (r.n, r.v) for r in spark.read.parquet(view).collect()
    } == got


def test_concurrent_append_rebases_onto_winner(spark, tmp_path):
    """True OCC for concurrent appends (round-6 hardening): a committer
    whose parent read went stale — another append landed between its
    parent read and its commit — must REBASE onto the winner's manifest
    instead of re-proposing its stale file list (which would make the
    winner's rows silently invisible in the latest version).  Simulated
    at the `_commit` API grain: writer B captures parent/seen, writes
    its data files, the winner commits, then B commits."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 10), root)  # v0
    # writer B reads its parent + version listing (together)
    parent = sn.current_version(root)
    seen = set(sn.snapshot_versions(root))
    b_files = sn._write_files(_df(spark, 20, 25), root)
    # the winner lands while B is still writing
    sn.snapshot_append(_df(spark, 10, 15), root)  # v1
    v = sn._commit(
        root, b_files, parent,
        rebase_append=True, operation="append", seen_versions=seen,
    )
    assert v == 2
    m = sn._read_manifest(root, 2)
    assert m["parent"] == 1, "B must rebase onto the winner"
    assert set(sn._read_manifest(root, 1)["files"]) <= set(m["files"]), (
        "the winner's files must survive in B's commit"
    )
    assert sn.read_snapshot(spark, root).count() == 20  # 10 + 5 + 5


def test_append_after_rollback_keeps_lineage_despite_newer_versions(
    spark, tmp_path
):
    """Rebase must NOT swallow pre-existing abandoned lineages: an
    append after `rollback` branches from the rolled-back head (the
    abandoned descendants are in `seen_versions`)."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 5), root)      # v0
    sn.snapshot_append(_df(spark, 5, 8), root)         # v1 (abandoned)
    sn.rollback(root, 0)
    v = sn.snapshot_append(_df(spark, 8, 10), root)    # v2, parent 0
    assert v == 2
    assert sn._read_manifest(root, 2)["parent"] == 0
    assert sn.read_snapshot(spark, root).count() == 7  # 5 + 2, not v1's


def test_latest_pointer_never_moves_backwards_on_commit(spark, tmp_path):
    """`_advance_latest` is forward-only: a slow committer's pointer
    write cannot bury a higher already-acknowledged version; `rollback`
    stays the one deliberate backward move."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 3), root)   # v0
    sn.snapshot_append(_df(spark, 3, 5), root)      # v1
    sn._advance_latest(root, 0)                     # late, lower — no-op
    assert sn.current_version(root) == 1
    sn.rollback(root, 0)                            # explicit — honored
    assert sn.current_version(root) == 0


def test_refresh_marker_travels_inside_view_swap(spark, tmp_path):
    """The processed-version marker is published INSIDE the view
    directory by the same atomic rename as the data (no window where a
    merged view carries a stale marker ⇒ no double-merge), and the
    legacy sidecar layout migrates cleanly."""
    import shutil

    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    view = str(tmp_path / "view")

    def events(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 3).alias("g"), (F.col("id") * 2).alias("v")
        )

    sn.snapshot_append(events(0, 40), root)
    assert sn.refresh_incremental_agg(spark, root, view, ["g"], ["v"]) == 0
    marker = os.path.join(view, "_PROCESSED_VERSION")
    assert os.path.exists(marker), "marker must live inside the view dir"
    assert not os.path.exists(view + "._processed"), "no sidecar marker"
    assert int(open(marker).read()) == 0
    # Spark's listing must skip the marker file
    assert spark.read.parquet(view).count() == 3

    # legacy sidecar migration: a view produced by the old layout
    os.remove(marker)
    with open(view + "._processed", "w") as fh:
        fh.write("0")
    sn.snapshot_append(events(40, 60), root)
    assert sn.refresh_incremental_agg(spark, root, view, ["g"], ["v"]) == 1
    got = {r.g: (r.n, r.v) for r in spark.read.parquet(view).collect()}
    want = {
        r.g: (r.n, r.v)
        for r in sn.read_snapshot(spark, root)
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("v").alias("v"))
        .collect()
    }
    assert got == want, "legacy-marker refresh must consume only the delta"
    assert int(open(marker).read()) == 1
    assert not os.path.exists(view + "._processed"), "sidecar retired"

    # marker atomicity: re-running refresh with no new commits is a no-op
    # (the old two-step layout could double-merge after a torn publish)
    assert sn.refresh_incremental_agg(spark, root, view, ["g"], ["v"]) is None
    shutil.rmtree(view + "._replaced", ignore_errors=True)


def test_file_stats_json_safe_types(spark, tmp_path):
    """Manifest stats must survive json.dump for ANY column type: str /
    timestamp coerce to portable primitives, unrepresentable values
    drop the file's claims ({}) instead of failing the commit."""
    from datetime import date, datetime

    from pyspark.sql import functions as F

    # unit grain: the coercion contract
    assert sn._stat_primitive(7) == 7
    assert sn._stat_primitive(1.5) == 1.5
    assert sn._stat_primitive("abc") == "abc"
    assert sn._stat_primitive(b"abc") == "abc"
    assert sn._stat_primitive(b"\xff\xfe") is None
    assert sn._stat_primitive(datetime(2024, 1, 2, 3, 4, 5)) == (
        "2024-01-02T03:04:05"
    )
    assert sn._stat_primitive(date(2024, 1, 2)) == "2024-01-02"
    assert sn._stat_primitive(object()) is None

    # e2e: a timestamp stats column previously blew up json.dump
    root = str(tmp_path / "tbl")
    df = spark.range(5).select(
        F.col("id"),
        F.format_string("k%03d", F.col("id")).alias("s"),
        F.to_timestamp(F.lit("2024-06-01 00:00:00")).alias("ts"),
    )
    v = sn.snapshot_append(df, root, stats_cols=["s", "ts"])
    stats = sn._read_manifest(root, v)["stats"]
    saw_s = False
    for fstats in stats.values():
        if "s" in fstats:
            saw_s = True
            assert isinstance(fstats["s"][0], str)
        # pyarrow exposes NO footer statistics for Spark-written
        # tz-aware timestamps in this stack: the column records no
        # claims (per-column skip, round 10) — pruning on it is
        # always-read, never a wrong skip, and json.dump still works
        if "ts" in fstats:
            assert isinstance(fstats["ts"][0], str)
    assert saw_s, "string stats must be recorded"
    assert sn.read_snapshot(spark, root).count() == 5
    # string-range pruning still works on the coerced stats
    hit = sn.read_snapshot_pruned(spark, root, "s", "k001", "k002")
    assert hit.count() == 2


def test_read_snapshot_pruned_validates_arguments(spark, tmp_path):
    """Argument hygiene: missing col+ranges, col AND ranges together,
    and fully-unbounded ranges all fail loudly up front instead of
    deep in Spark.  One-SIDED bounds are legal as of round 11 (open on
    the None side) — the old both-bounds refusal is inverted in
    `test_read_snapshot_pruned_open_ranges_and_prefixes`."""
    import pytest

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 5), root, stats_cols=["id"])
    with pytest.raises(ValueError, match="pass col"):
        sn.read_snapshot_pruned(spark, root)
    with pytest.raises(ValueError, match="not both"):
        sn.read_snapshot_pruned(
            spark, root, col="id", lo=0, hi=1, ranges={"id": (0, 1)}
        )
    with pytest.raises(ValueError, match="at least one bound"):
        sn.read_snapshot_pruned(spark, root, ranges={"id": (None, None)})
    assert sorted(
        r.id
        for r in sn.read_snapshot_pruned(spark, root, "id", None, 3).collect()
    ) == [0, 1, 2, 3]


def test_mor_merge_matches_cow_merge(spark, tmp_path):
    """Merge-on-read and copy-on-write must produce the SAME logical
    table for the same I/U/D feed — MoR just pays at read time.  Also
    pins the sequencing rule: a key re-inserted in a LATER batch
    survives its own earlier delete (delete files apply only to data
    with a lower commit sequence)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    def feed(rows):
        return spark.createDataFrame(
            [Row(k=k, v=v, _op=op) for k, v, op in rows]
        )

    mor = str(tmp_path / "mor")
    cow = str(tmp_path / "cow")
    batches = [
        [(1, 10, "I"), (2, 20, "I"), (3, 30, "I")],
        [(2, 21, "U"), (3, None, "D"), (4, 40, "I")],
        [(3, 32, "I"), (1, None, "D")],  # re-insert 3 AFTER its delete
    ]
    for b in batches:
        sn.snapshot_mor_merge(spark, mor, feed(b), ["k"])
        sn.snapshot_merge_keys(spark, cow, feed(b), ["k"])
    got = {
        r.k: r.v
        for r in sn.read_snapshot_mor(spark, mor).select("k", "v").collect()
    }
    want = {
        r.k: r.v
        for r in sn.read_snapshot(spark, cow).select("k", "v").collect()
    }
    assert got == want == {2: 21, 3: 32, 4: 40}
    # MoR writes never rewrite existing data files
    m0 = set(sn._read_manifest(mor, 0)["files"])
    m2 = set(sn._read_manifest(mor, 2)["files"])
    assert m0 <= m2, "MoR merge must reference, not rewrite, old files"


def test_mor_time_travel_and_compaction_fold(spark, tmp_path):
    """Time travel works across MoR deletes (each version's delete set
    is its own), and `snapshot_compact` folds the deletes into pure
    data files without changing the read."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")

    def feed(rows):
        return spark.createDataFrame(
            [Row(k=k, v=v, _op=op) for k, v, op in rows]
        )

    sn.snapshot_mor_merge(spark, root, feed([(1, 10, "I"), (2, 20, "I")]), ["k"])
    sn.snapshot_mor_merge(spark, root, feed([(1, None, "D"), (3, 30, "I")]), ["k"])
    # v0 read: delete not yet visible
    assert {
        r.k for r in sn.read_snapshot_mor(spark, root, 0).collect()
    } == {1, 2}
    assert {
        r.k for r in sn.read_snapshot_mor(spark, root, 1).collect()
    } == {2, 3}
    before = {
        (r.k, r.v) for r in sn.read_snapshot_mor(spark, root).collect()
    }
    v = sn.snapshot_compact(spark, root)
    m = sn._read_manifest(root, v)
    assert m["delete_files"] == [], "compaction must fold deletes away"
    after = {(r.k, r.v) for r in sn.read_snapshot_mor(spark, root).collect()}
    assert after == before
    # vacuum (0 grace) may now collect the unreferenced nothing — but
    # every delete file is still referenced by v0/v1 manifests
    removed = sn.vacuum_orphans(root, min_age_s=0.0)
    assert removed == []
    assert {
        r.k for r in sn.read_snapshot_mor(spark, root, 1).collect()
    } == {2, 3}, "older MoR versions must survive vacuum after compaction"


def test_mor_tagged_merge_idempotent_replay(spark, tmp_path):
    """A replayed MoR merge with the same tag is a no-op (exactly-once
    contract shared with the CoW merge)."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    f = spark.createDataFrame([Row(k=1, v=10, _op="I")])
    v1 = sn.snapshot_mor_merge(spark, root, f, ["k"], tag="e1")
    v2 = sn.snapshot_mor_merge(spark, root, f, ["k"], tag="e1")
    assert v1 == v2
    assert sn.read_snapshot_mor(spark, root).count() == 1


def test_incremental_scan_rejects_mor_hops(spark, tmp_path):
    """`read_snapshot_changes` across a MoR merge must fail loudly —
    the delta is not expressible as added rows."""
    import pytest
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 5), root)  # v0
    sn.snapshot_mor_merge(
        spark,
        root,
        spark.createDataFrame([Row(id=1, v=99, _op="D")]).select(
            "id", "v", "_op"
        ),
        ["id"],
    )  # v1: delete id=1
    with pytest.raises(ValueError, match="MoR"):
        sn.read_snapshot_changes(spark, root, 0, 1)


def test_snapshot_history_and_asof_resolution(spark, tmp_path):
    """`snapshot_history` reports the true lineage DAG (rollback branch
    point, operations, file deltas, is_current) and timestamp time
    travel resolves to the newest commit ≤ ts."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 4).coalesce(1), root)       # v0
    sn.snapshot_append(_df(spark, 4, 6).coalesce(1), root)          # v1
    sn.snapshot_overwrite(_df(spark, 100, 101).coalesce(1), root)   # v2
    sn.rollback(root, 1)
    sn.snapshot_append(_df(spark, 6, 7).coalesce(1), root)          # v3

    h = {r.version: r for r in sn.snapshot_history(spark, root).collect()}
    assert set(h) == {0, 1, 2, 3}
    assert h[0].parent is None and h[0].operation == "overwrite"
    assert h[1].parent == 0 and h[1].operation == "append"
    assert h[2].parent == 1 and h[2].operation == "overwrite"
    assert h[3].parent == 1, "post-rollback commit branches from v1"
    assert [v for v, r in h.items() if r.is_current] == [3]
    assert h[1].files_added == 1 and h[1].files_removed == 0
    assert h[2].files_removed == 2  # overwrite dropped v1's two files
    ts = [h[v].ts for v in (0, 1, 2, 3)]
    assert all(t is not None for t in ts) and ts == sorted(ts)

    # as-of-ts: exact commit time → that version; just before v1 → v0
    assert sn.resolve_asof_version(root, h[0].ts) == 0
    assert sn.resolve_asof_version(root, (h[0].ts + h[1].ts) / 2) == 0
    assert sn.resolve_asof_version(root, h[3].ts + 1) == 3
    assert sn.read_snapshot_asof(spark, root, h[1].ts).count() == 6
    import pytest

    with pytest.raises(FileNotFoundError):
        sn.resolve_asof_version(root, h[0].ts - 1)


def test_raw_reads_refuse_mor_manifests(spark, tmp_path):
    """A manifest carrying equality-delete files refuses raw reads
    (plain and pruned) instead of silently resurfacing deleted rows;
    compaction folds the deletes and re-enables them."""
    import pytest
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame([Row(k=1, v=10, _op="I"), Row(k=2, v=20, _op="I")]),
        ["k"],
    )
    sn.snapshot_mor_merge(
        spark, root, spark.createDataFrame([Row(k=1, v=0, _op="D")]), ["k"]
    )
    with pytest.raises(ValueError, match="MoR delete files"):
        sn.read_snapshot(spark, root)
    # the PRUNED read is MoR-aware (r7): it bounds the data scan and
    # still applies the deletes — no compaction needed for a lookup
    assert {
        r.k for r in sn.read_snapshot_pruned(spark, root, "k", 0, 10).collect()
    } == {2}
    sn.snapshot_compact(spark, root)
    assert {r.k for r in sn.read_snapshot(spark, root).collect()} == {2}


def test_cow_merge_after_mor_merge_respects_deletes(spark, tmp_path):
    """Review-pass regression: a CoW merge following MoR commits must
    read through the delete files — the old raw read resurrected
    MoR-deleted keys and duplicated updated ones."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame(
            [Row(k=1, v=10, _op="I"), Row(k=2, v=20, _op="I")]
        ),
        ["k"],
    )
    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame(
            [Row(k=1, v=0, _op="D"), Row(k=2, v=21, _op="U")]
        ),
        ["k"],
    )
    # CoW merge touching an unrelated key
    sn.snapshot_merge_keys(
        spark, root, spark.createDataFrame([Row(k=5, v=50, _op="I")]), ["k"]
    )
    got = {r.k: r.v for r in sn.read_snapshot(spark, root).collect()}
    assert got == {2: 21, 5: 50}, "k=1 must stay deleted, k=2 not duplicated"
    # and the merge's overwrite folded the delete files
    assert sn._read_manifest(root, sn.current_version(root))["delete_files"] == []


def test_view_bootstrap_on_mor_table_applies_deletes(spark, tmp_path):
    """Review-pass regression: the materialized view's bootstrap path
    must aggregate the MoR-resolved table, not the raw data files."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    view = str(tmp_path / "view")
    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame(
            [Row(g="a", k=1, v=10, _op="I"), Row(g="a", k=2, v=20, _op="I")]
        ),
        ["k"],
    )
    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame([Row(g="a", k=1, v=0, _op="D")]),
        ["k"],
    )
    sn.refresh_incremental_agg(spark, root, view, ["g"], ["v"])
    got = {r.g: (r.n, r.v) for r in spark.read.parquet(view).collect()}
    assert got == {"a": (1, 20)}, "deleted k=1 must not seed the view"


def test_snapshot_restore_keeps_history_linear(spark, tmp_path):
    """`snapshot_restore` is undo-as-a-commit: content returns to the
    target version via file references (no data rewrite), history stays
    linear, and timestamp resolution keeps working for every instant —
    while `rollback`'s abandoned branches are excluded from as-of
    lookups (readable only by explicit version)."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 5).coalesce(1), root)   # v0
    sn.snapshot_append(_df(spark, 5, 8).coalesce(1), root)      # v1
    v2 = sn.snapshot_restore(root, 0)                           # undo v1
    assert v2 == 2
    m2 = sn._read_manifest(root, 2)
    assert m2["parent"] == 1 and m2["operation"] == "restore"
    assert m2["files"] == sn._read_manifest(root, 0)["files"], (
        "restore must reference v0's files, not copy them"
    )
    assert sn.read_snapshot(spark, root).count() == 5
    # linear history: every wall-clock instant resolves sensibly
    t1 = sn._read_manifest(root, 1)["ts"]
    assert sn.resolve_asof_version(root, t1) == 1
    assert sn.resolve_asof_version(root, m2["ts"] + 1) == 2

    # restore of a MoR version carries its delete files verbatim
    from pyspark.sql import Row

    mor = str(tmp_path / "mor")
    sn.snapshot_mor_merge(
        spark, mor,
        spark.createDataFrame([Row(k=1, v=10, _op="I"), Row(k=2, v=20, _op="I")]),
        ["k"],
    )
    sn.snapshot_mor_merge(
        spark, mor, spark.createDataFrame([Row(k=1, v=0, _op="D")]), ["k"]
    )
    sn.snapshot_compact(spark, mor)  # v2: folded
    v3 = sn.snapshot_restore(mor, 1)  # back to the MoR state
    m3 = sn._read_manifest(mor, v3)
    assert m3["delete_files"] == sn._read_manifest(mor, 1)["delete_files"]
    assert {r.k for r in sn.read_snapshot_mor(spark, mor).collect()} == {2}


def test_asof_skips_abandoned_lineage(spark, tmp_path):
    """After a rollback, as-of-ts resolution never resurfaces the
    abandoned branch."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 3), root)   # v0
    sn.snapshot_overwrite(_df(spark, 10, 20), root)  # v1 (to be abandoned)
    sn.rollback(root, 0)
    sn.snapshot_append(_df(spark, 3, 5), root)      # v2, parent 0
    t1 = sn._read_manifest(root, 1)["ts"]
    # v1's commit time falls between v0 and v2, but v1 is off-lineage
    assert sn.resolve_asof_version(root, t1) == 0


def test_mor_read_survives_reserved_column_names(spark, tmp_path):
    """User columns named _rel/_seq must survive a MoR read unchanged
    (internal plumbing names are uuid-suffixed)."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    rows = [
        Row(k=1, _rel="a", _seq=7, _op="I"),
        Row(k=2, _rel="b", _seq=8, _op="I"),
    ]
    sn.snapshot_mor_merge(spark, root, spark.createDataFrame(rows), ["k"])
    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame([Row(k=1, _rel="x", _seq=0, _op="D")]),
        ["k"],
    )
    got = [
        (r.k, r._rel, r._seq)
        for r in sn.read_snapshot_mor(spark, root).collect()
    ]
    assert got == [(2, "b", 8)]


def test_delete_where_is_metadata_plus_keylist(spark, tmp_path):
    """Predicate delete: no data files rewritten, rows vanish from MoR
    reads, history preserved, compaction reclaims, tagged replay no-ops."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10), root)  # v0: id 0..9, v = 2*id
    before_files = set(sn._read_manifest(root, 0)["files"])
    v1 = sn.snapshot_delete_where(
        spark, root, "v >= 10", ["id"], tag="gdpr-1"
    )
    m1 = sn._read_manifest(root, v1)
    assert set(m1["files"]) == before_files, "no data files touched"
    assert len(m1["delete_files"]) >= 1
    assert m1["operation"] == "delete-where"
    got = {r.id for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got == {0, 1, 2, 3, 4}  # v = 2*id >= 10 → ids 5..9 deleted
    # history: v0 still shows everything
    assert sn.read_snapshot(spark, root, 0).count() == 10
    # tagged replay is a no-op
    assert sn.snapshot_delete_where(
        spark, root, "v >= 10", ["id"], tag="gdpr-1"
    ) == v1
    # compaction folds; physical erasure path = expire + vacuum
    sn.snapshot_compact(spark, root)
    assert sn.read_snapshot(spark, root).count() == 5


def test_streaming_cdc_sink_exactly_once_mor(spark, tmp_path):
    """The streaming MoR CDC sink applies each micro-batch as a tagged
    snapshot_mor_merge: the merged table equals the batch replay and a
    checkpoint-recovery rerun duplicates nothing."""
    import os

    from pyspark.sql import functions as F

    tmp = str(tmp_path)
    feed = spark.range(0, 200).select(
        (F.col("id") % 40).alias("k"),
        F.col("id").alias("seq"),
        (F.col("id") * 3).alias("v"),
        F.when(F.col("id") % 7 == 0, "D").otherwise("U").alias("_op"),
    )
    # two micro-batches split by seq median
    feed.filter(F.col("seq") < 100).coalesce(1).write.parquet(f"{tmp}/src/b0")
    feed.filter(F.col("seq") >= 100).coalesce(1).write.parquet(f"{tmp}/src/b1")

    def run():
        stream = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{tmp}/src/b*")
        )
        sn.run_streaming_snapshot_cdc_sink(
            stream, f"{tmp}/tbl", f"{tmp}/ckpt", ["k"], seq_col="seq"
        )

    run()
    got = {
        (r.k, r.seq, r.v)
        for r in sn.read_snapshot_mor(spark, f"{tmp}/tbl").collect()
    }
    # batch oracle: last change per key by (epoch of arrival, seq) —
    # files arrive in path order b0, b1 so plain seq ordering holds
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(F.desc("seq"))
    want = {
        (r.k, r.seq, r.v)
        for r in feed.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1 AND _op <> 'D'")
        .select("k", "seq", "v")
        .collect()
    }
    assert got == want and len(got) > 0
    # replay after wiping the checkpoint: every epoch tag already
    # committed → no duplicates, same table
    import shutil

    versions_before = sn.snapshot_versions(f"{tmp}/tbl")
    shutil.rmtree(f"{tmp}/ckpt")
    run()
    assert sn.snapshot_versions(f"{tmp}/tbl") == versions_before
    got2 = {
        (r.k, r.seq, r.v)
        for r in sn.read_snapshot_mor(spark, f"{tmp}/tbl").collect()
    }
    assert got2 == got


def test_delete_where_conflict_retries_against_new_head(
    spark, tmp_path, monkeypatch
):
    """Serializable delete: a concurrent commit landing between the
    predicate evaluation and the commit must trigger a RETRY that
    re-evaluates against the new head — the stale key list would kill a
    concurrently-updated row the predicate no longer matches."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10), root)  # id 0..9, v = 2*id

    orig = sn._write_files
    state = {"fired": False}

    def hooked(df, r, stats_cols=None, kind="data"):
        if kind == "deletes" and not state["fired"]:
            state["fired"] = True  # set BEFORE the nested merge recurses
            # concurrent writer updates id=7 to v=0 (no longer matching)
            sn.snapshot_mor_merge(
                spark,
                root,
                spark.createDataFrame([Row(id=7, v=0, _op="U")]),
                ["id"],
            )
        return orig(df, r, stats_cols=stats_cols, kind=kind)

    monkeypatch.setattr(sn, "_write_files", hooked)
    sn.snapshot_delete_where(spark, root, "v >= 10", ["id"])
    got = {r.id: r.v for r in sn.read_snapshot_mor(spark, root).collect()}
    # ids 5,6,8,9 (v>=10) deleted; id 7 SURVIVES with its concurrent v=0
    # — under the old rebase path its stale delete entry would kill it
    assert got == {0: 0, 1: 2, 2: 4, 3: 6, 4: 8, 7: 0}


def test_mor_read_plan_shape(spark, tmp_path):
    """100 TB-readiness pin for `read_snapshot_mor`: ONE FileScan covers
    ALL data file groups (never a union per commit), the file→sequence
    map join and every delete anti-join are BROADCAST (no
    SortMergeJoin), so the only full-size operation is the single data
    scan."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    for b in (
        [Row(k=1, v=10, _op="I"), Row(k=2, v=20, _op="I")],
        [Row(k=3, v=30, _op="I"), Row(k=1, v=11, _op="U")],
        [Row(k=2, v=0, _op="D")],
    ):
        sn.snapshot_mor_merge(spark, root, spark.createDataFrame(b), ["k"])
    df = sn.read_snapshot_mor(spark, root)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # one scan for the data side + ONE batched scan covering ALL
    # same-schema delete lists (r15: the per-file read loop became one
    # multi-path read; per-file sequences ride a _metadata suffix→seq
    # map) — never a scan per data commit OR per delete list
    n_deletes = len(sn._read_manifest(root, sn.current_version(root))["delete_files"])
    assert n_deletes == 3  # the fixture really has one list per merge
    n_scans = plan.count("Scan parquet")
    assert n_scans == 2, (n_scans, n_deletes, plan)
    assert {r.k: r.v for r in df.collect()} == {1: 11, 3: 30}


def test_position_delete_on_non_keyed_table(spark, tmp_path):
    """keys=None delete_where writes POSITION delete files ((file, row
    ordinal) references) — deletes exact rows on a table with DUPLICATE
    values, which an equality delete cannot express; coexists with
    equality deletes and folds under compaction."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    # duplicates on every column: equality deletes cannot single rows out
    rows = [Row(grp="a", v=1), Row(grp="a", v=1), Row(grp="b", v=5),
            Row(grp="b", v=9), Row(grp="a", v=9)]
    sn.snapshot_append(spark.createDataFrame(rows).coalesce(1), root)
    v1 = sn.snapshot_delete_where(spark, root, "v >= 9", keys=None)
    m1 = sn._read_manifest(root, v1)
    assert all(
        d.get("kind") == "position" for d in m1["delete_files"]
    ) and m1["delete_files"]
    got = sorted(
        (r.grp, r.v) for r in sn.read_snapshot_mor(spark, root).collect()
    )
    assert got == [("a", 1), ("a", 1), ("b", 5)], got
    # history intact; compaction folds the position deletes
    assert sn.read_snapshot(spark, root, 0).count() == 5
    v2 = sn.snapshot_compact(spark, root)
    assert sn._read_manifest(root, v2)["delete_files"] == []
    assert sorted(
        (r.grp, r.v) for r in sn.read_snapshot_mor(spark, root).collect()
    ) == got

    # mixed flavors: an equality delete on top of a position delete
    sn.snapshot_append(
        spark.createDataFrame([Row(grp="c", v=2), Row(grp="c", v=3)]), root
    )
    sn.snapshot_delete_where(spark, root, "grp = 'c'", keys=["grp"])
    sn.snapshot_delete_where(spark, root, "v = 5", keys=None)
    final = sorted(
        (r.grp, r.v) for r in sn.read_snapshot_mor(spark, root).collect()
    )
    assert final == [("a", 1), ("a", 1)], final


def test_maintain_snapshot_policy(spark, tmp_path):
    """The one-call maintenance policy: folds deletes only past the
    threshold, expires old manifests, vacuums unreferenced files —
    idempotent, and the table reads identically before and after."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 20).coalesce(1), root)
    for i in range(3):  # 3 MoR delete commits
        sn.snapshot_delete_where(spark, root, f"id = {i}", keys=["id"])
    before = {r.id for r in sn.read_snapshot_mor(spark, root).collect()}

    # below threshold: nothing happens
    did = sn.maintain_snapshot(spark, root, max_delete_files=8)
    assert did == {
        "compacted": None,
        "manifests_merged": None,
        "expired": [],
        "vacuumed": [],
    }

    # above threshold: compaction folds, expiry + vacuum reclaim
    did = sn.maintain_snapshot(
        spark, root, max_delete_files=2, target_files=1,
        keep_last=1, vacuum_grace_s=0.0,
    )
    assert did["compacted"] is not None
    assert did["expired"], "old manifests must be expired"
    assert did["vacuumed"], "their unreferenced files must be reclaimed"
    assert {r.id for r in sn.read_snapshot_mor(spark, root).collect()} == before

    # idempotent: a second run is a no-op
    did2 = sn.maintain_snapshot(
        spark, root, max_delete_files=2, target_files=1,
        keep_last=1, vacuum_grace_s=0.0,
    )
    assert did2 == {
        "compacted": None,
        "manifests_merged": None,
        "expired": [],
        "vacuumed": [],
    }


def test_delete_where_flavors_agree_on_keyed_table(spark, tmp_path):
    """On a unique-keyed table the two delete flavors are semantically
    interchangeable: equality (keys=[..]) and position (keys=None)
    deletes of the same predicate leave identical visible rows."""
    eq_root = str(tmp_path / "eq")
    pos_root = str(tmp_path / "pos")
    for root in (eq_root, pos_root):
        sn.snapshot_append(_df(spark, 0, 25).coalesce(2), root)
    for pred in ("v >= 30", "id % 3 = 0", "v < 4"):
        sn.snapshot_delete_where(spark, eq_root, pred, keys=["id"])
        sn.snapshot_delete_where(spark, pos_root, pred, keys=None)
        eq = sorted(
            (r.id, r.v)
            for r in sn.read_snapshot_mor(spark, eq_root).collect()
        )
        pos = sorted(
            (r.id, r.v)
            for r in sn.read_snapshot_mor(spark, pos_root).collect()
        )
        assert eq == pos, (pred, eq, pos)
    assert eq, "fixture must leave survivors"


def test_null_keys_match_in_merges_and_deletes(spark, tmp_path):
    """Iceberg null semantics: NULL-keyed rows are matchable — an
    equality delete of a NULL key kills the NULL-keyed row (the plain
    == anti-join would null-reject and resurrect it, a silent erasure
    failure), and CoW/MoR merges agree on NULL-keyed feeds."""
    from pyspark.sql import Row

    schema = "k BIGINT, email STRING, _op STRING"
    mor = str(tmp_path / "mor")
    cow = str(tmp_path / "cow")
    feed1 = spark.createDataFrame(
        [(1, "a@x", "I"), (None, "b@x", "I"), (2, "c@x", "I")], schema
    )
    feed2 = spark.createDataFrame([(None, "b2@x", "U")], schema)
    for root in (mor, cow):
        fn = sn.snapshot_mor_merge if root == mor else sn.snapshot_merge_keys
        fn(spark, root, feed1, ["k"])
        fn(spark, root, feed2, ["k"])
    got_mor = {
        (r.k, r.email)
        for r in sn.read_snapshot_mor(spark, mor).collect()
    }
    got_cow = {
        (r.k, r.email) for r in sn.read_snapshot(spark, cow).collect()
    }
    assert got_mor == got_cow == {(1, "a@x"), (None, "b2@x"), (2, "c@x")}
    # GDPR shape: delete the NULL-keyed row by predicate via equality
    sn.snapshot_delete_where(spark, mor, "email = 'b2@x'", keys=["k"])
    assert {
        (r.k, r.email) for r in sn.read_snapshot_mor(spark, mor).collect()
    } == {(1, "a@x"), (2, "c@x")}


def test_compact_conflict_retries_against_new_head(spark, tmp_path, monkeypatch):
    """Serializable compaction: a commit landing mid-rewrite (the
    streaming CDC sink racing the maintenance cron) must trigger a
    retry that includes the new commit — a blind overwrite would bury
    it while its tag marker makes the checkpoint replay no-op, losing
    the batch permanently."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame([Row(k=1, v=10, _op="I"), Row(k=2, v=20, _op="I")]),
        ["k"],
    )
    sn.snapshot_mor_merge(
        spark, root, spark.createDataFrame([Row(k=1, v=0, _op="D")]), ["k"]
    )

    orig = sn._write_files
    state = {"fired": False}

    def hooked(df, r, stats_cols=None, kind="data"):
        if not state["fired"]:
            state["fired"] = True  # BEFORE the nested merge recurses
            # a streaming epoch lands while the compaction rewrite runs
            sn.snapshot_mor_merge(
                spark, root,
                spark.createDataFrame([Row(k=9, v=90, _op="I")]), ["k"],
            )
        return orig(df, r, stats_cols=stats_cols, kind=kind)

    monkeypatch.setattr(sn, "_write_files", hooked)
    sn.snapshot_compact(spark, root)
    got = {r.k: r.v for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got == {2: 20, 9: 90}, (
        "the mid-compaction commit must survive: " + str(got)
    )
    assert sn._read_manifest(root, sn.current_version(root))["delete_files"] == []


def test_streaming_sink_legacy_epoch_tags_are_opt_in(spark, tmp_path):
    """Unscoped 'epoch-N' markers on a table must NOT swallow a new
    stream's epochs (ADVICE r6): by default a fresh-checkpoint stream
    appends its batch even though a legacy tag exists; only the
    explicit ``honor_legacy_epoch_tags`` migration knob skips it — and
    via a read-only probe that never moves _LATEST."""
    root = str(tmp_path / "tbl")
    # some OTHER writer committed under the unscoped legacy layout
    sn.snapshot_append(_df(spark, 0, 10), root, tag="epoch-0")

    def mkstream(bdir: str):
        src = _df(spark, 10, 20)
        src.coalesce(1).write.parquet(str(tmp_path / bdir / "b0"))
        return (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(tmp_path / bdir / "b*"))
        )

    # default: the legacy tag belongs to someone else — batch lands
    sn.run_streaming_snapshot_sink(
        mkstream("src_a"), root, str(tmp_path / "ckpt_a")
    )
    assert sn.read_snapshot(spark, root).count() == 20, (
        "a foreign legacy tag must not swallow the stream's epoch"
    )
    # opt-in migration: a checkpoint that truly predates scoping skips
    # its already-committed epoch instead of double-applying it
    before = sn.current_version(root)
    sn.run_streaming_snapshot_sink(
        mkstream("src_b"),
        root,
        str(tmp_path / "ckpt_b"),
        honor_legacy_epoch_tags=True,
    )
    assert sn.read_snapshot(spark, root).count() == 20, "no double-apply"
    assert sn.current_version(root) == before, (
        "the read-only probe must not commit or move _LATEST"
    )


# --------------------------------------------------------------------------
# round 7: bin-packing layout-preserving compaction
# --------------------------------------------------------------------------


def _md5(path: str) -> str:
    import hashlib

    with open(path, "rb") as fh:
        return hashlib.md5(fh.read()).hexdigest()


def test_compact_keeps_good_files_byte_identical(spark, tmp_path):
    """Bin-packing: a file group that is already above the size target
    survives compaction BY REFERENCE — same path, same bytes — while
    the small files around it are packed; maintenance cost is
    proportional to the small files, never the table."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 5000).coalesce(1), root)  # the big file
    big = sn._read_manifest(root, 0)["files"]
    assert len(big) == 1
    big_path = os.path.join(root, big[0])
    threshold = os.path.getsize(big_path)  # big file is NOT below this
    for i in range(4):  # four tiny appends
        sn.snapshot_append(_df(spark, 5000 + i, 5001 + i).coalesce(1), root)
    pre_md5 = _md5(big_path)
    pre_files = sn._read_manifest(root, sn.current_version(root))["files"]
    v = sn.snapshot_compact(spark, root, target_file_bytes=threshold)
    m = sn._read_manifest(root, v)
    assert big[0] in m["files"], "the good file must be carried by reference"
    assert _md5(big_path) == pre_md5, "…byte-identical"
    # the four tiny files are gone from the new manifest, packed into one
    assert len(m["files"]) == 2, m["files"]
    assert set(m["files"]) & set(pre_files) == set(big), (
        "only the big file survives by reference"
    )
    assert sn.read_snapshot(spark, root).count() == 5004
    # kept file retains its original commit sequence
    assert m["file_seq"][big[0]] == 0


def test_compact_noop_on_already_compact_table(spark, tmp_path):
    """A table with nothing to rewrite returns the current version
    without committing — the idempotence maintain_snapshot relies on."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 100).coalesce(1), root)
    cur = sn.current_version(root)
    size = os.path.getsize(
        os.path.join(root, sn._read_manifest(root, cur)["files"][0])
    )
    assert sn.snapshot_compact(spark, root, target_file_bytes=size) == cur
    assert sn.snapshot_versions(root) == [0], "no churn commit"


def test_clustered_table_prunes_after_maintenance(spark, tmp_path):
    """The r6 weak item: a clustered table's pruning guarantee must
    SURVIVE maintain_snapshot.  Cluster-append, dirty the table with
    MoR deletes past the policy threshold, maintain, and the keyrange
    lookup must still open ~1 file — the compaction re-ranged, re-sorted,
    and re-recorded stats because the manifest carries the layout."""
    root = str(tmp_path / "tbl")
    big = spark.range(0, 20000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    sn.snapshot_append_clustered(big, root, ["k"], n_files=8)
    for i in range(3):
        sn.snapshot_delete_where(spark, root, f"k = {i}", keys=["k"])
    did = sn.maintain_snapshot(
        spark, root, max_delete_files=2, target_files=8
    )
    assert did["compacted"] is not None
    m = sn._read_manifest(root, did["compacted"])
    assert m["delete_files"] == []
    assert m.get("layout") == {"sort_cols": ["k"], "stats_cols": ["k"]}
    assert all(
        "k" in (m["stats"].get(f) or {}) for f in m["files"]
    ), "every rewritten file must carry fresh stats"
    hit = sn.read_snapshot_pruned(spark, root, "k", 10000, 10100)
    # range boundaries are sampling-derived: the window may straddle
    # one file edge — the guarantee is SKIPPING works, not exact edges
    assert len(hit.inputFiles()) <= 2, hit.inputFiles()
    assert hit.count() == 101  # k=0..2 deleted, none of them in range
    # correctness unchanged vs a full scan
    assert hit.count() == sn.read_snapshot(spark, root).filter(
        "k between 10000 and 10100"
    ).count()


def test_compact_preserves_unlabeled_stats_columns(spark, tmp_path):
    """ADVICE r6: a table without a declared layout but WITH recorded
    stats must not lose them to a maintenance cycle — the rewrite
    recomputes stats over the union of the parent's stat columns."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 50), root, stats_cols=["id"])
    sn.snapshot_append(_df(spark, 50, 100), root, stats_cols=["id"])
    v = sn.snapshot_compact(spark, root, target_files=1)
    m = sn._read_manifest(root, v)
    assert len(m["files"]) == 1
    assert m["stats"][m["files"][0]].get("id") == [0, 99]


def test_delete_where_zero_matches_is_a_noop(spark, tmp_path):
    """ADVICE r6: a predicate matching no rows (a GDPR request for an
    absent key) must not commit an empty delete file — raw and pruned
    readers keep working and the version does not advance."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root, stats_cols=["id"])
    cur = sn.current_version(root)
    for keys in (["id"], None):  # both delete flavors
        got = sn.snapshot_delete_where(spark, root, "id = 999", keys=keys)
        assert got == cur, "no-op delete must return the current version"
    assert sn.snapshot_versions(root) == [0]
    # raw + pruned reads still work (no MoR flip)
    assert sn.read_snapshot(spark, root).count() == 10
    assert sn.read_snapshot_pruned(spark, root, "id", 0, 5).count() == 6


# --------------------------------------------------------------------------
# round 7: schema evolution (rename/drop as metadata-only commits)
# --------------------------------------------------------------------------


def test_evolve_rename_crosses_epochs(spark, tmp_path):
    """Rename is metadata-only: old files keep their bytes, old versions
    read under their own schema, new reads see the new name across ALL
    file epochs, and a post-rename append under the new name joins the
    same field."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 5).coalesce(1), root)       # v0: id, v
    files_v0 = sn._read_manifest(root, 0)["files"]
    mtimes = {f: os.path.getmtime(os.path.join(root, f)) for f in files_v0}
    v1 = sn.snapshot_evolve(root, renames={"v": "value"})        # v1
    assert v1 == 1
    for f, mt in mtimes.items():  # no data rewritten
        assert os.path.getmtime(os.path.join(root, f)) == mt
    assert sn._read_manifest(root, 1)["files"] == files_v0
    # new read sees the new name; values intact
    got = sn.read_snapshot(spark, root)
    assert got.columns == ["id", "value"]
    assert {r.id: r.value for r in got.collect()} == {i: 2 * i for i in range(5)}
    # time travel shows the OLD schema
    assert sn.read_snapshot(spark, root, 0).columns == ["id", "v"]
    # append under the NEW name lands in the same logical column
    newer = spark.range(5, 8).select(
        F.col("id"), (F.col("id") * 2).alias("value")
    )
    sn.snapshot_append(newer.coalesce(1), root)
    got = sn.read_snapshot(spark, root)
    assert got.columns == ["id", "value"]
    assert {r.id: r.value for r in got.collect()} == {i: 2 * i for i in range(8)}


def test_evolve_drop_and_readd_never_resurfaces(spark, tmp_path):
    """Drop removes the field logically (bytes stay until compaction);
    re-adding the same NAME later is a NEW field id — old files' values
    must NOT resurface under it (the Iceberg id-not-name rule)."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 4).coalesce(1), root)   # id, v
    sn.snapshot_evolve(root, drops=["v"])
    assert sn.read_snapshot(spark, root).columns == ["id"]
    # re-add "v" via an append that carries the name
    sn.snapshot_append(_df(spark, 10, 12).coalesce(1), root)
    got = {r.id: r.v for r in sn.read_snapshot(spark, root).collect()}
    assert got[10] == 20 and got[11] == 22
    assert all(got[i] is None for i in range(4)), (
        "old files' dropped bytes must not resurface under the new field"
    )


def test_evolve_compact_and_restore_cross_schema(spark, tmp_path):
    """Compaction rewrites an evolved table under the logical schema;
    restore to a pre-evolution version restores the old schema."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 6).coalesce(1), root)        # v0
    sn.snapshot_evolve(root, renames={"v": "value"})              # v1
    sn.snapshot_append(
        spark.range(6, 9).select("id", (F.col("id") * 2).alias("value")),
        root,
    )                                                             # v2
    v3 = sn.snapshot_compact(spark, root, target_files=1)
    got = sn.read_snapshot(spark, root, v3)
    assert got.columns == ["id", "value"] and got.count() == 9
    # restore to v0: old schema comes back; the evolved head stays
    # readable by number
    v4 = sn.snapshot_restore(root, 0)
    assert sn.read_snapshot(spark, root, v4).columns == ["id", "v"]
    assert sn.read_snapshot(spark, root, v3).columns == ["id", "value"]


def test_evolve_validation_and_mor_composition(spark, tmp_path):
    """Loud failures stay loud (unknown column, rename collision,
    dropping a live delete-key column); the OLD mutual exclusion is
    gone — deletes no longer block evolution and the MoR writers
    accept evolved tables (equality-delete lists bind to field ids,
    the Iceberg v2 composition)."""
    import pytest

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 5).coalesce(1), root)
    with pytest.raises(ValueError, match="no column"):
        sn.snapshot_evolve(root, renames={"nope": "x"})
    with pytest.raises(ValueError, match="collides"):
        sn.snapshot_evolve(root, renames={"id": "v"})
    with pytest.raises(ValueError, match="nothing to do"):
        sn.snapshot_evolve(root)
    # deletes NO LONGER block evolution: the first evolve stamps
    # key_ids onto the pre-existing list…
    sn.snapshot_delete_where(spark, root, "id = 0", keys=["id"])
    sn.snapshot_evolve(root, renames={"v": "value"})
    m = sn._read_manifest(root, sn.current_version(root))
    [dl] = m["delete_files"]
    assert dl["keys"] == ["id"] and dl.get("key_ids"), dl
    # …the pre-evolve delete still applies, and MoR writers work on
    # the evolved table under the NEW names
    from pyspark.sql import Row

    sn.snapshot_delete_where(spark, root, "id = 1", keys=["id"])
    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame([Row(id=2, value=222, _op="U")]), ["id"],
    )
    got = {r.id: r.value for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got[2] == 222 and 0 not in got and 1 not in got
    # the one refusal that REMAINS: dropping a live delete-key column
    with pytest.raises(ValueError, match="equality-delete"):
        sn.snapshot_evolve(root, drops=["id"])
    # the CoW merge still works on the logical schema
    sn.snapshot_merge_keys(
        spark, root,
        spark.createDataFrame([Row(id=3, value=99, _op="U")]), ["id"],
    )
    got = {r.id: r.value for r in sn.read_snapshot_mor(spark, root).collect()}
    assert got[3] == 99
    # compaction folds any remaining deletes, then the drop goes through
    sn.snapshot_compact(spark, root)
    sn.snapshot_evolve(root, drops=["id"])
    assert sn.read_snapshot(spark, root).columns == ["value"]


# --------------------------------------------------------------------------
# round 7: hidden partitioning
# --------------------------------------------------------------------------


def test_partitioned_append_prunes_by_partition_value(spark, tmp_path):
    """`snapshot_append_partitioned` records per-file transform values;
    a partition_eq lookup opens ONLY that partition's files (asserted
    via inputFiles) and still applies the semantic predicate."""
    root = str(tmp_path / "tbl")
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 4).alias("g"),
        (F.col("id") * 3).alias("v"),
    )
    sn.snapshot_append_partitioned(
        df, root, {"grp": "CAST(g AS STRING)"}, stats_cols=["id"]
    )
    m = sn._read_manifest(root, 0)
    assert all(
        sn._read_manifest(root, 0)["partition_values"][f]["grp"]
        in {"0", "1", "2", "3"}
        for f in m["files"]
    )
    # the transform column is HIDDEN: not stored in the data files
    assert set(sn.read_snapshot(spark, root).columns) == {"id", "g", "v"}
    hit = sn.read_snapshot_pruned(spark, root, partition_eq={"grp": 2})
    n_all = len(m["files"])
    assert len(hit.inputFiles()) < n_all, "must skip other partitions"
    assert all("grp=2" in f for f in hit.inputFiles())
    assert hit.count() == 250
    assert {r.g for r in hit.select("g").distinct().collect()} == {2}
    # composes with stats ranges
    both = sn.read_snapshot_pruned(
        spark, root, ranges={"id": (0, 99)}, partition_eq={"grp": 2}
    )
    assert both.count() == 25
    # a plain append's files carry no recorded value -> always read
    sn.snapshot_append(
        spark.range(1000, 1004).select(
            "id", (F.col("id") % 4).alias("g"), (F.col("id") * 3).alias("v")
        ),
        root,
    )
    hit2 = sn.read_snapshot_pruned(spark, root, partition_eq={"grp": 2})
    assert hit2.count() == 251  # 1002 % 4 == 2
    # unknown partition name fails loudly
    import pytest

    with pytest.raises(ValueError, match="no partition transform"):
        sn.read_snapshot_pruned(spark, root, partition_eq={"day": "x"})


def test_partitioned_files_survive_mor_deletes(spark, tmp_path):
    """The MoR file→sequence map is keyed by part-file basename, so
    partitioned file groups (one directory level deeper) merge
    correctly: a delete only kills lower-sequence copies and a
    re-insert survives."""
    root = str(tmp_path / "tbl")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    )
    sn.snapshot_append_partitioned(df, root, {"grp": "CAST(g AS STRING)"})
    from pyspark.sql import Row

    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame([Row(k=7, g=2, _op="D")]), ["k"],
    )
    got = {r.k for r in sn.read_snapshot_mor(spark, root).collect()}
    assert 7 not in got and len(got) == 99
    # re-insert AFTER the delete: the sequence rule lets it survive
    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame([Row(k=7, g=2, _op="I")]), ["k"],
    )
    got = {r.k for r in sn.read_snapshot_mor(spark, root).collect()}
    assert 7 in got and len(got) == 100


def test_compact_prunes_disjoint_equality_deletes(spark, tmp_path):
    """A NARROW equality delete must not force a whole-table rewrite:
    compaction reads the delete list's key range from its footer and
    keeps every data file whose recorded key stats are provably
    disjoint — maintenance bytes ∝ the delete's blast radius."""
    root = str(tmp_path / "tbl")
    big = spark.range(0, 4000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    sn.snapshot_append_clustered(big, root, ["k"], n_files=4)
    files0 = sn._read_manifest(root, 0)["files"]
    assert len(files0) == 4
    sn.snapshot_delete_where(spark, root, "k between 100 and 110", keys=["k"])
    v = sn.snapshot_compact(spark, root, target_file_bytes=1)  # no small files
    m = sn._read_manifest(root, v)
    kept = set(files0) & set(m["files"])
    assert len(kept) == 3, "only the intersecting file may be rewritten"
    assert m["delete_files"] == []
    assert sn.read_snapshot(spark, root).count() == 4000 - 11
    assert sn.read_snapshot(spark, root).filter("k = 105").count() == 0


def test_compact_never_prunes_null_keyed_deletes(spark, tmp_path):
    """Footer min/max excludes NULLs but eqNullSafe deletes match them:
    a delete list containing a NULL key must degrade to conservative
    (rewrite every lower-sequence file) — range-pruning it would
    silently resurrect the NULL-keyed row."""
    rows = [(None, -1)] + [(i, i) for i in range(100)]
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    sn.snapshot_append_clustered(df, root, ["k"], n_files=2)
    feed = spark.createDataFrame([(None, 0, "D")], "k bigint, v bigint, _op string")
    sn.snapshot_mor_merge(spark, root, feed, ["k"])
    v = sn.snapshot_compact(spark, root, target_file_bytes=1)
    got = sn.read_snapshot(spark, root, v)
    assert got.count() == 100
    assert got.filter("k is null").count() == 0, (
        "the NULL-keyed row must stay deleted after compaction"
    )


def test_attach_snapshot_view_sql_surface(spark, tmp_path):
    """`attach_snapshot_view` puts the table format on the SQL surface:
    a spark.sql user reads the MoR-merged state, time travel works via
    version= and asof=, and the view PINS its version — a commit after
    attach does not leak into the view until re-attach."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)       # v0
    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame([Row(id=3, v=99, _op="U"),
                               Row(id=4, v=0, _op="D")]), ["id"],
    )                                                             # v1
    t0 = sn._read_manifest(root, 0)["ts"]
    got = sn.attach_snapshot_views(
        spark,
        {
            "snapv_live": root,
            "snapv_v0": {"root": root, "version": 0},
            "snapv_asof": {"root": root, "asof": t0},
        },
    )
    assert got == {"snapv_live": 1, "snapv_v0": 0, "snapv_asof": 0}
    live = {
        r.id: r.v
        for r in spark.sql("SELECT id, v FROM snapv_live").collect()
    }
    assert live[3] == 99 and 4 not in live and len(live) == 9
    assert spark.sql("SELECT COUNT(*) n FROM snapv_v0").first().n == 10
    assert spark.sql("SELECT COUNT(*) n FROM snapv_asof").first().n == 10
    # pinning: a new commit is invisible until re-attach
    sn.snapshot_append(_df(spark, 100, 105).coalesce(1), root)
    assert spark.sql("SELECT COUNT(*) n FROM snapv_live").first().n == 9
    sn.attach_snapshot_view(spark, "snapv_live", root)
    assert spark.sql("SELECT COUNT(*) n FROM snapv_live").first().n == 14
    import pytest

    with pytest.raises(ValueError, match="at most one"):
        sn.attach_snapshot_view(spark, "x", root, version=0, asof=t0)


# --------------------------------------------------------------------------
# round 7 review regressions
# --------------------------------------------------------------------------


def test_pruned_stats_survive_rename_and_never_alias(spark, tmp_path):
    """Stats are keyed by PHYSICAL names; pruning must translate the
    logical range column through field ids — so (a) pruning still works
    after a rename, and (b) a rename that recycles a freed name can
    never consult the old column's stale ranges (which would silently
    skip matching files)."""
    root = str(tmp_path / "tbl")
    df = spark.range(0, 4000).select(
        F.col("id").alias("v"), (F.col("id") + 100000).alias("w")
    )
    sn.snapshot_append_clustered(df, root, ["v"], n_files=4)
    sn.snapshot_evolve(root, renames={"v": "value"})
    # (a) pruning on the NEW name still skips via the old physical stats
    hit = sn.read_snapshot_pruned(spark, root, "value", 100, 150)
    assert len(hit.inputFiles()) == 1
    assert hit.count() == 51
    # (b) recycle the freed name onto the OTHER column: v now means the
    # +100000 column, whose values never fall in [100, 150] — a stale
    # stats lookup under 'v' would wrongly claim a hit or a skip
    sn.snapshot_evolve(root, renames={"w": "v"})
    got = sn.read_snapshot_pruned(spark, root, "v", 100100, 100150)
    assert got.count() == 51, "recycled name must prune on ITS column"
    assert sn.read_snapshot_pruned(spark, root, "v", 100, 150).count() == 0


def test_evolve_remaps_layout_and_guards_transforms(spark, tmp_path):
    """Renaming a layout column must remap sort_cols/stats_cols (or
    compaction would crash referencing a dead name); renaming/dropping
    a partition-transform source column is refused loudly."""
    import pytest

    root = str(tmp_path / "tbl")
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("x")
    )
    sn.snapshot_append_clustered(df, root, ["k"], n_files=4)
    sn.snapshot_evolve(root, renames={"k": "key"})
    m = sn._read_manifest(root, sn.current_version(root))
    assert m["layout"] == {"sort_cols": ["key"], "stats_cols": ["key"]}
    # maintenance still works and still prunes on the new name
    sn.snapshot_append(
        spark.range(2000, 2100).select(
            F.col("id").alias("key"), (F.col("id") % 7).alias("x")
        ).coalesce(1),
        root,
    )
    v = sn.snapshot_compact(spark, root, target_files=4)
    hit = sn.read_snapshot_pruned(spark, root, "key", 500, 600, version=v)
    # range boundaries are sampling-derived, so the window may straddle
    # a file edge — the point is that stats skipping still WORKS
    assert len(hit.inputFiles()) <= 2 and hit.count() == 101
    # dropping a layout column removes it from the policy
    sn.snapshot_evolve(root, drops=["key"])
    m = sn._read_manifest(root, sn.current_version(root))
    assert "sort_cols" not in (m.get("layout") or {})
    # partition transforms refuse evolution of their source columns
    root2 = str(tmp_path / "pt")
    df2 = spark.range(0, 100).select("id", (F.col("id") % 3).alias("g"))
    sn.snapshot_append_partitioned(df2, root2, {"grp": "CAST(g AS STRING)"})
    with pytest.raises(ValueError, match="partition transform"):
        sn.snapshot_evolve(root2, renames={"g": "h"})
    with pytest.raises(ValueError, match="partition transform"):
        sn.snapshot_evolve(root2, drops=["g"])


def test_position_delete_path_depth_compat(spark, tmp_path):
    """A position-delete list written under the legacy 3-segment key
    (no path_depth field) must still kill its rows — and still force
    its file into the compaction rewrite set."""
    import json

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)
    v1 = sn.snapshot_delete_where(spark, root, "id < 3", keys=None)
    mpath = f"{root}/_manifests/v{v1}.json"
    m = json.load(open(mpath))
    # format 2: the delete dicts live in an immutable delete-entry file
    [dename] = m["delete_entries"]
    depath = f"{root}/_manifests/{dename}"
    de = json.load(open(depath))
    [d] = de["delete_files"]
    assert d["path_depth"] == 2
    # rewrite the delete list to the LEGACY layout: 3-segment _file
    # values and no path_depth field
    import pyarrow as pa
    import pyarrow.parquet as pq

    dpath = os.path.join(root, d["file"])
    t = pq.read_table(dpath)
    legacy_files = pa.array(
        ["data/" + v for v in t.column("_file").to_pylist()]
    )
    pq.write_table(
        pa.table({"_file": legacy_files, "_pos": t.column("_pos")}), dpath
    )
    crc = os.path.join(
        os.path.dirname(dpath), "." + os.path.basename(dpath) + ".crc"
    )
    if os.path.exists(crc):  # stale hadoop checksum for the rewrite
        os.remove(crc)
    del d["path_depth"]
    json.dump(de, open(depath, "w"))
    got = sorted(r.id for r in sn.read_snapshot_mor(spark, root).collect())
    assert got == list(range(3, 10)), "legacy 3-segment refs must apply"
    v2 = sn.snapshot_compact(spark, root, target_file_bytes=1)
    assert sn._read_manifest(root, v2)["delete_files"] == []
    assert sorted(
        r.id for r in sn.read_snapshot(spark, root).collect()
    ) == list(range(3, 10))


def test_maintain_small_file_policy_converges(spark, tmp_path):
    """max_small_files with a LARGER explicit target_files must still
    converge (the target clamps to the threshold) instead of the
    janitor declining forever."""
    root = str(tmp_path / "tbl")
    for i in range(6):
        sn.snapshot_append(_df(spark, i * 10, (i + 1) * 10).coalesce(1), root)
    did = sn.maintain_snapshot(
        spark, root, max_small_files=4, target_files=8
    )
    assert did["compacted"] is not None, "the policy must act"
    m = sn._read_manifest(root, did["compacted"])
    assert len(m["files"]) <= 4
    # and the follow-up run is a no-op
    did2 = sn.maintain_snapshot(
        spark, root, max_small_files=4, target_files=8
    )
    assert did2["compacted"] is None
    assert sn.read_snapshot(spark, root).count() == 60


def test_pruned_read_schema_stable_on_evolved_table(spark, tmp_path):
    """On an evolved table the pruned read's schema must not depend on
    which files survive pruning: a field carried only by pruned-away
    epochs appears as NULL."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(
        _df(spark, 0, 50).coalesce(1), root, stats_cols=["id"]
    )
    sn.snapshot_evolve(root, renames={"v": "value"})
    sn.snapshot_append(
        spark.range(1000, 1050).select(
            "id",
            (F.col("id") * 2).alias("value"),
            F.lit("x").alias("w"),
        ).coalesce(1),
        root,
        stats_cols=["id"],
    )
    pruned = sn.read_snapshot_pruned(spark, root, "id", 0, 49)
    full = sn.read_snapshot(spark, root)
    assert pruned.columns == full.columns, (
        "pruning must never change the schema"
    )
    assert pruned.count() == 50
    assert all(r.w is None for r in pruned.collect())
    # empty dict is rejected, not a silent full scan
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        sn.read_snapshot_pruned(spark, root, partition_eq={})


def test_pruned_read_merges_mor_deletes(spark, tmp_path):
    """Pruned reads on a MoR table bound the DATA scan by stats while
    every delete still applies — and a key re-inserted after its delete
    survives (the sequence rule rides through the subset read)."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    big = spark.range(0, 8000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    sn.snapshot_append_clustered(big, root, ["k"], n_files=8)
    sn.snapshot_mor_merge(
        spark, root,
        spark.createDataFrame(
            [Row(k=100, v=-1, _op="D"), Row(k=101, v=77, _op="U")]
        ),
        ["k"],
    )
    sn.snapshot_mor_merge(
        spark, root, spark.createDataFrame([Row(k=100, v=55, _op="I")]), ["k"]
    )
    hit = sn.read_snapshot_pruned(spark, root, "k", 90, 110)
    got = {r.k: r.v for r in hit.collect()}
    assert got[100] == 55, "re-insert survives its older delete"
    assert got[101] == 77 and len(got) == 21
    # the data scan was bounded: only 1 of the 8 clustered base files
    # (plus the small merge-commit files) is read
    data_files = [
        f for f in hit.inputFiles() if "/data/" in f
    ]
    base_files = {
        f for f in sn._read_manifest(root, 0)["files"]
    }
    read_base = [
        f for f in data_files
        if any(f.endswith(b.split("/")[-1]) for b in base_files)
    ]
    assert len(read_base) == 1, read_base
    # equality with the unpruned MoR read under the same predicate
    want = {
        r.k: r.v
        for r in sn.read_snapshot_mor(spark, root)
        .filter("k between 90 and 110")
        .collect()
    }
    assert got == want


def test_compact_delete_files_minor(spark, tmp_path):
    """Minor compaction (Iceberg 'rewrite delete files'): many small
    delete lists merge into one per group WITHOUT touching data files;
    reads are identical, the sequence rule survives per-row (a
    re-inserted key still outlives its older delete), and a second run
    is a no-op."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 30).coalesce(2), root)
    # key 5: deleted then RE-INSERTED (higher seq) — must survive merge
    sn.snapshot_mor_merge(
        spark, root, spark.createDataFrame([Row(id=5, v=0, _op="D")]), ["id"]
    )
    sn.snapshot_mor_merge(
        spark, root, spark.createDataFrame([Row(id=5, v=50, _op="I"),
                                            Row(id=6, v=0, _op="D")]), ["id"]
    )
    sn.snapshot_mor_merge(
        spark, root, spark.createDataFrame([Row(id=7, v=0, _op="D")]), ["id"]
    )
    # two position deletes on top
    sn.snapshot_delete_where(spark, root, "id = 8", keys=None)
    sn.snapshot_delete_where(spark, root, "id = 9", keys=None)
    m0 = sn._read_manifest(root, sn.current_version(root))
    assert len(m0["delete_files"]) >= 5  # one+ per commit (multi-part lists)
    before = {r.id: r.v for r in sn.read_snapshot_mor(spark, root).collect()}
    assert before[5] == 50 and 6 not in before and 8 not in before
    data_mtimes = {
        f: os.path.getmtime(os.path.join(root, f)) for f in m0["files"]
    }

    v = sn.compact_delete_files(spark, root)
    m1 = sn._read_manifest(root, v)
    kinds = sorted(
        (d.get("kind"), len(d.get("keys", []))) for d in m1["delete_files"]
    )
    assert len(m1["delete_files"]) == 2, m1["delete_files"]
    assert ("equality-multi", 1) in kinds and ("position", 0) in kinds
    assert m1["files"] == m0["files"], "no data file touched"
    for f, mt in data_mtimes.items():
        assert os.path.getmtime(os.path.join(root, f)) == mt
    after = {r.id: r.v for r in sn.read_snapshot_mor(spark, root).collect()}
    assert after == before, "minor compaction must not change the table"
    # pruned MoR read still works over merged lists
    got = {
        r.id: r.v
        for r in sn.read_snapshot_pruned(spark, root, "id", 0, 10).collect()
    }
    assert got == {k: x for k, x in before.items() if k <= 10}
    # idempotent
    assert sn.compact_delete_files(spark, root) == v
    # and the MAJOR compact still folds everything exactly
    v2 = sn.snapshot_compact(spark, root)
    assert sn._read_manifest(root, v2)["delete_files"] == []
    assert {
        r.id: r.v for r in sn.read_snapshot(spark, root).collect()
    } == before


def test_partition_spec_evolution_mixed_lineage(spark, tmp_path):
    """Partition-spec EVOLUTION: a later append can use a different
    transform; files carry the values of the spec they were written
    under, and a lookup on either spec skips only files that recorded a
    DIFFERENT value for that name — unrecorded files are always read,
    so the answer stays exact across the spec change."""
    root = str(tmp_path / "tbl")
    a = spark.range(0, 400).select(
        "id", (F.col("id") % 4).alias("g"), (F.col("id") % 10).alias("h")
    )
    sn.snapshot_append_partitioned(a, root, {"grp": "CAST(g AS STRING)"})
    b = spark.range(400, 600).select(
        "id", (F.col("id") % 4).alias("g"), (F.col("id") % 10).alias("h")
    )
    sn.snapshot_append_partitioned(b, root, {"dec": "CAST(h AS STRING)"})
    m = sn._read_manifest(root, sn.current_version(root))
    # the layout carries BOTH transforms (merged dict)
    assert set(m["layout"]["partition_transforms"]) == {"grp", "dec"}
    # lookup on the OLD spec: second-commit files recorded no 'grp'
    # value -> always read; the semantic predicate still filters them
    hit = sn.read_snapshot_pruned(spark, root, partition_eq={"grp": 1})
    assert hit.count() == 100 + 50  # 400/4 from a, 200/4 from b
    # lookup on the NEW spec symmetric
    hit2 = sn.read_snapshot_pruned(spark, root, partition_eq={"dec": 3})
    assert hit2.count() == 40 + 20
    # skip evidence: a grp lookup reads fewer a-files than a full scan
    a_files = set(sn._read_manifest(root, 0)["files"])
    read_a = [
        f for f in hit.inputFiles()
        if any(f.endswith(x.split("/")[-1]) and x.split("/")[-2] in f
               for x in a_files)
    ]
    assert 0 < len(read_a) < len(a_files)


def test_wap_stage_audit_publish(spark, tmp_path):
    """Snapshot-native write-audit-publish: a staged append is durable
    but invisible, the auditor reads it explicitly, publish is an O(1)
    forward pointer move — and a publish made stale by an intervening
    commit fails loudly instead of dropping that commit."""
    import pytest

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)     # v0 live
    staged = sn.snapshot_stage_append(_df(spark, 10, 15).coalesce(1), root)
    assert sn.current_version(root) == 0, "staging must not publish"
    assert sn.read_snapshot(spark, root).count() == 10, "readers unaffected"
    # the audit reads the staged version explicitly
    assert sn.read_snapshot(spark, root, staged).count() == 15
    sn.snapshot_publish(root, staged)
    assert sn.read_snapshot(spark, root).count() == 15
    # stale publish: a commit lands after staging
    s2 = sn.snapshot_stage_append(_df(spark, 15, 20).coalesce(1), root)
    sn.snapshot_append(_df(spark, 20, 22).coalesce(1), root)
    with pytest.raises(sn.SnapshotConflictError, match="re-stage"):
        sn.snapshot_publish(root, s2)
    assert sn.read_snapshot(spark, root).count() == 17  # 15 + 2
    # the abandoned staged version remains explicitly readable
    assert sn.read_snapshot(spark, root, s2).count() == 20
    # publishing the current head is a harmless no-op
    sn.snapshot_publish(root, sn.current_version(root))


def test_tags_pin_versions_and_retention(spark, tmp_path):
    """Named tags: immutable pins readable by name, surviving
    expire_versions; delete releases the pin; the SQL surface attaches
    by ref."""
    import pytest

    root = str(tmp_path / "tbl")
    for i in range(4):
        sn.snapshot_append(_df(spark, i * 5, (i + 1) * 5).coalesce(1), root)
    assert sn.snapshot_create_tag(root, "train-v1", 1) == 1
    assert sn.snapshot_create_tag(root, "head") == 3  # default: current
    assert sn.snapshot_refs(root) == {"head": 3, "train-v1": 1}
    assert sn.resolve_ref(root, "train-v1") == 1
    # idempotent re-tag to the same version; loud on a different one
    sn.snapshot_create_tag(root, "train-v1", 1)
    with pytest.raises(ValueError, match="immutable"):
        sn.snapshot_create_tag(root, "train-v1", 2)
    # retention never drops a tagged version
    expired = sn.expire_versions(root, keep_last=1)
    assert 1 not in expired and 0 in expired and 2 in expired
    assert sn.read_snapshot(spark, root, 1).count() == 10, "pin readable"
    # SQL surface by ref
    sn.attach_snapshot_view(spark, "snapv_train", root, ref="train-v1")
    assert spark.sql("SELECT COUNT(*) n FROM snapv_train").first().n == 10
    with pytest.raises(ValueError, match="at most one"):
        sn.attach_snapshot_view(spark, "x", root, version=1, ref="train-v1")
    # delete releases the pin; next retention sweep drops the version
    sn.snapshot_delete_tag(root, "train-v1")
    assert 1 in sn.expire_versions(root, keep_last=1)
    with pytest.raises(FileNotFoundError):
        sn.resolve_ref(root, "train-v1")


def test_rebase_never_folds_unpublished_stage(spark, tmp_path, monkeypatch):
    """A concurrent append must NOT rebase onto an unpublished WAP
    stage — that would publish unaudited rows.  The staged version
    stays invisible and its later publish fails the staleness check."""
    import pytest

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0
    orig = sn._write_files
    state = {"staged": None}

    def hooked(df, r, stats_cols=None, kind="data"):
        if state["staged"] is None:
            state["staged"] = -1  # guard BEFORE the nested stage recurses
            state["staged"] = sn.snapshot_stage_append(
                _df(spark, 100, 105).coalesce(1), root
            )
        return orig(df, r, stats_cols=stats_cols, kind=kind)

    monkeypatch.setattr(sn, "_write_files", hooked)
    sn.snapshot_append(_df(spark, 10, 12).coalesce(1), root)
    monkeypatch.setattr(sn, "_write_files", orig)
    got = sorted(r.id for r in sn.read_snapshot(spark, root).collect())
    assert got == list(range(12)), (
        "staged rows must not leak through a concurrent rebase: " + str(got)
    )
    # the stage is still readable explicitly, and publishing it now is
    # the documented loud conflict (a commit landed after staging)
    assert sn.read_snapshot(spark, root, state["staged"]).count() == 15
    with pytest.raises(sn.SnapshotConflictError, match="re-stage"):
        sn.snapshot_publish(root, state["staged"])


def test_publish_detects_concurrent_burial(spark, tmp_path, monkeypatch):
    """The publish TOCTOU window: a commit racing between the staleness
    check and the forward-only pointer move must surface as a loud
    conflict, never a silent no-op publish."""
    import pytest

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0
    staged = sn.snapshot_stage_append(_df(spark, 10, 15).coalesce(1), root)
    orig_adv = sn._advance_latest
    state = {"fired": False}

    def hooked(r, v):
        if not state["fired"] and v == staged:
            state["fired"] = True
            sn.snapshot_append(_df(spark, 20, 22).coalesce(1), root)
        return orig_adv(r, v)

    monkeypatch.setattr(sn, "_advance_latest", hooked)
    with pytest.raises(sn.SnapshotConflictError, match="during publish"):
        sn.snapshot_publish(root, staged)
    monkeypatch.setattr(sn, "_advance_latest", orig_adv)
    got = sorted(r.id for r in sn.read_snapshot(spark, root).collect())
    assert got == list(range(10)) + [20, 21], "the racing commit won"


def test_partition_redefinition_refused(spark, tmp_path):
    """Redefining an existing partition NAME with a different transform
    would poison recorded values (old files' values lie under the new
    semantics) — refused loudly; the same expression is fine."""
    import pytest

    root = str(tmp_path / "tbl")
    df = spark.range(0, 100).select("id", (F.col("id") % 10).alias("g"))
    sn.snapshot_append_partitioned(df, root, {"b": "CAST(id % 10 AS STRING)"})
    with pytest.raises(ValueError, match="poison"):
        sn.snapshot_append_partitioned(
            df, root, {"b": "CAST(id % 2 AS STRING)"}
        )
    # same expression appends fine; a NEW name is spec evolution
    sn.snapshot_append_partitioned(df, root, {"b": "CAST(id % 10 AS STRING)"})
    sn.snapshot_append_partitioned(df, root, {"c": "CAST(g AS STRING)"})
    assert sn.read_snapshot(spark, root).count() == 300


def test_maintain_delete_mode_minor(spark, tmp_path):
    """delete_mode='minor' merges delete lists at metadata cost when
    the delete threshold fires — data files untouched, reads identical,
    and the policy converges (second run no-op)."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 30).coalesce(1), root)
    for i in range(4):
        sn.snapshot_delete_where(spark, root, f"id = {i}", keys=["id"])
    before = {r.id for r in sn.read_snapshot_mor(spark, root).collect()}
    data_files = sn._read_manifest(root, 0)["files"]
    mtimes = {f: os.path.getmtime(os.path.join(root, f)) for f in data_files}
    did = sn.maintain_snapshot(
        spark, root, max_delete_files=2, delete_mode="minor"
    )
    assert did["compacted"] is not None
    m = sn._read_manifest(root, did["compacted"])
    assert len(m["delete_files"]) == 1, "lists merged, not folded"
    assert m["files"] == data_files
    for f, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(root, f)) == mt
    assert {r.id for r in sn.read_snapshot_mor(spark, root).collect()} == before
    did2 = sn.maintain_snapshot(
        spark, root, max_delete_files=2, delete_mode="minor"
    )
    assert did2["compacted"] is None, "converged"
    # a typo'd mode must raise, never silently take the major path
    with pytest.raises(ValueError, match="delete_mode"):
        sn.maintain_snapshot(spark, root, delete_mode="Minor")


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k LONG, v LONG")


def _cdf_rows(spark, root, lo, hi):
    return sorted(
        (r._commit_version, r._change_type, r.k, r.v)
        for r in sn.read_snapshot_cdf(spark, root, lo, hi).collect()
    )


def test_read_snapshot_cdf_mor_events(spark, tmp_path):
    """CDF over a MoR lineage: an upsert surfaces as delete(pre-image)
    + insert(new row), a delete as its pre-image, a plain append as
    inserts — and replaying the events advances the old state to
    exactly the new state."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(
        spark.range(0, 10)
        .selectExpr("id AS k", "id * 10 AS v")
        .coalesce(1),
        root,
    )  # v0
    batch = spark.createDataFrame(
        [(1, 111, "U"), (2, None, "D"), (100, 1000, "I")],
        "k LONG, v LONG, _op STRING",
    )
    sn.snapshot_mor_merge(spark, root, batch, ["k"])  # v1
    sn.snapshot_append(_kv(spark, [(200, 2000), (201, 2010)]).coalesce(1), root)  # v2
    assert _cdf_rows(spark, root, 0, 2) == [
        (1, "delete", 1, 10),
        (1, "delete", 2, 20),
        (1, "insert", 1, 111),
        (1, "insert", 100, 1000),
        (2, "insert", 200, 2000),
        (2, "insert", 201, 2010),
    ]
    # event replay: state(v0) + events == state(v2)
    state = {r.k: r.v for r in sn.read_snapshot(spark, root, 0).collect()}
    for _, ct, k, v in _cdf_rows(spark, root, 0, 2):
        if ct == "delete":
            state.pop(k)
        else:
            state[k] = v
    assert state == {
        r.k: r.v for r in sn.read_snapshot_mor(spark, root, 2).collect()
    }
    # bootstrap: from_version=-1 = the whole as-of table as inserts
    boot = sn.read_snapshot_cdf(spark, root, -1, 2)
    assert boot.count() == len(state)
    assert boot.select("_change_type").distinct().collect()[0][0] == "insert"
    # empty range = schema-only
    assert sn.read_snapshot_cdf(spark, root, 2, 2).count() == 0
    # SQL surface: table_changes()-style view over the same feed
    pinned = sn.attach_snapshot_cdf_view(spark, "tbl_changes", root, 0)
    assert pinned == 2
    got = spark.sql(
        "SELECT _commit_version, _change_type, COUNT(*) AS n "
        "FROM tbl_changes GROUP BY ALL ORDER BY ALL"
    ).collect()
    assert [(r._commit_version, r._change_type, r.n) for r in got] == [
        (1, "delete", 2),
        (1, "insert", 2),
        (2, "insert", 2),
    ]
    spark.catalog.dropTempView("tbl_changes")
    # keys= lifts the SQL view to the four-valued Delta shape
    sn.attach_snapshot_cdf_view(spark, "tbl_changes4", root, 0, keys=["k"])
    got4 = spark.sql(
        "SELECT _commit_version, _change_type, COUNT(*) AS n "
        "FROM tbl_changes4 GROUP BY ALL ORDER BY ALL"
    ).collect()
    assert [(r._commit_version, r._change_type, r.n) for r in got4] == [
        (1, "delete", 1),
        (1, "insert", 1),
        (1, "update_postimage", 1),
        (1, "update_preimage", 1),
        (2, "insert", 2),
    ]
    spark.catalog.dropTempView("tbl_changes4")


def test_read_snapshot_cdf_position_minor_refusals(spark, tmp_path):
    """Position-delete commits emit pre-image events from only the
    referenced files; minor-compaction hops emit nothing; major
    compaction and restore hops refuse loudly."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(
        spark.range(0, 10)
        .selectExpr("id AS k", "id * 10 AS v")
        .coalesce(1),
        root,
    )  # v0
    sn.snapshot_delete_where(spark, root, "k >= 8")  # v1: position
    assert _cdf_rows(spark, root, 0, 1) == [
        (1, "delete", 8, 80),
        (1, "delete", 9, 90),
    ]
    # equality deletes + minor compaction: the compact hop is silent
    root2 = str(tmp_path / "tbl2")
    sn.snapshot_append(
        spark.range(0, 10)
        .selectExpr("id AS k", "id * 10 AS v")
        .coalesce(1),
        root2,
    )  # v0
    for i in (1, 2):  # v1, v2: equality delete-where
        sn.snapshot_delete_where(spark, root2, f"k = {i}", keys=["k"])
    sn.compact_delete_files(spark, root2)  # v3: minor — no row change
    batch = spark.createDataFrame([(3, 333, "U")], "k LONG, v LONG, _op STRING")
    sn.snapshot_mor_merge(spark, root2, batch, ["k"])  # v4
    assert _cdf_rows(spark, root2, 0, 4) == [
        (1, "delete", 1, 10),
        (2, "delete", 2, 20),
        (4, "delete", 3, 30),
        (4, "insert", 3, 333),
    ]
    # major compaction is row-content-preserving: the hop emits NOTHING
    # and a consumer whose range crosses it stays alive (r8 — the folded
    # deletes already streamed as events when their commits happened)
    sn.snapshot_compact(spark, root2)  # v5
    assert _cdf_rows(spark, root2, 0, 5) == _cdf_rows(spark, root2, 0, 4)
    # an OVERWRITE is still not expressible as row changes
    sn.snapshot_overwrite(_kv(spark, [(9, 90)]), root2)  # v6
    with pytest.raises(ValueError, match="removed or rewrote"):
        sn.read_snapshot_cdf(spark, root2, 0, 6)


def test_read_snapshot_cdf_legacy_position_depth(spark, tmp_path):
    """A legacy 3-segment position-delete list (no path_depth field)
    still yields exact CDF delete events — the keys are translated to
    the canonical 2-segment form through the manifest."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)
    v1 = sn.snapshot_delete_where(spark, root, "id < 3", keys=None)
    mpath = f"{root}/_manifests/v{v1}.json"
    m = json.load(open(mpath))
    [dename] = m["delete_entries"]
    depath = f"{root}/_manifests/{dename}"
    de = json.load(open(depath))
    [d] = de["delete_files"]
    dpath = os.path.join(root, d["file"])
    t = pq.read_table(dpath)
    legacy_files = pa.array(
        ["data/" + v for v in t.column("_file").to_pylist()]
    )
    pq.write_table(
        pa.table({"_file": legacy_files, "_pos": t.column("_pos")}), dpath
    )
    crc = os.path.join(
        os.path.dirname(dpath), "." + os.path.basename(dpath) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    del d["path_depth"]
    json.dump(de, open(depath, "w"))
    got = sorted(
        (r._commit_version, r._change_type, r.id)
        for r in sn.read_snapshot_cdf(spark, root, 0, v1).collect()
    )
    assert got == [(v1, "delete", i) for i in range(3)]


def test_snapshot_branches_audit_workflow(spark, tmp_path):
    """Writable branches (Iceberg refs): branch commits are invisible
    to main until fast_forward publishes the head in O(1); divergence
    fails loudly; tag/branch namespaces guard each other."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0 (main)
    assert sn.snapshot_create_branch(root, "audit") == 0
    b1 = sn.snapshot_append_to_branch(_df(spark, 10, 20).coalesce(1), root, "audit")
    b2 = sn.snapshot_append_to_branch(_df(spark, 20, 30).coalesce(1), root, "audit")
    assert sn.resolve_ref(root, "audit") == b2
    assert sn._read_manifest(root, b2)["parent"] == b1
    # main readers see NOTHING of the branch
    assert sn.current_version(root) == 0
    assert sn.read_snapshot(spark, root).count() == 10
    # the auditor reads the branch by name — SQL surface included
    sn.attach_snapshot_view(spark, "audit_view", root, ref="audit")
    assert spark.table("audit_view").count() == 30
    spark.catalog.dropTempView("audit_view")
    # publish: O(1) pointer move, main now carries the whole branch
    assert sn.snapshot_fast_forward(root, "audit") == b2
    assert sn.current_version(root) == b2
    assert sorted(r.id for r in sn.read_snapshot(spark, root).collect()) == list(range(30))
    # namespace guards
    with pytest.raises(ValueError, match="is a branch"):
        sn.snapshot_create_tag(root, "audit")
    with pytest.raises(ValueError, match="is a branch"):
        sn.snapshot_delete_tag(root, "audit")
    sn.snapshot_create_tag(root, "pin", 0)
    with pytest.raises(ValueError, match="is a tag"):
        sn.snapshot_append_to_branch(_df(spark, 0, 1), root, "pin")
    with pytest.raises(ValueError, match="is a tag"):
        sn.snapshot_fast_forward(root, "pin")
    with pytest.raises(ValueError, match="already exists"):
        sn.snapshot_create_branch(root, "pin")
    sn.snapshot_delete_branch(root, "audit")
    with pytest.raises(FileNotFoundError):
        sn.resolve_ref(root, "audit")


def test_snapshot_branch_divergence_and_isolation(spark, tmp_path):
    """A main commit after the fork point (1) is never folded into the
    branch, (2) never rebases onto the unpublished branch commit, and
    (3) blocks fast_forward loudly."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0
    sn.snapshot_create_branch(root, "wip")
    bv = sn.snapshot_append_to_branch(_df(spark, 100, 105).coalesce(1), root, "wip")
    # main append AFTER the branch commit: must not absorb branch rows
    mv = sn.snapshot_append(_df(spark, 10, 12).coalesce(1), root)
    assert sorted(r.id for r in sn.read_snapshot(spark, root).collect()) == list(range(12))
    # the branch still shows only its own lineage
    assert sorted(
        r.id for r in sn.read_snapshot(spark, root, bv).collect()
    ) == list(range(10)) + list(range(100, 105))
    # diverged: publishing would drop main's commit — loud refusal
    with pytest.raises(sn.SnapshotConflictError, match="does not descend"):
        sn.snapshot_fast_forward(root, "wip")
    # the branch keeps working on its own lineage after divergence
    bv2 = sn.snapshot_append_to_branch(_df(spark, 105, 107).coalesce(1), root, "wip")
    assert sn._read_manifest(root, bv2)["parent"] == bv
    assert sn.current_version(root) == mv


def test_branch_lineage_survives_expire(spark, tmp_path):
    """A live branch pins its whole parent chain through retention —
    expire_versions must never break fast_forward's descend walk."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 5).coalesce(1), root)  # v0
    sn.snapshot_create_branch(root, "b")
    for i in range(4):  # v1..v4 on the branch
        sn.snapshot_append_to_branch(
            _df(spark, 5 + i * 5, 10 + i * 5).coalesce(1), root, "b"
        )
    expired = sn.expire_versions(root, keep_last=2)
    assert expired == [], "the live branch chain must be pinned"
    assert sn.snapshot_fast_forward(root, "b") == 4
    assert sorted(r.id for r in sn.read_snapshot(spark, root).collect()) == list(range(25))
    # once published and the branch deleted, retention applies again
    sn.snapshot_delete_branch(root, "b")
    assert sn.expire_versions(root, keep_last=2) == [0, 1, 2]


def test_branch_pointer_cas_and_publish_race(spark, tmp_path):
    """(1) Generation claims are a true CAS — the second claimant of a
    generation loses loudly, never silently buries the first.  (2) A
    main commit whose sibling scan ran while the branch was unpublished
    cannot bury a fast_forward that landed in between — it rebases onto
    the published head instead."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0
    sn.snapshot_create_branch(root, "b")
    base = sn._ref_entry(root, "b")
    assert sn._claim_branch_gen(root, "b", base, 1, 0) is True
    assert sn._claim_branch_gen(root, "b", base, 1, 0) is False, "CAS must refuse"
    sn.snapshot_delete_branch(root, "b")
    sn.snapshot_create_branch(root, "b")
    bv = sn.snapshot_append_to_branch(_df(spark, 10, 20).coalesce(1), root, "b")
    # a main writer captures its view BEFORE the publish...
    seen = set(sn.snapshot_versions(root))
    parent = sn.current_version(root)
    files = sn._write_files(_df(spark, 100, 105).coalesce(1), root)
    sn.snapshot_fast_forward(root, "b")  # head -> branch head
    # ...then lands: the stale advance is refused internally and the
    # commit re-derives against the published head
    v = sn._commit(
        root,
        files,
        parent,
        rebase_append=True,
        operation="append",
        seen_versions=seen,
        publish=True,
    )
    assert sn.current_version(root) == v
    assert sn._read_manifest(root, v)["parent"] == bv
    assert sorted(
        r.id for r in sn.read_snapshot(spark, root).collect()
    ) == list(range(20)) + list(range(100, 105))


def test_snapshot_cherry_pick_diverged_branch(spark, tmp_path):
    """Cherry-pick rebuilds a diverged branch on the new head at
    metadata cost: file groups are SHARED, not copied; refusals cover
    overwrites and delete-bearing hops; re-picking is a no-op."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0
    sn.snapshot_create_branch(root, "wip")
    b1 = sn.snapshot_append_to_branch(_df(spark, 100, 105).coalesce(1), root, "wip")
    b2 = sn.snapshot_append_to_branch(_df(spark, 105, 108).coalesce(1), root, "wip")
    sn.snapshot_append(_df(spark, 10, 12).coalesce(1), root)  # main diverges
    with pytest.raises(sn.SnapshotConflictError):
        sn.snapshot_fast_forward(root, "wip")
    n_data_dirs = len(os.listdir(os.path.join(root, "data")))
    v1 = sn.snapshot_cherry_pick(root, b1)
    v2 = sn.snapshot_cherry_pick(root, b2)
    assert sn.current_version(root) == v2
    assert sorted(
        r.id for r in sn.read_snapshot(spark, root).collect()
    ) == list(range(12)) + list(range(100, 108))
    # metadata-only: the picked commits wrote NO new data files
    assert len(os.listdir(os.path.join(root, "data"))) == n_data_dirs
    assert sn._read_manifest(root, v2)["operation"] == "cherry-pick"
    # re-picking an already-merged commit is a no-op
    assert sn.snapshot_cherry_pick(root, b1) == v2
    # refusals: overwrite hops and delete-bearing hops
    ow = sn.snapshot_overwrite(_df(spark, 0, 3).coalesce(1), root)
    with pytest.raises(ValueError, match="overwrote"):
        sn.snapshot_cherry_pick(root, ow)
    dv = sn.snapshot_delete_where(spark, root, "id = 1", keys=["id"])
    with pytest.raises(ValueError, match="delete-file"):
        sn.snapshot_cherry_pick(root, dv)


def test_branch_recreate_ignores_crashed_delete_debris(spark, tmp_path):
    """Gen dirs are per-incarnation: a crashed delete's leftover
    generation files can never be read as a re-created branch's head."""
    import json as _json

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0
    sn.snapshot_create_branch(root, "b")
    sn.snapshot_append_to_branch(_df(spark, 10, 15).coalesce(1), root, "b")
    old = sn._ref_entry(root, "b")
    # simulate a delete that crashed after removing the base ref
    os.remove(os.path.join(sn._refs_dir(root), "b.json"))
    assert os.path.isdir(sn._branch_gen_dir(root, "b", old)), "debris stays"
    v2 = sn.snapshot_append(_df(spark, 15, 18).coalesce(1), root)  # main v2
    assert sn.snapshot_create_branch(root, "b") == v2
    # the stale incarnation's generation files are invisible
    assert sn.resolve_ref(root, "b") == v2
    nb = sn.snapshot_append_to_branch(_df(spark, 100, 102).coalesce(1), root, "b")
    assert sn._read_manifest(root, nb)["parent"] == v2


def test_refresh_incremental_agg_cdf_retracts(spark, tmp_path):
    """CDF-driven view maintenance over a MoR/CDC table: upserts net to
    the value change, deletes retract, fully-retracted groups vanish —
    the maintained view equals a from-scratch aggregate after every
    refresh."""
    root, view = str(tmp_path / "tbl"), str(tmp_path / "view")

    def batch(rows):
        return spark.createDataFrame(rows, "k LONG, g LONG, v LONG, _op STRING")

    def recompute():
        return {
            (r.g, r.n, r.v)
            for r in sn.read_snapshot_mor(spark, root)
            .groupBy("g")
            .agg(F.count("*").alias("n"), F.sum("v").alias("v"))
            .collect()
        }

    def view_rows():
        return {(r.g, r.n, r.v) for r in spark.read.parquet(view).collect()}

    sn.snapshot_mor_merge(
        spark, root, batch([(1, 0, 10, "I"), (2, 0, 20, "I"), (3, 1, 30, "I")]), ["k"]
    )  # v0
    assert sn.refresh_incremental_agg_cdf(spark, root, view, ["g"], ["v"]) == 0
    assert view_rows() == recompute()
    # upsert k=1, delete k=2, insert k=4 into group 1
    sn.snapshot_mor_merge(
        spark, root, batch([(1, 0, 11, "U"), (2, 0, 0, "D"), (4, 1, 40, "I")]), ["k"]
    )  # v1
    assert sn.refresh_incremental_agg_cdf(spark, root, view, ["g"], ["v"]) == 1
    assert view_rows() == recompute()
    # fully retract group 0 (delete k=1) — the group must vanish
    sn.snapshot_mor_merge(spark, root, batch([(1, 0, 0, "D")]), ["k"])  # v2
    assert sn.refresh_incremental_agg_cdf(spark, root, view, ["g"], ["v"]) == 2
    assert view_rows() == recompute()
    assert {r[0] for r in view_rows()} == {1}, "group 0 fully retracted"
    # idempotent when current
    assert sn.refresh_incremental_agg_cdf(spark, root, view, ["g"], ["v"]) is None


def test_refresh_cdf_preserves_decimal_precision(spark, tmp_path):
    """Retraction must keep the exact decimal type: a value carrying
    the 10th fractional digit survives the incremental path unchanged
    (INT*decimal would widen past precision 38 and round it away)."""
    from decimal import Decimal

    root, view = str(tmp_path / "tbl"), str(tmp_path / "view")
    mk = lambda rows: spark.createDataFrame(
        rows, "k LONG, g LONG, v DECIMAL(28,10), _op STRING"
    )
    tiny = Decimal("0.0000000001")
    sn.snapshot_mor_merge(
        spark, root, mk([(1, 0, tiny, "I"), (2, 0, tiny, "I")]), ["k"]
    )  # v0
    sn.refresh_incremental_agg_cdf(spark, root, view, ["g"], ["v"])
    sn.snapshot_mor_merge(spark, root, mk([(2, 0, None, "D")]), ["k"])  # v1
    sn.refresh_incremental_agg_cdf(spark, root, view, ["g"], ["v"])
    [row] = spark.read.parquet(view).collect()
    assert row.n == 1 and row.v == tiny, f"lost precision: {row.v}"


def test_snapshot_files_metadata_table(spark, tmp_path):
    """The files metadata table: one row per referenced file (data AND
    delete lists) with seq, footer rowcount, recorded stats and
    partition values — metadata only."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(
        _df(spark, 0, 10).coalesce(1), root, stats_cols=["id"]
    )  # v0
    sn.snapshot_append_partitioned(
        _df(spark, 10, 20).coalesce(1), root, {"b": "CAST(id % 2 AS STRING)"}
    )  # v1
    sn.snapshot_delete_where(spark, root, "id = 3", keys=["id"])  # v2
    ft = sn.snapshot_files(spark, root)
    rows = {r.file: r for r in ft.collect()}
    data = [r for r in rows.values() if r.content == "data"]
    dels = [r for r in rows.values() if r.content == "deletes"]
    assert len(data) == 3 and len(dels) == 1  # v1 wrote 2 partition files
    assert sum(r.n_rows for r in data) == 20
    assert dels[0].n_rows == 1 and dels[0].seq == 2
    v0 = [r for r in data if r.seq == 0]
    assert len(v0) == 1 and v0[0].stats["id"] == ["0", "9"]
    assert {r.partition.get("b") for r in data if r.seq == 1} == {"0", "1"}
    # pinned version: the v0 table shows only its own file
    assert sn.snapshot_files(spark, root, 0).count() == 1
    # SQL surface: it is just a DataFrame
    sn.snapshot_files(spark, root).createOrReplaceTempView("tbl_files")
    [agg] = spark.sql(
        "SELECT COUNT(*) AS nf, SUM(n_rows) AS nr FROM tbl_files "
        "WHERE content = 'data'"
    ).collect()
    assert (agg.nf, agg.nr) == (3, 20)
    spark.catalog.dropTempView("tbl_files")


def test_read_snapshot_cdf_prunes_pre_image_scan(spark, tmp_path):
    """With recorded stats, the CDF delete-event pre-image scan reads
    only the parent files whose min/max overlap the delete lists' key
    range — and an insert-only commit (keys disjoint from every file)
    emits no delete events at all."""
    root = str(tmp_path / "tbl")
    mk = lambda lo, hi, op: (
        spark.range(lo, hi)
        .selectExpr("id AS k", "id * 10 AS v")
        .withColumn("_op", F.lit(op))
        .coalesce(1)
    )
    sn.snapshot_mor_merge(spark, root, mk(0, 50, "I"), ["k"], stats_cols=["k"])
    sn.snapshot_mor_merge(spark, root, mk(50, 100, "I"), ["k"], stats_cols=["k"])
    # insert-only commit, keys disjoint from both files
    v2 = sn.snapshot_mor_merge(
        spark, root, mk(1000, 1005, "I"), ["k"], stats_cols=["k"]
    )
    got = sorted(
        (r._change_type, r.k)
        for r in sn.read_snapshot_cdf(spark, root, v2 - 1, v2).collect()
    )
    assert got == [("insert", k) for k in range(1000, 1005)], (
        "disjoint keys -> no pre-image scan, no delete events"
    )
    # update one key in the FIRST file only: the second file's range is
    # provably disjoint from the delete list and must not be read
    batch = spark.createDataFrame([(7, 777, "U")], "k LONG, v LONG, _op STRING")
    v3 = sn.snapshot_mor_merge(spark, root, batch, ["k"], stats_cols=["k"])
    cdf = sn.read_snapshot_cdf(spark, root, v3 - 1, v3)
    rows = sorted((r._change_type, r.k, r.v) for r in cdf.collect())
    assert rows == [("delete", 7, 70), ("insert", 7, 777)]
    m = sn._read_manifest(root, v3 - 1)
    second = [
        f for f, st in (m["stats"] or {}).items() if st.get("k") == [50, 99]
    ]
    assert len(second) == 1
    infiles = {p.split("/", 3)[-1] for p in cdf.inputFiles()}
    assert not any(second[0] in p for p in infiles), (
        "provably-disjoint parent file must not be scanned"
    )


# ---------------------------------------------------------------------------
# round 8: two-level manifests (O(delta) commit metadata), CDC across
# compaction, partitioned vacuum, partition-pruning-preserving compaction
# ---------------------------------------------------------------------------


def test_manifest_bytes_o_delta(spark, tmp_path):
    """Commit metadata is O(delta): on a many-file table, the bytes the
    Nth append writes (version payload + its new entry file) are
    proportional to the BATCH, not to the accumulated table — the
    Iceberg manifest-list property (VERDICT r7's one weak item)."""
    import json

    root = str(tmp_path / "tbl")

    def commit_bytes(v: int) -> int:
        mdir = f"{root}/_manifests"
        payload = json.load(open(f"{mdir}/v{v}.json"))
        total = os.path.getsize(f"{mdir}/v{v}.json")
        pl_parent = (
            json.load(open(f"{mdir}/v{v - 1}.json")) if v > 0 else {}
        )
        prev = set(pl_parent.get("entries") or []) | set(
            pl_parent.get("delete_entries") or []
        )
        for n in (payload.get("entries") or []) + (
            payload.get("delete_entries") or []
        ):
            if n not in prev:  # entries WRITTEN by this commit
                total += os.path.getsize(f"{mdir}/{n}")
        return total

    for i in range(25):
        sn.snapshot_append(
            _df(spark, i * 10, i * 10 + 10).coalesce(2),
            root,
            stats_cols=["id"],
        )
    early, late = commit_bytes(2), commit_bytes(24)
    # version payload grows by one ~45-byte entry NAME per commit — the
    # per-file metadata (stats/seq/sizes) must NOT be re-serialized
    assert late < early + 40 * 60, (early, late)
    # and per-file metadata is resolvable exactly as before
    m = sn._read_manifest(root, 24)
    assert len(m["files"]) == 50
    assert len(m["file_seq"]) == 50
    assert all(m["stats"][f].get("id") for f in m["files"])
    assert len(m.get("sizes") or {}) == 50, "sizes recorded at write time"


def test_vacuum_collects_partitioned_debris_and_survives(spark, tmp_path):
    """ADVICE r7 (medium): vacuum on a table with partitioned commits
    must not crash on the nested _pt_x=v/ layout, must keep every
    referenced file at any depth, and must collect orphaned NESTED
    parquet from crashed partitioned commits."""
    import shutil

    root = str(tmp_path / "tbl")
    df = spark.range(0, 60).select(
        "id", (F.col("id") % 3).alias("g"), (F.col("id") * 2).alias("v")
    )
    sn.snapshot_append_partitioned(df, root, {"grp": "CAST(g AS STRING)"})
    # plain same-schema append: no recorded partition values (always
    # read by the pruned scan), but the transform column must resolve
    plain = spark.range(100, 110).select(
        "id", F.lit(7).cast("long").alias("g"), (F.col("id") * 2).alias("v")
    )
    sn.snapshot_append(plain.coalesce(1), root)
    # orphaned partitioned debris: a crashed commit's group dir
    live_group = os.path.dirname(
        os.path.dirname(sn._read_manifest(root, 0)["files"][0])
    )
    crashed = os.path.join(root, "data", "deadbeefcafe")
    shutil.copytree(os.path.join(root, live_group), crashed)
    removed = sn.vacuum_orphans(root, min_age_s=0.0)
    assert removed and all(r.startswith("data/deadbeefcafe") for r in removed)
    assert not os.path.exists(crashed), "empty orphan group dir removed"
    # referenced nested files all survive; the table still reads
    assert sn.read_snapshot(spark, root).count() == 70
    pruned = sn.read_snapshot_pruned(spark, root, partition_eq={"grp": "1"})
    assert pruned.count() == 20
    # maintain_snapshot's vacuum step composes (the ADVICE crash repro)
    did = sn.maintain_snapshot(spark, root, vacuum_grace_s=0.0)
    assert did["vacuumed"] == []
    assert sn.read_snapshot(spark, root).count() == 70


def test_vacuum_collects_unreferenced_entry_files(spark, tmp_path):
    """Entry files of EXPIRED versions are garbage-collected by vacuum
    (grace-windowed), never entries a live version still references."""
    root = str(tmp_path / "tbl")
    for i in range(6):
        sn.snapshot_append(_df(spark, i, i + 1).coalesce(1), root)
    edir = f"{root}/_manifests/entries"
    n_before = sum(1 for n in os.listdir(edir) if n.startswith("e-"))
    assert n_before >= 6
    sn.expire_versions(root, keep_last=2)
    sn.vacuum_orphans(root, min_age_s=0.0)
    import json

    live = set()
    for v in sn.snapshot_versions(root):
        pl = json.load(open(f"{root}/_manifests/v{v}.json"))
        live |= set(pl.get("entries") or [])
    left = {
        f"entries/{n}" for n in os.listdir(edir) if n.startswith("e-")
    }
    assert left == live, "exactly the still-referenced entries survive"
    assert sn.read_snapshot(spark, root).count() == 6  # table intact


def test_compact_preserves_partition_pruning(spark, tmp_path):
    """ADVICE r7: compaction re-applies the recorded partition
    transforms to the rewritten files, so partition_eq pruning keeps
    skipping AFTER maintenance (the hidden-partitioning analog of the
    clustered-table guarantee)."""
    root = str(tmp_path / "tbl")
    for lo in (0, 60):
        df = spark.range(lo, lo + 60).select(
            "id", (F.col("id") % 3).alias("g")
        )
        sn.snapshot_append_partitioned(
            df, root, {"grp": "CAST(g AS STRING)"}
        )
    v = sn.snapshot_compact(spark, root, target_file_bytes=1 << 20)
    assert v == 2, "small files must be rewritten"
    m = sn._read_manifest(root, v)
    pv = m.get("partition_values") or {}
    assert pv and all(
        "grp" in pv.get(f, {}) for f in m["files"]
    ), "rewritten files carry re-derived partition values"
    pruned = sn.read_snapshot_pruned(spark, root, partition_eq={"grp": "1"})
    assert pruned.count() == 40
    n_all = len(m["files"])
    assert len(pruned.inputFiles()) < n_all, "pruning survives maintenance"
    # FIXED POINT (r8 review): one file per partition value is as packed
    # as a partitioned rewrite can get — a second compact must NOT churn
    # out another version, or cron maintenance rewrites forever
    assert sn.snapshot_compact(spark, root, target_file_bytes=1 << 20) == v
    assert sn.maintain_snapshot(
        spark, root, max_small_files=0, target_file_bytes=1 << 20
    )["compacted"] is None


def test_changes_and_incremental_view_survive_compaction(spark, tmp_path):
    """`read_snapshot_changes` SKIPS a row-content-preserving compact
    hop instead of refusing — so `refresh_incremental_agg` keeps
    working across cron maintenance."""
    root = str(tmp_path / "tbl")
    view = str(tmp_path / "view")
    sn.snapshot_append(_df(spark, 0, 30).coalesce(4), root)  # v0
    assert sn.refresh_incremental_agg(spark, root, view, [], ["v"]) == 0
    sn.snapshot_append(_df(spark, 30, 40).coalesce(4), root)  # v1
    v2 = sn.snapshot_compact(spark, root, target_file_bytes=1 << 20)
    assert v2 == 2
    sn.snapshot_append(_df(spark, 40, 50).coalesce(1), root)  # v3
    got = sorted(
        r.id for r in sn.read_snapshot_changes(spark, root, 0, 3).collect()
    )
    assert got == list(range(30, 50)), "both append spans, nothing else"
    assert sn.refresh_incremental_agg(spark, root, view, [], ["v"]) == 3
    [row] = spark.read.parquet(view).collect()
    assert row.n == 50 and row.v == sum(2 * i for i in range(50))


def test_cdf_replay_converges_across_compaction(spark, tmp_path):
    """The pinned r8 contract: a CDF consumer replaying events across a
    MID-RANGE major compaction converges to exactly the compacted
    table's merged state."""
    root = str(tmp_path / "tbl")
    sn.snapshot_mor_merge(
        spark,
        root,
        _kv(spark, [(k, k * 10) for k in range(8)]).withColumn(
            "_op", F.lit("I")
        ),
        ["k"],
    )  # v0
    sn.snapshot_delete_where(spark, root, "k < 2", keys=["k"])  # v1
    v2 = sn.snapshot_compact(spark, root)  # folds
    assert v2 == 2
    batch = spark.createDataFrame(
        [(3, 333, "U"), (4, -1, "D")], "k LONG, v LONG, _op STRING"
    )
    v3 = sn.snapshot_mor_merge(spark, root, batch, ["k"])
    events = _cdf_rows(spark, root, 0, v3)
    assert [(cv, ct, k) for cv, ct, k, _ in events] == [
        (1, "delete", 0),
        (1, "delete", 1),
        (3, "delete", 3),
        (3, "delete", 4),
        (3, "insert", 3),
    ]
    # replay onto the v0 state = the final merged state
    state = {
        r.k: r.v for r in sn.read_snapshot_mor(spark, root, 0).collect()
    }
    for _cv, ct, k, vv in events:  # deletes precede inserts per commit
        if ct == "delete":
            state.pop(k, None)
        else:
            state[k] = vv
    want = {
        r.k: r.v for r in sn.read_snapshot_mor(spark, root, v3).collect()
    }
    assert state == want


def test_compact_manifests_bounds_entry_list(spark, tmp_path):
    """Manifest compaction (Iceberg RewriteManifests): many appends
    accrete one entry-name per commit; the metadata-only merge collapses
    them to ONE entry, data files untouched, history and every
    downstream consumer (changes walk, CDF, incremental view) crossing
    the hop unchanged."""
    import json

    root = str(tmp_path / "tbl")
    for i in range(8):
        sn.snapshot_append(
            _df(spark, i * 10, i * 10 + 10).coalesce(1),
            root,
            stats_cols=["id"],
        )
    head = sn.current_version(root)
    pl = json.load(open(f"{root}/_manifests/v{head}.json"))
    assert len(pl["entries"]) == 8
    files_before = sn._read_manifest(root, head)["files"]
    v = sn.compact_manifests(root)
    assert v == head + 1
    pl2 = json.load(open(f"{root}/_manifests/v{v}.json"))
    assert len(pl2["entries"]) == 1, "entries merged to one"
    m2 = sn._read_manifest(root, v)
    assert m2["files"] == files_before, "data files byte-identical"
    assert m2["stats"] and m2["file_seq"] and m2["sizes"]
    assert m2["file_seq"][files_before[0]] == 0, "original seqs carried"
    # no-op at the fixed point
    assert sn.compact_manifests(root) == v
    # every consumer crosses the hop: the file/delete sets are identical
    got = sorted(
        r.id for r in sn.read_snapshot_changes(spark, root, 0, v).collect()
    )
    assert got == list(range(10, 80))
    cdf = sn.read_snapshot_cdf(spark, root, head, v)
    assert cdf.count() == 0, "manifest merge emits no events"
    # appends continue on the merged base; pruning still works
    sn.snapshot_append(_df(spark, 80, 90).coalesce(1), root, stats_cols=["id"])
    pl3 = json.load(
        open(f"{root}/_manifests/v{sn.current_version(root)}.json")
    )
    assert len(pl3["entries"]) == 2
    hit = sn.read_snapshot_pruned(spark, root, "id", 85, 86)
    assert hit.count() == 2 and len(hit.inputFiles()) == 1
    # the maintenance knob
    for i in range(3):
        sn.snapshot_append(_df(spark, 100 + i, 101 + i).coalesce(1), root)
    did = sn.maintain_snapshot(spark, root, max_manifest_entries=2)
    assert did["manifests_merged"] is not None
    pl4 = json.load(
        open(f"{root}/_manifests/v{sn.current_version(root)}.json")
    )
    assert len(pl4["entries"]) == 1
    assert sn.read_snapshot(spark, root).count() == 93
    # old versions stay time-travelable; orphaned entries reclaimed only
    # after expiry + vacuum
    assert sn.read_snapshot(spark, root, 3).count() == 40


def test_compact_manifests_rebases_onto_claimed_sibling(
    spark, tmp_path, monkeypatch
):
    """The burial race (r8 review): an append that CLAIMS its manifest
    after the merge captured its listing but before the merge claims —
    the mid-publish window — must not be buried: compact_manifests
    rebases onto the sibling, so its acknowledged rows ride the merged
    head."""
    import json

    root = str(tmp_path / "tbl")
    for i in range(3):
        sn.snapshot_append(_df(spark, i * 10, i * 10 + 10).coalesce(1), root)
    files = sn._write_files(_df(spark, 100, 110).coalesce(1), root)
    state = {"sib": None}
    real_meta = sn._read_manifest_meta

    def inject_then_read(root_, version):
        # fires inside compact_manifests AFTER its seen/parent capture
        # (the first in-loop metadata read): claim the sibling append
        # WITHOUT advancing the pointer — the mid-publish window
        if state["sib"] is None:
            monkeypatch.setattr(sn, "_read_manifest_meta", real_meta)
            state["sib"] = sn._commit(
                root_,
                files,
                sn.current_version(root_),
                rebase_append=True,
                operation="append",
                seen_versions=set(sn.snapshot_versions(root_)) - {99},
                publish=False,
            )
        return real_meta(root_, version)

    monkeypatch.setattr(sn, "_read_manifest_meta", inject_then_read)
    v = sn.compact_manifests(root)
    assert state["sib"] is not None and v > state["sib"]
    got = sorted(r.id for r in sn.read_snapshot(spark, root).collect())
    assert got == list(range(0, 30)) + list(range(100, 110)), (
        "the claimed sibling's rows must survive the merge"
    )
    pl = json.load(open(f"{root}/_manifests/v{v}.json"))
    assert len(pl["entries"]) == 1
    # pathological knob values clamp to the fixed point (no cron churn)
    assert sn.compact_manifests(root, max_entries=0) == v
    assert sn.compact_manifests(root, max_entries=-5) == v


def test_compact_fixed_point_across_spec_evolution(spark, tmp_path):
    """Pre-evolution partition files (recorded under an older spec) must
    still be compacted — the rewrite re-derives the FULL spec and merges
    them with their peers; afterwards compaction is a no-op."""
    root = str(tmp_path / "tbl")
    df = spark.range(0, 40).select(
        "id", (F.col("id") % 2).alias("g"), (F.col("id") % 2).alias("h")
    )
    sn.snapshot_append_partitioned(df, root, {"pg": "CAST(g AS STRING)"})
    sn.snapshot_append_partitioned(
        df, root, {"pg": "CAST(g AS STRING)", "ph": "CAST(h AS STRING)"}
    )
    v = sn.snapshot_compact(spark, root, target_file_bytes=1 << 20)
    assert v == 2, "older-spec files must be rewritten under the full spec"
    m = sn._read_manifest(root, v)
    pv = m.get("partition_values") or {}
    assert all(set(pv.get(f) or {}) == {"pg", "ph"} for f in m["files"])
    assert sn.read_snapshot(spark, root).count() == 80
    # fixed point: one file per (pg, ph) value — no further churn
    assert sn.snapshot_compact(spark, root, target_file_bytes=1 << 20) == v


def test_classify_cdf_updates_four_valued_feed(spark, tmp_path):
    """`classify_cdf_updates` (Delta table_changes parity): same-key
    delete+insert within one commit become update_pre/postimage; true
    deletes, true inserts, and NULL-keyed upserts classify correctly."""
    root = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, 10, "I"), (2, 20, "I"), (None, 99, "I")],
        "k LONG, v LONG, _op STRING",
    )
    sn.snapshot_mor_merge(spark, root, base, ["k"])  # v0
    batch = spark.createDataFrame(
        [(1, 111, "U"), (2, None, "D"), (3, 30, "I"), (None, 77, "U")],
        "k LONG, v LONG, _op STRING",
    )
    v1 = sn.snapshot_mor_merge(spark, root, batch, ["k"])
    ev = sn.classify_cdf_updates(
        sn.read_snapshot_cdf(spark, root, 0, v1), ["k"]
    )
    got = sorted(
        [
            (r._change_type, r.k, r.v)
            for r in ev.filter(F.col("_commit_version") == v1).collect()
        ],
        key=str,
    )
    assert got == sorted(
        [
            ("update_preimage", 1, 10),
            ("update_postimage", 1, 111),
            ("update_preimage", None, 99),   # NULL keys pair too
            ("update_postimage", None, 77),
            ("delete", 2, 20),               # true delete stays
            ("insert", 3, 30),               # fresh insert stays
        ],
        key=str,
    )
    # replay contract unchanged: pre-images before post-images per commit
    state = {
        (r.k,): r.v for r in sn.read_snapshot_mor(spark, root, 0).collect()
    }
    rows = ev.collect()
    for r in [x for x in rows if x._commit_version == v1]:
        if r._change_type in ("delete", "update_preimage"):
            state.pop((r.k,), None)
    for r in [x for x in rows if x._commit_version == v1]:
        if r._change_type in ("insert", "update_postimage"):
            state[(r.k,)] = r.v
    want = {
        (r.k,): r.v for r in sn.read_snapshot_mor(spark, root, v1).collect()
    }
    assert state == want


def test_concurrent_writers_and_manifest_merges_lose_nothing(spark, tmp_path):
    """STRESS pin for the round-8 commit machinery: many threads
    appending concurrently while a maintenance thread repeatedly merges
    manifests — every acknowledged batch's rows are in the final head
    exactly once, and the resolved manifest stays consistent."""
    from concurrent.futures import ThreadPoolExecutor

    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 9000, 9010).coalesce(1), root)  # v0
    N_WRITERS, N_BATCHES = 5, 3

    def writer(w: int) -> list[int]:
        out = []
        for b in range(N_BATCHES):
            lo = (w * N_BATCHES + b) * 10
            out.append(
                sn.snapshot_append(_df(spark, lo, lo + 10).coalesce(1), root)
            )
        return out

    def janitor() -> None:
        for _ in range(4):
            try:
                sn.compact_manifests(root)
            except sn.SnapshotConflictError:
                pass  # heavy contention — the next pass retries

    with ThreadPoolExecutor(max_workers=N_WRITERS + 1) as ex:
        jfut = ex.submit(janitor)
        futs = [ex.submit(writer, w) for w in range(N_WRITERS)]
        versions = [v for f in futs for v in f.result()]
        jfut.result()
    # every acknowledged version is durable and time-travelable
    for v in versions:
        sn._read_manifest(root, v)
    got = sorted(r.id for r in sn.read_snapshot(spark, root).collect())
    want = sorted(
        list(range(0, N_WRITERS * N_BATCHES * 10))
        + list(range(9000, 9010))
    )
    assert got == want, "no lost or duplicated rows under contention"
    # resolution consistency: files unique, every file has a sequence
    m = sn._read_manifest(root, sn.current_version(root))
    assert len(set(m["files"])) == len(m["files"])
    assert set(m["file_seq"]) == set(m["files"])
    # and a final merge leaves one entry with everything intact
    v = sn.compact_manifests(root)
    assert sorted(
        r.id for r in sn.read_snapshot(spark, root, v).collect()
    ) == want


def test_partitioned_append_with_sort_cols_prunes_within_partition(
    spark, tmp_path
):
    """Hidden partitioning × write-time sorting (r8): sort_cols makes
    the per-file stats tight WITHIN each partition, so a point lookup
    composes partition_eq (skip other partitions) with a range skip
    inside the matching partition — and the layout policy survives
    compaction."""
    root = str(tmp_path / "tbl")
    df = spark.range(0, 600).select(
        "id", (F.col("id") % 3).alias("g")
    ).repartition(6)  # scrambled input: the WRITE must impose the order
    sn.snapshot_append_partitioned(
        df,
        root,
        {"grp": "CAST(g AS STRING)"},
        stats_cols=["id"],
        sort_cols=["id"],
    )
    m = sn._read_manifest(root, 0)
    assert (m["layout"]["sort_cols"], m["layout"]["stats_cols"]) == (
        ["id"],
        ["id"],
    )
    # second commit: grp=0 now holds TWO files with disjoint id ranges —
    # the partition skip alone keeps both, the recorded stats must drop
    # the non-matching one
    sn.snapshot_append_partitioned(
        spark.range(600, 1200).select("id", (F.col("id") % 3).alias("g")),
        root,
        {"grp": "CAST(g AS STRING)"},
        stats_cols=["id"],
        sort_cols=["id"],
    )
    in_grp0 = [
        f
        for f, pv in sn._read_manifest(root, 1)["partition_values"].items()
        if pv.get("grp") == "0"
    ]
    assert len(in_grp0) == 2
    hit = sn.read_snapshot_pruned(
        spark, root, col="id", lo=33, hi=33, partition_eq={"grp": "0"}
    )
    assert hit.count() == 1
    assert len(hit.inputFiles()) == 1, (
        "stats must skip within the partition, not just across"
    )
    # compaction preserves BOTH halves of the policy
    v = sn.snapshot_compact(spark, root, target_file_bytes=1 << 20)
    assert v == 2
    hit2 = sn.read_snapshot_pruned(
        spark, root, col="id", lo=33, hi=33, partition_eq={"grp": "0"}
    )
    assert hit2.count() == 1 and len(hit2.inputFiles()) == 1


def test_streaming_sink_hidden_partitioned(spark, tmp_path):
    """`run_streaming_snapshot_sink(partition_transforms=…)`: each epoch
    commits a hidden-partitioned append under the same exactly-once
    tag — partition pruning and the PARTITIONS metadata table work on
    the continuously ingested result, and a checkpoint replay is a
    no-op."""
    import shutil

    from pyspark.sql import functions as F

    root = str(tmp_path / "tbl")
    src = _df(spark, 0, 20).withColumn(
        "bucket", (F.col("id") % 2).cast("string")
    )
    src.filter("id < 10").coalesce(1).write.parquet(str(tmp_path / "s/b0"))
    src.filter("id >= 10").coalesce(1).write.parquet(str(tmp_path / "s/b1"))

    def run():
        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(tmp_path / "s/b*"))
        )
        sn.run_streaming_snapshot_sink(
            stream, root, str(tmp_path / "ckpt"),
            partition_transforms={"pt": "bucket"},
        )

    run()
    assert sn.read_snapshot(spark, root).count() == 20
    # pruning works mid-lineage: the spec landed with epoch 0
    pruned = sn.read_snapshot_pruned(spark, root, partition_eq={"pt": "0"})
    assert pruned.count() == 10
    parts = {
        r["partition"]["pt"]: r["row_count"]
        for r in sn.snapshot_partitions(spark, root).collect()
    }
    assert parts == {"0": 10, "1": 10}
    # checkpoint loss replays both epochs -> tags dedupe, nothing new
    versions = sn.snapshot_versions(root)
    shutil.rmtree(str(tmp_path / "ckpt"))
    run()
    assert sn.snapshot_versions(root) == versions
    assert sn.read_snapshot(spark, root).count() == 20


def test_streaming_sink_clustered_plain_path(spark, tmp_path):
    """`sort_cols` on the UNPARTITIONED sink path routes through the
    clustered append — stats land and pruning works (regression: it
    used to be silently dropped)."""
    root = str(tmp_path / "tbl")
    src = _df(spark, 0, 100)
    src.coalesce(1).write.parquet(str(tmp_path / "s/b0"))
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "s/b*"))
    )
    sn.run_streaming_snapshot_sink(
        stream, root, str(tmp_path / "ckpt"),
        sort_cols=["id"], stats_cols=["id"],
    )
    m = sn._read_manifest(root, sn.current_version(root))
    assert m.get("stats")  # per-file min/max recorded
    pruned = sn.read_snapshot_pruned(spark, root, "id", 0, 5)
    assert pruned.count() == 6


# --------------------------------------------------------------------------
# round 10: OPTIMIZE ZORDER on hidden-partitioned tables
# --------------------------------------------------------------------------


def test_zorder_rewrite_composes_with_partitioning(spark, tmp_path):
    """`snapshot_rewrite_zordered` on a partitioned table (round 10 —
    the r9 refusal replaced): per-partition rewrite preserving
    transforms and recorded values, so a (partition_eq + range) lookup
    prunes by BOTH; appends keep clustering; the cron fixed point
    holds; content byte-identical."""
    root = str(tmp_path / "tbl")
    df = spark.range(40000).select(
        (F.col("id") % 4).alias("region"),
        (F.col("id") % 200).alias("a"),
        ((F.col("id") * 7) % 200).alias("b"),
        F.col("id").alias("payload"),
    )
    sn.snapshot_append_partitioned(
        df, root, {"r": "CAST(region AS STRING)"}
    )
    before = sorted(tuple(r) for r in sn.read_snapshot(spark, root).collect())
    v = sn.snapshot_rewrite_zordered(
        spark, root, ["a", "b"], n_files=16, bits=6
    )
    m = sn._read_manifest(root, v)
    lay = sn._read_manifest_meta(root, v)["layout"]
    assert lay["partition_transforms"] == {"r": "CAST(region AS STRING)"}
    assert lay["zorder_cols"] == ["a", "b"]
    pv = m["partition_values"]
    assert all(pv.get(f, {}).get("r") is not None for f in m["files"])
    after = sorted(tuple(r) for r in sn.read_snapshot_mor(spark, root).collect())
    assert before == after
    # partition pruning COMPOSES with multi-dim zorder pruning: the
    # lookup opens ~1 file of the partition's several
    st = m.get("stats") or {}
    part2 = [f for f in m["files"] if pv[f].get("r") == "2"]
    assert len(part2) >= 3, "a partition must hold several zorder files"
    cand = [
        f for f in part2
        if not (
            st.get(f, {}).get("a")
            and (st[f]["a"][0] > 12 or st[f]["a"][1] < 10)
        )
        and not (
            st.get(f, {}).get("b")
            and (st[f]["b"][0] > 84 or st[f]["b"][1] < 70)
        )
    ]
    assert len(cand) < len(part2), "zorder pruning must cut within the partition"
    got = sn.read_snapshot_pruned(
        spark, root,
        ranges={"a": (10, 12), "b": (70, 84)}, partition_eq={"r": 2},
    )
    want = [t for t in before if t[0] == 2 and 10 <= t[1] <= 12 and 70 <= t[2] <= 84]
    assert got.count() == len(want)
    # fixed point: an identical re-run commits nothing
    assert sn.snapshot_rewrite_zordered(
        spark, root, ["a", "b"], n_files=16, bits=6
    ) == v
    # appends keep the within-partition policy and recorded values
    sn.snapshot_append_partitioned(
        spark.createDataFrame(
            [(9, 5, 5, 12345)], "region long, a long, b long, payload long"
        ),
        root, {"r": "CAST(region AS STRING)"},
    )
    m2 = sn._read_manifest(root, sn.current_version(root))
    new = [f for f in m2["files"] if f not in m["files"]]
    assert new and all(
        m2["partition_values"][f].get("r") == "9" for f in new
    )
    # compaction preserves the composed layout
    sn.snapshot_compact(spark, root, target_files=4)
    lay3 = sn._read_manifest_meta(root, sn.current_version(root))["layout"]
    assert lay3.get("zorder_cols") == ["a", "b"]
    assert lay3.get("partition_transforms")
    assert sn.read_snapshot_mor(spark, root).count() == len(before) + 1


def test_partitioned_append_still_refuses_global_zorder(spark, tmp_path):
    """The GLOBAL zorder layout (unpartitioned) still refuses
    partitioned appends — only the within-partition flavor composes."""
    import pytest

    root = str(tmp_path / "tbl")
    sn.snapshot_append_zordered(
        _df(spark, 0, 100), root, ["id", "v"], n_files=2
    )
    with pytest.raises(ValueError, match="GLOBAL z-order"):
        sn.snapshot_append_partitioned(
            _df(spark, 100, 110), root, {"e": "CAST(id % 2 AS STRING)"}
        )


def test_attach_memo_rebuilds_on_manifest_replacement(spark, tmp_path):
    """The attach memo's key carries the manifest's full identity —
    inode + mtime + size + the per-commit uuid `_commit` records — so
    a table DROPPED AND RECREATED at the same root, reaching the same
    version number with a byte-identical-size manifest, rebuilds the
    analyzed view instead of serving the old file list (advice, round
    12: (mtime_ns, size) alone is spoofable by mtime-preserving
    copies on coarse-mtime filesystems)."""
    import shutil

    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 10), root)
    assert sn._read_manifest_meta(root, 0).get("uuid")  # recorded
    sn.attach_snapshot_view(spark, "memo_ident_t", root)
    assert spark.table("memo_ident_t").count() == 10

    # drop/recreate: same root, same version number, different data
    shutil.rmtree(root)
    sn.snapshot_overwrite(_df(spark, 0, 7), root)
    sn.attach_snapshot_view(spark, "memo_ident_t", root)
    assert spark.table("memo_ident_t").count() == 7
    spark.catalog.dropTempView("memo_ident_t")


def test_attach_memo_key_changes_on_inplace_mutation(spark, tmp_path):
    """Manifest immutability is the memo's correctness invariant
    (VERDICT r11 nit): pin that the ONE sanctioned in-place mutation
    (`_stamp_manifest_payload`, an atomic replace) changes the memo
    identity — a stamped manifest must rebuild, never serve the
    pre-stamp analyzed view."""
    root = str(tmp_path / "tbl")
    sn.snapshot_overwrite(_df(spark, 0, 5), root)

    def ident():
        st = os.stat(sn._manifest_path(root, 0))
        return (
            st.st_ino,
            st.st_mtime_ns,
            st.st_size,
            sn._read_manifest_meta(root, 0).get("uuid"),
        )

    before = ident()
    sn._stamp_manifest_payload(root, 0, {"copied_all": ["x"]})
    after = ident()
    assert before != after  # os.replace mints a new inode


def test_manifest_uuid_cache_lru_bounded(spark, tmp_path, monkeypatch):
    """The manifest-uuid cache is LRU-BOUNDED (advice, round 13): a
    long-lived driver creating and deleting many temp roots must not
    leak one entry per dead root forever.  Eviction is correctness-
    neutral — an evicted live root re-reads one manifest header on
    its next attach and serves the same identity."""
    monkeypatch.setattr(sn, "_MANIFEST_UUID_CACHE", {})
    monkeypatch.setattr(sn, "_MANIFEST_UUID_CACHE_CAP", 3)
    roots = []
    for i in range(5):
        root = str(tmp_path / f"t{i}")
        sn.snapshot_overwrite(_df(spark, 0, 3 + i), root)
        sn.attach_snapshot_view(spark, f"uuid_lru_t{i}", root)
        roots.append(root)
    assert len(sn._MANIFEST_UUID_CACHE) == 3
    # insertion-ordered LRU: the three most recent roots survive
    assert list(sn._MANIFEST_UUID_CACHE) == roots[2:]
    # re-attaching an EVICTED root still answers correctly (re-read)
    sn.attach_snapshot_view(spark, "uuid_lru_t0", roots[0])
    assert spark.table("uuid_lru_t0").count() == 3
    assert list(sn._MANIFEST_UUID_CACHE) == roots[3:] + [roots[0]]
    # a cache HIT moves to the end (true LRU, not FIFO)
    sn.attach_snapshot_view(spark, "uuid_lru_t3", roots[3])
    assert list(sn._MANIFEST_UUID_CACHE) == [
        roots[4], roots[0], roots[3]
    ]
    for i in range(5):
        spark.catalog.dropTempView(f"uuid_lru_t{i}")


def test_prunable_timestamp_write_conf_restored(spark, tmp_path):
    """The engine's INT64-micros write pin is scoped to the engine's
    own writes (advice, round 12): an externally-built session that
    runs with a different outputTimestampType gets its value BACK
    after any snapshot write chokepoint — the engine must not
    silently change the physical parquet type of the caller's own
    unrelated writes."""
    key = "spark.sql.parquet.outputTimestampType"
    prior = spark.conf.get(key)
    try:
        spark.conf.set(key, "INT96")
        root = str(tmp_path / "tbl")
        sn.snapshot_overwrite(_df(spark, 0, 5), root)
        assert spark.conf.get(key) == "INT96"
        # the partitioned chokepoint restores too
        sn.snapshot_append_partitioned(
            _df(spark, 5, 9), root, {"e": "CAST(id % 2 AS STRING)"}
        )
        assert spark.conf.get(key) == "INT96"
        # and the engine's files were still written prunable (micros)
        import pyarrow.parquet as pq

        m = sn._read_manifest(root, sn.current_version(root))
        sch = pq.ParquetFile(
            os.path.join(root, m["files"][0])
        ).schema_arrow
        assert "int96" not in str(sch).lower()
    finally:
        spark.conf.set(key, prior)


def test_pruned_read_nan_open_top_soundness(spark, tmp_path):
    """Spark orders NaN ABOVE every number, so `v >= 30` KEEPS NaN
    rows — an open-top range skip on float stats is sound only with
    NaN-absence evidence (round 12).  The write chokepoints record a
    per-file NaN count and fold FINITE extremes (parquet-mr folds NaN
    into footer min/max arbitrarily); the pruned read skips a
    NaN-carrying file on bounded-above claims (NaN fails `<= hi`) but
    never on open-top ones, and legacy count-less float stats make no
    open-top claims at all."""
    import json

    root = str(tmp_path / "tbl")
    nanful = spark.sql(
        "SELECT id AS k, CAST(CASE WHEN id = 3 THEN 'NaN' ELSE "
        "CAST(id AS STRING) END AS DOUBLE) AS v FROM RANGE(6)"
    ).coalesce(1)
    clean = spark.sql(
        "SELECT id AS k, CAST(id AS DOUBLE) AS v "
        "FROM RANGE(10, 21)"
    ).coalesce(1)
    sn.snapshot_append(nanful, root, stats_cols=["v"])
    sn.snapshot_append(clean, root, stats_cols=["v"])
    m = sn._read_manifest(root, sn.current_version(root))
    sts = [m["stats"][f]["v"] for f in m["files"]]
    # the NaN-carrying file records FINITE extremes + its count
    assert sorted(len(s) for s in sts) == [3, 3]
    assert any(s[2] == 1 and s[1] == 5.0 for s in sts), sts
    # open-top `v >= 30`: only the NaN row satisfies — the NaN file
    # must be read (count evidence says maybe), the clean file skipped
    got = sn.read_snapshot_pruned(spark, root, ranges={"v": (30.0, None)})
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["v"] != rows[0]["v"]
    assert len(got.inputFiles()) == 1
    # bounded-above `30 <= v <= 40`: NaN fails the hi side — BOTH skip
    got2 = sn.read_snapshot_pruned(spark, root, ranges={"v": (30.0, 40.0)})
    assert got2.count() == 0 and len(got2.inputFiles()) == 0
    # legacy manifests (no recorded counts): strip the third elements —
    # open-top claims vanish, the answer stays right via a full read
    mdir = sn._manifest_dir(root)
    v = sn.current_version(root)
    payload = json.load(open(sn._manifest_path(root, v)))
    for name in payload["entries"]:
        epath = os.path.join(mdir, name)
        e = json.load(open(epath))
        for f, st in (e.get("stats") or {}).items():
            e["stats"][f] = {c: s[:2] for c, s in st.items()}
        json.dump(e, open(epath, "w"))
    sn._JSON_CACHE.clear()
    sn._RESOLVED_CACHE.clear()
    got3 = sn.read_snapshot_pruned(spark, root, ranges={"v": (30.0, None)})
    assert got3.count() == 1 and len(got3.inputFiles()) == 2
