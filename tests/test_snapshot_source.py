"""Snapshot table as a streaming source (`sources/snapshot_source.py`):
version offsets, exactly-once restarts, loud failure off the append-only
lineage, additive-evolution padding, and the batch reader surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import snapshots as sn
from data_engineering_challenge_spark.sources.snapshot_source import (
    register_snapshot_source,
)
from data_engineering_challenge_spark.streaming import incremental as st


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def _drain(spark, root, out, ckpt):
    register_snapshot_source(spark)
    stream = (
        spark.readStream.format("snapshot_table").option("root", root).load()
    )
    st.run_available_now(stream, out, ckpt)


def test_stream_restart_replays_nothing(spark, tmp_path):
    """Offsets are versions: a drained source replays nothing on
    restart; a later append is exactly the next run's delta."""
    root = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    sn.snapshot_append(_df(spark, 0, 50).coalesce(2), root)
    _drain(spark, root, out, ckpt)
    assert spark.read.parquet(out).count() == 50  # initial snapshot
    _drain(spark, root, out, ckpt)
    assert spark.read.parquet(out).count() == 50, "drained → no replay"
    sn.snapshot_append(_df(spark, 50, 60).coalesce(1), root)
    sn.snapshot_append(_df(spark, 60, 65).coalesce(1), root)
    _drain(spark, root, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 65, "only the two deltas landed"
    assert {r.id for r in got.collect()} == set(range(65))


def test_stream_fails_loud_on_mor_or_overwrite_hop(spark, tmp_path):
    """A delete-set change or an overwrite between offsets is not an
    added-files delta — the batch must fail, never stream wrong rows."""
    from pyspark.sql import Row
    from py4j.protocol import Py4JJavaError

    root = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    sn.snapshot_append(_df(spark, 0, 20).coalesce(1), root)
    _drain(spark, root, out, ckpt)
    sn.snapshot_mor_merge(
        spark, root, spark.createDataFrame([Row(id=3, v=0, _op="D")]), ["id"]
    )
    with pytest.raises(Exception, match="delete-file set"):
        _drain(spark, root, out, ckpt)
    # a fresh consumer of an overwrite hop also fails
    root2 = str(tmp_path / "src2")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root2)
    _drain(spark, root2, str(tmp_path / "o2"), str(tmp_path / "c2"))
    sn.snapshot_overwrite(_df(spark, 0, 5).coalesce(1), root2)
    with pytest.raises(Exception, match="overwrote"):
        _drain(spark, root2, str(tmp_path / "o2"), str(tmp_path / "c2"))


def test_stream_pads_additive_evolution(spark, tmp_path):
    """An append that added a column (merge-schema lineage) streams with
    old files' missing column as NULL — the schema is pinned at stream
    start from the newest file group."""
    root = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    sn.snapshot_append(_df(spark, 0, 5).coalesce(1), root)
    sn.snapshot_append(
        _df(spark, 5, 8).withColumn("w", F.lit("new")).coalesce(1), root
    )
    _drain(spark, root, out, ckpt)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"id", "v", "w"}
    rows = {r.id: r.w for r in got.collect()}
    assert rows[0] is None and rows[6] == "new" and len(rows) == 8


def test_batch_reader_and_refusals(spark, tmp_path):
    """The batch surface reads a pinned version; evolved tables and
    MoR-carrying versions are refused loudly on both surfaces."""
    from pyspark.sql import Row

    register_snapshot_source(spark)
    root = str(tmp_path / "src")
    sn.snapshot_append(_df(spark, 0, 30).coalesce(2), root)
    sn.snapshot_append(_df(spark, 30, 40).coalesce(1), root)
    b = spark.read.format("snapshot_table").option("root", root).load()
    assert b.count() == 40 and set(b.columns) == {"id", "v"}
    b0 = (
        spark.read.format("snapshot_table")
        .option("root", root)
        .option("version", "0")
        .load()
    )
    assert b0.count() == 30, "version option pins time travel"
    # MoR version refused on the batch surface
    sn.snapshot_mor_merge(
        spark, root, spark.createDataFrame([Row(id=1, v=0, _op="D")]), ["id"]
    )
    with pytest.raises(Exception, match="delete"):
        spark.read.format("snapshot_table").option("root", root).load().count()
    # evolved table refused on both surfaces
    root2 = str(tmp_path / "src2")
    sn.snapshot_append(_df(spark, 0, 5).coalesce(1), root2)
    sn.snapshot_evolve(root2, renames={"v": "value"})
    with pytest.raises(Exception, match="evolved"):
        spark.read.format("snapshot_table").option("root", root2).load().count()
    with pytest.raises(Exception, match="evolved"):
        _drain(spark, root2, str(tmp_path / "o3"), str(tmp_path / "c3"))


def test_stream_start_version_skips_history(spark, tmp_path):
    """start_version (Delta's startingVersion, INCLUSIVE): a consumer
    that already holds everything BEFORE version N starts at N's own
    rows on a fresh checkpoint; restarts still resume from the
    checkpoint."""
    register_snapshot_source(spark)
    root = str(tmp_path / "src")
    sn.snapshot_append(_df(spark, 0, 50).coalesce(1), root)   # v0 (held)
    sn.snapshot_append(_df(spark, 50, 60).coalesce(1), root)  # v1
    stream = (
        spark.readStream.format("snapshot_table")
        .option("root", root)
        .option("start_version", "1")
        .load()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    st.run_available_now(stream, out, ckpt)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(50, 60)), "v1 included, v0 skipped"
    # restart: checkpoint wins, nothing replays
    sn.snapshot_append(_df(spark, 60, 62).coalesce(1), root)
    stream = (
        spark.readStream.format("snapshot_table")
        .option("root", root)
        .option("start_version", "1")
        .load()
    )
    st.run_available_now(stream, out, ckpt)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(50, 62))


def test_stream_start_version_validated_at_start(spark, tmp_path):
    """A bad start_version fails FAST at the first trigger with the
    stream's own error, not a deep FileNotFoundError later — and
    head+1 (start from the NEXT commit) is allowed."""
    import pytest
    from pyspark.errors import StreamingQueryException

    register_snapshot_source(spark)
    root = str(tmp_path / "src")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0

    def start(sv, out, ckpt):
        stream = (
            spark.readStream.format("snapshot_table")
            .option("root", root)
            .option("start_version", str(sv))
            .load()
        )
        st.run_available_now(
            stream, str(tmp_path / out), str(tmp_path / ckpt)
        )

    with pytest.raises(StreamingQueryException, match="beyond the table"):
        start(99, "out99", "ckpt99")
    # head is v0: start_version=1 = 'only future commits' — legal, empty
    start(1, "out1", "ckpt1")
    import os

    files = [
        f
        for f in os.listdir(str(tmp_path / "out1"))
        if f.endswith(".parquet")
    ]
    total = (
        spark.read.parquet(str(tmp_path / "out1")).count() if files else 0
    )
    assert total == 0


def test_stream_change_feed_events_and_restart(spark, tmp_path):
    """change_feed=true streams per-commit events: full-row inserts
    from added files, key-only delete tombstones from equality-delete
    lists; a checkpointed restart replays nothing."""
    register_snapshot_source(spark)
    root = str(tmp_path / "src")
    b0 = spark.createDataFrame([(1, 10, "I"), (2, 20, "I")], "k LONG, v LONG, _op STRING")
    b1 = spark.createDataFrame(
        [(1, 11, "U"), (2, None, "D"), (3, 30, "I")], "k LONG, v LONG, _op STRING"
    )
    sn.snapshot_mor_merge(spark, root, b0, ["k"])  # v0
    sn.snapshot_mor_merge(spark, root, b1, ["k"])  # v1

    def consume():
        stream = (
            spark.readStream.format("snapshot_table")
            .option("root", root)
            .option("change_feed", "true")
            .option("start_version", "1")
            .load()
        )
        st.run_available_now(stream, str(tmp_path / "out"), str(tmp_path / "ckpt"))
        return sorted(
            (r._commit_version, r._change_type, r.k, r.v)
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        )

    assert consume() == [
        (1, "delete", 1, None),
        (1, "delete", 2, None),
        (1, "delete", 3, None),
        (1, "insert", 1, 11),
        (1, "insert", 3, 30),
    ]
    b2 = spark.createDataFrame([(3, 33, "U")], "k LONG, v LONG, _op STRING")
    sn.snapshot_mor_merge(spark, root, b2, ["k"])  # v2
    got = consume()
    assert [t for t in got if t[0] == 2] == [
        (2, "delete", 3, None),
        (2, "insert", 3, 33),
    ]
    assert len(got) == 7, "restart must replay nothing"


def test_stream_change_feed_refusals(spark, tmp_path):
    """Position-delete commits and batch reads refuse change_feed
    loudly; the initial snapshot of a delete-carrying table points at
    start_version."""
    import pytest
    from pyspark.errors import StreamingQueryException

    register_snapshot_source(spark)
    root = str(tmp_path / "src")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0
    sn.snapshot_delete_where(spark, root, "id < 2")  # v1: position deletes
    with pytest.raises(Exception, match="change_feed is a STREAM option"):
        spark.read.format("snapshot_table").option("root", root).option(
            "change_feed", "true"
        ).load().collect()

    def run(sv):
        stream = (
            spark.readStream.format("snapshot_table")
            .option("root", root)
            .option("change_feed", "true")
            .option("start_version", str(sv))
            .load()
        )
        st.run_available_now(
            stream, str(tmp_path / f"o{sv}"), str(tmp_path / f"c{sv}")
        )

    with pytest.raises(StreamingQueryException, match="position"):
        run(1)


def test_stream_change_feed_initial_and_zero_start(spark, tmp_path):
    """start_version=0 on a clean table streams the whole snapshot as
    inserts (no spurious ancestor error), and the default initial
    snapshot of a delete-carrying table points at start_version."""
    import pytest
    from pyspark.errors import StreamingQueryException

    register_snapshot_source(spark)
    root = str(tmp_path / "clean")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0

    def run(r, opts, o, c):
        s = spark.readStream.format("snapshot_table").option("root", r)
        for k, v in opts.items():
            s = s.option(k, v)
        st.run_available_now(
            s.load(), str(tmp_path / o), str(tmp_path / c)
        )

    run(root, {"change_feed": "true", "start_version": "0"}, "o0", "c0")
    got = spark.read.parquet(str(tmp_path / "o0"))
    assert got.count() == 10
    assert {r._change_type for r in got.collect()} == {"insert"}
    # delete-carrying table, default start: CDF-appropriate guidance
    root2 = str(tmp_path / "mor")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root2)
    sn.snapshot_delete_where(spark, root2, "id = 1", keys=["id"])
    with pytest.raises(StreamingQueryException, match="start_version"):
        run(root2, {"change_feed": "true"}, "o1", "c1")


def test_replicate_snapshot_table_converges(spark, tmp_path):
    """Replication through the streamed change feed: the mirror — a
    first-class snapshot table fed by per-epoch MoR merges — converges
    to the source's merged state, restarts consume only new commits,
    and a replayed epoch is a no-op."""
    from data_engineering_challenge_spark.sources.snapshot_source import (
        replicate_snapshot_table,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    mk = lambda rows: spark.createDataFrame(rows, "k LONG, v LONG, _op STRING")
    sn.snapshot_mor_merge(spark, src, mk([(1, 10, "I"), (2, 20, "I")]), ["k"])
    sn.snapshot_mor_merge(
        spark, src, mk([(1, 11, "U"), (2, None, "D"), (3, 30, "I")]), ["k"]
    )

    def state(root):
        return {
            (r.k, r.v) for r in sn.read_snapshot_mor(spark, root).collect()
        }

    replicate_snapshot_table(spark, src, dst, ["k"], ckpt, start_version=1)
    # bootstrap from v1: the mirror holds v1's net effect (no v0 state,
    # started mid-history on purpose to exercise tombstones + inserts)
    assert state(dst) == {(1, 11), (3, 30)}
    # now a full-history mirror: fresh checkpoint from version 0
    dst2, ckpt2 = str(tmp_path / "dst2"), str(tmp_path / "ckpt2")
    replicate_snapshot_table(spark, src, dst2, ["k"], ckpt2, start_version=0)
    assert state(dst2) == state(src)
    # new source commits; restart consumes only the delta
    sn.snapshot_mor_merge(
        spark, src, mk([(3, 33, "U"), (1, None, "D")]), ["k"]
    )
    replicate_snapshot_table(spark, src, dst2, ["k"], ckpt2, start_version=0)
    assert state(dst2) == state(src) == {(3, 33)}
    n_versions = len(sn.snapshot_versions(dst2))
    # drained source: another run commits nothing new
    replicate_snapshot_table(spark, src, dst2, ["k"], ckpt2, start_version=0)
    assert len(sn.snapshot_versions(dst2)) == n_versions
    assert state(dst2) == state(src)


def test_replicate_refuses_duplicate_key_sources(spark, tmp_path):
    """A source with multiple live rows per key cannot be mirrored
    through keyed merges — loud refusal, never silent row loss."""
    import pytest
    from pyspark.errors import StreamingQueryException

    from data_engineering_challenge_spark.sources.snapshot_source import (
        replicate_snapshot_table,
    )

    src = str(tmp_path / "src")
    sn.snapshot_append(
        spark.createDataFrame([(1, 10), (1, 20), (2, 30)], "k LONG, v LONG")
        .coalesce(1),
        src,
    )
    with pytest.raises(StreamingQueryException, match="key-unique"):
        replicate_snapshot_table(
            spark,
            src,
            str(tmp_path / "dst"),
            ["k"],
            str(tmp_path / "ckpt"),
            start_version=0,
        )


# ---------------------------------------------------------------------------
# round 8: streaming consumers survive major compaction (row-content-
# preserving hops are skipped, never refused)
# ---------------------------------------------------------------------------


def test_stream_survives_compaction(spark, tmp_path):
    """A checkpointed plain stream crosses a small-file-packing compact
    hop WITHOUT replaying or duplicating rows: the compact hop emits
    nothing, later appends stream as usual."""
    root = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    sn.snapshot_append(_df(spark, 0, 20).coalesce(4), root)   # v0
    _drain(spark, root, out, ckpt)
    sn.snapshot_append(_df(spark, 20, 30).coalesce(4), root)  # v1
    v = sn.snapshot_compact(spark, root, target_file_bytes=1 << 20)
    assert v == 2, "the pack must commit"
    sn.snapshot_append(_df(spark, 30, 40).coalesce(1), root)  # v3
    _drain(spark, root, out, ckpt)
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(40)), "no replay, no loss, no duplicates"


def test_change_feed_survives_compaction(spark, tmp_path):
    """A checkpointed change-feed consumer crosses a delete-folding
    major compaction without replay — the folded deletes already
    streamed as tombstones when their commits fired (VERDICT r7 #2)."""
    import os

    register_snapshot_source(spark)
    root = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    mk = lambda rows: spark.createDataFrame(rows, "k LONG, v LONG, _op STRING")
    sn.snapshot_mor_merge(spark, root, mk([(1, 10, "I"), (2, 20, "I")]), ["k"])
    sn.snapshot_mor_merge(spark, root, mk([(1, 11, "U")]), ["k"])

    def drain():
        stream = (
            spark.readStream.format("snapshot_table")
            .option("root", root)
            .option("change_feed", "true")
            .option("start_version", "0")
            .load()
        )
        st.run_available_now(stream, out, ckpt)

    drain()
    v = sn.snapshot_compact(spark, root)  # folds the delete lists
    assert sn._read_manifest(root, v)["delete_files"] == []
    sn.snapshot_mor_merge(spark, root, mk([(3, 30, "I")]), ["k"])
    drain()  # crosses the compact hop on the SAME checkpoint
    rows = spark.read.parquet(out).collect()
    by_version = sorted(
        (r._commit_version, r._change_type, r.k) for r in rows
    )
    assert not any(cv == v for cv, _ct, _k in by_version), (
        "the compact hop must emit nothing"
    )
    assert (3, "insert", 3) in by_version, "post-compact commits stream"
    # every MoR merge emits a tombstone per touched key + its inserts:
    # v0 (I,I) -> 2+2, v1 (U) -> 1+1, v3 (I) -> 1+1 — nothing replayed
    assert (
        sum(1 for r in rows if r._change_type == "insert") == 4
        and sum(1 for r in rows if r._change_type == "delete") == 4
    ), by_version


def test_replicate_converges_across_maintenance(spark, tmp_path):
    """The advertised operating pattern: cron `maintain_snapshot` on
    the source MID-FEED; the replication mirror keeps converging on the
    same checkpoint instead of dying on the compaction hop."""
    from data_engineering_challenge_spark.sources.snapshot_source import (
        replicate_snapshot_table,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    mk = lambda rows: spark.createDataFrame(rows, "k LONG, v LONG, _op STRING")
    sn.snapshot_mor_merge(spark, src, mk([(k, k * 10, "I") for k in range(5)]), ["k"])
    sn.snapshot_mor_merge(spark, src, mk([(1, 111, "U"), (2, None, "D")]), ["k"])
    replicate_snapshot_table(spark, src, dst, ["k"], ckpt, start_version=0)

    def state(root):
        return {
            (r.k, r.v) for r in sn.read_snapshot_mor(spark, root).collect()
        }

    assert state(dst) == state(src)
    # cron maintenance compacts the source mid-feed
    did = sn.maintain_snapshot(spark, src, max_delete_files=0)
    assert did["compacted"] is not None
    sn.snapshot_mor_merge(spark, src, mk([(4, 444, "U"), (9, 90, "I")]), ["k"])
    replicate_snapshot_table(spark, src, dst, ["k"], ckpt, start_version=0)
    assert state(dst) == state(src) == {
        (0, 0), (1, 111), (3, 30), (4, 444), (9, 90)
    }


def test_stream_rate_limits_backfill_by_versions(spark, tmp_path):
    """max_versions_per_batch (Delta's maxFilesPerTrigger posture at
    version grain): a backfill over many commits plans BOUNDED
    micro-batches instead of one giant catch-up batch — verified at the
    offset-protocol level (initial → latest → partitions → commit), the
    same sequence the engine drives."""
    from data_engineering_challenge_spark.sources.snapshot_source import (
        SnapshotStreamReader,
    )

    root = str(tmp_path / "src")
    for i in range(6):  # v0..v5
        sn.snapshot_append(_df(spark, i * 10, i * 10 + 10).coalesce(1), root)
    schema = sn.read_snapshot(spark, root).schema
    r = SnapshotStreamReader(root, schema, max_versions_per_batch=2)
    seen_files = []
    start = r.initialOffset()
    assert start == {"version": -1}
    batches = 0
    while True:
        end = r.latestOffset()
        if end["version"] <= start["version"]:
            break
        assert end["version"] - start["version"] <= 2, (start, end)
        for part in r.partitions(start, end):
            seen_files.append(part.path)
        r.commit(end)
        start = end
        batches += 1
    assert batches == 3, "6 commits / cap 2 = 3 bounded batches"
    got = sorted(
        r2.id
        for f in seen_files
        for r2 in spark.read.parquet(f).collect()
    )
    assert got == list(range(60)), "rate limiting loses nothing"
    # a fresh commit resumes the cadence
    sn.snapshot_append(_df(spark, 60, 70).coalesce(1), root)
    end = r.latestOffset()
    assert end == {"version": 6}
    # the cap must be sane
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must be >= 1"):
        SnapshotStreamReader(root, schema, max_versions_per_batch=0)


def test_stream_rate_limits_by_files_splits_initial_snapshot(
    spark, tmp_path
):
    """max_files_per_trigger splits even the INITIAL SNAPSHOT across
    micro-batches at a deterministic sorted-file boundary; the split
    offsets are self-describing, so a reader WITHOUT the option
    re-plans a WAL-replayed batch identically."""
    from data_engineering_challenge_spark.sources.snapshot_source import (
        SnapshotStreamReader,
    )

    root = str(tmp_path / "src")
    sn.snapshot_append(_df(spark, 0, 60).repartition(6), root)  # 6 files
    schema = sn.read_snapshot(spark, root).schema
    r = SnapshotStreamReader(root, schema, max_files_per_trigger=2)
    start = r.initialOffset()
    offsets, seen = [start], []
    while True:
        end = r.latestOffset()
        if end == start:
            break
        parts = r.partitions(start, end)
        assert len(parts) <= 2, (start, end)
        seen.extend(p.path for p in parts)
        r.commit(end)
        offsets.append(end)
        start = end
    assert len(offsets) == 4, "6 files / cap 2 = 3 batches"
    assert offsets[1].get("snap") and offsets[2].get("snap")
    assert "snap" not in offsets[3] and "idx" not in offsets[3]
    got = sorted(
        x.id for f in seen for x in spark.read.parquet(f).collect()
    )
    assert got == list(range(60)), "splitting loses nothing"
    # self-describing: an UNLIMITED reader re-plans the same batch
    r2 = SnapshotStreamReader(root, schema)
    replay = [p.path for p in r2.partitions(offsets[1], offsets[2])]
    assert replay == [
        p for p in seen[2:4]
    ], "WAL-replayed split batch must plan identically without options"


def test_stream_rate_limits_by_files_across_commits(spark, tmp_path):
    """File-grain admission crosses commit boundaries: versions in a
    batch close complete, the last may split mid-version; coverage is
    exact and per-batch size bounded."""
    from data_engineering_challenge_spark.sources.snapshot_source import (
        SnapshotStreamReader,
    )

    root = str(tmp_path / "src")
    sn.snapshot_append(_df(spark, 0, 10).coalesce(1), root)  # v0: 1 file
    sn.snapshot_append(_df(spark, 10, 40).repartition(3), root)  # v1: 3
    sn.snapshot_append(_df(spark, 40, 60).repartition(2), root)  # v2: 2
    schema = sn.read_snapshot(spark, root).schema
    # consume v0 as the initial snapshot first (unlimited baseline)
    r = SnapshotStreamReader(root, schema, max_files_per_trigger=3)
    start = r.initialOffset()
    batches, seen = 0, []
    while True:
        end = r.latestOffset()
        if end == start:
            break
        parts = r.partitions(start, end)
        assert 1 <= len(parts) <= 3, (start, end)
        seen.extend(p.path for p in parts)
        r.commit(end)
        start = end
        batches += 1
    assert batches >= 2, "6 files under cap 3 need >= 2 batches"
    got = sorted(
        x.id for f in seen for x in spark.read.parquet(f).collect()
    )
    assert got == list(range(60))


def test_stream_rate_limits_by_bytes_and_refusals(spark, tmp_path):
    """A tiny byte cap degrades to one-file batches (progress is
    guaranteed — at least one file per trigger); file/byte caps refuse
    change_feed (commit events stay atomic) and non-positive values."""
    from data_engineering_challenge_spark.sources.snapshot_source import (
        SnapshotStreamReader,
    )

    root = str(tmp_path / "src")
    sn.snapshot_append(_df(spark, 0, 30).repartition(3), root)
    schema = sn.read_snapshot(spark, root).schema
    r = SnapshotStreamReader(root, schema, max_bytes_per_trigger=1)
    start = r.initialOffset()
    batches, seen = 0, []
    while True:
        end = r.latestOffset()
        if end == start:
            break
        parts = r.partitions(start, end)
        assert len(parts) == 1, "1-byte cap admits exactly one file"
        seen.extend(p.path for p in parts)
        r.commit(end)
        start = end
        batches += 1
    assert batches == 3
    got = sorted(
        x.id for f in seen for x in spark.read.parquet(f).collect()
    )
    assert got == list(range(30))
    with pytest.raises(ValueError, match="must be >= 1"):
        SnapshotStreamReader(root, schema, max_files_per_trigger=0)
    with pytest.raises(ValueError, match="atomic"):
        SnapshotStreamReader(
            root, schema, change_feed=True, max_files_per_trigger=2
        )


def test_stream_rate_limit_end_to_end(spark, tmp_path):
    """The option plumbs through the reader surface.  Spark's Python
    DataSource API falls back to SINGLE-batch execution under
    Trigger.AvailableNow (engine WARN), so one capped drain = one
    bounded micro-batch and the checkpoint carries the split offset —
    repeated drains page through the backfill exactly once, ≤cap files
    each (a continuous processingTime trigger would do the same
    without the restarts)."""
    root = str(tmp_path / "src")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    sn.snapshot_append(_df(spark, 0, 40).repartition(4), root)
    register_snapshot_source(spark)
    stream = (
        spark.readStream.format("snapshot_table")
        .option("root", root)
        .option("max_files_per_trigger", 2)
        .load()
    )
    counts = []
    for _ in range(5):
        st.run_available_now(stream, out, ckpt)
        counts.append(spark.read.parquet(out).count())
        if len(counts) >= 2 and counts[-1] == counts[-2]:
            break
    assert counts[0] < 40, f"first drain is capped at 2 of 4 files: {counts}"
    assert counts[-1] == 40, f"paging must complete the backfill: {counts}"
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(40)), "exactly once across split offsets"


def test_stream_snap_split_resume_without_caps_loses_nothing(
    spark, tmp_path
):
    """The data-loss review scenario: a stream stops MID-initial-
    snapshot (split offset checkpointed), commits land, and the stream
    resumes WITHOUT the file cap — the resume batch must plan the
    snapshot remainder PLUS the post-snapshot commits, not silently
    drop them."""
    from data_engineering_challenge_spark.sources.snapshot_source import (
        SnapshotStreamReader,
    )

    root = str(tmp_path / "src")
    sn.snapshot_append(_df(spark, 0, 40).repartition(4), root)  # v0
    schema = sn.read_snapshot(spark, root).schema
    r = SnapshotStreamReader(root, schema, max_files_per_trigger=2)
    start = r.initialOffset()
    mid = r.latestOffset()  # 2 of 4 snapshot files
    assert mid.get("snap") and mid["idx"] == 2
    first = [p.path for p in r.partitions(start, mid)]
    # "restart" without the option: the engine re-commits the
    # checkpointed offset before any latestOffset
    sn.snapshot_append(_df(spark, 40, 50).coalesce(1), root)  # v1
    r2 = SnapshotStreamReader(root, schema)
    r2.commit(mid)
    end = r2.latestOffset()
    assert end == {"version": 1}
    rest = [p.path for p in r2.partitions(mid, end)]
    got = sorted(
        x.id
        for f in first + rest
        for x in spark.read.parquet(f).collect()
    )
    assert got == list(range(50)), "resume must cover snapshot tail + v1"


def test_stream_version_cap_composes_with_file_cap(spark, tmp_path):
    """max_versions_per_batch keeps bounding WHICH version the initial
    snapshot pins even when a file cap coexists."""
    from data_engineering_challenge_spark.sources.snapshot_source import (
        SnapshotStreamReader,
    )

    root = str(tmp_path / "src")
    for i in range(4):  # v0..v3
        sn.snapshot_append(_df(spark, i * 10, i * 10 + 10).coalesce(1), root)
    schema = sn.read_snapshot(spark, root).schema
    r = SnapshotStreamReader(
        root, schema, max_versions_per_batch=1, max_files_per_trigger=100
    )
    r.initialOffset()
    end = r.latestOffset()
    assert end == {"version": 0}, (
        "the version cap pins the initial snapshot at v0, file cap or not"
    )


def test_stream_admission_grid_exactly_once(spark, tmp_path):
    """Exhaustive offset-protocol walk over one lineage (mixed file
    counts AND a mid-lineage major compaction) × a grid of admission
    caps × restart modes (none / fresh capped reader / fresh UNCAPPED
    reader at every batch boundary, primed the way the engine does):
    every walk must deliver the table's rows EXACTLY once — no cap
    combination, split offset, or restart may lose or duplicate a
    file — and every batch must respect the file cap."""
    from data_engineering_challenge_spark.sources.snapshot_source import (
        SnapshotStreamReader,
    )

    root = str(tmp_path / "src")
    sn.snapshot_append(_df(spark, 0, 30).repartition(3), root)   # v0
    sn.snapshot_append(_df(spark, 30, 40).coalesce(1), root)     # v1
    sn.snapshot_append(_df(spark, 40, 90).repartition(5), root)  # v2
    sn.snapshot_compact(spark, root)                             # v3
    sn.snapshot_append(_df(spark, 90, 110).repartition(2), root)  # v4
    schema = sn.read_snapshot(spark, root).schema
    want = sorted(r.id for r in sn.read_snapshot(spark, root).collect())

    def mk(capped):
        return SnapshotStreamReader(
            root,
            schema,
            max_files_per_trigger=caps[0] if capped else None,
            max_bytes_per_trigger=caps[1] if capped else None,
            max_versions_per_batch=caps[2] if capped else None,
        )

    grid = [
        (None, None, None),
        (1, None, None),
        (2, None, None),
        (3, None, None),
        (None, 1, None),
        (None, 10**12, None),
        (2, None, 1),
        (1, 1, 2),
        (None, None, 1),
        (None, None, 2),
    ]
    for caps in grid:
        for restart in ("none", "capped", "uncapped"):
            r = mk(True)
            cur_capped = True
            start = r.initialOffset()
            seen: list[str] = []
            for _ in range(40):
                end = r.latestOffset()
                if end == start:
                    break
                parts = r.partitions(start, end)
                if cur_capped and caps[0] is not None:
                    assert len(parts) <= caps[0], (caps, start, end)
                # a version-capped batch that lands exactly on a compact
                # hop is legitimately EMPTY (the hop contributes no
                # files; the engine tolerates an empty micro-batch)
                seen.extend(p.path for p in parts)
                r.commit(end)
                start = end
                if restart != "none":
                    # fresh reader; the engine re-commits the
                    # checkpointed offset before any latestOffset
                    cur_capped = restart == "capped"
                    r = mk(cur_capped)
                    r.commit(start)
            else:
                raise AssertionError(f"walk did not drain: {caps}")
            assert len(seen) == len(set(seen)), (
                f"file planned twice: {caps} {restart}"
            )
            got = sorted(
                x.id
                for f in seen
                for x in spark.read.parquet(f).collect()
            )
            assert got == want, (caps, restart)


def test_per_scan_pushdown_is_withdrawn(spark, tmp_path):
    """Round 10: the r8 DataSource pushFilters file pruning was
    WITHDRAWN after measurement — Spark 4.1 keeps ONE Python-
    DataSource read plan per RELATION (the last scan planned wins for
    every scan of it), so per-scan pruning silently LOST ROWS whenever
    a relation was scanned twice (a UNION over one attached view, or
    simply reusing a DataFrame after a filtered query returned
    one file's rows for a full count).  This test pins the SAFE
    contract that replaced it: (a) the 'pushdown' option refuses
    loudly with the explanation, (b) relation reuse is exact — a
    filtered query never changes what a later scan of the same
    DataFrame reads, including UNION branches with disjoint needs."""
    register_snapshot_source(spark)
    root = str(tmp_path / "tbl")
    df = spark.range(15000).selectExpr(
        "id AS okey", "id AS cust", "CAST(id AS DOUBLE) AS price"
    )
    sn.snapshot_append_clustered(df, root, ["okey"], n_files=8)
    with pytest.raises(Exception, match="WITHDRAWN"):
        (
            spark.read.format("snapshot_table")
            .option("root", root).option("pushdown", "true")
            .load().count()
        )
    r = spark.read.format("snapshot_table").option("root", root).load()
    # the poisoning shape: filtered query, then a FULL count on the
    # same DataFrame (under the withdrawn reader this returned one
    # file's rows), then a UNION whose branches need disjoint files
    assert r.filter("okey = 5").count() == 1
    assert r.count() == 15000
    r.createOrReplaceTempView("wd_v")
    got = {
        t[0]: t[1]
        for t in spark.sql(
            """SELECT 'range' d, COUNT(*) n FROM wd_v
               WHERE okey BETWEEN 1000 AND 4000
               UNION ALL SELECT 'point', COUNT(*) FROM wd_v
               WHERE cust = 14999
               UNION ALL SELECT 'all', COUNT(*) FROM wd_v"""
        ).collect()
    }
    assert got == {"range": 3001, "point": 1, "all": 15000}, got


def test_stream_accepts_add_only_evolution(spark, tmp_path):
    """ADD-only evolution (the common ALTER TABLE ADD COLUMN) keeps
    the table STREAMABLE (round 10): every live file binds its columns
    to same-named live fields, so the raw file feed equals the logical
    read and missing columns pad as NULL; renames/drops/defaulted adds
    still refuse loudly."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 5), root)
    sn.snapshot_evolve(root, adds={"tag": "string"})  # plain typed add
    sn.snapshot_append(
        spark.createDataFrame([(7, 14, "x")], "id long, v long, tag string"),
        root,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    _drain(spark, root, out, ckpt)
    got = {r["id"]: (r["v"], r["tag"]) for r in spark.read.parquet(out).collect()}
    assert got[7] == (14, "x") and got[0] == (0, None) and len(got) == 6
    # a defaulted add breaks the raw-read equivalence: refuse
    sn.snapshot_evolve(root, adds={"w": ("long", 9)})
    with pytest.raises(Exception, match="defaulted add|renames"):
        _drain(spark, root, out, str(tmp_path / "ck2"))
    # a renamed table refuses too
    root2 = str(tmp_path / "tbl2")
    sn.snapshot_append(_df(spark, 0, 3), root2)
    sn.snapshot_evolve(root2, renames={"v": "val"})
    with pytest.raises(Exception, match="renames/drops"):
        _drain(spark, root2, str(tmp_path / "o2"), str(tmp_path / "ck3"))


def test_stream_schema_includes_unmaterialized_typed_add(spark, tmp_path):
    """A typed ADD no file carries yet must still be in the stream
    schema (fixed at start) — otherwise files that later carry it have
    the column projected away for the stream's lifetime (review,
    round 10)."""
    root = str(tmp_path / "tbl")
    sn.snapshot_append(_df(spark, 0, 3), root)
    sn.snapshot_evolve(root, adds={"tag": "string"})
    register_snapshot_source(spark)
    stream = (
        spark.readStream.format("snapshot_table").option("root", root).load()
    )
    assert "tag" in stream.schema.fieldNames()
    out, ck = str(tmp_path / "o"), str(tmp_path / "c")
    st.run_available_now(stream, out, ck)
    sn.snapshot_append(
        spark.createDataFrame([(9, 18, "x")], "id long, v long, tag string"),
        root,
    )
    _drain(spark, root, out, ck)
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert (9, 18, "x") in got and (0, 0, None) in got
