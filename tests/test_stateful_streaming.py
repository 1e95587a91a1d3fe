"""applyInPandasWithState custom operator + schema'd CSV round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_challenge_spark import roles
from data_engineering_challenge_spark.streaming import incremental as st
from data_engineering_challenge_spark.streaming.stateful import streaming_first_seen


def test_streaming_first_seen_dedup(spark, tmp_path):
    events = roles.load_events(spark, "/root/testdata/sf0.001")
    # fingerprint with deliberate collisions: event_type|value-bucket
    src = events.select(
        "user_id",
        F.concat_ws(
            "|", "event_type", (F.col("value") * 10).cast("int").cast("string")
        ).alias("fingerprint"),
        F.unix_micros("ts").alias("ts_us"),
    )
    src.write.parquet(str(tmp_path / "src"))

    stream = spark.readStream.schema(src.schema).parquet(str(tmp_path / "src"))
    out = streaming_first_seen(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(str(tmp_path / "out"))
    batch_expected = src.select("user_id", "fingerprint").distinct().count()
    assert got.count() == batch_expected
    # seq numbers are 1..n per user with no gaps
    per_user = (
        got.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("seq_no").alias("mx"))
        .collect()
    )
    for r in per_user:
        assert r.n == r.mx


def test_daily_counts_append_cutoff(spark, tmp_path):
    """Pins the append-mode finalization rule the streaming_window_counts
    oracle encodes: a window row is emitted iff window_end <= max(ts) -
    watermark horizon, and the emitted aggregates equal the batch ones."""
    import datetime as dt

    rows = []
    eid = 0
    for day in (1, 2, 3, 4):
        for h in (0, 12):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, day, h, 30), eid, "click", float(eid), "{}")
            )
    # max ts = Mar 4 12:30 -> watermark Mar 3 12:30: windows ending Mar 2,
    # Mar 3 00:00 emit (days 1, 2); day-3 window ends Mar 4 00:00 > wm.
    src = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    src.write.parquet(str(tmp_path / "events"))
    stream = st.read_events_stream(spark, str(tmp_path / "events"))
    st.run_available_now(
        st.daily_counts(stream), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    got = {
        r.day_start.day: (r.n_events, r.total_value)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert set(got) == {1, 2}
    batch = {
        r.d.day: (r.n, r.v)
        for r in src.groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    for day in (1, 2):
        assert got[day] == batch[day]


def test_csv_round_trip_with_schema(spark, tmp_path):
    """§2.1 CSV source/sink: schema'd read preserves types (the reference's
    CSV round-trip silently re-infers, run_pipeline.py:98)."""
    from data_engineering_challenge_spark.sources import io as eio

    events = roles.load_events(spark, "/root/testdata/sf0.001").limit(50)
    out = events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "user_id",
        "event_type",
        "value",
    )
    eio.write_csv(out, str(tmp_path / "ev.csv"), single_file=True)

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts_str", StringType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    back = eio.read_csv(spark, str(tmp_path / "ev.csv"), schema)
    assert back.schema == schema
    assert back.count() == 50
    a = {r.event_id: r.value for r in out.collect()}
    b = {r.event_id: r.value for r in back.collect()}
    assert a == b


def test_stream_stream_journeys_matches_batch(spark, tmp_path):
    """Stream-stream join with watermarks + two-sided time bound equals the
    batch as-of join under the same lookback window."""
    from data_engineering_challenge_spark.operators import journeys as jny

    sf = "/root/testdata/sf0.001"
    events = roles.load_events(spark, sf)
    sessions = roles.sessions_from_events(events)
    conversions = roles.conversions_from_events(events)
    sessions.write.parquet(str(tmp_path / "sess"))
    conversions.write.parquet(str(tmp_path / "conv"))

    s_stream = spark.readStream.schema(sessions.schema).parquet(str(tmp_path / "sess"))
    # streaming sessions keep event_id naming via roles mapping
    s_stream = s_stream.withColumnRenamed("session_id", "event_id").withColumnRenamed(
        "channel_name", "event_type"
    )
    c_stream = spark.readStream.schema(conversions.schema).parquet(str(tmp_path / "conv"))
    j = st.incremental_journeys_stream_stream(s_stream, c_stream, lookback_days=30)
    st.run_available_now(j, str(tmp_path / "out"), str(tmp_path / "ckpt"))
    got = spark.read.parquet(str(tmp_path / "out"))

    expected = jny.build_journeys(conversions, sessions, lookback_days=30).select(
        "conversion_id", "session_id"
    )
    assert got.count() == expected.count()
    assert got.select("conversion_id", "session_id").exceptAll(expected).count() == 0


def test_foreach_batch_upsert_idempotent(spark, tmp_path):
    """Replaying a batch with overlapping keys REPLACES those keys — no
    duplicate rows after a re-run (the reference's delete+insert
    idempotency, streaming form)."""
    from pyspark.sql import Row

    path = str(tmp_path / "table")
    src1 = str(tmp_path / "in1")
    spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b")]
    ).write.parquet(src1)
    stream = spark.readStream.schema("k long, v string").parquet(src1)
    st.run_foreach_batch_upsert(stream, path, str(tmp_path / "ck1"), keys=["k"])
    assert {(r.k, r.v) for r in spark.read.parquet(path).collect()} == {
        (1, "a"), (2, "b")
    }

    # second run from a NEW source dir (fresh checkpoint): k=2 updated, k=3 new
    src2 = str(tmp_path / "in2")
    spark.createDataFrame(
        [Row(k=2, v="B"), Row(k=3, v="c")]
    ).write.parquet(src2)
    stream2 = spark.readStream.schema("k long, v string").parquet(src2)
    st.run_foreach_batch_upsert(stream2, path, str(tmp_path / "ck2"), keys=["k"])
    assert {(r.k, r.v) for r in spark.read.parquet(path).collect()} == {
        (1, "a"), (2, "B"), (3, "c")
    }


def test_incremental_attribution_delta_recompute(spark, tmp_path):
    """Incremental attribution across multiple micro-batches equals the
    batch pipeline: per batch only touched conversions recompute, from
    their full accumulated journeys."""
    from data_engineering_challenge_spark.operators import attribution as attr
    from data_engineering_challenge_spark.operators import journeys as jny

    sf = "/root/testdata/sf0.001"
    events = roles.load_events(spark, sf)
    sessions = roles.sessions_from_events(events)
    conversions = roles.conversions_from_events(events)

    # split the session feed into 4 files -> maxFilesPerTrigger=1 gives 4
    # genuine micro-batches with overlapping users/conversions
    src = str(tmp_path / "sessions")
    sessions.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(sessions.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumnRenamed("session_id", "event_id")
        .withColumnRenamed("channel_name", "event_type")
    )

    jpath = str(tmp_path / "journeys")
    apath = str(tmp_path / "attribution")
    st.incremental_attribution(
        stream, conversions, jpath, apath, str(tmp_path / "ckpt")
    )

    got = st.read_merged(spark, apath)
    expected = attr.attribute_linear(jny.build_journeys(conversions, sessions))
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_overwrite_by_key_corrupt_table_fails_loud(spark, tmp_path):
    """An unreadable existing table must FAIL the batch — never be treated
    as 'first batch' (which would overwrite all accumulated history with
    one micro-batch).  Table absence is decided by an explicit FileSystem
    check, not by catching read errors."""
    import os

    import pytest
    from pyspark.sql import Row

    path = str(tmp_path / "table")
    os.makedirs(path)
    with open(os.path.join(path, "part-00000.parquet"), "wb") as f:
        f.write(b"this is not a parquet file")

    batch = spark.createDataFrame([Row(k=1, v="x")])
    with pytest.raises(Exception):
        st.overwrite_by_key(batch, path, ["k"])
    # the corrupt table was left in place for recovery, not replaced
    with open(os.path.join(path, "part-00000.parquet"), "rb") as f:
        assert f.read() == b"this is not a parquet file"


def test_overwrite_by_key_leaves_no_temp_dirs(spark, tmp_path):
    """The temp-write + rename swap must clean up after itself on success."""
    import os

    from pyspark.sql import Row

    path = str(tmp_path / "table")
    st.overwrite_by_key(spark.createDataFrame([Row(k=1, v="a")]), path, ["k"])
    st.overwrite_by_key(spark.createDataFrame([Row(k=1, v="A"), Row(k=2, v="b")]), path, ["k"])
    assert {(r.k, r.v) for r in spark.read.parquet(path).collect()} == {
        (1, "A"), (2, "b")
    }
    leftovers = [d for d in os.listdir(tmp_path) if "._" in d]
    assert leftovers == []


def test_overwrite_by_key_recovers_interrupted_swap(spark, tmp_path):
    """Crash window between the two swap renames: the target is absent and
    the complete merged table sits in ``._inprogress``.  A replayed batch
    must RESTORE that history and merge on top of it — not take the
    first-batch branch and replace everything with one micro-batch, and not
    destroy the recovery copies."""
    import os
    import shutil

    from pyspark.sql import Row

    path = str(tmp_path / "table")
    # history the interrupted swap was publishing: keys 1..3
    st.overwrite_by_key(
        spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
        ),
        path,
        ["k"],
    )
    # simulate the crash: complete new table in ._inprogress, previous table
    # moved aside to ._replaced, target gone
    os.rename(path, path + "._inprogress")
    spark.createDataFrame([Row(k=1, v="stale")]).write.parquet(
        path + "._replaced"
    )

    # foreachBatch replay of a batch touching only key 3
    st.overwrite_by_key(
        spark.createDataFrame([Row(k=3, v="C")]), path, ["k"]
    )

    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "C")}  # history survived
    assert [d for d in os.listdir(tmp_path) if "._" in d] == []
    shutil.rmtree(path)

    # ._replaced alone (publish rename + rollback both failed): the old
    # table is the best surviving copy and must be restored, not ignored
    spark.createDataFrame([Row(k=9, v="old")]).write.parquet(
        path + "._replaced"
    )
    st.overwrite_by_key(
        spark.createDataFrame([Row(k=10, v="new")]), path, ["k"]
    )
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(9, "old"), (10, "new")}


def test_streaming_dedup_drops_redelivered(spark, tmp_path):
    """An at-least-once feed delivering every event twice must come out of
    streaming_dedup with each event_id exactly once — equal to the batch
    distinct — and with state bounded by the watermark (the scale
    property: plain dropDuplicates state grows with every key ever)."""
    sf = "/root/testdata/sf0.001"
    events = roles.load_events(spark, sf)
    src = str(tmp_path / "events")
    events.write.mode("overwrite").parquet(src)
    events.write.mode("append").parquet(src)  # replay

    stream = st.read_events_stream(spark, src)
    out = str(tmp_path / "out")
    st.run_available_now(st.streaming_dedup(stream), out, str(tmp_path / "ck"))

    got = spark.read.parquet(out)
    n_distinct = events.select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_incremental_report_equals_batch(spark, tmp_path):
    """End-to-end incremental materialized-view maintenance: streaming the
    session feed in 4 micro-batches and delta-maintaining journeys ->
    attribution -> report must land the EXACT batch report (decimal-exact
    sums make the comparison bit-level, not approximate)."""
    from data_engineering_challenge_spark.operators import attribution as attr
    from data_engineering_challenge_spark.operators import journeys as jny
    from data_engineering_challenge_spark.operators import report as rpt

    sf = "/root/testdata/sf0.001"
    events = roles.load_events(spark, sf)
    sessions = roles.sessions_from_events(events)
    conversions = roles.conversions_from_events(events)
    costs = roles.session_costs_from_events(events)

    src = str(tmp_path / "sessions")
    sessions.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(sessions.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumnRenamed("session_id", "event_id")
        .withColumnRenamed("channel_name", "event_type")
    )

    st.incremental_report(
        stream, conversions, sessions, costs,
        str(tmp_path / "journeys"), str(tmp_path / "attribution"),
        str(tmp_path / "report"), str(tmp_path / "ckpt"),
    )

    got = st.read_merged(spark, str(tmp_path / "report"))
    expected = rpt.channel_report(
        sessions, costs,
        attr.attribute_linear(jny.build_journeys(conversions, sessions)),
        conversions, exact_sums=True,
    )
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_incremental_report_prunes_to_touched_partitions(spark, tmp_path):
    """The materialized-view claim made checkable: with a DATE-PARTITIONED
    sessions table and micro-batches each touching ONE date, every batch's
    report recompute must carry a static ``PartitionFilters: [date IN
    (<touched>)]`` on the sessions scan — only the touched partitions are
    read, so per-batch work is proportional to touched (channel, date)
    groups, not to history."""
    import datetime as dt

    from pyspark.sql import Row, functions as F

    days = [dt.datetime(2024, 1, d) for d in (1, 2, 3)]
    sess_rows, cost_rows, conv_rows = [], [], []
    for i, day in enumerate(days, 1):
        for k in range(4):
            sid = f"u{i}-s{k}"
            sess_rows.append(
                Row(
                    session_id=sid,
                    user_id=f"u{i}",
                    ts=day + dt.timedelta(hours=k),
                    channel_name=f"ch{k % 2}",
                    holder_engagement=k % 2,
                    closer_engagement=(k + 1) % 2,
                    impression_interaction=0,
                )
            )
            cost_rows.append(Row(session_id=sid, cost=1.5))
        conv_rows.append(
            Row(
                conv_id=f"u{i}-c",
                user_id=f"u{i}",
                conv_ts=day + dt.timedelta(hours=10),
                revenue=100.0,
            )
        )
    conversions = spark.createDataFrame(conv_rows)
    costs = spark.createDataFrame(cost_rows)

    # the accumulated sessions table, PARTITIONED BY date
    static_path = str(tmp_path / "sessions_static")
    spark.createDataFrame(sess_rows).withColumn(
        "date", F.to_date("ts")
    ).write.partitionBy("date").parquet(static_path)
    sessions_static = spark.read.parquet(static_path)

    # stream source: one file per day -> each micro-batch touches ONE date
    src = str(tmp_path / "src")
    for i in (1, 2, 3):
        spark.createDataFrame(
            [r for r in sess_rows if r.user_id == f"u{i}"]
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumnRenamed("session_id", "event_id")
        .withColumnRenamed("channel_name", "event_type")
    )

    plans = []
    st.incremental_report(
        stream, conversions, sessions_static, costs,
        str(tmp_path / "journeys"), str(tmp_path / "attribution"),
        str(tmp_path / "report"), str(tmp_path / "ckpt"),
        plan_probe=lambda df: plans.append(
            df._jdf.queryExecution().executedPlan().toString()
        ),
    )

    assert len(plans) == 3
    all_dates = {"2024-01-01", "2024-01-02", "2024-01-03"}
    seen_pruned = set()
    for plan in plans:
        pf_lines = [
            ln for ln in plan.splitlines()
            if "PartitionFilters" in ln and "date" in ln
        ]
        assert pf_lines, plan  # the sessions scan IS partition-filtered
        # each batch touches exactly one user == one date: the IN list must
        # name exactly one partition, so 2 of 3 partitions are never read
        for ln in pf_lines:
            present = {d for d in all_dates if d in ln}
            assert len(present) == 1, ln
            seen_pruned |= present
    assert seen_pruned == all_dates  # across batches every date had a turn

    # and the maintained report still equals the batch recompute
    from data_engineering_challenge_spark.operators import attribution as attr
    from data_engineering_challenge_spark.operators import journeys as jny
    from data_engineering_challenge_spark.operators import report as rpt

    sessions = spark.createDataFrame(sess_rows)
    got = st.read_merged(spark, str(tmp_path / "report"))
    expected = rpt.channel_report(
        sessions, costs,
        attr.attribute_linear(jny.build_journeys(conversions, sessions)),
        conversions, exact_sums=True,
    )
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_apply_cdc_insert_update_delete(spark, tmp_path):
    """CDC apply: upserts replace by key, deletes remove the key (payload
    ignored), last change per key within a batch wins, replays are
    idempotent, and deletes of absent keys are no-ops."""
    import os

    from pyspark.sql import Row

    path = str(tmp_path / "table")
    b1 = spark.createDataFrame(
        [
            Row(k=1, v="a", _op="I"),
            Row(k=2, v="b", _op="I"),
            Row(k=3, v="c", _op="I"),
        ]
    )
    st.apply_cdc(b1, path, ["k"])
    assert {(r.k, r.v) for r in spark.read.parquet(path).collect()} == {
        (1, "a"), (2, "b"), (3, "c")
    }

    # update k=1, delete k=2, and a same-batch I-then-D on k=4 (last wins)
    b2 = spark.createDataFrame(
        [
            Row(k=1, v="A", _op="U"),
            Row(k=2, v=None, _op="D"),
            Row(k=4, v="d", _op="I"),
            Row(k=4, v=None, _op="D"),
            Row(k=9, v=None, _op="D"),  # absent key: no-op
        ]
    )
    st.apply_cdc(b2, path, ["k"])
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "A"), (3, "c")}

    st.apply_cdc(b2, path, ["k"])  # replayed delivery: unchanged
    assert {(r.k, r.v) for r in spark.read.parquet(path).collect()} == got
    assert [d for d in os.listdir(tmp_path) if "._" in d] == []


def test_run_foreach_batch_cdc_stream(spark, tmp_path):
    """The streaming wrapper applies a change feed end-to-end."""
    from pyspark.sql import Row

    path = str(tmp_path / "table")
    src = str(tmp_path / "feed")
    spark.createDataFrame(
        [Row(k=1, v="a", _op="I"), Row(k=2, v="b", _op="I")]
    ).write.parquet(src)
    stream = spark.readStream.schema("k long, v string, _op string").parquet(src)
    st.run_foreach_batch_cdc(stream, path, str(tmp_path / "ck1"), keys=["k"])

    spark.createDataFrame(
        [Row(k=1, v=None, _op="D"), Row(k=3, v="c", _op="I")]
    ).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema("k long, v string, _op string").parquet(src)
    st.run_foreach_batch_cdc(stream2, path, str(tmp_path / "ck1"), keys=["k"])

    assert {(r.k, r.v) for r in spark.read.parquet(path).collect()} == {
        (2, "b"), (3, "c")
    }


def _file_identity(root):
    """(relative path, mtime_ns, size) of every data file under ``root``."""
    import os

    out = set()
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root)
            stt = os.stat(p)
            out.add((rel, stt.st_mtime_ns, stt.st_size))
    return out


def test_merge_rewrites_only_touched_partitions(spark, tmp_path):
    """THE scale property of the partition-restricted merge: a batch must
    leave every key-bucket partition it does not touch PHYSICALLY
    untouched — same file paths, mtimes, and sizes — and rewrite only the
    ``_kb=`` directories containing its keys.  (The whole-table merge this
    replaces rewrote 100% of the files per micro-batch: per-batch I/O ∝
    table, the round-4 scale-killer.)"""
    import os

    from pyspark.sql import Row

    path = str(tmp_path / "table")
    base = spark.createDataFrame([Row(k=i, v=f"v{i}") for i in range(200)])
    st.overwrite_by_key(base, path, ["k"], num_buckets=16)
    parts = {d for d in os.listdir(path) if d.startswith("_kb=")}
    assert len(parts) > 4  # 200 keys spread over 16 buckets

    before = {d: _file_identity(os.path.join(path, d)) for d in parts}

    # one-key batch: exactly the buckets of {7} may change
    st.overwrite_by_key(
        spark.createDataFrame([Row(k=7, v="NEW")]), path, ["k"], num_buckets=16
    )
    from data_engineering_challenge_spark.streaming.incremental import (
        BUCKET_COL, _bucket_of,
    )

    touched = {
        f"_kb={r[0]}"
        for r in spark.createDataFrame([Row(k=7)])
        .select(_bucket_of(["k"], 16).alias(BUCKET_COL))
        .collect()
    }
    after = {d: _file_identity(os.path.join(path, d)) for d in parts}
    for d in parts - touched:
        assert after[d] == before[d], f"untouched partition {d} was rewritten"
    for d in touched:
        assert after[d] != before[d], f"touched partition {d} unchanged"

    # and the merge semantics held
    got = {(r.k, r.v) for r in st.read_merged(spark, path).collect()}
    assert got == {(i, "NEW" if i == 7 else f"v{i}") for i in range(200)}


def test_apply_cdc_rewrites_only_touched_partitions(spark, tmp_path):
    """Same file-identity property for the CDC merge, including a delete."""
    import os

    from pyspark.sql import Row

    path = str(tmp_path / "table")
    st.apply_cdc(
        spark.createDataFrame(
            [Row(k=i, v=f"v{i}", _op="I") for i in range(100)]
        ),
        path,
        ["k"],
        num_buckets=8,
    )
    parts = {d for d in os.listdir(path) if d.startswith("_kb=")}
    before = {d: _file_identity(os.path.join(path, d)) for d in parts}

    batch = spark.createDataFrame(
        [Row(k=3, v="X", _op="U"), Row(k=4, v=None, _op="D")]
    )
    st.apply_cdc(batch, path, ["k"], num_buckets=8)

    from data_engineering_challenge_spark.streaming.incremental import (
        BUCKET_COL, _bucket_of,
    )

    touched = {
        f"_kb={r[0]}"
        for r in spark.createDataFrame([Row(k=3), Row(k=4)])
        .select(_bucket_of(["k"], 8).alias(BUCKET_COL))
        .collect()
    }
    after = {d: _file_identity(os.path.join(path, d)) for d in parts}
    for d in parts - touched:
        assert after[d] == before[d], f"untouched partition {d} was rewritten"

    got = {(r.k, r.v) for r in st.read_merged(spark, path).collect()}
    expected = {(i, f"v{i}") for i in range(100)} - {(3, "v3"), (4, "v4")}
    expected.add((3, "X"))
    assert got == expected


def test_apply_cdc_seq_col_orders_collisions(spark, tmp_path):
    """Same-key collisions must resolve by the feed's sequence column when
    given — and DEMONSTRABLY by arrival order when not: the two orderings
    disagree on this fixture, proving seq_col is load-bearing (a replayed/
    shuffled feed without it can resurrect an overwritten value)."""
    import shutil

    from pyspark.sql import Row

    path = str(tmp_path / "table")
    # arrival order (row order) is the REVERSE of commit order (lsn)
    rows = [
        Row(k=1, v="newest", lsn=5, _op="U"),
        Row(k=1, v="older", lsn=2, _op="U"),
        Row(k=1, v="oldest", lsn=1, _op="I"),
    ]
    batch = spark.createDataFrame(rows).coalesce(1)

    st.apply_cdc(batch, path, ["k"], seq_col="lsn")
    assert [(r.k, r.v) for r in st.read_merged(spark, path).collect()] == [
        (1, "newest")
    ]
    shutil.rmtree(path)

    # without seq_col, arrival order wins: the LAST row (lowest lsn) sticks
    st.apply_cdc(batch, path, ["k"])
    assert [(r.k, r.v) for r in st.read_merged(spark, path).collect()] == [
        (1, "oldest")
    ]


def test_apply_cdc_rejects_malformed_ops(spark, tmp_path):
    """A NULL or unknown op value must FAIL the batch — a NULL op would
    otherwise slip through a null-rejecting `!= 'D'` filter while its key
    is still anti-joined out of the table: a malformed record silently
    DELETING data.  Fail-loud, same posture as the corrupt-table check."""
    import pytest
    from pyspark.sql import Row

    path = str(tmp_path / "table")
    st.apply_cdc(
        spark.createDataFrame([Row(k=1, v="a", _op="I")]), path, ["k"]
    )

    with pytest.raises(ValueError, match="_op"):
        st.apply_cdc(
            spark.createDataFrame(
                [Row(k=1, v=None, _op=None)], "k long, v string, _op string"
            ),
            path,
            ["k"],
        )
    with pytest.raises(ValueError, match="_op"):
        st.apply_cdc(
            spark.createDataFrame([Row(k=1, v="x", _op="upsert")]), path, ["k"]
        )
    # table untouched by both failed batches
    assert {(r.k, r.v) for r in st.read_merged(spark, path).collect()} == {
        (1, "a")
    }


def test_merge_recovers_partition_level_crash_states(spark, tmp_path):
    """Partition-swap crash machine: (a) a complete ``._inprogress``
    partition with its target moved aside is published; (b) a lone
    ``._replaced`` is restored; (c) leftovers next to a LIVE partition are
    stale and cleared; (d) a stale ``._staging`` sibling is cleared.  All
    hidden names — a reader mid-crash never sees a malformed partition."""
    import os
    import shutil

    from pyspark.sql import Row

    from data_engineering_challenge_spark.sources import io

    path = str(tmp_path / "table")
    base = spark.createDataFrame([Row(k=i, v=f"v{i}") for i in range(50)])
    st.overwrite_by_key(base, path, ["k"], num_buckets=4)
    parts = sorted(d for d in os.listdir(path) if d.startswith("_kb="))
    assert len(parts) >= 3
    pa, pb, pc = parts[0], parts[1], parts[2]

    # (a) crash between renames: target gone, complete temp in ._inprogress
    os.rename(os.path.join(path, pa), os.path.join(path, f".{pa}._inprogress"))
    # (b) publish+rollback both failed: only ._replaced holds the data
    os.rename(os.path.join(path, pb), os.path.join(path, f".{pb}._replaced"))
    # (c) stale leftovers next to a live partition
    shutil.copytree(
        os.path.join(path, pc), os.path.join(path, f".{pc}._inprogress")
    )
    # (d) stale staging sibling from a crashed staging write
    os.makedirs(path + "._staging/_kb=0")

    io.recover_partition_swaps(spark, path)

    assert sorted(
        d for d in os.listdir(path) if d.startswith("_kb=")
    ) == parts
    assert not any(d.endswith(("._inprogress", "._replaced")) for d in os.listdir(path))
    assert not os.path.exists(path + "._staging")
    got = {(r.k, r.v) for r in st.read_merged(spark, path).collect()}
    assert got == {(i, f"v{i}") for i in range(50)}

    # and a merge straight through the same crash state also self-heals
    os.rename(os.path.join(path, pa), os.path.join(path, f".{pa}._inprogress"))
    st.overwrite_by_key(
        spark.createDataFrame([Row(k=0, v="Z")]), path, ["k"], num_buckets=4
    )
    got = {(r.k, r.v) for r in st.read_merged(spark, path).collect()}
    assert got == {(i, "Z" if i == 0 else f"v{i}") for i in range(50)}


def test_publish_atomic_discards_torn_first_write(spark, tmp_path):
    """First-ever publish crash MID-WRITE: the ``._inprogress`` temp is
    half-written (no ``_SUCCESS`` job-commit marker, no ``._replaced``
    since no prior table was moved aside).  Recovery must NOT install the
    torn directory as the live table — it is discarded, and the caller's
    replayed batch regenerates it."""
    import os

    from pyspark.sql import Row

    from data_engineering_challenge_spark.sources import io

    path = str(tmp_path / "table")
    # half-written temp: parquet file present but the job never committed
    tmp = path + "._inprogress"
    spark.createDataFrame([Row(k=1, v="torn")]).write.parquet(tmp)
    os.remove(os.path.join(tmp, "_SUCCESS"))

    assert io.recover_interrupted_swap(spark, path) is False
    assert not os.path.exists(path)
    assert not os.path.exists(tmp)  # torn temp discarded, not published

    # the replayed batch then takes the clean first-batch branch
    st.overwrite_by_key(
        spark.createDataFrame([Row(k=1, v="good")]), path, ["k"]
    )
    assert {(r.k, r.v) for r in st.read_merged(spark, path).collect()} == {
        (1, "good")
    }


def test_merge_empty_table_roundtrip(spark, tmp_path):
    """Deleting every key must leave a READABLE empty table (zero-partition
    parquet is not readable — the merge falls back to a flat empty write),
    and the table must accept subsequent batches."""
    from pyspark.sql import Row

    path = str(tmp_path / "table")
    st.apply_cdc(
        spark.createDataFrame(
            [Row(k=1, v="a", _op="I"), Row(k=2, v="b", _op="I")]
        ),
        path,
        ["k"],
        num_buckets=4,
    )
    st.apply_cdc(
        spark.createDataFrame(
            [Row(k=1, v=None, _op="D"), Row(k=2, v=None, _op="D")],
            "k long, v string, _op string",
        ),
        path,
        ["k"],
        num_buckets=4,
    )
    assert st.read_merged(spark, path).count() == 0

    st.apply_cdc(
        spark.createDataFrame([Row(k=3, v="c", _op="I")]),
        path,
        ["k"],
        num_buckets=4,
    )
    assert {(r.k, r.v) for r in st.read_merged(spark, path).collect()} == {
        (3, "c")
    }


def test_merge_read_is_partition_pruned(spark, tmp_path):
    """Read-side twin of the file-identity test: the merge's scan of the
    existing table must carry ``PartitionFilters: [_kb IN (...)]`` — the
    touched-bucket list lands as a PLANNING-time partition filter, so
    untouched partitions are never read, not just never written."""
    from pyspark.sql import Row

    path = str(tmp_path / "table")
    st.overwrite_by_key(
        spark.createDataFrame([Row(k=i, v=f"v{i}") for i in range(100)]),
        path,
        ["k"],
        num_buckets=16,
    )

    plans = []
    st._MERGE_PLAN_PROBE = lambda df: plans.append(
        df._jdf.queryExecution().executedPlan().toString()
    )
    try:
        st.overwrite_by_key(
            spark.createDataFrame([Row(k=7, v="NEW")]), path, ["k"],
            num_buckets=16,
        )
    finally:
        st._MERGE_PLAN_PROBE = None

    assert len(plans) == 1
    pf = [ln for ln in plans[0].splitlines() if "PartitionFilters" in ln]
    # one-key batch -> one bucket: Catalyst renders the single-element IN
    # as an equality on the partition column (multi-bucket batches keep IN)
    import re

    assert pf and "_kb" in pf[0], plans[0]
    assert re.search(r"_kb#\d+ = \d+\)", pf[0]) or " IN " in pf[0], pf[0]
    assert "PartitionFilters: []" not in pf[0], pf[0]


def test_merge_writes_one_file_per_touched_partition(spark, tmp_path):
    """Small-file discipline: each touched ``_kb=`` directory holds ONE
    data file after a merge (the staging write hash-repartitions on the
    bucket column) — without it every write task drops a sliver into
    every touched directory and the table accretes files per batch."""
    import glob

    from pyspark.sql import Row

    path = str(tmp_path / "table")
    st.overwrite_by_key(
        spark.createDataFrame(
            [Row(k=i, v=f"v{i}") for i in range(500)]
        ).repartition(8),
        path,
        ["k"],
        num_buckets=8,
    )
    # touch every bucket so every directory goes through the merge path
    st.overwrite_by_key(
        spark.createDataFrame(
            [Row(k=i, v=f"V{i}") for i in range(500)]
        ).repartition(8),
        path,
        ["k"],
        num_buckets=8,
    )
    import os

    for d in os.listdir(path):
        if d.startswith("_kb="):
            files = glob.glob(os.path.join(path, d, "part-*"))
            assert len(files) == 1, (d, files)
    got = {(r.k, r.v) for r in st.read_merged(spark, path).collect()}
    assert got == {(i, f"V{i}") for i in range(500)}


def test_compact_preserves_bucket_layout(spark, tmp_path):
    """compact_parquet on a merge-maintained table must keep the ``_kb=``
    partition layout (flattening would silently destroy the pruning every
    later merge depends on) and preserve content exactly."""
    import os

    from pyspark.sql import Row

    from data_engineering_challenge_spark.sources import io

    path = str(tmp_path / "table")
    st.apply_cdc(
        spark.createDataFrame(
            [Row(k=i, v=f"v{i}", _op="I") for i in range(200)]
        ),
        path,
        ["k"],
        num_buckets=8,
    )
    parts_before = sorted(d for d in os.listdir(path) if d.startswith("_kb="))
    io.compact_parquet(spark, path)
    parts_after = sorted(d for d in os.listdir(path) if d.startswith("_kb="))
    assert parts_after == parts_before
    got = {(r.k, r.v) for r in st.read_merged(spark, path).collect()}
    assert got == {(i, f"v{i}") for i in range(200)}
    # and a merge still works (layout intact end-to-end)
    st.apply_cdc(
        spark.createDataFrame([Row(k=0, v="Z", _op="U")]), path, ["k"],
        num_buckets=8,
    )
    assert ("0", ) not in got  # sanity: keys are ints
    got2 = {(r.k, r.v) for r in st.read_merged(spark, path).collect()}
    assert got2 == (got - {(0, "v0")}) | {(0, "Z")}


def test_sessionize_stream_boundary_and_cutoff(spark, tmp_path):
    """Pins the two rules the streaming_sessionize oracle encodes:
    (1) session_window MERGES touching intervals — an exactly-30-minute
    gap stays ONE session (the same > 30 min split rule as the batch
    sessionizer); only a strictly-larger gap splits; (2) append mode
    emits a session iff session_end (last event + gap) <= max(ts) -
    watermark horizon."""
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1, 0, 0)
    rows = [
        # user 1: exactly-30:00 gap (merge), then 30:01 gap (split)
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 1, "click", 2.0, "{}"),
        (3, t0 + dt.timedelta(minutes=60, seconds=1), 1, "click", 4.0, "{}"),
        # user 2: a late event that holds the watermark forward
        (4, t0 + dt.timedelta(hours=4), 2, "click", 8.0, "{}"),
    ]
    src = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    src.write.parquet(str(tmp_path / "events"))
    stream = st.read_events_stream(spark, str(tmp_path / "events"))
    st.run_available_now(
        st.sessionize_stream(stream), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    got = {
        (r.user_id, r.n_events, r.total_value)
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    # watermark = 04:00 - 1h = 03:00.  User 1: events at 00:00 and 00:30
    # merge (touching), the 01:00:01 event splits -> sessions of 2 and 1
    # events ending 01:00 and 01:30:01, both <= 03:00 -> emitted.  User
    # 2's session ends 04:30 -> held in state, not emitted.
    assert got == {(1, 2, 3.0), (1, 1, 4.0)}


def test_streaming_ewma_state_carries_across_batches(spark, tmp_path):
    """Split the event feed at its median timestamp into two files ->
    maxFilesPerTrigger=1 gives two micro-batches.  Batch 2's recurrences
    must CONTINUE from batch 1's carried (last, n) state, so the combined
    output is bit-identical (==, no tolerance) to the batch operator."""
    from data_engineering_challenge_spark import queries_scale as qsc
    from data_engineering_challenge_spark.streaming.stateful import streaming_ewma

    sf = "/root/testdata/sf0.001"
    events = roles.load_events(spark, sf)
    src = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    cut = src.approxQuantile("ts_us", [0.5], 0.0)[0]
    src.filter(F.col("ts_us") <= cut).coalesce(1).write.parquet(
        str(tmp_path / "src" / "b0")
    )
    src.filter(F.col("ts_us") > cut).coalesce(1).write.parquet(
        str(tmp_path / "src" / "b1")
    )

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "src" / "b*"))
    )
    q = (
        streaming_ewma(stream)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(prog) >= 2, "feed must actually arrive in >=2 micro-batches"

    got = {
        r.event_id: r.ewma
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    expected = {
        r.event_id: r.ewma for r in qsc.ewma_value(spark, sf).collect()
    }
    assert got == expected


def test_foreach_batch_dim_refresh_between_batches(spark, tmp_path):
    """Slowly-changing dimension refresh WITHOUT a stream restart: a
    plain stream-static join snapshots the static side's FILE LISTING at
    plan time, so dimension updates landing mid-stream are invisible (or
    crash when the old files are swapped away).  The operational pattern
    is a fresh spark.read inside foreachBatch — each micro-batch joins
    the dimension snapshot CURRENT at that batch.  This test pins it:
    batch 0 enriches with v1 labels, the handler swaps in v2
    (publish_atomic), batch 1 must see v2."""
    from data_engineering_challenge_spark.sources import io as eio

    dim_path = str(tmp_path / "dim")
    out_path = str(tmp_path / "out")
    spark.createDataFrame(
        [("click", "v1"), ("view", "v1")], "event_type string, label string"
    ).write.parquet(dim_path)

    src = spark.createDataFrame(
        [(1, "click"), (2, "view")], "event_id bigint, event_type string"
    )
    src.filter("event_id = 1").coalesce(1).write.parquet(
        str(tmp_path / "src" / "b0")
    )
    src.filter("event_id = 2").coalesce(1).write.parquet(
        str(tmp_path / "src" / "b1")
    )

    def handle(bdf, epoch_id):
        dim = spark.read.parquet(dim_path)  # fresh snapshot PER BATCH
        (
            bdf.join(dim, "event_type")
            .withColumn("_epoch", F.lit(int(epoch_id)))
            .write.mode("append")
            .parquet(out_path)
        )
        if int(epoch_id) == 0:
            eio.publish_atomic(
                spark.createDataFrame(
                    [("click", "v2"), ("view", "v2")],
                    "event_type string, label string",
                ),
                dim_path,
            )

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "src" / "b*"))
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = {r.event_id: r.label for r in spark.read.parquet(out_path).collect()}
    assert rows == {1: "v1", 2: "v2"}
