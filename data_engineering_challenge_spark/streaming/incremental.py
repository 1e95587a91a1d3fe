"""Incremental processing with Structured Streaming (SURVEY.md §2.9).

The reference's incremental story is a FileSensor waiting for a flag file,
then re-running the batch steps over a date range (reference
dags/attribution_pipeline_dag.py:35-42, cj_builder.py:45-53).  The
Spark-native equivalent replaces polling + re-runs with a streaming source
and watermark discipline:

* file source (``readStream``) on the events directory — new parquet files
  are discovered automatically; ``trigger(availableNow=True)`` is the exact
  analog of "flag file seen → process everything pending → stop".
* **incremental journey building**: the sessions STREAM joined to static
  conversions (stream-static inner join — no state needed on the static
  side); for conversions that also arrive as a stream, a stream-stream
  join with watermarks on both sides bounds the join state.
* **windowed aggregation**: tumbling 1-day counts with a watermark
  replacing the batch ``GROUP BY date``.
* **sessionization**: ``session_window`` with a 30-minute gap — the
  streaming twin of the batch gaps-and-islands query
  (queries_relational.sessionize_events).

State sizing at scale: the watermark bounds state to (watermark horizon ×
arrival rate); journeys keyed by user_id shard across executors with the
shuffle.  ``foreachBatch`` writers give idempotent overwrite-by-key
semantics for the sink (the reference's delete+insert, done right).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import EVENTS


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream of events parquet files (schema mandatory for
    streaming reads).  ``maxFilesPerTrigger`` paces backfills."""
    from ..sources.io import ensure_instant_timestamps

    ensure_instant_timestamps(spark)
    return (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", "16")
        .parquet(events_dir)
    )


def incremental_journeys(
    sessions_stream: DataFrame, conversions: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming journey build: each arriving session row joins to the
    (static) conversions of the same user with the as-of bound — emitting
    journey rows incrementally instead of re-running the batch join.

    Stream-static inner join: no streaming state beyond the watermark
    bookkeeping; the static side is re-read per micro-batch (broadcast if
    small)."""
    s = sessions_stream.withWatermark("ts", watermark).alias("s")
    c = conversions.alias("c")
    return s.join(
        c,
        (F.col("s.user_id") == F.col("c.user_id")) & (F.col("s.ts") <= F.col("c.conv_ts")),
        "inner",
    ).select(
        F.col("c.conv_id").alias("conversion_id"),
        F.col("s.event_id").alias("session_id"),
        F.col("s.ts").alias("timestamp"),
        F.col("s.event_type").alias("channel_label"),
    )


def daily_counts(events_stream: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling 1-day aggregation with late-data tolerance = watermark.

    The value sum goes through DECIMAL(28,10) so the merged result is
    independent of micro-batch arrival order (float partial sums would
    make the emitted total depend on how the files were batched)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("day_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(events_stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming sessionization via session_window (stateful; watermark
    bounds how long an open session waits for more events).

    Two deliberate exactness choices: the value sum goes through
    DECIMAL(28,10) so the emitted total is independent of arrival order
    (the daily_counts discipline), and session_window's boundary rule is
    pinned by test: TOUCHING intervals merge (an exactly-gap spacing stays
    one session), so islands split only on gaps STRICTLY over ``gap`` —
    identical to the batch sessionizer's ``> 30min`` rule."""
    return (
        events_stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    events_stream: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once streaming dedup on an at-least-once feed: re-delivered
    event ids inside the watermark horizon are dropped
    (``dropDuplicatesWithinWatermark``).

    The watermark is what makes this scale: plain ``dropDuplicates`` on a
    stream keeps EVERY key ever seen in state (unbounded — it OOMs on an
    infinite feed), while the within-watermark variant evicts ids older
    than the horizon, so state ≈ horizon × arrival rate regardless of
    stream age.  The dedup-ingest front door of a streaming corpus
    pipeline: source retries/replays stop producing duplicate documents
    downstream."""
    ids = id_cols or ["event_id"]
    return events_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ids
    )


def run_available_now(stream_df: DataFrame, out_dir: str, checkpoint_dir: str) -> None:
    """Process-everything-pending-then-stop (the FileSensor analog)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_available_now_complete(
    stream_df: DataFrame, checkpoint_dir: str, table_name: str
) -> None:
    """Aggregating streams need complete/update mode; memory sink for tests."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def incremental_journeys_stream_stream(
    sessions_stream: DataFrame,
    conversions_stream: DataFrame,
    lookback_days: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream journey build: BOTH sessions and conversions arrive as
    streams (the reference's two tables fed continuously).

    Inner stream-stream join with watermarks on both sides AND a two-sided
    time-range condition (``conv_ts - lookback <= ts <= conv_ts``): the
    range bound is what lets Spark EVICT join state — without it a session
    row must be retained forever in case a future conversion matches it.
    ``lookback_days`` is therefore both a semantic knob (the batch
    ``build_journeys(lookback_days=...)`` capability) and the state bound:
    per-key state ≈ lookback window × arrival rate.
    """
    s = sessions_stream.withWatermark("ts", watermark).alias("s")
    c = conversions_stream.withWatermark("conv_ts", watermark).alias("c")
    cond = (
        (F.col("s.user_id") == F.col("c.user_id"))
        & (F.col("s.ts") <= F.col("c.conv_ts"))
        & (
            F.col("s.ts")
            >= F.col("c.conv_ts") - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
        )
    )
    return s.join(c, cond, "inner").select(
        F.col("c.conv_id").alias("conversion_id"),
        F.col("s.event_id").alias("session_id"),
        F.col("s.ts").alias("timestamp"),
        F.col("s.event_type").alias("channel_label"),
    )


#: hidden key-bucket partition column of merge-maintained tables — pmod of
#: the key hash, so a batch's keys map to a bounded set of partitions
BUCKET_COL = "_kb"


def _bucket_of(keys: list[str], num_buckets: int):
    return F.pmod(
        F.xxhash64(*[F.col(k) for k in keys]), F.lit(num_buckets)
    ).cast("int")


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    """Read a merge-maintained table (``overwrite_by_key`` / ``apply_cdc``
    target), hiding the internal key-bucket partition column."""
    df = spark.read.parquet(path)
    return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df


#: test hook: when set, receives each merge's pruned (kept ∪ upserts)
#: DataFrame before materialization — plan capture for the
#: PartitionFilters assertion (the read-side twin of the file-identity
#: write-side test)
_MERGE_PLAN_PROBE = None


def _merge_by_key(
    touched_keys: DataFrame,
    upserts: DataFrame,
    path: str,
    keys: list[str],
    num_buckets: int | None,
) -> None:
    """Shared merge core: rows of ``path`` whose key appears in
    ``touched_keys`` are dropped, ``upserts`` added — with I/O restricted
    to the key-bucket partitions the batch touches.

    ``num_buckets`` set (the default): the table is laid out partitioned by
    ``_kb = pmod(xxhash64(keys), num_buckets)``.  The batch's touched
    bucket set (≤ batch size, ≤ num_buckets — collected, a scalar-bounded
    probe) prunes the read (``PartitionFilters: [_kb IN (...)]``) AND
    bounds the write: only touched ``_kb=`` directories are rewritten via
    ``io.publish_atomic_partitions``; every other partition's files remain
    PHYSICALLY untouched.  Per-batch I/O is ∝ touched partitions — at
    100 TB a 1 000-row batch reads/writes ~1/num_buckets of the table at
    most, not all of it.  A pre-existing UNBUCKETED table is migrated
    (one whole-table rewrite, amortized over every later batch).

    ``num_buckets=None``: the legacy whole-table merge (read ∖ keys ∪
    upserts, ``io.publish_atomic``) — table-level atomic, but per-batch
    I/O ∝ table size; keep it only for tiny tables.

    On a transactional format (Delta/Iceberg) this whole function is a
    MERGE / ``replaceWhere`` — that is the production path; this is the
    plain-parquet equivalent."""
    from ..sources import io

    spark = upserts.sparkSession
    exists = io.recover_interrupted_swap(spark, path)
    if exists:
        io.recover_partition_swaps(spark, path)

    if num_buckets is None:
        if not exists:
            upserts.write.mode("overwrite").parquet(path)
            return
        existing = spark.read.parquet(path)
        kept = existing.join(F.broadcast(touched_keys), keys, "left_anti")
        io.publish_atomic(kept.unionByName(upserts), path)
        return

    if BUCKET_COL in upserts.columns:
        raise ValueError(f"merge input already has a {BUCKET_COL} column")
    bucketed_upserts = upserts.withColumn(
        BUCKET_COL, _bucket_of(keys, num_buckets)
    )
    live_parts = io.list_partition_dirs(spark, path, BUCKET_COL) if exists else []
    if exists and not live_parts:
        # flat layout (legacy table, or the all-rows-deleted empty state):
        # migrate — rewrite once partitioned by key bucket; an EMPTY flat
        # table skips straight to the first-bucketed-write branch
        existing = spark.read.parquet(path)
        if existing.isEmpty():
            exists = False
        else:
            io.publish_atomic(
                existing.withColumn(BUCKET_COL, _bucket_of(keys, num_buckets)),
                path,
                partition_by=[BUCKET_COL],
            )
            live_parts = io.list_partition_dirs(spark, path, BUCKET_COL)
    if not exists:
        if upserts.isEmpty():
            # partitionBy of zero rows writes no readable file — keep the
            # schema with a flat empty table; the next batch migrates it
            upserts.write.mode("overwrite").parquet(path)
        else:
            bucketed_upserts.write.mode("overwrite").partitionBy(
                BUCKET_COL
            ).parquet(path)
        return

    touched = sorted(
        r[0]
        for r in touched_keys.select(
            _bucket_of(keys, num_buckets).alias(BUCKET_COL)
        )
        .distinct()
        .collect()
    )
    if not touched:
        return
    existing = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin(touched)
    )  # partition-pruned: only touched _kb= directories are read
    kept = existing.join(F.broadcast(touched_keys), keys, "left_anti")
    # one output file per touched partition (hash-repartition on the bucket
    # column before the partitionBy write): without this every write task
    # drops a sliver file into each touched directory and the table
    # accretes small files batch over batch
    merged = kept.unionByName(bucketed_upserts).repartition(
        max(len(touched), 1), F.col(BUCKET_COL)
    )
    if _MERGE_PLAN_PROBE is not None:
        _MERGE_PLAN_PROBE(merged)
    if set(live_parts) <= {f"{BUCKET_COL}={v}" for v in touched}:
        # the batch touches EVERY live partition — if the merge empties
        # them all, fall back to a flat empty table (zero-partition parquet
        # is unreadable); rare by construction, and the check above keeps
        # this extra job off the per-batch hot path
        if merged.isEmpty():
            io.publish_atomic(upserts.limit(0), path)
            return
    io.publish_atomic_partitions(merged, path, BUCKET_COL, touched)


def overwrite_by_key(
    batch_df: DataFrame,
    path: str,
    keys: list[str],
    num_buckets: int | None = 64,
) -> None:
    """Idempotent overwrite-by-key for one micro-batch: rows in ``path``
    whose key appears in the batch are replaced, others kept — the
    reference's DELETE+INSERT re-run semantics (api_client.py:139,
    channel_reporter.py:99).

    Plain-parquet merge (read ∖ batch-keys ∪ batch) restricted to the
    key-bucket partitions the batch touches (see ``_merge_by_key`` — the
    anti-join broadcasts the batch's key set; micro-batches are small by
    construction).  Failure posture:

    * "table absent" is decided by an EXPLICIT FileSystem existence check,
      never by catching read errors — a corrupt or transiently-unreadable
      table must FAIL the batch, not be silently treated as first-batch
      (which would replace all accumulated history with one micro-batch);
    * an absent table is NOT taken at face value either: a prior batch
      that crashed between its two swap renames leaves the history in a
      ``._inprogress``/``._replaced`` sibling, and
      ``io.recover_interrupted_swap`` restores it before the first-batch
      branch can run — the foreachBatch replay then merges on top of the
      recovered history instead of replacing it;
    * merged partitions are fully staged before any rename and swapped in
      per partition (``io.publish_atomic_partitions``) — a crash leaves
      every partition either old or new, never half-written; the replayed
      batch converges the table and repairs any mid-swap window
      (``io.recover_partition_swaps``).
    """
    batch_df = batch_df.localCheckpoint()  # batch is tiny; sever lineage
    _merge_by_key(
        batch_df.select(*keys).distinct(), batch_df, path, keys, num_buckets
    )


def run_foreach_batch_upsert(
    stream_df: DataFrame, path: str, checkpoint_dir: str, keys: list[str]
) -> None:
    """availableNow run with an overwrite-by-key sink: re-processing a
    date range (or a replayed batch) REPLACES those keys instead of
    appending duplicates — the streaming form of the reference's
    idempotent re-runs."""
    q = (
        stream_df.writeStream.foreachBatch(
            lambda bdf, _id: overwrite_by_key(bdf, path, keys)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def apply_cdc(
    batch_df: DataFrame,
    path: str,
    keys: list[str],
    op_col: str = "_op",
    seq_col: str | None = None,
    num_buckets: int | None = 64,
) -> None:
    """Apply one CDC micro-batch (insert/update/delete change feed) to a
    plain-parquet table — the MERGE a transactional format would run,
    completing ``overwrite_by_key``'s upsert-only story with DELETE
    semantics:

    * ``op_col`` = 'I' / 'U': the row replaces any existing row with its
      key (upsert — I and U are deliberately identical, so a replayed feed
      that re-labels an insert as an update stays idempotent);
    * ``op_col`` = 'D': the key is removed; the row's other columns are
      ignored (CDC deletes usually carry only the key image);
    * any OTHER op value — including NULL — FAILS the batch: a malformed
      change record silently treated as an upsert (or, worse, a NULL op
      slipping through a null-rejecting delete filter and deleting its
      key) corrupts the table; same fail-loud posture as the corrupt-table
      check.

    If one key appears multiple times in a batch, the winner is the
    highest ``seq_col`` value when given (the feed's LSN / commit sequence
    — the CORRECT order under shuffled or re-delivered feeds, since
    arrival order within a multi-partition batch is not commit order),
    with batch row order as the tie-break; without ``seq_col`` batch
    arrival order alone decides, which is only sound for ordered
    single-source feeds (the availableNow file source).

    Same failure posture and partition-restricted I/O as
    ``overwrite_by_key`` (see ``_merge_by_key``)."""
    batch_df = batch_df.localCheckpoint()  # batch is tiny; sever lineage
    bad = batch_df.filter(
        F.col(op_col).isNull() | ~F.col(op_col).isin("I", "U", "D")
    ).limit(1)
    bad_rows = bad.collect()
    if bad_rows:
        raise ValueError(
            f"apply_cdc: {op_col} must be one of 'I'/'U'/'D', got "
            f"{bad_rows[0][op_col]!r} — failing the batch (a malformed "
            "change record must not be silently applied)"
        )
    # last change per key wins: explicit feed sequence first when given,
    # monotonically_increasing_id (batch row order) as the tie-break
    order = [F.desc("_arrival")]
    if seq_col is not None:
        order.insert(0, F.desc(seq_col))
    w = Window.partitionBy(*keys).orderBy(*order)
    last = (
        batch_df.withColumn("_arrival", F.monotonically_increasing_id())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_arrival", "_rn")
    )
    upserts = last.filter(F.col(op_col) != "D").drop(op_col)
    _merge_by_key(
        last.select(*keys).distinct(), upserts, path, keys, num_buckets
    )


def run_foreach_batch_cdc(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    keys: list[str],
    op_col: str = "_op",
    seq_col: str | None = None,
) -> None:
    """availableNow run applying a CDC change stream to a table — replayed
    batches re-apply idempotently (upserts replace, deletes of absent keys
    are no-ops)."""
    q = (
        stream_df.writeStream.foreachBatch(
            lambda bdf, _id: apply_cdc(bdf, path, keys, op_col, seq_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def incremental_attribution(
    sessions_stream: DataFrame,
    conversions,
    journeys_path: str,
    attribution_path: str,
    checkpoint_dir: str,
    model_fn=None,
) -> None:
    """The full reference pipeline run INCREMENTALLY: each micro-batch of
    newly-arrived sessions (1) appends its journey rows to the journeys
    table and (2) delta-recomputes attribution for exactly the touched
    conversions — reading their FULL accumulated journey (attribution is a
    whole-journey property; scoring a partial journey would be wrong),
    then upserting by conversion key.

    This is the production incremental-attribution pattern: work per batch
    is proportional to touched conversions, not to history; re-delivered
    batches are idempotent (append is deduped by the semi-join recompute,
    the upsert replaces).  The reference's nightly "re-run the date range"
    collapses into this delta recompute.
    """
    from ..operators import attribution as attr

    model_fn = model_fn or attr.attribute_linear
    journeys = incremental_journeys(sessions_stream, conversions)

    def handle(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.localCheckpoint()
        if batch.isEmpty():
            return
        overwrite_by_key(
            batch, journeys_path, ["conversion_id", "session_id"]
        )
        touched = batch.select("conversion_id").distinct()
        full = read_merged(spark, journeys_path).join(
            F.broadcast(touched), "conversion_id", "left_semi"
        )
        attributed = model_fn(full).localCheckpoint()
        overwrite_by_key(attributed, attribution_path, ["conversion_id"])

    q = (
        journeys.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def incremental_report(
    sessions_stream: DataFrame,
    conversions: DataFrame,
    sessions_static: DataFrame,
    costs: DataFrame,
    journeys_path: str,
    attribution_path: str,
    report_path: str,
    checkpoint_dir: str,
    model_fn=None,
    plan_probe=None,
) -> None:
    """The ENTIRE reference pipeline maintained incrementally — journeys,
    attribution, AND the (channel, date) report — with per-batch work
    proportional to what the batch touched, not to history.

    Per micro-batch of newly-arrived sessions:

    1. journey rows upsert by (conversion, session);
    2. attribution delta-recomputes for exactly the touched conversions,
       over their FULL accumulated journeys (whole-journey property);
    3. the report recomputes exactly the (channel_name, date) GROUPS any
       touched conversion contributes to — a group must be rebuilt from
       ALL its rows (other conversions share it), so the sessions input
       is key-filtered, the attribution input stays whole, and the
       resulting group rows replace their keys in the report table.

    A conversion's session set only grows, so the touched-group set always
    covers every group whose value its re-attribution changed.  This is
    incremental materialized-view maintenance for the reference's step 3;
    the reference's own answer is "re-run the date range nightly".
    ``sessions_static`` / ``costs`` are the accumulated dimension tables
    (in production: tables this same feed maintains).

    Delta proportionality at 100 TB: the touched-group KEY SET is bounded
    by the batch's session count, so it is collected (a scalar-sized probe,
    same posture as the dedup convergence probes) and its date list pushed
    back into the sessions scan as a STATIC filter.  On a date-partitioned
    sessions table the group recompute therefore reads only the touched
    date partitions — ``PartitionFilters: [date IN (...)]`` in the plan,
    asserted by test_incremental_report_prunes_to_touched_partitions — and
    a ``date`` column, when present, is used directly so the filter lands
    on the partition column instead of an expression over ``ts``.
    ``plan_probe``, when given, receives each batch's report DataFrame
    before materialization (plan capture for tests/audit)."""
    from ..operators import attribution as attr
    from ..operators import report as rpt

    model_fn = model_fn or attr.attribute_linear
    journeys = incremental_journeys(sessions_stream, conversions)

    def handle(batch: DataFrame, _batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.localCheckpoint()
        if batch.isEmpty():
            return
        overwrite_by_key(batch, journeys_path, ["conversion_id", "session_id"])
        touched = batch.select("conversion_id").distinct()
        full = read_merged(spark, journeys_path).join(
            F.broadcast(touched), "conversion_id", "left_semi"
        )
        attributed = model_fn(full).localCheckpoint()
        overwrite_by_key(attributed, attribution_path, ["conversion_id"])

        att_all = read_merged(spark, attribution_path)
        # prefer an existing date column (the partition column on a
        # date-partitioned sessions table) over recomputing from ts, so the
        # touched-date filter below prunes partitions instead of scanning
        has_date = "date" in sessions_static.columns
        keyed = sessions_static.select(
            "session_id",
            "channel_name",
            (F.col("date") if has_date else F.to_date("ts")).alias("date"),
        )
        # renamed key columns: touched_keys shares lineage with
        # sessions_static (a self-join), so unqualified names are ambiguous
        touched_keys = (
            keyed.join(
                F.broadcast(attributed.select("session_id").distinct()),
                "session_id",
                "left_semi",
            )
            .select(
                F.col("channel_name").alias("_key_channel"),
                F.col("date").alias("_key_date"),
            )
            .distinct()
        )
        # the touched-group key set is bounded by the batch — collect it
        # and push the date list into the scan as a static filter (this is
        # what makes "work per batch ∝ touched partitions" a plan property,
        # not a hope: PartitionFilters carries the IN list)
        touched_rows = touched_keys.collect()
        if not touched_rows:
            return
        touched_local = spark.createDataFrame(
            touched_rows, touched_keys.schema
        )
        sess_date = F.col("date") if has_date else F.to_date("ts")
        sess_src = sessions_static.filter(
            sess_date.isin([r._key_date for r in touched_rows])
        )
        sess_f = sess_src.join(
            F.broadcast(touched_local),
            (sess_src["channel_name"] == touched_local["_key_channel"])
            & (sess_date == touched_local["_key_date"]),
            "left_semi",
        )
        out = rpt.channel_report(
            sess_f, costs, att_all, conversions, exact_sums=True
        )
        if plan_probe is not None:
            plan_probe(out)
        out = out.localCheckpoint()
        overwrite_by_key(out, report_path, ["channel_name", "date"])

    q = (
        journeys.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
