"""observe()-based per-micro-batch metrics: computed inside the batch job,
collected via the listener bus, reconciling exactly with batch SQL."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_challenge_spark import roles
from data_engineering_challenge_spark.streaming import monitor as mon


def test_observed_metrics_reconcile_with_batch_totals(spark, tmp_path):
    events = roles.load_events(spark, "/root/testdata/sf0.001").select(
        "event_id", "user_id", "event_type", "value"
    )
    # two files -> two availableNow micro-batches (maxFilesPerTrigger=1)
    half_a = events.filter(F.col("event_id") % 2 == 0)
    half_b = events.filter(F.col("event_id") % 2 == 1)
    half_a.coalesce(1).write.parquet(str(tmp_path / "src"))
    half_b.coalesce(1).write.mode("append").parquet(str(tmp_path / "src"))

    listener = mon.BatchMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(tmp_path / "src"))
        )
        observed = mon.with_batch_metrics(
            stream,
            n_rows=F.count(F.lit(1)),
            n_errors=F.count_if(F.col("event_type") == "error"),
            value_sum=F.sum(F.col("value").cast("decimal(28,10)")),
        )
        q = (
            observed.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        batches = listener.wait_for(2)
    finally:
        spark.streams.removeListener(listener)

    # every batch reported, and the totals reconcile EXACTLY with batch SQL
    tot = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("event_type") == "error").alias("e"),
        F.sum(F.col("value").cast("decimal(28,10)")).alias("s"),
    ).collect()[0]
    assert sum(b["n_rows"] for b in batches) == tot.n
    assert sum(b["n_errors"] for b in batches) == tot.e
    assert sum(b["value_sum"] for b in batches) == tot.s
    assert len({b["batchId"] for b in batches}) == len(batches)
    # and the sink saw every row exactly once (observe is not a filter)
    assert spark.read.parquet(str(tmp_path / "out")).count() == tot.n
