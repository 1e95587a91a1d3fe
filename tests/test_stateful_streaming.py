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
