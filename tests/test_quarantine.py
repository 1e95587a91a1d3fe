"""Dead-letter quarantine: exact split, reasons attached, replay-idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_challenge_spark import roles
from data_engineering_challenge_spark.operators import quality as q
from data_engineering_challenge_spark.streaming import quarantine as dq

RULES = [
    q.rule_values_in("event_type", ["view", "click", "purchase", "signup"]),
    q.rule_between("value", 0.0, 50.0),
]


def test_quarantine_split_is_exact_and_reasoned(spark, tmp_path):
    events = roles.load_events(spark, "/root/testdata/sf0.001").select(
        "event_id", "user_id", "event_type", "value"
    )
    events.coalesce(2).write.parquet(str(tmp_path / "src"))
    stream = spark.readStream.schema(events.schema).parquet(str(tmp_path / "src"))
    dq.run_foreach_batch_quarantine(
        stream, str(tmp_path / "ok"), str(tmp_path / "bad"),
        str(tmp_path / "ckpt"), RULES,
    )
    valid, bad = dq.read_quarantine_split(
        spark, str(tmp_path / "ok"), str(tmp_path / "bad")
    )
    good_pred = (
        F.col("event_type").isin("view", "click", "purchase", "signup")
        & ((F.col("value") >= 0.0) & (F.col("value") <= 50.0))
    )
    want_good = events.filter(good_pred)
    want_bad = events.filter(~good_pred)
    assert valid.count() == want_good.count()
    assert bad.count() == want_bad.count()
    assert valid.count() + bad.count() == events.count()  # nothing dropped
    assert set(valid.columns) == set(events.columns)
    # every quarantined row names at least one failed rule, correctly
    sample = bad.filter(F.col("event_type") == "error").limit(5).collect()
    assert all("values_in(event_type)" in r.violations for r in sample)
    over = bad.filter(F.col("value") > 50.0).limit(5).collect()
    assert all("between(value,0.0,50.0)" in r.violations for r in over)


def test_quarantine_replayed_batch_is_idempotent(spark, tmp_path):
    events = roles.load_events(spark, "/root/testdata/sf0.001").select(
        "event_id", "event_type", "value"
    )
    # simulate a checkpoint-recovery replay: same epoch handled twice
    from data_engineering_challenge_spark.operators.quality import tag_violations  # noqa: F401
    import data_engineering_challenge_spark.streaming.quarantine as mod

    def run_epoch(eid):
        tagged = q.tag_violations(events, RULES).withColumn(
            "_batch", F.lit(eid)
        )
        clean = tagged.filter(F.size("_violations") == 0).drop("_violations")
        (
            clean.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(str(tmp_path / "ok"))
        )

    run_epoch(0)
    n1 = spark.read.parquet(str(tmp_path / "ok")).count()
    run_epoch(0)  # replay
    n2 = spark.read.parquet(str(tmp_path / "ok")).count()
    assert n1 == n2  # the partition was replaced, not appended
