"""Dead-letter quarantine sink (SURVEY.md §2.9 operational layer): split
each micro-batch into clean rows and rule-violating rows, landing both —
nothing is silently dropped, and bad records carry WHY they failed.

Idempotency without a transactional format: each batch writes its rows
under a ``_batch=<epoch>`` partition via dynamic partition overwrite, so
a replayed micro-batch (checkpoint recovery) REPLACES its own partition
instead of appending duplicates — the same partition-restricted
discipline as the key-bucket merges (streaming/incremental.py), keyed by
epoch instead of key hash.

The reference aborts the whole run on zero records (reference
pipeline.py:98-100) and has no notion of per-row validity; this is the
streaming-scale version of "keep the good data flowing, keep the bad
data visible".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.quality import RowRule, tag_violations


def run_foreach_batch_quarantine(
    stream_df: DataFrame,
    valid_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    rules: list[RowRule],
) -> None:
    """availableNow run of ``stream_df`` through the rule split: clean
    rows land under ``valid_path``, violating rows under
    ``quarantine_path`` with a ``violations`` reason column."""

    def handle(bdf: DataFrame, epoch_id: int) -> None:
        tagged = tag_violations(bdf, rules).withColumn(
            "_batch", F.lit(int(epoch_id))
        )
        clean = tagged.filter(F.size("_violations") == 0).drop("_violations")
        bad = tagged.filter(F.size("_violations") > 0).withColumn(
            "violations", F.array_join("_violations", ";")
        ).drop("_violations")
        for df, path in ((clean, valid_path), (bad, quarantine_path)):
            (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch")
                .parquet(path)
            )

    q = (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_quarantine_split(spark, valid_path: str, quarantine_path: str):
    """(valid, quarantined) DataFrames, ``_batch`` partition column
    dropped."""
    v = spark.read.parquet(valid_path).drop("_batch")
    b = spark.read.parquet(quarantine_path).drop("_batch")
    return v, b
