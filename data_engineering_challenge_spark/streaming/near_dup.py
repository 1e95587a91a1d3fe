"""Incremental near-dup admission (SURVEY.md §2.9/§2.10): each micro-batch
of documents is deduplicated against EVERYTHING already admitted — the
ingestion-time form of corpus dedup, where history lives in a signature
table instead of re-scanning the corpus per batch.

Per batch:
1. MinHash signatures for the batch docs (md5 family — engine-portable,
   the same `operators.dedup.minhash_signatures` the batch path checks);
2. intra-batch first-seen: one row per full signature (min doc_id);
3. vs history: banded LSH join of the batch's signatures against the
   admitted-signature table — the BATCH side is broadcast (it is the
   small side; history only gets scanned, never shuffled), candidates
   verified by signature-agreement fraction >= ``threshold``
   (1.0 = exact-signature duplicate, the oracle-checked mode);
4. novel docs land under ``_batch=<epoch>`` in the novel table AND their
   signatures append to the state table under the SAME epoch partition
   via dynamic partition overwrite — a replayed micro-batch REPLACES its
   own partitions, and the history read excludes the current epoch, so
   recovery cannot dedup a batch against its own half-written output.

Docs too short to shingle (< n tokens) carry no signature and are always
admitted — they cannot collide with anything.

At 100 TB: per-batch cost is (batch shingling) + (scan of the signature
table, which is ~1 row per admitted doc — orders of magnitude smaller
than the corpus) with the batch side broadcast; no corpus rescan, no
growing executor state (history lives in the table, not the state
store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd

NUM_HASHES = 8
_MH = [f"mh{i}" for i in range(NUM_HASHES)]


def _with_signatures(batch: DataFrame, n: int) -> DataFrame:
    """Left-join signatures onto the batch; sig_key NULL for docs too
    short to shingle."""
    sigs = dd.minhash_signatures(batch, n=n, num_hashes=NUM_HASHES)
    return batch.join(sigs, "doc_id", "left").withColumn(
        "sig_key",
        F.when(
            F.col(_MH[0]).isNotNull(), F.concat_ws("|", *_MH)
        ).otherwise(F.lit(None).cast("string")),
    )


def _band_bucket(band: int):
    return F.concat_ws("|", F.col(_MH[2 * band]), F.col(_MH[2 * band + 1]))


def run_foreach_batch_near_dup(
    doc_stream: DataFrame,
    novel_path: str,
    state_path: str,
    checkpoint_dir: str,
    n: int = 3,
    threshold: float = 1.0,
) -> None:
    """availableNow run of the admission pipeline described in the module
    docstring.  ``doc_stream`` needs (doc_id, text, ...)."""
    spark = doc_stream.sparkSession

    def handle(bdf: DataFrame, epoch_id: int) -> None:
        epoch = int(epoch_id)
        tagged = _with_signatures(bdf, n)
        # intra-batch first-seen per full signature (short docs pass)
        from pyspark.sql import Window

        w = Window.partitionBy("sig_key").orderBy("doc_id")
        firsts = tagged.withColumn(
            "_rn",
            F.when(F.col("sig_key").isNull(), F.lit(1)).otherwise(
                F.row_number().over(w)
            ),
        ).filter(F.col("_rn") == 1).drop("_rn")

        history = _read_state(spark, state_path, before_epoch=epoch)
        if history is not None:
            cand = None
            for b in range(NUM_HASHES // 2):
                probe = firsts.filter(F.col("sig_key").isNotNull()).select(
                    "doc_id", *_MH, _band_bucket(b).alias("_bkt")
                )
                hist = history.select(
                    *[F.col(c).alias(f"h_{c}") for c in _MH],
                    _band_bucket(b).alias("_bkt"),
                )
                # batch side broadcast — history is scanned, never shuffled
                hit = hist.join(F.broadcast(probe), "_bkt")
                cand = hit if cand is None else cand.unionByName(hit)
            agree = sum(
                F.when(F.col(m) == F.col(f"h_{m}"), 1).otherwise(0) for m in _MH
            ) / F.lit(float(NUM_HASHES))
            dup_ids = (
                cand.filter(agree >= threshold).select("doc_id").distinct()
            )
            firsts = firsts.join(dup_ids, "doc_id", "left_anti")

        novel = firsts.withColumn("_batch", F.lit(epoch))
        (
            novel.drop("sig_key", *_MH)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(novel_path)
        )
        (
            novel.filter(F.col("sig_key").isNotNull())
            .select("doc_id", *_MH, "_batch")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(state_path)
        )

    q = (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _read_state(
    spark: SparkSession, state_path: str, before_epoch: int
) -> DataFrame | None:
    """Admitted signatures from epochs strictly before ``before_epoch`` —
    the exclusion is what makes a replayed batch idempotent (it must not
    see its own prior half-written output).  Partition-pruned read.

    Existence is probed through the Hadoop FS (works for any scheme)
    instead of a try/except around the read — a swallowed
    AnalysisException still stack-traces in the JVM log on every first
    batch, which reads like a failure in otherwise-clean runs."""
    from ..sources.io import _hadoop_fs

    fs, p = _hadoop_fs(spark, state_path)
    if not fs.exists(p):
        return None
    return spark.read.parquet(state_path).filter(
        F.col("_batch") < before_epoch
    )


def read_novel(spark: SparkSession, novel_path: str) -> DataFrame:
    return spark.read.parquet(novel_path).drop("_batch")
