"""Incremental near-dup admission: cross-batch dedup against the admitted
signature table, intra-batch first-seen, near-dup threshold consistency,
re-run determinism."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_challenge_spark.operators import dedup as dd
from data_engineering_challenge_spark.streaming import near_dup as nd


def _write_batches(spark, tmp_path, batches):
    """One parquet file per batch with strictly increasing mtimes so the
    file stream delivers them in order (maxFilesPerTrigger=1)."""
    src = tmp_path / "src"
    schema = None
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows)
        schema = df.schema
        df.coalesce(1).write.mode("append").parquet(str(src))
        newest = max(
            (str(p) for p in src.glob("part-*.parquet")), key=os.path.getmtime
        )
        os.utime(newest, (1_700_000_000 + i, 1_700_000_000 + i))
    return str(src), schema


def _doc(i, text):
    return Row(doc_id=i, text=text)


LONG_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
LONG_D = "completely different content with its own distinct run of words"


def test_admission_dedups_across_and_within_batches(spark, tmp_path):
    src, schema = _write_batches(
        spark,
        tmp_path,
        [
            [_doc(0, LONG_A), _doc(1, LONG_D)],
            [
                _doc(10, LONG_A),   # cross-batch dup of 0 -> dropped
                _doc(11, "brand new third document body with fresh words"),
                _doc(12, "twin text appearing twice in one batch today"),
                _doc(13, "twin text appearing twice in one batch today"),
                _doc(14, "a b"),    # too short to shingle -> always admitted
            ],
        ],
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    nd.run_foreach_batch_near_dup(
        stream, str(tmp_path / "novel"), str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    got = {r.doc_id for r in nd.read_novel(spark, str(tmp_path / "novel")).collect()}
    assert got == {0, 1, 11, 12, 14}
    # the admitted-signature table matches: one row per admitted sig-doc
    state = spark.read.parquet(str(tmp_path / "state"))
    assert {r.doc_id for r in state.collect()} == {0, 1, 11, 12}


def test_near_dup_threshold_consistent_with_signature_agreement(spark, tmp_path):
    near_a = LONG_A.replace("kappa", "lambda")  # 1 token differs from LONG_A
    src, schema = _write_batches(
        spark,
        tmp_path,
        [[_doc(0, LONG_A)], [_doc(1, near_a)]],
    )
    sigs = {
        r.doc_id: tuple(r[f"mh{i}"] for i in range(8))
        for r in dd.minhash_signatures(
            spark.createDataFrame([_doc(0, LONG_A), _doc(1, near_a)])
        ).collect()
    }
    agreement = sum(a == b for a, b in zip(sigs[0], sigs[1])) / 8.0
    threshold = 0.5
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    nd.run_foreach_batch_near_dup(
        stream, str(tmp_path / "novel"), str(tmp_path / "state"),
        str(tmp_path / "ckpt"), threshold=threshold,
    )
    got = {r.doc_id for r in nd.read_novel(spark, str(tmp_path / "novel")).collect()}
    # doc 1 is dropped iff its agreement with history crosses the threshold
    want = {0} if agreement >= threshold else {0, 1}
    assert got == want


def test_rerun_with_fresh_checkpoint_is_deterministic(spark, tmp_path):
    src, schema = _write_batches(
        spark,
        tmp_path,
        [[_doc(0, LONG_A)], [_doc(10, LONG_A), _doc(11, LONG_D)]],
    )
    for run in ("ck1", "ck2"):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        nd.run_foreach_batch_near_dup(
            stream, str(tmp_path / "novel"), str(tmp_path / "state"),
            str(tmp_path / run),
        )
    novel = nd.read_novel(spark, str(tmp_path / "novel"))
    assert {r.doc_id for r in novel.collect()} == {0, 11}
    assert novel.count() == 2  # partitions replaced, never appended
