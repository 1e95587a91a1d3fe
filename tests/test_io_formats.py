"""Source/sink format coverage (SURVEY.md §2.1): JSONL, ORC, raw text,
writer codec control — each round-trips losslessly."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from data_engineering_challenge_spark.sources import io

SF = "/root/testdata/sf0.001"


def _fingerprint(df):
    """Order-insensitive content hash of a whole frame."""
    cols = sorted(df.columns)
    return (
        df.select(F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])).alias("h"))
        .agg(F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")))
        .collect()[0][0]
    )


def test_jsonl_roundtrip_lossless(spark, tmp_path):
    docs = io.read_parquet_table(spark, f"{SF}/documents.parquet")
    io.write_jsonl(docs, str(tmp_path / "docs_jsonl"))
    back = io.read_jsonl(spark, str(tmp_path / "docs_jsonl"), docs.schema)
    assert back.count() == docs.count()
    assert back.schema == docs.schema
    assert _fingerprint(back) == _fingerprint(docs)


def test_orc_roundtrip_lossless(spark, tmp_path):
    orders = io.read_parquet_table(spark, f"{SF}/orders.parquet")
    io.write_orc(orders, str(tmp_path / "orders_orc"))
    back = io.read_orc_table(spark, str(tmp_path / "orders_orc"))
    assert back.count() == orders.count()
    assert _fingerprint(back) == _fingerprint(orders)


def test_text_corpus_read(spark, tmp_path):
    docs = io.read_parquet_table(spark, f"{SF}/documents.parquet")
    docs.select("text").coalesce(1).write.text(str(tmp_path / "raw"))
    corpus = io.read_text_corpus(spark, str(tmp_path / "raw"))
    assert corpus.count() == docs.count()
    assert set(corpus.columns) == {"text", "source_file"}
    assert corpus.filter(F.col("source_file") == "").count() == 0
    # content preserved (line-per-doc, no newlines in this corpus)
    assert _fingerprint(corpus.select("text")) == _fingerprint(docs.select("text"))


def test_parquet_codec_control(spark, tmp_path):
    import pyarrow.parquet as pq

    docs = io.read_parquet_table(spark, f"{SF}/documents.parquet")
    io.write_parquet(docs, str(tmp_path / "zstd"), compression="zstd")
    f = glob.glob(str(tmp_path / "zstd" / "part-*.parquet"))[0]
    assert pq.ParquetFile(f).metadata.row_group(0).column(0).compression == "ZSTD"
    back = spark.read.parquet(str(tmp_path / "zstd"))
    assert _fingerprint(back) == _fingerprint(docs)
