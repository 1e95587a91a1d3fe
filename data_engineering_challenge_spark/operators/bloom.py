"""Declarative Bloom filter — membership pre-filtering without UDFs or
private APIs (SURVEY.md §2.10 ✚).

PySpark exposes no public Bloom surface (``DataFrameStatFunctions.
bloomFilter`` is Scala-only; ``bloom_filter_agg`` is an internal
expression), so this builds one from public column functions:

* build: k hash positions per value — ``pmod(xxhash64(value, seed_i),
  m)`` — folded into an m-bit bitmap with a ``bit_or`` aggregate over
  64-bit words.  One narrow aggregation over the (small) member side;
  the result is ``m/64`` longs collected to the driver — bounded by the
  CHOSEN capacity, never by data volume.
* probe: a pure column expression over the literal word array —
  ``element_at(words, pos div 64) & (1 << pos % 64)`` ANDed across the
  k probes.  Whole-stage-codegen'd, map-only: no join, no shuffle, no
  state on the corpus side.

Scale shape: this is the decontamination / membership pattern for a
100 TB corpus against a small reference set (benchmark shingles, a
blocklist, yesterday's keys).  A broadcast hash join ships and hashes
the whole reference relation per executor; the bloom ships ``m/8``
bytes inside the plan itself and turns the first pass into a scan-local
filter.  False positives are possible (rate set by m, k, n), false
negatives are NOT — so the standard composition is bloom-prefilter →
exact verify join on the (tiny) surviving candidate set, which keeps
the final output EXACT while the corpus-sized work stays join-free.

No reference analog (reference has no membership structures); the n-gram
decontamination semantics mirror queries_text.contamination_overlap.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(value: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions of ``value``: pmod(xxhash64(value, seed), m).

    Seeds are the literals 0..k-1 mixed in as an extra hash input —
    xxhash64 over (value, seed) gives k independent 64-bit streams with
    no stored seed table, deterministic across engines and sessions."""
    return [
        F.pmod(F.xxhash64(value, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def _one_shifted_by(bit_pos: Column) -> Column:
    """``1L << bit_pos`` with a COLUMN shift amount — ``F.shiftleft`` only
    accepts a literal int, so route through call_function."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), bit_pos.cast("int")
    )


def build_bloom_words(
    members: DataFrame, col: str, m_bits: int = 1 << 17, k: int = 5
) -> list[int]:
    """Aggregate the member side into an m-bit Bloom bitmap; returns the
    ``m_bits / 64`` words as Python ints (the broadcast payload).

    One distinct + one bit_or aggregation; the collect is bounded by
    ``m_bits/64`` rows (the filter's own capacity), NOT by member count.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError(f"m_bits must be a positive multiple of 64, got {m_bits}")
    pos = (
        members.select(F.col(col).alias("_v"))
        .distinct()
        .select(
            F.explode(F.array(*_positions(F.col("_v"), m_bits, k))).alias("pos")
        )
    )
    words = (
        pos.select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            _one_shifted_by(F.pmod(F.col("pos"), F.lit(64))).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[r["word_idx"]] = r["word"]
    return out


def bloom_might_contain(
    value: Column, words: list[int], k: int = 5
) -> Column:
    """Membership probe as a pure column expression over the literal word
    array — true for every inserted value (no false negatives), true for
    a non-member with probability ≈ (1 - e^(-k·n/m))^k."""
    m_bits = len(words) * 64
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    conds = []
    for pos in _positions(value, m_bits, k):
        word = F.element_at(arr, ((pos / 64).cast("long") + 1).cast("int"))
        bit = _one_shifted_by(F.pmod(pos, F.lit(64)))
        conds.append(word.bitwiseAND(bit) != 0)
    return reduce(lambda a, b: a & b, conds)


def contaminated_docs_bloom(
    train_shingles: DataFrame,
    bench_shingles: DataFrame,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """Exact contamination counts via bloom-prefilter → exact verify.

    1. fold the benchmark shingle set into an m-bit bloom (small side);
    2. scan-local probe drops the overwhelming majority of clean corpus
       shingles with zero shuffle (map-only filter, plan-tested);
    3. the surviving candidates — true hits plus the bloom's few false
       positives — are verified with the exact broadcast semi-join, so
       the OUTPUT is exact: (doc_id, n_contaminated > 0) identical to
       the all-join contamination_overlap path.

    Expects (doc_id, shingle) relations (operators.dedup.shingle_sets).
    """
    words = build_bloom_words(bench_shingles, "shingle", m_bits, k)
    candidates = train_shingles.filter(
        bloom_might_contain(F.col("shingle"), words, k)
    )
    return (
        candidates.join(
            F.broadcast(bench_shingles.select("shingle").distinct()), "shingle"
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
