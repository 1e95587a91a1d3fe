"""Deduplication operators (SURVEY.md §2.10 ✚): exact, n-gram Jaccard,
MinHash+LSH, SimHash — the LLM-corpus dedup toolbox, all as DataFrame
compositions (no UDFs, no driver loops).

Scale design:
* exact dedup = one hash shuffle on the key (or on md5(text) to keep wide
  text out of the shuffle);
* n-gram Jaccard = inverted-index self-join on shingles — worst case is
  quadratic in docs-per-shingle, which is why the LSH path exists;
* MinHash LSH = signatures (map-side) -> band buckets -> join within
  buckets only: candidate generation cost is proportional to true
  collisions, the standard 100 TB-scale near-dup design (the
  shingle->minhash->band->bucket-join pipeline);
* hashes are md5 strings for engine-portable determinism (see text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles, tokens


def dedup_exact(documents: DataFrame, key: str = "text") -> DataFrame:
    """Exact dedup keeping the smallest doc_id per key group (deterministic,
    unlike dropDuplicates whose survivor is partition-order dependent).
    Returns (doc_id, n_dups)."""
    return documents.groupBy(key).agg(
        F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups")
    ).select("doc_id", "n_dups")


def shingle_sets(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct pairs — the inverted-index relation."""
    return (
        documents.select("doc_id", F.explode(shingles(tokens(), n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All doc pairs with shingle-set Jaccard >= threshold.

    inverted-index join: pairs sharing a shingle -> intersection counts ->
    |A∪B| = |A|+|B|-|A∩B|.  Returns (doc_a, doc_b, jaccard), doc_a < doc_b.
    """
    ss = shingle_sets(documents, n)
    sizes = ss.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    a = ss.alias("a")
    b = ss.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    jac = F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    documents: DataFrame, n: int = 3, num_hashes: int = 8
) -> DataFrame:
    """MinHash signature per document: hash_i = min(md5(i || ':' || shingle)).

    md5-string minhash is engine-portable (oracle-checkable) and
    permutation-equivalent: taking the min of a hash over the shingle set
    approximates Jaccard similarity exactly like integer minhash.
    One explode + one groupBy (shuffle on doc_id); signature columns mh0..mhN.
    """
    ss = shingle_sets(documents, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return ss.groupBy("doc_id").agg(*aggs)


def minhash_lsh_candidates(
    documents: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join per band.

    Docs agreeing on ALL minhashes inside any band become a candidate pair
    (then verified with true Jaccard by callers if needed).  The join is
    per-(band, bucket) — at scale this is the whole point: candidate
    generation never compares docs that share no bucket.
    Returns distinct (doc_a, doc_b), doc_a < doc_b.
    """
    sig = minhash_signatures(documents, n, num_hashes)
    num_bands = num_hashes // rows_per_band
    bands = []
    for bi in range(num_bands):
        cols = [F.col(f"mh{bi * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            sig.select(
                "doc_id",
                F.lit(bi).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("bucket"),
            )
        )
    banded = bands[0]
    for b in bands[1:]:
        banded = banded.unionByName(b)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
