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

from .text import shingle_arrays, shingles, simhash60, tokens


def dedup_exact(documents: DataFrame, key: str = "text") -> DataFrame:
    """Exact dedup keeping the smallest doc_id per key group (deterministic,
    unlike dropDuplicates whose survivor is partition-order dependent).
    Returns (doc_id, n_dups)."""
    return documents.groupBy(key).agg(
        F.min("doc_id").alias("doc_id"), F.count("*").alias("n_dups")
    ).select("doc_id", "n_dups")


def _exploded_shingles(documents: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle) multiset.  explode_outer + null-filter dodges the
    inferred size()>0 filter that would re-inline the shingle transform at
    the scan (shingles themselves are never null); shingle_arrays fans out
    under-split scans so the explode+hash work runs cluster-wide."""
    return (
        shingle_arrays(documents, n)
        .select("doc_id", F.explode_outer("sh").alias("shingle"))
        .filter(F.col("shingle").isNotNull())
    )


def shingle_sets(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct pairs — the inverted-index relation."""
    return _exploded_shingles(documents, n).distinct()


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.5,
    max_postings: int = 200,
) -> DataFrame:
    """All doc pairs with shingle-set Jaccard >= threshold.

    inverted-index join: pairs sharing a shingle -> intersection counts ->
    |A∪B| = |A|+|B|-|A∩B|.  Returns (doc_a, doc_b, jaccard), doc_a < doc_b.

    Per-shingle work is quadratic in posting-list length, so shingles in
    more than ``max_postings`` docs are dropped as stop-shingles — from the
    set sizes AND the intersections, keeping the Jaccard definition
    consistent ("similarity over discriminative shingles").  Boilerplate
    n-grams carry no dedup signal; the cap turns the worst-case quadratic
    blowup into a bounded per-bucket cost.
    """
    ss = shingle_sets(documents, n)
    # group doc-ids per shingle and explode ordered pairs locally — ONE pass
    # over the inverted index instead of a self-join that would recompute
    # (and reshuffle) the shingle relation twice.
    postings = (
        ss.groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(F.size("ids") <= max_postings)
    )
    sizes = (
        postings.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("set_size"))
    )
    inter = (
        postings.filter(F.size("ids") > 1)
        .select(F.explode(_ordered_pairs(F.col("ids"))).alias("p"))
        .groupBy(F.col("p.doc_a"), F.col("p.doc_b"))
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


def _ordered_pairs(ids):
    """array<struct<doc_a,doc_b>> of all i<j pairs of a sorted id array —
    computed inside the row (no join)."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )


def minhash_signatures(
    documents: DataFrame, n: int = 3, num_hashes: int = 8, hash_fn: str = "md5"
) -> DataFrame:
    """MinHash signature per document.

    Two performance choices that preserve minhash semantics exactly:

    * **no DISTINCT before the min-agg** — min over the shingle multiset
      equals min over the shingle set, so the dedup shuffle is skipped
      (one groupBy on doc_id is the only shuffle);
    * **4 hashes per md5** — md5 is 32 hex chars; each 8-char chunk is an
      independent 32-bit hash, so ``ceil(num_hashes/4)`` md5 calls per
      shingle replace ``num_hashes`` calls (4x less hashing).

    ``hash_fn`` picks the hash family:

    * ``"md5"`` (default) — engine-portable string hashing, identical in
      DuckDB, so signatures are oracle-checkable;
    * ``"xxhash64"`` — Spark's native 64-bit hash, no hex round-trip and
      roughly an order of magnitude cheaper per shingle: the production
      choice at scale when cross-engine portability isn't needed.  Seeded
      per hash index via an extra literal argument.

    Signature columns mh0..mhN-1 (string for md5, bigint for xxhash64 —
    downstream banding concat_ws accepts both).
    """
    exploded = _exploded_shingles(documents, n)
    if hash_fn == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"mh{i}")
            for i in range(num_hashes)
        ]
        return exploded.groupBy("doc_id").agg(*aggs)
    if hash_fn != "md5":
        raise ValueError(f"unknown hash_fn {hash_fn!r} (md5|xxhash64)")
    # md5: aggregate the min over the chunk's NUMERIC value, then format
    # back to the 8-char lowercase hex.  Fixed-width lowercase hex is
    # order-isomorphic to its integer value, so the min is identical — but
    # a bigint aggregation buffer keeps the aggregate in HashAggregate;
    # min(string) has a variable-width buffer, which forces SortAggregate
    # plus a full sort of the exploded shingle relation (measured r14:
    # the sort was the single hottest node in the signature plan).  The
    # hash chunks are PRE-PROJECTED so each md5 is spelled once and the
    # aggregate sees plain bigint inputs (simpler agg update exprs;
    # measured a further ~15% off the signature stage median).
    cols = []
    for i in range(num_hashes):
        seed, chunk = divmod(i, 4)
        h = F.md5(F.concat(F.lit(f"{seed}:"), F.col("shingle")))
        cols.append(
            F.conv(F.substring(h, chunk * 8 + 1, 8), 16, 10)
            .cast("long")
            .alias(f"_v{i}")
        )
    proj = exploded.select("doc_id", *cols)
    sig = proj.groupBy("doc_id").agg(
        *[F.min(f"_v{i}").alias(f"_mh{i}") for i in range(num_hashes)]
    )
    return sig.select(
        "doc_id",
        *[
            F.lower(F.lpad(F.hex(F.col(f"_mh{i}")), 8, "0")).alias(f"mh{i}")
            for i in range(num_hashes)
        ],
    )


def minhash_lsh_candidates(
    documents: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    rows_per_band: int = 2,
    hash_fn: str = "md5",
    max_bucket_size: int = 200,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join per band.

    Docs agreeing on ALL minhashes inside any band become a candidate pair
    (then verified with true Jaccard by callers if needed).  The join is
    per-(band, bucket) — at scale this is the whole point: candidate
    generation never compares docs that share no bucket.
    Returns distinct (doc_a, doc_b), doc_a < doc_b.

    ``max_bucket_size`` is the skew guard: a degenerate bucket holding a
    large fraction of all docs (hash collision pile-up, boilerplate
    corpora) would explode quadratically in the local pair expansion, so
    buckets above the cap are DROPPED.  The docs they contain are near-
    identical boilerplate by construction — exact dedup or a re-band with
    more rows per band is the right tool for them, not pairwise LSH.
    """
    sig = minhash_signatures(documents, n, num_hashes, hash_fn)
    num_bands = num_hashes // rows_per_band
    # one explode instead of a num_bands-way union (a union would recompute
    # the whole signature pipeline per band), then collect-ids-per-bucket +
    # local pair explosion instead of a self-join (which would recompute it
    # twice more).
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.concat_ws(
                "|",
                *[F.col(f"mh{bi * rows_per_band + r}") for r in range(rows_per_band)],
            ).alias("bucket"),
        )
        for bi in range(num_bands)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    return (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket_size))
        .select(F.explode(_ordered_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )


def simhash_near_dup(
    documents: DataFrame,
    bands: int = 4,
    band_bits: int = 15,
    max_hamming: int = 3,
    max_bucket_size: int = 200,
) -> DataFrame:
    """SimHash near-dup pairs: band the 60-bit sketch, bucket-join, verify
    by Hamming distance (SURVEY.md §2.10 SimHash dedup; reference computes
    pairwise token-set similarity — here the sketch makes it sub-quadratic).

    With ``bands * band_bits`` covering the whole sketch, any pair at
    Hamming distance <= bands - 1 agrees on at least one full band
    (pigeonhole), so recall is EXACT for ``max_hamming <= bands - 1`` —
    candidate generation is a per-band bucket join, never all-pairs, the
    same 100 TB shape as :func:`minhash_lsh_candidates`.  15-bit bands give
    32k bucket values per band, so buckets stay ~N/32k; ``max_bucket_size``
    drops degenerate boilerplate piles (same rationale as the MinHash cap).

    Returns (doc_a, doc_b, hamming), doc_a < doc_b — all-integer output,
    portable across engines bit-for-bit.
    """
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the exact-recall bound "
            f"bands-1={bands - 1}; add bands or lower the threshold"
        )
    sims = simhash60(documents)
    mask = (1 << band_bits) - 1
    band_cols = [
        F.shiftright(F.col("simhash"), band_bits * j).bitwiseAND(F.lit(mask))
        for j in range(bands)
    ]
    banded = sims.select(
        F.struct(F.col("doc_id"), F.col("simhash")).alias("ds"),
        F.posexplode(F.array(*band_cols)).alias("band", "bucket"),
    )
    # collect (doc_id, simhash) structs per bucket + local pair explosion —
    # same one-pass shape as minhash_lsh_candidates, and the sims ride
    # along so the verify needs no join back through the sketch pipeline.
    pairs = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("ds")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket_size))
        .select(F.explode(_ordered_pairs(F.col("ids"))).alias("p"))
        .select(
            F.col("p.doc_a.doc_id").alias("doc_a"),
            F.col("p.doc_b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("p.doc_a.simhash").bitwiseXOR(F.col("p.doc_b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def dup_clusters(
    pairs: DataFrame, max_iters: int = 20, shuffle_partitions: int | None = None
) -> DataFrame:
    """Connected components over a near-dup pair graph: (doc_id, cluster_id)
    where cluster_id = min doc_id reachable through the pairs.

    Iterative min-label propagation: each round every node takes the min of
    its own label and its neighbors' labels; converges in O(component
    diameter) rounds (near-dup components are shallow — chains of edits —
    so a handful of rounds in practice, ``max_iters`` as a safety cap).

    Scale design:
    * each round is ONE join + ONE groupBy on the edge list — the classic
      label-propagation round; for graphs with giant components switch to
      the large-star/small-star contraction algorithm (Kiveris et al.,
      "Connected Components in MapReduce and Beyond"), same driver loop;
    * ``localCheckpoint`` truncates the lineage each round — without it the
      plan doubles per iteration and Catalyst analysis time explodes;
    * convergence test is an aggregate (sum of labels is monotonically
      non-increasing and bounded, so equal sums == fixed point), not a
      row-wise diff join;
    * ``shuffle_partitions`` (optional) overrides the session's shuffle
      width for the duration of the loop: the verified pair graph is
      orders of magnitude smaller than the corpus, so running each round's
      join at the corpus-sized session default (e.g. 200) spends more time
      launching empty tasks than propagating labels.  Size it to the EDGE
      data, not the corpus; restored on exit.
    """
    spark = pairs.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(conf_key)
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    try:
        return _dup_clusters_loop(pairs, max_iters)
    finally:
        if shuffle_partitions is not None:
            spark.conf.set(conf_key, prev_parts)


def _dup_clusters_loop(pairs: DataFrame, max_iters: int) -> DataFrame:
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iters):
        neighbor_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))
