"""Text / dedup / similarity queries (SURVEY.md §2.10 ✚ north-star
extensions) with DuckDB oracles.

Shared SQL building blocks mirror operators/text.py exactly: whitespace
tokens, 3-word shingles (DuckDB lists are 1-based — ``range(1, n-1)`` is
the 1-based twin of Spark's ``sequence(0, n-3)``), md5-string minhash.
Dot products fold left-to-right in both engines (F.aggregate vs list_sum),
so cosine scores are bit-identical.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import dedup as dd
from .operators import similarity as sim
from .operators import text as tx
from .queries import _SQL_PRELUDE, _dsum_sql, dsum, register

#: streaming queries materialize real output tables (a blocking availableNow
#: run + temp dirs); cache the output path per (query, sf_dir) so repeated
#: registry builds — plan/schema-only enumerations included — are no-ops
#: after the first run instead of paying a full streaming execution and
#: leaking a fresh temp dir each time.
_STREAM_OUT_CACHE: dict[tuple[str, str], str] = {}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.io import read_parquet_cached_schema

    return read_parquet_cached_schema(spark, f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.io import read_parquet_cached_schema

    return read_parquet_cached_schema(spark, f"{sf_dir}/embeddings.parquet")


_SQL_TOKS = "string_split(text, ' ')"

_SQL_SHINGLES = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT DISTINCT doc_id, s
    FROM toks, UNNEST(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
             ELSE [] END) AS u(s)
)
"""


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------


@register(
    "text_stats",
    f"""
SELECT doc_id,
       CAST(len({_SQL_TOKS}) AS INTEGER) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual,
       CAST(len(list_distinct({_SQL_TOKS})) AS INTEGER) AS n_unique_tokens,
       len(list_distinct({_SQL_TOKS})) * 1.0 / len({_SQL_TOKS}) AS ttr,
       (length(text) - (len({_SQL_TOKS}) - 1)) * 1.0 / len({_SQL_TOKS}) AS avg_token_len
FROM documents
""",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (token counting for corpus budgeting)."""
    return tx.token_stats(_docs(spark, sf_dir))


@register(
    "text_quality",
    f"""
SELECT doc_id, lang,
       CAST(len({_SQL_TOKS}) AS INTEGER) AS n_tokens,
       len(list_filter({_SQL_TOKS}, t -> t IN ('the', 'a'))) * 1.0
           / len({_SQL_TOKS}) AS stopword_ratio,
       len(list_distinct({_SQL_TOKS})) * 1.0 / len({_SQL_TOKS}) AS ttr,
       0.4 * least(1.0, len({_SQL_TOKS}) / 100.0)
       + 0.3 * (len(list_distinct({_SQL_TOKS})) * 1.0 / len({_SQL_TOKS}))
       + 0.3 * (len(list_filter({_SQL_TOKS}, t -> t IN ('the', 'a'))) * 1.0
                / len({_SQL_TOKS})) AS quality_score
FROM documents
""",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length/diversity/stopword blend."""
    return tx.quality_score(_docs(spark, sf_dir))


@register(
    "lang_guess",
    f"""
SELECT doc_id, lang,
       len(list_filter({_SQL_TOKS}, t -> t IN ('the', 'a'))) * 1.0
           / len({_SQL_TOKS}) AS en_marker_ratio,
       CASE WHEN len(list_filter({_SQL_TOKS}, t -> t IN ('the', 'a'))) * 1.0
                 / len({_SQL_TOKS}) > 0.05
            THEN 'en' ELSE 'unknown' END AS lang_guess
FROM documents
""",
)
def q_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language-ID heuristic."""
    return tx.language_guess(_docs(spark, sf_dir))


@register(
    "doc_fingerprints",
    "SELECT doc_id, md5(lower(text)) AS fp FROM documents",
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document md5 fingerprint."""
    return tx.fingerprint_md5(_docs(spark, sf_dir))


def _simhash_cte(bits: int) -> str:
    """WITH-clause prefix ending in ``sims(doc_id, simhash)`` — the SQL
    twin of operators.text._simhash at the given bit width.  The bit-sum
    expression must match Spark exactly: ((h>>j & 1)*2 - 1) * cnt."""
    hexchars = (bits + 3) // 4
    bit_sums = ",\n           ".join(
        f"SUM((((h >> {j}) & 1) * 2 - 1) * cnt) AS b{j}" for j in range(bits)
    )
    packed = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(bits)
    )
    return f"""
WITH tok AS (
    SELECT doc_id, t AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         UNNEST(toks) AS u(t)
), counted AS (
    SELECT doc_id, token, COUNT(*) AS cnt,
           CAST(concat('0x', substring(md5(token), 1, {hexchars})) AS BIGINT) AS h
    FROM tok GROUP BY doc_id, token
), sums AS (
    SELECT doc_id,
           {bit_sums}
    FROM counted GROUP BY doc_id
), sims AS (
    SELECT doc_id, {packed} AS simhash FROM sums
)"""


def _simhash_sql() -> str:
    return _simhash_cte(32) + "\nSELECT doc_id, simhash FROM sims\n"


@register("simhash_fingerprints", _simhash_sql())
def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash sketch per document (near-dup by hamming distance)."""
    return tx.simhash32(_docs(spark, sf_dir))


@register(
    "simhash_near_dup_pairs",
    _simhash_cte(60)
    + """
, bands AS (
    SELECT doc_id, simhash, CAST(j AS INTEGER) AS band,
           (simhash >> (15 * CAST(j AS INTEGER))) & 32767 AS bucket
    FROM sims, UNNEST([0, 1, 2, 3]) AS u(j)
), keep AS (
    SELECT band, bucket FROM bands GROUP BY band, bucket
    HAVING COUNT(*) > 1 AND COUNT(*) <= 200
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sim_a,
                    b.doc_id AS doc_b, b.simhash AS sim_b
    FROM bands a
    JOIN keep USING (band, bucket)
    JOIN bands b USING (band, bucket)
    WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sim_a, sim_b)) <= 3
""",
)
def q_simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 60-bit sketch, 4x15-bit LSH bands, Hamming
    <= 3 verify.  Pigeonhole makes recall exact at this threshold (<= 3
    flipped bits leave >= 1 of 4 bands untouched), candidate generation is
    a per-band bucket join with the same degenerate-bucket cap as the
    MinHash path, and the output is all-integer so the driver hash is
    engine-portable by construction (no transcendental, no decimal)."""
    return dd.simhash_near_dup(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------


@register(
    "dedup_exact_docs",
    """
SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text
""",
)
def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: smallest doc_id survives per identical text."""
    return dd.dedup_exact(_docs(spark, sf_dir))


@register(
    "ngram_jaccard_pairs",
    _SQL_SHINGLES
    + """
-- stop-shingle cap mirrors the operator: shingles in > 200 docs are
-- dropped from sizes AND intersections (no dedup signal, quadratic cost)
, keep AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 200),
shf AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shf GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
    FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, i * 1.0 / (sa.sz + sb.sz - i) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.2
""",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-shingle Jaccard >= 0.2 (inverted-index join,
    stop-shingles above 200 postings dropped)."""
    return dd.ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.2)


_MINHASH_AGGS_SQL = ",\n       ".join(
    f"MIN(substring(md5(concat('{i // 4}:', s)), {(i % 4) * 8 + 1}, 8)) AS mh{i}"
    for i in range(8)
)

# minhash skips the DISTINCT (min over multiset == min over set) — mirror
# the operator exactly: explode WITHOUT dedup
_SQL_SHINGLES_MULTI = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
    SELECT doc_id, s
    FROM toks, UNNEST(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
             ELSE [] END) AS u(s)
)
"""


@register(
    "minhash_signatures",
    _SQL_SHINGLES_MULTI
    + f"""
SELECT doc_id,
       {_MINHASH_AGGS_SQL}
FROM sh GROUP BY doc_id
""",
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-hash MinHash signature per document (md5-string minhash)."""
    return dd.minhash_signatures(_docs(spark, sf_dir), n=3, num_hashes=8)


#: shared banding block: signature -> 4 bands x 2 rows -> bucket-capped
#: candidate pairs (cap mirrors the operator's max_bucket_size=200 skew
#: guard — an over-cap bucket is degenerate boilerplate, dropped)
_SQL_BANDED_CAND = f"""
, sig AS (
    SELECT doc_id,
       {_MINHASH_AGGS_SQL}
    FROM sh GROUP BY doc_id
), banded AS (
    SELECT doc_id, 0 AS band, concat_ws('|', mh0, mh1) AS bucket FROM sig
    UNION ALL
    SELECT doc_id, 1 AS band, concat_ws('|', mh2, mh3) AS bucket FROM sig
    UNION ALL
    SELECT doc_id, 2 AS band, concat_ws('|', mh4, mh5) AS bucket FROM sig
    UNION ALL
    SELECT doc_id, 3 AS band, concat_ws('|', mh6, mh7) AS bucket FROM sig
), bsize AS (
    SELECT band, bucket, COUNT(*) AS n FROM banded GROUP BY band, bucket
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    JOIN bsize s ON a.band = s.band AND a.bucket = s.bucket AND s.n <= 200
)
"""


@register(
    "minhash_lsh_candidates",
    _SQL_SHINGLES_MULTI + _SQL_BANDED_CAND + "SELECT doc_a, doc_b FROM cand",
)
def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: 4 bands x 2 rows over the 8-hash
    signature; bucket-join only (the scale path for near-dup)."""
    return dd.minhash_lsh_candidates(_docs(spark, sf_dir), n=3, num_hashes=8, rows_per_band=2)


@register("minhash_lsh_candidates_xxh", None)  # hash choice is Spark-native
def q_minhash_lsh_candidates_xxh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same LSH pipeline with hash_fn="xxhash64" — the production hash
    at scale (no hex string round-trip, one JVM hash per shingle per
    index).  No SQL oracle: xxhash64 is Spark-internal by design; the md5
    twin (minhash_lsh_candidates) carries the cross-engine correctness row,
    and tests assert the two pipelines find the same high-similarity pairs."""
    return dd.minhash_lsh_candidates(
        _docs(spark, sf_dir), n=3, num_hashes=8, rows_per_band=2, hash_fn="xxhash64"
    )


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

_SQL_DOT = """
list_sum(list_transform(list_zip({a}, {b}),
         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
"""

#: per-vector norm CTE — computed once per vector (mirrors the operators,
#: which precompute norms so each pair costs one dot product)
_SQL_NORMED = f"""
WITH e AS (
    SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
    FROM embeddings
)
"""


@register(
    "cosine_topk",
    _SQL_NORMED
    + f"""
, scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_SQL_DOT.format(a='q.embedding', b='c.embedding')} / (q.norm * c.norm)
               AS cos_sim
    FROM e q JOIN e c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 20
), ranked AS (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
""",
)
def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for the first 20 query vectors."""
    emb = _emb(spark, sf_dir)
    return sim.cosine_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)


# the operators compute these same driver-side literals — one shared source
# of truth for the hyperplane components keeps Spark and oracle identical
from .operators.similarity import _sign_component_values as _sign_components  # noqa: E402


def _near_dup_lsh_oracle(
    num_bands: int = 8, bits_per_band: int = 2, threshold: float = 0.45,
    max_bucket: int = 1000,
) -> str:
    """Oracle twin of similarity.near_dup_pairs_lsh: per-band sign buckets
    from the same md5-derived ±1 components (literals below equal what
    Spark computes at runtime), bucket-capped candidate pairs, exact
    cosine verify."""
    band_selects = []
    for band in range(num_bands):
        bits = []
        for bit in range(bits_per_band):
            seed = band * bits_per_band + bit
            comps = ", ".join(str(c) for c in _sign_components(seed))
            bits.append(
                f"(CASE WHEN list_sum(list_transform(list_zip(embedding, [{comps}]),"
                f" x -> CAST(x[1] AS DOUBLE) * x[2])) > 0 THEN {2**bit} ELSE 0 END)"
            )
        bucket = " + ".join(bits)
        band_selects.append(
            f"SELECT vec_id, {band} AS band, {bucket} AS bucket FROM embeddings"
        )
    banded = "\n    UNION ALL\n    ".join(band_selects)
    return f"""
WITH banded AS (
    {banded}
), bsize AS (
    SELECT band, bucket, COUNT(*) AS n FROM banded GROUP BY band, bucket
), cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    JOIN bsize s ON a.band = s.band AND a.bucket = s.bucket AND s.n <= {max_bucket}
), e AS (
    SELECT vec_id, embedding,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
    FROM embeddings
)
SELECT id_a, id_b,
       {_SQL_DOT.format(a='ea.embedding', b='eb.embedding')} / (ea.norm * eb.norm)
           AS cos_sim
FROM cand
JOIN e ea ON id_a = ea.vec_id
JOIN e eb ON id_b = eb.vec_id
WHERE {_SQL_DOT.format(a='ea.embedding', b='eb.embedding')} / (ea.norm * eb.norm)
      >= {threshold}
"""


@register("embedding_near_dup", _near_dup_lsh_oracle())
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicate pairs (cosine >= 0.45) via banded
    sign-LSH candidates + exact cosine verify — the scale-safe path: the
    plan is a bucket equi-join, never an all-pairs self-join.  With 8
    bands x 2 bits, a true pair at cosine 0.45 (per-bit collision ~0.65)
    is a candidate with prob ~0.99."""
    return sim.near_dup_pairs_lsh(
        _emb(spark, sf_dir), threshold=0.45, num_bands=8, bits_per_band=2
    )


@register(
    "embedding_near_dup_exact",
    _SQL_NORMED
    + f"""
SELECT * FROM (
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_SQL_DOT.format(a='a.embedding', b='b.embedding')} / (a.norm * b.norm)
               AS cos_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 200 AND b.vec_id < 200
) WHERE cos_sim >= 0.4
""",
)
def q_embedding_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force near-dup baseline on a bounded slice (vec_id < 200):
    the exact O(n²) reranking path, kept correctness-checked but never the
    default at corpus scale (use embedding_near_dup)."""
    return sim.near_dup_pairs(
        _emb(spark, sf_dir).filter(F.col("vec_id") < 200), threshold=0.4
    )


def _ann_oracle() -> str:
    projs = []
    for bit in range(4):
        comps = ", ".join(str(c) for c in _sign_components(bit))
        projs.append(
            f"(CASE WHEN list_sum(list_transform(list_zip(embedding, [{comps}]),"
            f" x -> CAST(x[1] AS DOUBLE) * x[2])) > 0 THEN {2**bit} ELSE 0 END)"
        )
    bucket = " + ".join(projs)
    return f"""
WITH bucketed AS (
    SELECT vec_id, embedding, {bucket} AS bucket,
           sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
    FROM embeddings
), scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           {_SQL_DOT.format(a='q.embedding', b='c.embedding')} / (q.norm * c.norm)
               AS cos_sim
    FROM bucketed q JOIN bucketed c
      ON q.vec_id <> c.vec_id AND q.bucket = c.bucket
    WHERE q.vec_id < 20
), ranked AS (
    SELECT query_id, neighbor_id, cos_sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


@register("ann_topk_lsh", _ann_oracle())
def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via 4-bit sign-random-projection buckets (the ANN
    scale path; compare against cosine_topk for recall)."""
    emb = _emb(spark, sf_dir)
    return sim.ann_topk_bucketed(
        emb, emb.filter(F.col("vec_id") < 20), k=5, num_bits=4, dim=64
    )


# --------------------------------------------------------------------------
# tf-idf (SURVEY.md §2.10 'text analysis' — pure DataFrame, no MLlib, so the
# oracle can reproduce it exactly)
# --------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    """
WITH tok AS (
    SELECT doc_id, t AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         UNNEST(toks) AS u(t)
), tf AS (
    SELECT doc_id, token, COUNT(*) AS cnt,
           SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS doc_len
    FROM tok GROUP BY doc_id, token
), df AS (
    SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_with
    FROM tok GROUP BY token
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
    -- ln() differs by 1 ulp between libm builds and the JVM, so the raw
    -- double is NOT engine-portable.  The tfidf decimal is therefore used
    -- for RANKING ONLY and never emitted: the hashed output is purely
    -- integral (cnt, doc_len, n_docs_with, rnk).  The ranking quantum is
    -- DECIMAL(18,6) — coarse enough that a 1-ulp input divergence almost
    -- never flips the rounded digit (1000x fewer boundary hits than the
    -- previous 18,9), and a flip only matters if it also reorders a top-3.
    SELECT tf.doc_id, tf.token, tf.cnt,
           CAST(tf.doc_len AS BIGINT) AS doc_len, df.n_docs_with,
           CAST((tf.cnt * 1.0 / tf.doc_len)
                * ln((n.n_docs + 1.0) / (df.n_docs_with + 1.0))
                AS DECIMAL(18,6)) AS tfidf_rank_key
    FROM tf JOIN df USING (token) CROSS JOIN n
), ranked AS (
    SELECT doc_id, token, cnt, doc_len, n_docs_with,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY tfidf_rank_key DESC, token ASC) AS rnk
    FROM scored
)
SELECT doc_id, token, CAST(cnt AS BIGINT) AS cnt, doc_len, n_docs_with,
       CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 3
""",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf terms per document.  Pure DataFrame tf-idf (explode ->
    tf window -> df join -> ln idf) rather than MLlib HashingTF/IDF so the
    result is hash-free and oracle-checkable; the MLlib pair is the drop-in
    at scale if feature vectors (not ranked terms) are the goal.

    Engine portability: ln() differs by 1 ulp between the JVM and libm, so
    the tfidf value is a DECIMAL(18,6) RANKING KEY only — the emitted (and
    hashed) columns are the exact integers that define it (cnt, doc_len,
    n_docs_with) plus the rank.  Integers hash identically everywhere."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(tx.tokens()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("cnt")).withColumn(
        "doc_len", F.sum("cnt").over(Window.partitionBy("doc_id"))
    )
    df_ = tok.groupBy("token").agg(
        F.countDistinct("doc_id").alias("n_docs_with")
    )
    # corpus size as a broadcast 1-row aggregate (the oracle's CROSS JOIN n)
    # rather than docs.count(): composition stays fully lazy — no Spark job
    # runs until the query itself is acted on
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.col("doc_len").cast("bigint").alias("doc_len"),
            "n_docs_with",
            (
                (F.col("cnt") * 1.0 / F.col("doc_len"))
                * F.log((F.col("n_docs") + 1.0) / (F.col("n_docs_with") + 1.0))
            ).cast("decimal(18,6)").alias("tfidf_rank_key"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_rank_key"), F.asc("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .drop("tfidf_rank_key")
    )


# --------------------------------------------------------------------------
# multimodal: the Arrow mapInPandas decode path, oracle-checked
# --------------------------------------------------------------------------

@register(
    "multimodal_features",
    """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(i AS INTEGER) AS feat_idx,
       CAST(CAST(concat('0x', substring(md5(text), CAST(i % 16 AS INTEGER) * 2 + 1, 2))
                 AS INTEGER) / 256.0 AS DOUBLE) AS feat_val
FROM documents CROSS JOIN range(0, 16) t(i)
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: text -> binary payload column ->
    Arrow mapInPandas feature extraction (python md5-based deterministic
    fake).  The oracle recomputes the identical features in pure SQL
    (md5 hex byte / 256), so the Python/Arrow path is value-checked against
    a JVM-free reference — the strongest available check for a UDF stage.

    The feature vector is emitted in LONG form — one (media_id, feat_idx,
    feat_val) row per dimension — because the correctness gate canonicalizes
    results with a column sort, which cannot order array cells; the array
    form stays available directly from ``multimodal.extract_features``.
    Each float32 is ``byte/256`` (≤ 8 mantissa bits), so the float->double
    cast is exact and matches the oracle's double bit-for-bit."""
    from .operators import multimodal as mm

    docs = _docs(spark, sf_dir)
    media = mm.attach_payload(docs, "doc_id", "text")
    feats = mm.extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        F.posexplode("feature").alias("feat_idx", "feat_val"),
    ).withColumn("feat_val", F.col("feat_val").cast("double"))


# --------------------------------------------------------------------------
# BPE-ish regex token counting + winnowing (rolling-hash) fingerprints
# --------------------------------------------------------------------------

_BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@register(
    "token_count_bpe",
    rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER)
           AS n_bpe_tokens,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens
FROM documents
""",
)
def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer regex (letter runs /
    digit runs / single punctuation — the GPT-2-style split shape) next to
    the whitespace count.  Pure regexp_extract_all: JVM-side, zero shuffle."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
    )


@register(
    "winnow_fingerprints",
    """
WITH grams AS (
    SELECT doc_id,
           list_transform(range(1, length(text) - 6),
                          i -> substring(text, CAST(i AS INTEGER), 8)) AS g
    FROM documents
    WHERE length(text) >= 11
), hashes AS (
    SELECT doc_id,
           list_transform(g, x ->
               CAST(concat('0x', substring(md5(x), 1, 8)) AS BIGINT)) AS h
    FROM grams
), winnowed AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(h) - 2),
                         i -> list_min(h[CAST(i AS INTEGER):CAST(i + 3 AS INTEGER)])))
               AS fps
    FROM hashes
)
SELECT doc_id, fp FROM winnowed, UNNEST(fps) AS u(fp)
""",
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash scheme of
    Schleimer/Wilkerson/Aiken's MOSS): hash every 8-char gram, keep the min
    of each 4-hash window, dedup.  Robust local fingerprints for copy
    detection — all array expressions, zero shuffle, engine-portable
    md5-chunk hashes."""
    docs = _docs(spark, sf_dir).filter(F.length("text") >= 11)
    # built via expr for 1-based substring parity with the oracle
    hashed = docs.withColumn(
        "h",
        F.expr(
            "transform(sequence(1, length(text) - 7), "
            "i -> cast(conv(substring(md5(substring(text, i, 8)), 1, 8), 16, 10) "
            "AS BIGINT))"
        ),
    )
    # Two materialization barriers, found by profiling:
    # (1) the window expression references `h` three times — inlining the
    #     500-md5 transform at each reference triples the hash cost;
    # (2) exploding a lambda-valued generator re-evaluates the WHOLE
    #     expression per OUTPUT row (~110x/doc here, 73s -> 1s when the
    #     generator is a bound attribute instead).
    # r14: the barriers are round-robin fan-outs (io.fan_out_scan
    # force=True) instead of repartition("doc_id") — same one-pass
    # barrier cost, but AQE cannot coalesce them below the core count,
    # so the per-position md5 work runs cluster-wide.
    from .sources.io import fan_out_scan

    hashed = fan_out_scan(hashed.select("doc_id", "h"), force=True)
    df = hashed.withColumn(
        "fps",
        F.expr(
            "array_distinct(transform(sequence(1, size(h) - 3), "
            "i -> array_min(slice(h, i, 4))))"
        ),
    )
    # explode_outer, not explode: InferFiltersFromGenerate synthesizes a
    # `size(fps)>0 AND isnotnull(fps)` filter for plain explode with the
    # WHOLE nested-lambda expression inlined — re-evaluating every md5 per
    # window slice at the scan (observed ~75s vs ~2s).  The outer variant is
    # exempt, and fps is never empty here (length >= 11 guarantees >= 1
    # window).
    fps = fan_out_scan(df.select("doc_id", "fps"), force=True)
    return fps.select("doc_id", F.explode_outer("fps").alias("fp"))


@register("ivf_topk", None)  # iterative (KMeans) — rows-only driver check
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-5 (KMeans coarse quantizer, 2-probe).  No SQL
    oracle: KMeans is iterative and not SQL-expressible; tests check recall
    against the exact search instead (test_text_dedup_similarity).  The
    checked instance trains 3 iterations — quantizer quality barely moves
    recall and every extra iteration is a full data pass (cheap driver
    verify; production callers tune max_iter)."""
    emb = _emb(spark, sf_dir)
    return sim.ivf_topk(emb, emb.filter(F.col("vec_id") < 20), k=5, max_iter=3)


@register(
    "streaming_incremental_journeys",
    # The streaming build's declared contract is exact parity with the batch
    # as-of join, so the batch journeys oracle IS its oracle — the driver
    # hash-checks the streaming execution against plain SQL.
    _SQL_PRELUDE
    + """
SELECT conversion_id,
       session_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       channel_label
FROM journeys
""",
)
def q_streaming_incremental_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming incremental journey build (SURVEY.md §2.9),
    executed with trigger(availableNow) — the FileSensor analog: process
    all pending events, then stop.  Returns the materialized journey rows,
    which equal the batch as-of join exactly — that parity is the oracle
    (same SQL as ``journeys_build``), so streaming execution earns a real
    value-hash row.  Output is cached per (query, sf_dir): composing the
    registry repeatedly does not re-run the stream."""
    import shutil
    import tempfile

    from . import roles
    from .streaming import incremental as st

    key = ("streaming_incremental_journeys", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="stream_journeys_")
        events = roles.load_events(spark, sf_dir)
        events.write.mode("overwrite").parquet(f"{tmp}/events")
        stream = st.read_events_stream(spark, f"{tmp}/events")
        j = st.incremental_journeys(
            stream, roles.conversions_from_events(events)
        )
        st.run_available_now(j, f"{tmp}/out", f"{tmp}/ckpt")
        # keep only the materialized output; drop the staged input + ckpt
        shutil.rmtree(f"{tmp}/events", ignore_errors=True)
        shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/out"
    return spark.read.parquet(out).select(
        "conversion_id",
        "session_id",
        F.unix_micros("timestamp").alias("ts_us"),
        "channel_label",
    )


@register(
    "lsh_verified_pairs",
    _SQL_SHINGLES_MULTI
    + _SQL_BANDED_CAND
    + """
SELECT c.doc_a, c.doc_b,
       1.0 - levenshtein(da.text, db.text) * 1.0
             / greatest(length(da.text), length(db.text)) AS edit_sim
FROM cand c
JOIN documents da ON c.doc_a = da.doc_id
JOIN documents db ON c.doc_b = db.doc_id
WHERE 1.0 - levenshtein(da.text, db.text) * 1.0
          / greatest(length(da.text), length(db.text)) >= 0.6
""",
)
def q_lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup pipeline: MinHash-LSH candidate generation
    followed by exact edit-distance verification — candidates are a tiny
    set, so the O(len^2) levenshtein only runs on plausible pairs (the
    production pattern: cheap sketch filter -> expensive verify)."""
    docs = _docs(spark, sf_dir)
    cand = dd.minhash_lsh_candidates(docs, n=3, num_hashes=8, rows_per_band=2)
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb"))
    sim_expr = 1.0 - F.levenshtein("_ta", "_tb") * 1.0 / F.greatest(
        F.length("_ta"), F.length("_tb")
    )
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select("doc_a", "doc_b", sim_expr.alias("edit_sim"))
        .filter(F.col("edit_sim") >= 0.6)
    )


# --------------------------------------------------------------------------
# near-dup clustering + deterministic sampling (LLM-corpus curation ✚)
# --------------------------------------------------------------------------

#: recursive oracle: transitive closure of the verified near-dup pairs.
#: DuckDB's WITH RECURSIVE UNION dedups the accumulated rows, so the walk
#: terminates; MIN(reach) per node == min doc_id in the component.
_SQL_CC = _SQL_SHINGLES_MULTI.replace("WITH ", "WITH RECURSIVE ", 1) + _SQL_BANDED_CAND + """
, edges AS (
    SELECT c.doc_a, c.doc_b
    FROM cand c
    JOIN documents da ON c.doc_a = da.doc_id
    JOIN documents db ON c.doc_b = db.doc_id
    WHERE 1.0 - levenshtein(da.text, db.text) * 1.0
              / greatest(length(da.text), length(db.text)) >= 0.6
), sym AS (
    SELECT doc_a AS src, doc_b AS dst FROM edges
    UNION
    SELECT doc_b AS src, doc_a AS dst FROM edges
), walk(node, reach) AS (
    SELECT src, src FROM sym
    UNION
    SELECT w.node, s.dst FROM walk w JOIN sym s ON s.src = w.reach
)
SELECT node AS doc_id, MIN(reach) AS cluster_id FROM walk GROUP BY node
"""


@register("dup_clusters_cc", _SQL_CC)
def q_dup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: LSH candidates -> edit-distance verify -> connected
    components (iterative min-label propagation, operators/dedup.py
    dup_clusters).  The curation end-game: keep cluster_id == doc_id rows,
    drop the rest.  Oracle = DuckDB WITH RECURSIVE transitive closure —
    an iterative Spark algorithm still gets a full value-hash check."""
    edges = q_lsh_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    # the verified pair graph is tiny vs the corpus — run the label-
    # propagation rounds at edge-sized shuffle width, not the session's
    # corpus-sized default (200 near-empty tasks per round otherwise)
    return dd.dup_clusters(edges, shuffle_partitions=8)


@register(
    "hash_sample_stratified",
    f"""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_sampled,
       {_dsum_sql('n_chars')} AS chars_sampled
FROM documents
WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 = 0
GROUP BY lang, source
""",
)
def q_hash_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample: md5(doc_id) bucket == 0, reported
    per (lang, source) stratum.  Unlike rand()-based sampling this is
    reproducible across engines, partitionings and reruns — the property a
    training-data pipeline needs for auditable holdouts.  The predicate is
    a pure column expression, so it pushes into the scan and samples
    WITHOUT a full-table materialization."""
    docs = _docs(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 10
    )
    return (
        docs.filter(bucket == 0)
        .groupBy("lang", "source")
        .agg(F.count("*").alias("n_sampled"), dsum("n_chars").alias("chars_sampled"))
    )


# --------------------------------------------------------------------------
# round-2 widening: corpus-curation operators (normalization, benchmark
# contamination, quality-aware dedup survivors, context-window packing)
# --------------------------------------------------------------------------


@register(
    "clean_text_normalized",
    """
SELECT doc_id,
       array_to_string(list_filter(string_split(text, ' '),
                                   t -> t NOT IN ('the', 'a')), ' ')
           AS clean_text,
       CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ('the', 'a'))) AS INTEGER) AS n_removed
FROM documents
""",
)
def q_clean_text_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization as a rewrite: stopwords dropped, text re-joined —
    the filter/rewrite stage every LLM-corpus pipeline runs before
    tokenization.  Pure array expressions, zero shuffle, scales as map
    work."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    kept = F.filter(toks, lambda t: ~t.isin(*tx.EN_STOPWORDS))
    removed = F.filter(toks, lambda t: t.isin(*tx.EN_STOPWORDS))
    return docs.select(
        "doc_id",
        F.array_join(kept, " ").alias("clean_text"),
        F.size(removed).alias("n_removed"),
    )


@register(
    "contamination_overlap",
    _SQL_SHINGLES
    + """
, bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
train AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY doc_id),
hits AS (
    SELECT t.doc_id, COUNT(*) AS n_contaminated
    FROM train t JOIN bench b ON t.s = b.s
    GROUP BY t.doc_id
)
SELECT s.doc_id,
       CAST(s.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       COALESCE(h.n_contaminated, 0) * 1.0 / s.n_shingles AS contamination_rate
FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
""",
)
def q_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each training doc's
    distinct shingles that appear anywhere in a held-out benchmark set
    (docs with doc_id % 97 == 0 stand in for the benchmark).  The standard
    n-gram-overlap decontamination pass; the benchmark shingle set is the
    small join side — broadcast at scale, so the corpus never shuffles."""
    ss = dd.shingle_sets(_docs(spark, sf_dir), n=3)
    bench = (
        ss.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    )
    train = ss.filter(F.col("doc_id") % 97 != 0)
    sizes = train.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    hits = (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        sizes.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (
                F.coalesce("n_contaminated", F.lit(0)) * 1.0 / F.col("n_shingles")
            ).alias("contamination_rate"),
        )
    )


@register(
    "dedup_survivors_quality",
    f"""
WITH scored AS (
    SELECT doc_id, text,
           0.4 * least(1.0, len({_SQL_TOKS}) / 100.0)
           + 0.3 * (len(list_distinct({_SQL_TOKS})) * 1.0 / len({_SQL_TOKS}))
           + 0.3 * (len(list_filter({_SQL_TOKS}, t -> t IN ('the', 'a'))) * 1.0
                    / len({_SQL_TOKS})) AS quality_score
    FROM documents
), ranked AS (
    SELECT doc_id, text, quality_score,
           ROW_NUMBER() OVER (PARTITION BY text
                              ORDER BY quality_score DESC, doc_id ASC) AS rn,
           COUNT(*) OVER (PARTITION BY text) AS n_dups
    FROM scored
)
SELECT doc_id AS survivor_id,
       CAST(n_dups AS BIGINT) AS n_dups,
       quality_score
FROM ranked WHERE rn = 1
""",
)
def q_dedup_survivors_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup survivor selection: per duplicate-text group
    keep the HIGHEST-quality doc (ties → smallest doc_id) — the curation
    end-game where dedup meets quality scoring, instead of the arbitrary
    min-id survivor.  One window over the text key; same shuffle count as
    plain exact dedup."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    scored = tx.quality_score(docs).select("doc_id", "quality_score").join(
        docs.select("doc_id", "text"), "doc_id"
    )
    w = Window.partitionBy("text").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    wc = Window.partitionBy("text")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n_dups", F.count("*").over(wc))
        .filter(F.col("rn") == 1)
        .select(
            F.col("doc_id").alias("survivor_id"), "n_dups", "quality_score"
        )
    )


@register(
    "token_budget_packing",
    f"""
WITH toks AS (
    SELECT doc_id, lang, source,
           CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens
    FROM documents
), packed AS (
    SELECT lang, source, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (
               PARTITION BY lang, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens) / 500.0) AS BIGINT) AS pack_id
    FROM toks
)
SELECT lang, source, pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       {_dsum_sql('n_tokens')} AS total_tokens
FROM packed
GROUP BY lang, source, pack_id
""",
)
def q_token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: docs are packed in deterministic doc_id
    order into ~500-token bins per (lang, source) stratum — the sequence-
    packing stage of LLM training-data prep.  Per-stratum windows keep the
    cumulative sum distributed (one shuffle on the stratum key); a global
    pack order would serialize, so stratify first at scale."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", "lang", "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 500.0).cast(
            "bigint"
        ),
    )
    return packed.groupBy("lang", "source", "pack_id").agg(
        F.count("*").alias("n_docs"), dsum("n_tokens").alias("total_tokens")
    )


@register(
    "multimodal_frame_sample",
    """
WITH ascii_docs AS (
    -- byte-chunking == char-chunking only for pure ASCII; the same
    -- length==octet_length guard is applied on the Spark side, so the
    -- equivalence is structural, not an assumption about testdata
    SELECT doc_id, text FROM documents
    WHERE length(text) = octet_length(encode(text))
), frames AS (
    SELECT doc_id AS media_id,
           CAST(i - 1 AS BIGINT) AS frame_no,
           substring(text, CAST((i - 1) * 64 + 1 AS INTEGER), 64) AS frame
    FROM ascii_docs,
         UNNEST(range(1, CAST(ceil(length(text) / 64.0) AS BIGINT) + 1)) AS u(i)
)
SELECT media_id, frame_no,
       CAST(length(frame) AS BIGINT) AS n_frame_bytes,
       md5(frame) AS frame_md5
FROM frames
WHERE frame_no % 3 = 0
""",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-to-many multimodal stage end-to-end: payload -> sampled
    'frames' (every 3rd 64-byte chunk) via mapInPandas, value-checked
    against a pure-SQL reconstruction.  The SQL twin chunks CHARACTERS, so
    both sides restrict to pure-ASCII docs (char length == byte length) —
    the oracle applies the identical guard — making the byte/char
    equivalence structural rather than an assumption about testdata.
    Pins the Arrow batch-explosion shape a real video frame sampler uses."""
    from .operators import multimodal as mm

    docs = _docs(spark, sf_dir).filter(
        F.length("text") == F.octet_length("text")
    )
    media = mm.attach_payload(docs, "doc_id", "text", kind="video")
    return mm.frame_sample(media, every_n=3)


@register(
    "multimodal_audio_chunks",
    """
WITH ascii_docs AS (
    SELECT doc_id, text FROM documents
    WHERE length(text) = octet_length(encode(text))
), chunks AS (
    SELECT doc_id AS media_id,
           CAST(i - 1 AS BIGINT) AS chunk_no,
           substring(text, CAST((i - 1) * 256 + 1 AS INTEGER), 256) AS chunk
    FROM ascii_docs,
         UNNEST(range(1, CAST(ceil(length(text) / 256.0) AS BIGINT) + 1)) AS u(i)
), samples AS (
    SELECT media_id, chunk_no,
           ascii(substring(chunk, CAST(j AS INTEGER), 1)) - 128 AS amp
    FROM chunks, UNNEST(range(1, length(chunk) + 1)) AS v(j)
)
SELECT media_id, chunk_no,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(SUM(ABS(amp)) AS BIGINT) AS sum_abs_amp,
       CAST(SUM(amp * amp) AS BIGINT) AS energy,
       CAST(MAX(ABS(amp)) AS BIGINT) AS peak_amp
FROM samples
GROUP BY media_id, chunk_no
""",
)
def q_multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio branch of the multimodal family: payload -> per-256-byte-chunk
    loudness stats through the Arrow mapInPandas stage (the VAD/loudness
    front-end shape).  The fake decode reads the payload as unsigned 8-bit
    PCM centered at 128, so every stat is an integer aggregate the oracle
    recomputes per character (ascii(c) - 128 == payload byte for the
    ASCII-guarded docs, same guard as multimodal_frame_sample) —
    engine-portable with zero float audio math."""
    from .operators import multimodal as mm

    docs = _docs(spark, sf_dir).filter(
        F.length("text") == F.octet_length("text")
    )
    media = mm.attach_payload(docs, "doc_id", "text", kind="audio")
    return mm.audio_chunk_features(media)


# --------------------------------------------------------------------------
# intra-document repetition removal + corpus vocabulary coverage — two more
# LLM-corpus curation stages (SURVEY.md §2.10 ✚)
# --------------------------------------------------------------------------


@register(
    "para_dedup_intra_doc",
    """
WITH sent AS (
    SELECT doc_id, i AS pos, p[i] AS sentence
    FROM (SELECT doc_id, string_split(text, '. ') AS p FROM documents),
         UNNEST(range(1, len(p) + 1)) AS u(i)
), first AS (
    SELECT doc_id, sentence, MIN(pos) AS pos
    FROM sent GROUP BY doc_id, sentence
), rebuilt AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           string_agg(sentence, '. ' ORDER BY pos) AS dedup_text
    FROM first GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, '. ')) AS INTEGER) AS n_sentences,
       r.n_unique,
       r.dedup_text
FROM documents d JOIN rebuilt r USING (doc_id)
""",
)
def q_para_dedup_intra_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition removal: drop repeated sentences within a
    document, keeping the FIRST occurrence and the original order — the
    within-page boilerplate-strip stage of corpus curation (distinct from
    cross-document dedup).

    All map-side until the per-(doc, sentence) group-by; the rebuild is a
    sorted collect_list per doc — order restored from the kept minimum
    position, so the output text is deterministic.  No UDFs."""
    docs = _docs(spark, sf_dir)
    sent = docs.select(
        "doc_id", F.posexplode(F.split("text", r"\. ")).alias("pos", "sentence")
    )
    first = sent.groupBy("doc_id", "sentence").agg(F.min("pos").alias("pos"))
    rebuilt = first.groupBy("doc_id").agg(
        F.count("*").alias("n_unique"),
        F.concat_ws(
            ". ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sentence"))),
                lambda s: s["sentence"],
            ),
        ).alias("dedup_text"),
    )
    return docs.select(
        "doc_id", F.size(F.split("text", r"\. ")).alias("n_sentences")
    ).join(rebuilt, "doc_id")


@register(
    "vocab_top_coverage",
    """
WITH tok AS (
    SELECT t AS token
    FROM (SELECT string_split(text, ' ') AS toks FROM documents),
         UNNEST(toks) AS u(t)
), counts AS (
    SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token
), total AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts
), top AS (
    SELECT token, cnt FROM counts ORDER BY cnt DESC, token ASC LIMIT 20
)
SELECT token,
       CAST(cnt AS BIGINT) AS cnt,
       CAST(ROW_NUMBER() OVER w AS INTEGER) AS rnk,
       CAST(SUM(cnt) OVER w AS BIGINT) * 1.0 / total AS cum_share
FROM top CROSS JOIN total
WINDOW w AS (ORDER BY cnt DESC, token ASC ROWS UNBOUNDED PRECEDING)
""",
)
def q_vocab_top_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build: top-20 corpus tokens with rank and CUMULATIVE
    corpus share — the coverage curve that sizes a tokenizer vocabulary.

    Scale design: the heavy work (token counts) is one map-side-combined
    groupBy; the top-k is TakeOrdered (heap, no global sort of the vocab);
    the cumulative window then runs over exactly k rows, so the
    single-partition window is bounded by k — never by the vocabulary.
    The corpus-total divisor arrives as a broadcast 1-row aggregate
    (integer sums, so the shares divide bit-identically cross-engine)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    top = counts.orderBy(F.desc("cnt"), F.asc("token")).limit(20)
    w = (
        Window.orderBy(F.desc("cnt"), F.asc("token"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "token",
            "cnt",
            F.row_number().over(w).alias("rnk"),
            (F.sum("cnt").over(w) / F.col("total")).alias("cum_share"),
        )
    )


@register(
    "bigram_lm_score",
    f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
    SELECT doc_id, s AS bigram
    FROM toks, UNNEST(
        CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)),
                                 i -> concat_ws(' ', t[i], t[i+1]))
             ELSE [] END) AS u(s)
), cb AS (
    SELECT bigram, split_part(bigram, ' ', 1) AS w1, COUNT(*) AS c2
    FROM bg GROUP BY bigram
), c1 AS (
    -- context totals derived from the bigram VOCAB (sum of c2 per w1),
    -- not from a third pass over the corpus-sized bg relation
    SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM cb GROUP BY w1
), scored AS (
    -- DECIMAL(18,9) quantization: ln() differs by 1 ulp between libm and
    -- the JVM (same device as tfidf_top_terms)
    SELECT bg.doc_id, CAST(ln(cb.c2 * 1.0 / c1.c1) AS DECIMAL(18,9)) AS lp
    FROM bg JOIN cb USING (bigram) JOIN c1 USING (w1)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       {_dsum_sql('lp')} / COUNT(*) AS avg_logprob
FROM scored GROUP BY doc_id
""",
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained bigram LM quality score: per document, the mean
    conditional log-probability ln(c(w1 w2)/c(w1 ·)) of its bigrams under
    the corpus's own bigram counts — the KenLM-style perplexity filter of
    LLM corpus curation, reduced to pure DataFrame algebra.

    The bigram relation comes from the bound-token shingle builder
    (n=2), so the split evaluates once per row and the explode feeds
    doc_id-clustered partitions; the model 'training' is two count
    aggregations over that same relation; scoring joins the counts back
    by bigram / by context.  Counts are exact ints (division bit-identical
    cross-engine); ln is quantized to DECIMAL(18,9) for portability and
    the per-doc mean uses the decimal-exact sum."""
    docs = _docs(spark, sf_dir)
    bg = (
        tx.shingle_arrays(docs, 2)
        .select("doc_id", F.explode_outer("sh").alias("bigram"))
        .filter(F.col("bigram").isNotNull())
    )
    # context totals derive from the bigram VOCAB (sum of c2 per w1) — the
    # naive bg.groupBy("w1") would re-evaluate the corpus-sized bigram
    # relation a third time; this aggregates the (small) count table instead
    cb = bg.groupBy("bigram").agg(F.count("*").alias("c2")).withColumn(
        "w1", F.substring_index("bigram", " ", 1)
    )
    c1 = cb.groupBy("w1").agg(F.sum("c2").alias("c1"))
    scored = (
        bg.join(cb, "bigram")
        .join(c1, "w1")
        .select(
            "doc_id",
            F.log(F.col("c2") * 1.0 / F.col("c1")).cast("decimal(18,9)").alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (dsum("lp") / F.count("*")).alias("avg_logprob"),
    )


@register(
    "corpus_mix_plan",
    """
WITH strata AS (
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang, source
), tot AS (
    SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
           CAST(COUNT(*) AS BIGINT) AS n_strata
    FROM strata
)
SELECT lang, source, n_docs, n_tokens,
       n_docs * 1.0 / total_docs AS doc_share,
       (1.0 / n_strata) / (n_docs * 1.0 / total_docs) AS mix_ratio
FROM strata CROSS JOIN tot
""",
)
def q_corpus_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-mixing plan: per (lang, source) stratum, doc/token counts,
    corpus share, and the up/down-sampling ratio that would equalize the
    mixture (uniform target; swap in configured weights in production) —
    the DoReMi-style reweighting input, computed relationally.

    One aggregation over the corpus; the totals come back as a broadcast
    1-row crossJoin (no second scan, no collect).  mix_ratio > 1 means
    up-sample (repeat/epoch), < 1 means down-sample (hash-sample at that
    rate — see hash_sample_stratified)."""
    docs = _docs(spark, sf_dir)
    strata = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    tot = strata.agg(
        F.sum("n_docs").alias("total_docs"), F.count("*").alias("n_strata")
    )
    return strata.crossJoin(F.broadcast(tot)).select(
        "lang", "source", "n_docs", "n_tokens",
        (F.col("n_docs") * 1.0 / F.col("total_docs")).alias("doc_share"),
        ((1.0 / F.col("n_strata")) / (F.col("n_docs") * 1.0 / F.col("total_docs"))).alias("mix_ratio"),
    )


@register(
    "streaming_dedup_events",
    # First-seen-per-key over an at-least-once feed is plain ANSI SQL on the
    # un-replayed source: the replay delivers byte-identical rows, so the
    # survivor per event_id equals ROW_NUMBER()=1 over events itself.
    """
SELECT event_id, user_id, event_type
FROM (
    SELECT event_id, user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY event_id
                              ORDER BY ts, user_id, event_type) AS rn
    FROM events
) t
WHERE rn = 1
""",
)
def q_streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest dedup (SURVEY.md §2.9/§2.10): the events feed is
    delivered TWICE (an at-least-once source replay), and
    ``dropDuplicatesWithinWatermark`` on event_id emits each event once —
    with state bounded by the watermark horizon instead of growing with
    every key ever seen.  The oracle is the batch first-seen-per-key
    (ROW_NUMBER()=1) over the un-replayed feed — redelivered rows are
    byte-identical, so the streaming survivor set must hash-match it.
    Output is cached per (query, sf_dir): composing the registry repeatedly
    does not re-run the stream."""
    import shutil
    import tempfile

    from . import roles
    from .streaming import incremental as st

    key = ("streaming_dedup_events", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="stream_dedup_")
        events = roles.load_events(spark, sf_dir)
        events.write.mode("overwrite").parquet(f"{tmp}/events")
        events.write.mode("append").parquet(f"{tmp}/events")  # replayed delivery
        stream = st.read_events_stream(spark, f"{tmp}/events")
        st.run_available_now(
            st.streaming_dedup(stream), f"{tmp}/out", f"{tmp}/ckpt"
        )
        shutil.rmtree(f"{tmp}/events", ignore_errors=True)
        shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/out"
    return spark.read.parquet(out).select(
        "event_id", "user_id", "event_type"
    )


@register(
    "streaming_window_counts",
    # Append-mode windowed aggregation emits exactly the windows the final
    # watermark has closed: window_end <= max(ts) - horizon.  That cutoff
    # IS the oracle — plain SQL over the same events with the same
    # finalization predicate, decimal-exact value sums on both sides.
    f"""
WITH wm AS (SELECT max(ts) - INTERVAL 1 DAY AS wm FROM events),
agg AS (
    SELECT date_trunc('day', ts) AS day_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {_dsum_sql('value')} AS total_value
    FROM events GROUP BY date_trunc('day', ts), event_type
)
SELECT CAST(epoch_us(day_start) AS BIGINT) AS day_us, event_type,
       n_events, total_value
FROM agg, wm
WHERE day_start + INTERVAL 1 DAY <= wm.wm
""",
)
def q_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window aggregation (SURVEY.md §2.9), executed
    with trigger(availableNow) and an append-mode parquet sink: a window
    row is written once, when the watermark passes its end — the
    incremental twin of the batch GROUP BY day.  The oracle replays the
    exact finalization rule (window_end <= max(ts) - watermark horizon),
    measured empirically and pinned by test_daily_counts_append_cutoff, so
    streaming execution earns a real value-hash row.  Output cached per
    (query, sf_dir) like the other streaming queries."""
    import shutil
    import tempfile

    from . import roles
    from .streaming import incremental as st

    key = ("streaming_window_counts", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="stream_window_")
        events = roles.load_events(spark, sf_dir)
        events.write.mode("overwrite").parquet(f"{tmp}/events")
        stream = st.read_events_stream(spark, f"{tmp}/events")
        st.run_available_now(
            st.daily_counts(stream), f"{tmp}/out", f"{tmp}/ckpt"
        )
        shutil.rmtree(f"{tmp}/events", ignore_errors=True)
        shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/out"
    return spark.read.parquet(out).select(
        F.unix_micros("day_start").alias("day_us"),
        "event_type",
        "n_events",
        "total_value",
    )


@register(
    "token_outlier_docs",
    """
WITH toks AS (
    SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
    FROM documents
), med AS (
    SELECT lang, median(n_tokens) AS med FROM toks GROUP BY lang
), dev AS (
    SELECT t.doc_id, t.lang, CAST(t.n_tokens AS INTEGER) AS n_tokens,
           m.med, ABS(t.n_tokens - m.med) AS adev
    FROM toks t JOIN med m USING (lang)
), mad AS (
    SELECT lang, median(adev) AS mad FROM dev GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_tokens, d.med, m.mad,
       CAST(d.adev > 3 * m.mad AS INTEGER) AS is_outlier
FROM dev d JOIN mad m USING (lang)
""",
)
def q_token_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flagging for corpus QA: per language stratum, docs
    whose token count deviates more than 3 MAD (median absolute
    deviation) from the stratum median — the robust-statistics filter
    that survives heavy-tailed length distributions where mean/stddev
    break.

    Two exact median aggregations (counts are small ints and deviations
    exact binary fractions, so the interpolated medians are bit-identical
    cross-engine) joined back per stratum — no windows, no UDFs."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    med = toks.groupBy("lang").agg(F.median("n_tokens").alias("med"))
    dev = toks.join(F.broadcast(med), "lang").withColumn(
        "adev", F.abs(F.col("n_tokens") - F.col("med"))
    )
    mad = dev.groupBy("lang").agg(F.median("adev").alias("mad"))
    return dev.join(F.broadcast(mad), "lang").select(
        "doc_id", "lang", "n_tokens", "med", "mad",
        (F.col("adev") > 3 * F.col("mad")).cast("int").alias("is_outlier"),
    )


# --------------------------------------------------------------------------
# round-4 widening: the dedup END-GAME (cluster -> prune the corpus) and
# Gopher-style rule-based quality gating
# --------------------------------------------------------------------------

#: the CC oracle rewritten as a CTE so the pruned corpus can anti-join it
_SQL_CC_PRUNE = _SQL_CC.replace(
    "SELECT node AS doc_id, MIN(reach) AS cluster_id FROM walk GROUP BY node",
    """, comp AS (
    SELECT node AS doc_id, MIN(reach) AS cluster_id FROM walk GROUP BY node
)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id <> cluster_id)
""",
)


@register("near_dup_corpus_prune", _SQL_CC_PRUNE)
def q_near_dup_corpus_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's END PRODUCT: the corpus with near-duplicate
    cluster non-representatives REMOVED (keep the min-doc_id member of
    each connected component; unclustered docs untouched) — what actually
    ships to training after minhash -> LSH -> verify -> cluster.

    Scale shape: the drop list is (cluster members - representatives),
    which is tiny relative to the corpus, so the final prune is a
    BROADCAST anti-join — the full corpus never shuffles.  Oracle = the
    recursive-CTE closure of dup_clusters_cc anti-joined in SQL."""
    edges = q_lsh_verified_pairs(spark, sf_dir).select("doc_a", "doc_b")
    clusters = dd.dup_clusters(edges, shuffle_partitions=8)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    docs = _docs(spark, sf_dir)
    return docs.join(F.broadcast(drop), "doc_id", "left_anti").select(
        "doc_id", "lang", "source"
    )


_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


@register(
    "gopher_quality_flags",
    f"""
WITH t AS (
    SELECT doc_id, string_split(text, ' ') AS toks, length(text) AS nc
    FROM documents
), s AS (
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(len(list_filter(toks,
                x -> x IN {_STOPWORDS!r})) AS BIGINT) AS n_stop,
           nc
    FROM t
)
SELECT doc_id, n_words, n_stop,
       (nc - (n_words - 1)) * 1.0 / n_words AS mean_word_len,
       n_stop * 1.0 / n_words AS stop_frac,
       CAST(n_words >= 20
            AND (nc - (n_words - 1)) * 1.0 / n_words BETWEEN 3 AND 10
            AND n_stop * 1.0 / n_words >= 0.04 AS INTEGER) AS passes
FROM s
""",
)
def q_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality gate in the Gopher/C4 style: per-document word
    count, mean word length and stopword fraction, combined into one
    boolean ``passes`` column (min length, plausible word-length band,
    minimum stopword presence — the cheap filters run before any model-
    based scoring touches the corpus).

    Pure column expressions over one split (no UDFs, no shuffle — a scan-
    shaped map job at any scale).  Exactness: all three stats derive from
    integer counts (mean word length via chars minus separators over the
    single-space corpus), so the doubles are int-ratio-exact and the
    flags engine-portable."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    n_words = F.size(toks).cast("bigint")
    n_stop = F.size(
        F.filter(toks, lambda x: x.isin(*_STOPWORDS))
    ).cast("bigint")
    base = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_stop.alias("n_stop"),
        F.length("text").alias("nc"),
    )
    mean_wl = (F.col("nc") - (F.col("n_words") - 1)) * 1.0 / F.col("n_words")
    stop_frac = F.col("n_stop") * 1.0 / F.col("n_words")
    return base.select(
        "doc_id",
        "n_words",
        "n_stop",
        mean_wl.alias("mean_word_len"),
        stop_frac.alias("stop_frac"),
        (
            (F.col("n_words") >= 20)
            & mean_wl.between(3, 10)
            & (stop_frac >= 0.04)
        ).cast("int").alias("passes"),
    )


@register(
    "repetition_signals",
    """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g2 AS (
    SELECT doc_id, s FROM toks, UNNEST(
        CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)),
                                 i -> concat_ws(' ', t[i], t[i+1]))
             ELSE [] END) AS u(s)
), c2 AS (SELECT doc_id, s, COUNT(*) AS c FROM g2 GROUP BY doc_id, s),
s2 AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_2grams,
           CAST(MAX(c) AS BIGINT) AS top_2gram_cnt
    FROM c2 GROUP BY doc_id
),
g3 AS (
    SELECT doc_id, s FROM toks, UNNEST(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
             ELSE [] END) AS u(s)
), c3 AS (SELECT doc_id, s, COUNT(*) AS c FROM g3 GROUP BY doc_id, s),
s3 AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_3grams,
           CAST(COALESCE(SUM(c) FILTER (WHERE c > 1), 0) AS BIGINT) AS dup_3gram_cnt
    FROM c3 GROUP BY doc_id
),
sent AS (
    SELECT doc_id,
           CAST(len(string_split(text, '. ')) AS BIGINT) AS n_sent,
           CAST(len(list_distinct(string_split(text, '. '))) AS BIGINT) AS n_uniq_sent
    FROM documents
)
SELECT d.doc_id,
       COALESCE(n_2grams, 0) AS n_2grams,
       COALESCE(top_2gram_cnt, 0) AS top_2gram_cnt,
       COALESCE(n_3grams, 0) AS n_3grams,
       COALESCE(dup_3gram_cnt, 0) AS dup_3gram_cnt,
       n_sent, n_uniq_sent,
       CASE WHEN COALESCE(n_2grams, 0) > 0
            THEN top_2gram_cnt * 1.0 / n_2grams ELSE 0.0 END AS top_2gram_frac,
       CASE WHEN COALESCE(n_3grams, 0) > 0
            THEN dup_3gram_cnt * 1.0 / n_3grams ELSE 0.0 END AS dup_3gram_frac,
       (n_sent - n_uniq_sent) * 1.0 / n_sent AS dup_sent_frac
FROM documents d
LEFT JOIN s2 USING (doc_id)
LEFT JOIN s3 USING (doc_id)
JOIN sent USING (doc_id)
""",
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: fraction of 2-gram
    occurrences claimed by the single most frequent 2-gram, fraction of
    3-gram occurrences whose gram repeats, and duplicate-sentence
    fraction — the repetition-removal half of the Gopher quality rules
    (the length/stopword half is ``gopher_quality_flags``).

    Two shuffle stages per n-gram width (doc+gram count, then per-doc
    roll-up) — the same scan-shaped pipeline as the simhash sketch, no
    UDFs.  Every fraction is a small-integer ratio, so the doubles are
    bit-identical across engines."""
    docs = _docs(spark, sf_dir)

    def gram_stats(n: int, aggs):
        grams = dd._exploded_shingles(docs, n)
        cnt = grams.groupBy("doc_id", "shingle").agg(F.count("*").alias("c"))
        return cnt.groupBy("doc_id").agg(*aggs)

    s2 = gram_stats(
        2,
        [
            F.sum("c").alias("n_2grams"),
            F.max("c").alias("top_2gram_cnt"),
        ],
    )
    s3 = gram_stats(
        3,
        [
            F.sum("c").alias("n_3grams"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias(
                "dup_3gram_cnt"
            ),
        ],
    )
    sents = F.split("text", r"\. ")
    sent = docs.select(
        "doc_id",
        F.size(sents).cast("bigint").alias("n_sent"),
        F.size(F.array_distinct(sents)).cast("bigint").alias("n_uniq_sent"),
    )
    out = (
        docs.select("doc_id")
        .join(s2, "doc_id", "left")
        .join(s3, "doc_id", "left")
        .join(sent, "doc_id")
    )
    n2 = F.coalesce("n_2grams", F.lit(0))
    n3 = F.coalesce("n_3grams", F.lit(0))
    return out.select(
        "doc_id",
        n2.alias("n_2grams"),
        F.coalesce("top_2gram_cnt", F.lit(0)).alias("top_2gram_cnt"),
        n3.alias("n_3grams"),
        F.coalesce("dup_3gram_cnt", F.lit(0)).alias("dup_3gram_cnt"),
        "n_sent",
        "n_uniq_sent",
        F.when(n2 > 0, F.col("top_2gram_cnt") * 1.0 / F.col("n_2grams"))
        .otherwise(F.lit(0.0))
        .alias("top_2gram_frac"),
        F.when(n3 > 0, F.col("dup_3gram_cnt") * 1.0 / F.col("n_3grams"))
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
        ((F.col("n_sent") - F.col("n_uniq_sent")) * 1.0 / F.col("n_sent")).alias(
            "dup_sent_frac"
        ),
    )


@register(
    "cdc_apply_replay",
    # The CDC merge is deterministic given a sequenced feed, so plain SQL
    # can replay it wholesale: the final table holds, per key, the change
    # with the highest (batch, seq) — unless that change is a delete.
    """
WITH feed AS (
    SELECT user_id AS k,
           event_id AS seq,
           event_id % 4 AS batch,
           CASE WHEN event_id % 7 = 0 THEN 'D'
                WHEN event_id % 3 = 0 THEN 'I'
                ELSE 'U' END AS op,
           value AS v
    FROM events
),
ranked AS (
    SELECT k, seq, op, v,
           ROW_NUMBER() OVER (PARTITION BY k
                              ORDER BY batch DESC, seq DESC) AS rn
    FROM feed
)
SELECT k AS user_id, seq AS last_seq, v AS last_value
FROM ranked
WHERE rn = 1 AND op <> 'D'
""",
)
def q_cdc_apply_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE end-to-end as an oracle-paired query (SURVEY.md §2.9):
    the events table becomes a deterministic I/U/D change feed (key =
    user_id, sequence = event_id, four batches by event_id % 4), applied
    batch-by-batch with ``apply_cdc(seq_col=...)`` onto a key-bucket-
    partitioned parquet table — partition-restricted merges, per-partition
    atomic swaps, explicit sequence ordering, delete semantics, all
    through the REAL merge path.  The oracle replays the same feed in
    plain SQL: per key, the change with the highest (batch, seq) wins,
    deletes remove the key.  Output is cached per (query, sf_dir) like the
    other streaming-family queries — composing the registry repeatedly
    does not re-run the merges."""
    import shutil
    import tempfile

    from . import roles
    from .streaming import incremental as st

    key = ("cdc_apply_replay", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="cdc_replay_")
        events = roles.load_events(spark, sf_dir)
        feed = events.select(
            F.col("user_id").alias("k"),
            F.col("event_id").alias("seq"),
            (F.col("event_id") % 4).alias("_batch"),
            F.when(F.col("event_id") % 7 == 0, F.lit("D"))
            .when(F.col("event_id") % 3 == 0, F.lit("I"))
            .otherwise(F.lit("U"))
            .alias("_op"),
            F.col("value").alias("v"),
        )
        for b in range(4):
            st.apply_cdc(
                feed.filter(F.col("_batch") == b).drop("_batch"),
                f"{tmp}/table",
                ["k"],
                seq_col="seq",
            )
        shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/table"
    return st.read_merged(spark, out).select(
        F.col("k").alias("user_id"),
        F.col("seq").alias("last_seq"),
        F.col("v").alias("last_value"),
    )


@register(
    "streaming_stream_stream_journeys",
    # One availableNow batch holds BOTH sides, so the watermark never gets
    # a chance to evict state mid-run and the stream-stream join's output
    # is exactly the batch join under the same time-range bound — that
    # batch join IS the oracle.
    """
WITH sessions AS (
    SELECT event_id AS session_id, user_id, ts, event_type AS channel_name
    FROM events
),
conversions AS (
    SELECT event_id AS conv_id, user_id, ts AS conv_ts
    FROM events WHERE event_type = 'purchase'
)
SELECT c.conv_id AS conversion_id,
       s.session_id,
       CAST(epoch_us(s.ts) AS BIGINT) AS ts_us,
       s.channel_name AS channel_label
FROM conversions c
JOIN sessions s
  ON s.user_id = c.user_id
 AND s.ts <= c.conv_ts
 AND s.ts >= c.conv_ts - INTERVAL 7 DAY
""",
)
def q_streaming_stream_stream_journeys(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAM-STREAM journey build (SURVEY.md §2.9): both sessions AND
    conversions arrive as file-source streams; the inner join carries
    watermarks on both sides plus the two-sided time-range bound
    (``conv_ts - 7d <= ts <= conv_ts``) that lets Spark EVICT join state
    — the knob that makes the join runnable forever at scale.  Run with
    ONE availableNow batch (no rate limit), the output equals the batch
    join under the same range bound exactly, which is the value-hash
    oracle.  Output cached per (query, sf_dir) like the other streaming
    queries."""
    import shutil
    import tempfile

    from . import roles
    from .streaming import incremental as st

    key = ("streaming_stream_stream_journeys", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="stream_ss_journeys_")
        events = roles.load_events(spark, sf_dir)
        events.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/sessions")
        conv = roles.conversions_from_events(events)
        conv.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/conversions")
        from .sources.io import ensure_instant_timestamps

        ensure_instant_timestamps(spark)
        s_stream = (
            spark.readStream.schema(events.schema).parquet(f"{tmp}/sessions")
        )
        c_stream = (
            spark.readStream.schema(conv.schema).parquet(f"{tmp}/conversions")
        )
        j = st.incremental_journeys_stream_stream(
            s_stream, c_stream, lookback_days=7
        )
        st.run_available_now(j, f"{tmp}/out", f"{tmp}/ckpt")
        shutil.rmtree(f"{tmp}/sessions", ignore_errors=True)
        shutil.rmtree(f"{tmp}/conversions", ignore_errors=True)
        shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/out"
    return spark.read.parquet(out).select(
        "conversion_id",
        "session_id",
        F.unix_micros("timestamp").alias("ts_us"),
        "channel_label",
    )


from .queries import _SQL_REPORT  # noqa: E402  (the batch report oracle)

# the incremental pipeline's journeys table carries no engagement flags, so
# its attribution model is LINEAR (ihc = 1/n per conversion) — swap the
# position-engagement scoring CTEs of the batch report oracle for the
# linear one, keeping every downstream CTE byte-identical.  Fail SOFT if
# _SQL_REPORT is ever reshaped (markers gone): the query degrades to a
# rows-only registry row instead of killing the module import (and with
# it every other query).
if ", scored AS (" in _SQL_REPORT and ", session_data AS (" in _SQL_REPORT:
    _SQL_REPORT_LINEAR = (
        _SQL_REPORT[: _SQL_REPORT.index(", scored AS (")]
        + """, attributed AS (
    SELECT conversion_id, session_id,
           1.0 / COUNT(*) OVER (PARTITION BY conversion_id) AS ihc
    FROM journeys
)
"""
        + _SQL_REPORT[_SQL_REPORT.index(", session_data AS (") :]
    )
else:  # pragma: no cover - defensive
    _SQL_REPORT_LINEAR = None


@register("streaming_incremental_report", _SQL_REPORT_LINEAR)
def q_streaming_incremental_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE pipeline maintained INCREMENTALLY (SURVEY.md §2.9
    flagship): sessions stream in as four micro-batches; each batch
    upserts its journey rows, delta-recomputes attribution for exactly
    the touched conversions, and rebuilds exactly the touched
    (channel, date) report groups — partition-restricted merges on all
    three tables.  The declared contract is bit-identical equality with
    the batch pipeline, so the batch channel_report SQL (with the linear
    attribution the incremental journeys feed supports) IS the oracle:
    the driver hash-checks incremental materialized-view maintenance
    end-to-end.  Output cached per (query, sf_dir)."""
    import shutil
    import tempfile

    from . import roles
    from .streaming import incremental as st

    key = ("streaming_incremental_report", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="stream_report_")
        events = roles.load_events(spark, sf_dir)
        sessions = roles.sessions_from_events(events)
        conversions = roles.conversions_from_events(events)
        costs = roles.session_costs_from_events(events)
        # two micro-batches: enough to prove delta maintenance (batch 2 must
        # rebuild groups batch 1 already wrote) at half the per-query cost
        sessions.repartition(2).write.parquet(f"{tmp}/sessions")
        from .sources.io import ensure_instant_timestamps

        ensure_instant_timestamps(spark)
        stream = (
            spark.readStream.schema(sessions.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{tmp}/sessions")
            .withColumnRenamed("session_id", "event_id")
            .withColumnRenamed("channel_name", "event_type")
        )
        st.incremental_report(
            stream,
            conversions,
            sessions,
            costs,
            f"{tmp}/journeys",
            f"{tmp}/attribution",
            f"{tmp}/report",
            f"{tmp}/ckpt",
        )
        for d in ("sessions", "journeys", "attribution", "ckpt"):
            shutil.rmtree(f"{tmp}/{d}", ignore_errors=True)
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/report"
    return st.read_merged(spark, out)


@register(
    "streaming_sessionize",
    # Append-mode session windows emit when the final watermark passes the
    # window end (last event + gap).  The oracle replays both rules in
    # plain SQL: gap-islands that split on gap > 30 min (session_window
    # merges touching [ts, ts+gap) intervals — an exactly-30-min gap stays
    # ONE session, same rule as the batch sessionizer; pinned by
    # test_sessionize_stream_boundary_and_cutoff) and the finalization
    # cutoff session_end <= max(ts) - 1 hour.
    f"""
WITH wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events),
marked AS (
    SELECT user_id, ts, value,
           CASE WHEN LAG(ts) OVER w IS NULL
                     OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
    SELECT user_id, ts, value,
           SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sess_no
    FROM marked
), sess AS (
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {_dsum_sql('value')} AS total_value
    FROM numbered GROUP BY user_id, sess_no
)
SELECT user_id,
       CAST(epoch_us(session_start) AS BIGINT) AS start_us,
       CAST(epoch_us(session_end) AS BIGINT) AS end_us,
       n_events, total_value
FROM sess, wm
WHERE session_end <= wm.wm
""",
)
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL streaming sessionization (SURVEY.md §2.9): session_window
    with a 30-minute gap over the event stream, append mode — a session
    row is written once, when the watermark passes its end (last event +
    gap).  The oracle replays the exact semantics in SQL: gap-islands
    splitting on >= 30 min (session_window's strict-overlap rule) and the
    finalization cutoff, with decimal-exact value sums on both sides.
    Output cached per (query, sf_dir)."""
    import shutil
    import tempfile

    from . import roles
    from .streaming import incremental as st

    key = ("streaming_sessionize", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="stream_sess_")
        events = roles.load_events(spark, sf_dir)
        events.write.mode("overwrite").parquet(f"{tmp}/events")
        stream = st.read_events_stream(spark, f"{tmp}/events")
        st.run_available_now(
            st.sessionize_stream(stream), f"{tmp}/out", f"{tmp}/ckpt"
        )
        shutil.rmtree(f"{tmp}/events", ignore_errors=True)
        shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/out"
    return spark.read.parquet(out).select(
        "user_id",
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
        "n_events",
        "total_value",
    )


@register(
    "streaming_upsert_precedence",
    # Two availableNow runs feed the same table: run 1 the even-event
    # rows, run 2 the odd ones, keyed by user.  Overwrite-by-key keeps a
    # user's rows from the LAST run that contained the user — plain SQL:
    # odd rows, plus even rows of users with no odd events.
    """
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_id % 2 = 1
   OR user_id NOT IN (
        SELECT DISTINCT user_id FROM events WHERE event_id % 2 = 1
   )
""",
)
def q_streaming_upsert_precedence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The foreachBatch overwrite-by-key SINK end-to-end (SURVEY.md §2.9):
    two availableNow runs (separate checkpoints — e.g. tonight's feed
    after last night's) upsert into one key-bucket-partitioned table; the
    second run REPLACES the keys it carries and leaves the rest — the
    reference's DELETE+INSERT re-run, streaming form, through the real
    checkpointed writer.  The oracle states the precedence rule in plain
    SQL.  Output cached per (query, sf_dir)."""
    import shutil
    import tempfile

    from . import roles
    from .streaming import incremental as st

    key = ("streaming_upsert_precedence", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="stream_upsert_")
        events = roles.load_events(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "value", "ts"
        )
        for run, parity in (("run1", 0), ("run2", 1)):
            feed = events.filter(F.col("event_id") % 2 == parity).drop("ts")
            feed.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/{run}")
            stream = spark.readStream.schema(feed.schema).parquet(f"{tmp}/{run}")
            st.run_foreach_batch_upsert(
                stream, f"{tmp}/table", f"{tmp}/ck_{run}", keys=["user_id"]
            )
            shutil.rmtree(f"{tmp}/{run}", ignore_errors=True)
            shutil.rmtree(f"{tmp}/ck_{run}", ignore_errors=True)
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/table"
    return st.read_merged(spark, out).select(
        "event_id", "user_id", "event_type", "value"
    )


@register(
    "streaming_stateful_first_seen",
    # The custom stateful operator's output surface is closed-form: with a
    # deterministic (ts_us, fingerprint) processing order, first_seen_us is
    # MIN(ts_us) per (user, fingerprint) and seq_no is the rank of that
    # first occurrence within the user's timeline — plain ANSI SQL.  Spark
    # truncates double->long toward zero; trunc() matches.
    """
WITH src AS (
    SELECT user_id,
           event_type || '|' ||
               CAST(CAST(trunc(value * 10) AS BIGINT) AS VARCHAR)
               AS fingerprint,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us
    FROM events
), firsts AS (
    SELECT user_id, fingerprint, MIN(ts_us) AS first_seen_us
    FROM src GROUP BY user_id, fingerprint
)
SELECT user_id, fingerprint, first_seen_us,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY first_seen_us, fingerprint)
            AS BIGINT) AS seq_no
FROM firsts
""",
)
def q_streaming_stateful_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandasWithState CUSTOM operator end-to-end (SURVEY.md
    §2.9): per-user first-seen dedup with a running sequence number, state
    sharded by user across executors.  One availableNow batch over a single
    source file keeps batch boundaries out of the semantics, and the
    operator's (ts_us, fingerprint) sort makes emission order — and
    therefore seq_no — shuffle-layout-independent, so the whole output
    value-hashes against the batch SQL replay.  With this, EVERY §2.9
    streaming component carries a value-hash oracle.  Output cached per
    (query, sf_dir)."""
    import shutil
    import tempfile

    from . import roles
    from .streaming import incremental as st
    from .streaming.stateful import streaming_first_seen

    key = ("streaming_stateful_first_seen", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="stream_stateful_")
        events = roles.load_events(spark, sf_dir)
        src = events.select(
            "user_id",
            F.concat_ws(
                "|",
                "event_type",
                (F.col("value") * 10).cast("long").cast("string"),
            ).alias("fingerprint"),
            F.unix_micros("ts").alias("ts_us"),
        )
        src.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/src")
        stream = spark.readStream.schema(src.schema).parquet(f"{tmp}/src")
        st.run_available_now(
            streaming_first_seen(stream), f"{tmp}/out", f"{tmp}/ckpt"
        )
        shutil.rmtree(f"{tmp}/src", ignore_errors=True)
        shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/out"
    return spark.read.parquet(out)


_SQL_SEMDEDUP_DOT_EC = _SQL_DOT.format(a="e.embedding", b="c.cvec")
_SQL_SEMDEDUP_DOT_AB = _SQL_DOT.format(a="a.embedding", b="b.embedding")


@register(
    "semdedup_prune",
    # Same centroid set (vec_id < 8), same left-to-right double fold for
    # every dot product, same (cos DESC, cid ASC) assignment tie-break and
    # keep-the-lowest-id prune rule — bit-identical survivors.
    _SQL_NORMED
    + f"""
, cents AS (
    SELECT vec_id AS cid, embedding AS cvec, norm AS cnorm
    FROM e WHERE vec_id < 8
), scored AS (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cos_c DESC, cid ASC) AS rn
    FROM (
        SELECT e.vec_id, c.cid,
               {_SQL_SEMDEDUP_DOT_EC} / (e.norm * c.cnorm) AS cos_c
        FROM e CROSS JOIN cents c
    )
), m AS (
    SELECT e.vec_id, e.embedding, e.norm, s.cid AS cluster
    FROM e JOIN scored s ON e.vec_id = s.vec_id AND s.rn = 1
), pruned AS (
    SELECT DISTINCT a.vec_id
    FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id > b.vec_id
    WHERE {_SQL_SEMDEDUP_DOT_AB} / (a.norm * b.norm) >= 0.3
)
SELECT m.vec_id, CAST(m.cluster AS INTEGER) AS cluster
FROM m LEFT JOIN pruned p ON m.vec_id = p.vec_id
WHERE p.vec_id IS NULL
""",
)
def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup end-game (SURVEY.md §2.10): nearest-centroid
    assignment (broadcast K-row centroid frame, map-side) then
    within-cluster near-dup prune (self-join co-partitioned on the cluster
    key — K independent (n/K)^2 problems instead of one n^2).  Centroids
    here are the deterministic seed set vec_id < 8; production swaps in
    KMeans centroids without touching the prune semantics.  Threshold 0.3
    suits the synthetic near-orthogonal embeddings (real corpora with
    trained encoders use ~0.95+); integer-only output surface."""
    emb = _emb(spark, sf_dir)
    return sim.semdedup_prune(
        emb, emb.filter(F.col("vec_id") < 8), threshold=0.3
    )


@register(
    "contamination_bloom",
    # The bloom is a pre-filter, not a semantics change: no false
    # negatives, and every surviving candidate is re-verified with the
    # exact join — so the oracle is the plain all-join contamination SQL.
    _SQL_SHINGLES
    + """
, bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
train AS (SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
FROM train t JOIN bench b ON t.s = b.s
GROUP BY t.doc_id
""",
)
def q_contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-accelerated decontamination (SURVEY.md §2.10): the benchmark
    shingle set folds into a 16 KiB bitmap carried inside the plan as a
    literal array; the corpus-sized first pass becomes a scan-local
    map-only probe (no join, no shuffle — at 100 TB the difference between
    shipping a reference relation to every task and shipping 2 KiB of
    longs), and only the few bloom-positive candidates reach the exact
    verify join.  Output is EXACT — same rows as the all-join path, which
    is the oracle."""
    from .operators import bloom as bl

    ss = dd.shingle_sets(_docs(spark, sf_dir), n=3)
    bench = ss.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    train = ss.filter(F.col("doc_id") % 97 != 0)
    return bl.contaminated_docs_bloom(train, bench, m_bits=1 << 17, k=5)


@register(
    "dataset_split",
    # engine-portable md5 bucket (the hash_sample_stratified idiom):
    # reproducible across engines, partitionings and reruns.
    """
SELECT doc_id,
       CASE WHEN b < 90 THEN 'train'
            WHEN b < 95 THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id,
           CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 100 AS b
    FROM documents
)
""",
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (90/5/5) by md5 bucket —
    the auditable-holdout requirement of a training pipeline: a document's
    split never changes across reruns, engines, or repartitioning, and
    membership is a pure column expression (no stored assignment table,
    no rand()).  Map-only at any scale; the same bucket expression pushes
    into scans as a predicate when materializing one split."""
    docs = _docs(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    return docs.select(
        "doc_id",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "length_bucket_batches",
    # integer inputs all the way: padding_frac is the same int-ratio
    # double in both engines.
    """
WITH lens AS (
    SELECT doc_id, len(string_split(text, ' ')) AS n_toks
    FROM documents
), placed AS (
    SELECT doc_id, n_toks, n_toks // 32 AS len_bucket,
           (ROW_NUMBER() OVER (PARTITION BY (n_toks // 32)
                               ORDER BY doc_id) - 1) // 16 AS batch_no
    FROM lens
)
SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
       CAST(batch_no AS BIGINT) AS batch_no,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(n_toks) AS BIGINT) AS max_len,
       CAST(SUM(n_toks) AS BIGINT) AS sum_len,
       (MAX(n_toks) * COUNT(*) - SUM(n_toks)) * 1.0
           / (MAX(n_toks) * COUNT(*)) AS padding_frac
FROM placed
GROUP BY len_bucket, batch_no
""",
)
def q_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketed batch assembly: documents bucket by token
    count (width 32), then fill fixed-size batches of 16 in deterministic
    doc_id order; the output is the per-batch padding accounting — the
    quantity length-grouped batching exists to minimize (pad-to-max waste
    within each batch).  ONE shuffle end-to-end: the window partitions by
    len_bucket, and the following (len_bucket, batch_no) aggregate is
    satisfied by that same hash partitioning (subset-key clustering), so
    no second Exchange."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    lens = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_toks")
    ).withColumn("len_bucket", F.expr("n_toks div 32"))
    w = Window.partitionBy("len_bucket").orderBy("doc_id")
    placed = lens.withColumn(
        "batch_no", F.floor((F.row_number().over(w) - 1) / 16).cast("long")
    )
    return (
        placed.groupBy(
            F.col("len_bucket").cast("long").alias("len_bucket"),
            F.col("batch_no").cast("long").alias("batch_no"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.max("n_toks").cast("long").alias("max_len"),
            F.sum("n_toks").alias("sum_len"),
        )
        .select(
            "len_bucket", "batch_no", "n_docs", "max_len", "sum_len",
            (
                (F.col("max_len") * F.col("n_docs") - F.col("sum_len")) * 1.0
                / (F.col("max_len") * F.col("n_docs"))
            ).alias("padding_frac"),
        )
    )


@register(
    "bpe_merge_ranks",
    # all adjacent occurrences (NOT distinct — merge ranking weighs raw
    # frequency), deterministic top-50 by (count DESC, pair ASC).
    """
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
pairs AS (
    SELECT u.p
    FROM toks, UNNEST(
        CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)),
                                 i -> concat_ws(' ', t[i], t[i+1]))
             ELSE [] END) AS u(p)
)
SELECT p AS pair, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs GROUP BY p
ORDER BY n_pairs DESC, pair ASC
LIMIT 50
""",
)
def q_bpe_merge_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-selection step of BPE tokenizer training (Sennrich et al.
    2016): rank adjacent symbol pairs by corpus frequency — the most
    frequent pair is the next merge rule.  Full training iterates
    (re-tokenize, re-count); each round is exactly this job, so the
    round's cost shape is what matters at scale: map-side pair explosion,
    ONE count shuffle, and top-k as TakeOrderedAndProject (never a global
    sort of the pair space)."""
    docs = _docs(spark, sf_dir)
    t = F.split("text", " ")
    pairs = docs.select(
        F.explode(
            F.zip_with(
                F.slice(t, F.lit(1), F.size(t) - 1),
                F.slice(t, F.lit(2), F.size(t) - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), F.asc("pair"))
        .limit(50)
    )


@register(
    "stratified_topk_sample",
    # fixed-size-per-stratum companion of hash_sample_stratified's
    # rate-based sample: k=20 docs per (lang, source), chosen by the
    # engine-portable md5 order — an eval set that never changes.
    """
SELECT lang, source, doc_id
FROM (
    SELECT lang, source, doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM documents
)
WHERE rn <= 20
""",
)
def q_stratified_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample: exactly 20 docs per (lang, source)
    stratum, selected by md5(doc_id) order — pseudo-random but stable
    across engines, partitionings and reruns (the eval-set construction
    requirement; rand()-based sampling can't give this).  One shuffle on
    the stratum key; the per-group ROW_NUMBER never materializes more
    than each group's stream."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "source", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )


@register(
    "bpe_train_merges",
    # iterative driver-loop algorithm (like ivf_topk's KMeans): each round
    # re-tokenizes with the previous rule, so no single SQL statement
    # expresses the result — rows-only here; EXACTNESS evidence is the
    # property test pinning the trainer to a pure-Python reference
    # implementation (test_text_dedup_similarity.py).
    None,
)
def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-loop training (SURVEY.md §2.10): four rounds of
    count-pairs → take-top → re-tokenize over the documents corpus.
    Per-round work is fully distributed (one count shuffle + a pure-
    expression greedy re-tokenization, no UDFs); driver traffic is ONE
    (pair, count) row per round.  Returns the learned merge table in
    rank order — deterministic (frequency desc, pair asc tie-break)."""
    from .operators import bpe

    rules = bpe.train_bpe_merges(_docs(spark, sf_dir), n_merges=4)
    return spark.createDataFrame(
        [
            {
                "rank": i + 1,
                "pair_left": left,
                "pair_right": right,
                "n_pairs": n,
            }
            for i, (left, right, n) in enumerate(rules)
        ],
        "rank int, pair_left string, pair_right string, n_pairs long",
    )


@register(
    "winnow_token_fingerprints",
    # TOKEN-level winnowing (k=3-token grams, w=4) — the char-gram
    # variant is winnow_fingerprints above; this one feeds
    # winnow_overlap_pairs.  Same md5-bucket hash both engines;
    # window-min SET is tie-break invariant, so DISTINCT makes the
    # compare exact.
    """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
kg AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                     i -> CAST(concat('0x', substring(
                              md5(concat_ws(' ', t[i], t[i+1], t[i+2])),
                              1, 8)) AS BIGINT))
                ELSE [] END AS h
    FROM toks
), mins AS (
    SELECT doc_id,
           CASE WHEN len(h) >= 4
                THEN list_transform(range(1, len(h) - 2),
                                    j -> list_min(h[j:j+3]))
                WHEN len(h) > 0 THEN [list_min(h)]
                ELSE [] END AS m
    FROM kg
)
SELECT DISTINCT doc_id, u.fp_hash
FROM mins, UNNEST(m) AS u(fp_hash)
""",
)
def q_winnow_token_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (MOSS) over the corpus — the rolling-hash
    document fingerprinting entry of SURVEY §2.10: k-gram hashes, window
    minima, distinct selected set per doc.  Guarantees any ≥ w+k-1 token
    overlap between documents shares a fingerprint; selected density is
    ~2/(w+1) of grams, so the fingerprint relation is a small fraction of
    the shingle relation the full-overlap join would need."""
    return tx.winnow_fingerprints(_docs(spark, sf_dir), k=3, w=4)


_SQL_WINNOW = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
kg AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                     i -> CAST(concat('0x', substring(
                              md5(concat_ws(' ', t[i], t[i+1], t[i+2])),
                              1, 8)) AS BIGINT))
                ELSE [] END AS h
    FROM toks
), mins AS (
    SELECT doc_id,
           CASE WHEN len(h) >= 4
                THEN list_transform(range(1, len(h) - 2),
                                    j -> list_min(h[j:j+3]))
                WHEN len(h) > 0 THEN [list_min(h)]
                ELSE [] END AS m
    FROM kg
), fp AS (
    SELECT DISTINCT doc_id, u.fp_hash
    FROM mins, UNNEST(m) AS u(fp_hash)
)
"""


@register(
    "winnow_overlap_pairs",
    # posting-list cap (<= 200 docs per fingerprint) applied in BOTH
    # engines, so the relations compared are identical.
    _SQL_WINNOW
    + """
, caps AS (
    SELECT fp_hash FROM fp GROUP BY fp_hash
    HAVING COUNT(*) > 1 AND COUNT(*) <= 200
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fp a JOIN fp b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
JOIN caps c ON a.fp_hash = c.fp_hash
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 3
""",
)
def q_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style overlap report: document pairs sharing >= 3 winnowed
    fingerprints.  The pair generation is the inverted-index one-pass
    explode (never a shingle-relation self-join), running on the ~2/(w+1)
    winnowed fraction of the gram stream."""
    return tx.winnow_overlap_pairs(
        _docs(spark, sf_dir), k=3, w=4, min_shared=3, max_postings=200
    )


@register(
    "jsonl_roundtrip_stats",
    # the oracle reads the ORIGINAL parquet: equality proves the JSONL
    # sink+source pair is lossless for the whole corpus, not just typed.
    f"""
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_toks
FROM documents
GROUP BY lang, source
""",
)
def q_jsonl_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink end-to-end (SURVEY.md §2.1): the corpus is
    written to JSONL and read back with an explicit schema, then
    aggregated; the oracle computes the same aggregate over the ORIGINAL
    parquet — a hash match means the interchange format corpora actually
    ship in round-trips losslessly through the engine (strings with
    quotes/unicode included).  Output cached per (query, sf_dir)."""
    import tempfile

    from .sources import io as eio

    key = ("jsonl_roundtrip_stats", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="jsonl_rt_")
        docs = _docs(spark, sf_dir)
        eio.write_jsonl(docs, f"{tmp}/docs")
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/docs"
    docs_schema = _docs(spark, sf_dir).schema
    back = eio.read_jsonl(spark, out, docs_schema)
    return back.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split("text", " "))).alias("total_toks"),
    )


_SQL_NGRAM3 = """UNNEST(
        CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t) - 1),
                                 i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
             ELSE [] END) AS u(s)"""


@register(
    "curated_corpus_manifest",
    # the whole curation chain in one statement, same gate order as the
    # Spark side: quality -> exact dedup -> decontaminate -> split.
    f"""
WITH base AS (
    SELECT doc_id, text, string_split(text, ' ') AS toks,
           length(text) AS nc
    FROM documents
), q AS (
    SELECT doc_id, text FROM base
    WHERE doc_id % 97 <> 0
      AND len(toks) >= 20
      AND (nc - (len(toks) - 1)) * 1.0 / len(toks) BETWEEN 3 AND 10
      AND len(list_filter(toks, x -> x IN {_STOPWORDS!r})) * 1.0
          / len(toks) >= 0.04
), surv AS (
    SELECT doc_id, text FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        FROM q
    ) WHERE rn = 1
), st AS (SELECT doc_id, string_split(text, ' ') AS t FROM surv),
sh AS (SELECT DISTINCT doc_id, s FROM st, {_SQL_NGRAM3}),
bt AS (SELECT doc_id, string_split(text, ' ') AS t
       FROM documents WHERE doc_id % 97 = 0),
bench AS (SELECT DISTINCT s FROM bt, {_SQL_NGRAM3}),
contaminated AS (
    SELECT DISTINCT sh.doc_id FROM sh JOIN bench ON sh.s = bench.s
)
SELECT doc_id,
       CASE WHEN b < 90 THEN 'train'
            WHEN b < 95 THEN 'val'
            ELSE 'test' END AS split
FROM (
    SELECT doc_id,
           CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 100 AS b
    FROM surv
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
)
""",
)
def q_curated_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation END-GAME as one composed pipeline (SURVEY.md §2.10):
    Gopher quality gate → exact dedup (min-doc_id survivor) → benchmark
    decontamination → deterministic split assignment; output is the
    manifest of what actually ships to training, with its split.

    Every stage is the scale-shaped operator the registry checks
    individually: the quality gate is a map-only expression, dedup is one
    text-key shuffle, decontamination runs the BLOOM prefilter before the
    exact verify join (operators/bloom.py — corpus-side map-only), and the
    split is a pure hash expression.  The oracle re-states the whole chain
    in one SQL statement, so the hash match certifies the COMPOSITION, not
    just the parts."""
    from pyspark.sql import Window

    from .operators import bloom as bl

    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    n_words = F.size(toks)
    nc = F.length("text")
    mean_wl = (nc - (n_words - 1)) * 1.0 / n_words
    stop_frac = (
        F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS))) * 1.0 / n_words
    )
    q = docs.filter(
        (F.col("doc_id") % 97 != 0)
        & (n_words >= 20)
        & mean_wl.between(3, 10)
        & (stop_frac >= 0.04)
    ).select("doc_id", "text")
    w = Window.partitionBy("text").orderBy("doc_id")
    surv = (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    bench_sh = (
        dd.shingle_sets(docs.filter(F.col("doc_id") % 97 == 0), n=3)
        .select("shingle")
        .distinct()
    )
    contaminated = bl.contaminated_docs_bloom(
        dd.shingle_sets(surv, n=3), bench_sh, m_bits=1 << 17, k=5
    ).select("doc_id")
    clean = surv.join(contaminated, "doc_id", "left_anti")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    return clean.select(
        "doc_id",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "multimodal_image_stats",
    # fake decode = consecutive payload byte triples as (r,g,b); for the
    # ASCII-guarded docs each byte is ascii(char), so the oracle recomputes
    # every integer stat per character position.
    """
WITH ascii_docs AS (
    SELECT doc_id, text FROM documents
    WHERE length(text) = octet_length(encode(text))
), sam AS (
    SELECT doc_id AS media_id,
           CAST((j - 1) // 3 AS BIGINT) AS px,
           (j - 1) % 3 AS ch,
           ascii(substring(text, CAST(j AS INTEGER), 1)) AS v
    FROM ascii_docs,
         UNNEST(range(1, 3 * (length(text) // 3) + 1)) AS u(j)
), agg AS (
    SELECT media_id,
           CAST(COUNT(DISTINCT px) AS BIGINT) AS n_px,
           CAST(SUM(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
           CAST(SUM(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
           CAST(SUM(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
    FROM sam GROUP BY media_id
), lum AS (
    SELECT media_id, CAST(MAX(luma) AS BIGINT) AS peak_luma
    FROM (SELECT media_id, px, SUM(v) AS luma FROM sam GROUP BY media_id, px)
    GROUP BY media_id
)
SELECT a.media_id, a.n_px, a.sum_r, a.sum_g, a.sum_b, l.peak_luma
FROM agg a JOIN lum l ON a.media_id = l.media_id
""",
)
def q_multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image branch of the multimodal family: payload -> per-image channel
    sums and peak luma through the Arrow mapInPandas stage (the
    normalize/threshold image front end).  The fake decode reads payload
    byte triples as pixels, so every stat is an integer aggregate the
    oracle recomputes per character; the REAL path decodes an actual
    24-bit BMP with the stdlib through the SAME stage
    (decode_bmp_rgb24, unit-tested with a generated BMP)."""
    from .operators import multimodal as mm

    docs = _docs(spark, sf_dir).filter(
        F.length("text") == F.octet_length("text")
    )
    media = mm.attach_payload(docs, "doc_id", "text", kind="image")
    return mm.image_pixel_stats(media)


@register(
    "streaming_near_dup_admission",
    # Two in-order batches (even doc_ids then odd): admitted = first doc
    # per full signature in (batch, doc_id) order, plus unshingleable
    # docs.  Signature SQL identical to minhash_signatures.
    _SQL_SHINGLES_MULTI
    + f"""
, sig AS (
    SELECT doc_id,
       {_MINHASH_AGGS_SQL}
    FROM sh GROUP BY doc_id
), ranked AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (
               PARTITION BY mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7
               ORDER BY doc_id % 2, doc_id) AS rn
    FROM sig
)
SELECT doc_id, CAST(doc_id % 2 AS INTEGER) AS from_batch
FROM ranked WHERE rn = 1
UNION ALL
SELECT doc_id, CAST(doc_id % 2 AS INTEGER) AS from_batch
FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM sig)
""",
)
def q_streaming_near_dup_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup admission end-to-end (SURVEY.md §2.9/§2.10):
    the corpus streams in TWO micro-batches (even doc_ids, then odd) and
    each batch is deduplicated against the admitted-signature table —
    exact-signature mode, so the admitted set is first-seen-per-signature
    in (batch, doc_id) order, which the oracle restates in plain SQL over
    the un-split corpus.  Cross-batch dups die against the history table,
    intra-batch dups against the batch window — both paths exercised by
    the real checkpointed foreachBatch writer.  Output cached per
    (query, sf_dir)."""
    import os as _os
    import shutil
    import tempfile

    from .streaming import near_dup as nd

    key = ("streaming_near_dup_admission", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="stream_neardup_")
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        src = f"{tmp}/src"
        for i, parity in enumerate((0, 1)):
            docs.filter(F.col("doc_id") % 2 == parity).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            newest = max(
                (
                    _os.path.join(src, f)
                    for f in _os.listdir(src)
                    if f.startswith("part-")
                ),
                key=_os.path.getmtime,
            )
            _os.utime(newest, (1_700_000_000 + i, 1_700_000_000 + i))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        nd.run_foreach_batch_near_dup(
            stream, f"{tmp}/novel", f"{tmp}/state", f"{tmp}/ckpt"
        )
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/novel"
    return spark.read.parquet(out).select(
        "doc_id", F.col("_batch").cast("int").alias("from_batch")
    )


@register(
    "csv_roundtrip_stats",
    # same aggregate as jsonl_roundtrip_stats: the oracle reads the
    # ORIGINAL parquet, so equality proves the schema'd CSV sink+source
    # pair (the reference's interchange format, quoting included) is
    # lossless for the whole corpus.
    """
SELECT lang, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_toks
FROM documents
GROUP BY lang, source
""",
)
def q_csv_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema'd CSV sink/source end-to-end (SURVEY.md §2.1 — the
    reference's OWN interchange format, cj_builder.py:130 /
    run_pipeline.py:98): corpus out to header CSV, back in with the
    explicit schema (never inferred — the reference's round-trip silently
    re-types timestamps), aggregated, hash-matched against the original
    parquet.  Output cached per (query, sf_dir)."""
    import tempfile

    from .sources import io as eio

    key = ("csv_roundtrip_stats", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="csv_rt_")
        eio.write_csv(_docs(spark, sf_dir), f"{tmp}/docs")
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/docs"
    back = eio.read_csv(spark, out, _docs(spark, sf_dir).schema)
    return back.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(F.split("text", " "))).alias("total_toks"),
    )


# --------------------------------------------------------------------------
# RAG chunking: overlapping token windows with provenance (round 5)
# --------------------------------------------------------------------------


@register(
    "doc_chunk_windows",
    """
WITH toks AS (
    SELECT doc_id, source, string_split(text, ' ') AS t,
           len(string_split(text, ' ')) AS n
    FROM documents
), spans AS (
    SELECT doc_id, source, t, n,
           UNNEST(range(0, GREATEST(1, (n - 10 + 29) // 30))) AS chunk_id
    FROM toks
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, source,
       CAST(len(t[chunk_id * 30 + 1 : chunk_id * 30 + 40]) AS BIGINT)
           AS n_tokens,
       array_to_string(t[chunk_id * 30 + 1 : chunk_id * 30 + 40], ' ')
           AS chunk_text
FROM spans
""",
)
def q_doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-prep chunking: each document becomes overlapping token windows
    (window 40 tokens, stride 30 → 10-token overlap) with provenance
    (doc_id, chunk_id, source) — what an embedding/indexing stage
    consumes.  Chunk count = max(1, ⌈(n−overlap)/stride⌉), all integer
    arithmetic; the final chunk is allowed short so no token is dropped.

    Spark: tokenize once, explode a `sequence` of chunk ids (bounded
    one-to-few flatMap — the multimodal frame-sample shape), `slice` +
    `array_join` per chunk.  Pure column expressions, no UDF.

    Scale: map-only — no shuffle at all; chunking 100 TB of text is
    embarrassingly parallel and this plan keeps it that way (the
    downstream embedding stage repartitions as it needs).
    """
    docs = _docs(spark, sf_dir)
    window, stride, overlap = 40, 30, 10
    toks = docs.select(
        "doc_id",
        "source",
        F.split("text", " ").alias("t"),
        F.size(F.split("text", " ")).alias("n"),
    )
    spans = toks.select(
        "doc_id",
        "source",
        "t",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.lit(1),
                    F.floor(
                        (F.col("n") - overlap + (stride - 1)) / stride
                    ).cast("int"),
                )
                - 1,
            )
        ).alias("chunk_id"),
    )
    chunk = F.slice(
        F.col("t"), F.col("chunk_id") * stride + 1, window
    )
    return spans.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        "source",
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# Python streaming DataSource end-to-end (round 5): the synthetic stream
# drained under a real checkpoint, then aggregated
# --------------------------------------------------------------------------


@register(
    "streaming_synthetic_source",
    """
WITH src AS (
    SELECT i % 997 AS user_id, i % 13 AS bucket,
           (i * 31) % 100000 AS value_cents
    FROM (SELECT UNNEST(range(0, 20000)) AS i)
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(value_cents) AS BIGINT) AS total_cents,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM src
GROUP BY bucket
""",
)
def q_streaming_synthetic_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python STREAMING DataSource (`sources/pyds.py`,
    `simpleStreamReader`) executed for real: the bounded synthetic stream
    drains through a checkpointed availableNow run into a parquet sink,
    and the landed table aggregates per bucket — hash-exact against the
    DuckDB `range()` restatement, proving the offset-tracked stream
    delivers exactly-once the relation the batch source declares.
    Output cached per (query, sf_dir); `sf_dir` is unused (programmatic
    source)."""
    import shutil
    import tempfile

    from .sources.pyds import register_synthetic_source
    from .streaming import incremental as st

    key = ("streaming_synthetic_source", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        register_synthetic_source(spark)
        tmp = tempfile.mkdtemp(prefix="stream_pyds_")
        stream = (
            spark.readStream.format("synthetic_events")
            .option("total_rows", 20000)
            .option("batch_rows", 20000)
            .load()
        )
        st.run_available_now(stream, f"{tmp}/out", f"{tmp}/ckpt")
        shutil.rmtree(f"{tmp}/ckpt", ignore_errors=True)
        out = _STREAM_OUT_CACHE[key] = f"{tmp}/out"
    landed = spark.read.parquet(out)
    return landed.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("value_cents").alias("total_cents"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "ngram_coverage_score",
    # all-integer counts + one int-ratio double at the edge; the md5
    # bucket reuses the dataset_split idiom so the reference/candidate
    # halves are reproducible across engines and reruns.
    """
WITH split AS (
    SELECT doc_id, string_split(text, ' ') AS t,
           CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 100 AS b
    FROM documents
), grams AS (
    SELECT doc_id, b,
           unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i+1])) AS g
    FROM split
), vocab AS (
    SELECT DISTINCT g FROM grams WHERE b < 50
), cand AS (
    SELECT doc_id, g FROM grams WHERE b >= 50
)
SELECT c.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(COUNT(v.g) AS BIGINT) AS n_covered,
       COUNT(v.g) * 1.0 / COUNT(*) AS coverage
FROM cand c LEFT JOIN vocab v ON c.g = v.g
GROUP BY c.doc_id
""",
)
def q_ngram_coverage_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus n-gram COVERAGE scoring (the CCNet-style novelty /
    domain-fit signal a curation pipeline uses instead of an LM when
    log-probs would be engine-unportable): the md5-bucket half of the
    corpus (b < 50, same idiom as `dataset_split`) acts as the
    REFERENCE; every candidate document is scored by the fraction of
    its word-bigram occurrences that appear anywhere in the reference
    vocabulary.  Low coverage ⇒ novel/out-of-domain (or noise); high ⇒
    well-trodden text.  Occurrence-level counting (no within-doc
    dedup), so the score weights repeated phrases — the behavior LM
    perplexity would have.

    Exactness: bigram membership is string equality, counts are
    bigints, coverage is one int-ratio double — hash-identical in both
    engines (no logs, no float accumulation).

    Scale: bigram explosion is map-side; the vocab is DISTINCT bigrams
    only (≪ occurrences) and the probe is one shuffled equi-join on the
    gram key — at 100 TB you'd xxhash64 the grams to bigints first
    (same join shape, 8-byte keys) and Bloom-prefilter the probe side
    exactly like `contamination_bloom` does; the oracle keeps plain
    strings for portability."""
    docs = _docs(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    # the size >= 2 guard matters: Spark's sequence(0, size-2) with a
    # single-token doc is sequence(0, -1) = [0, -1] (DESCENDING), which
    # would fabricate two null-gram rows while DuckDB's range(1, 1) is
    # empty and drops the doc — short docs must vanish in BOTH engines
    grams = (
        docs.select(
            "doc_id", bucket.alias("b"), F.split("text", " ").alias("t")
        )
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            "b",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2),"
                    " i -> concat(t[i], ' ', t[i+1]))"
                )
            ).alias("g"),
        )
    )
    vocab = grams.filter(F.col("b") < 50).select("g").distinct()
    cand = grams.filter(F.col("b") >= 50).select("doc_id", "g")
    probe = cand.join(
        vocab.withColumn("_hit", F.lit(1)), "g", "left"
    )
    return probe.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.count("_hit").alias("n_covered"),
        (F.count("_hit") * F.lit(1.0) / F.count("*")).alias("coverage"),
    )


@register(
    "bpe_encode_tokens",
    # encode(corpus, train(corpus)): rule k operates on rule k-1's output,
    # so no single SQL statement expresses the composition — rows-only;
    # EXACTNESS evidence is the encode parity property test pinning
    # bpe_encode to the pure-Python reference encoder per rule count
    # (test_text_dedup_similarity.py), same discipline as the trainer.
    None,
)
def q_bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE corpus ENCODE under the trained vocab (round 8 — the map-only
    pass every tokenizer pipeline runs after training, closing the
    train-only gap): learn 4 merges, apply them corpus-wide as chained
    JVM greedy folds (no UDF, no shuffle — one narrow stage), and report
    per-language token economics: raw whitespace tokens vs BPE tokens vs
    how many output tokens are merged units.  These are the
    tokens-per-doc numbers a packing/budgeting stage consumes
    (`token_budget_packing` approximates them with whitespace counts)."""
    from .operators import bpe

    docs = _docs(spark, sf_dir)
    rules = bpe.train_bpe_merges(docs, n_merges=4)
    enc = bpe.bpe_encode(docs, rules, text_col="text", out_col="_toks")
    return (
        enc.select(
            "lang",
            F.size(F.split("text", " ")).alias("_n_raw"),
            F.size("_toks").alias("_n_bpe"),
            F.size(
                F.filter("_toks", lambda t: t.contains(" "))
            ).alias("_n_merged"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n_raw").cast("bigint").alias("raw_tokens"),
            F.sum("_n_bpe").cast("bigint").alias("bpe_tokens"),
            F.sum("_n_merged").cast("bigint").alias("merged_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "snapshot_expectations_gate",
    # replay the two expectation rules relationally: per-rule violation
    # counts + what was admitted vs quarantined
    """
WITH d AS (
    SELECT (n_chars >= 100) AS ok_len,
           (lang IN ('en', 'de', 'fr', 'es')) AS ok_lang
    FROM documents
)
SELECT 'admitted' AS metric, CAST(COUNT(*) AS BIGINT) AS n
FROM d WHERE ok_len AND ok_lang
UNION ALL
SELECT 'quarantined', CAST(COUNT(*) AS BIGINT)
FROM d WHERE NOT (ok_len AND ok_lang)
UNION ALL
SELECT 'viol:min_chars', CAST(COUNT(*) AS BIGINT) FROM d WHERE NOT ok_len
UNION ALL
SELECT 'viol:lang_known', CAST(COUNT(*) AS BIGINT) FROM d WHERE NOT ok_lang
""",
)
def q_snapshot_expectations_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXPECTATIONS-gated corpus admission (round 8 —
    `snapshot_append_expect`, the DLT expect_or_drop/quarantine family
    on snapshot tables): gate the documents corpus through two quality
    rules (length floor, known language), append the clean rows to a
    snapshot table and the violating rows to a QUARANTINE snapshot
    table tagged with every failed rule — then report the metrics FROM
    THE TABLES (one read each, proving the split actually landed):
    admitted/quarantined row counts + per-rule violation counts from
    the quarantine's ``_violations`` tags.  The oracle replays the
    rules as SQL filters.  Output cached per (query, sf_dir)."""
    import tempfile

    from .operators.quality import RowRule
    from .sources import snapshots as sn

    key = ("snapshot_expectations_gate", sf_dir)
    out = _STREAM_OUT_CACHE.get(key)
    if out is None:
        tmp = tempfile.mkdtemp(prefix="snap_expect_")
        rules = [
            RowRule("min_chars", lambda: F.col("n_chars") >= 100),
            RowRule(
                "lang_known",
                lambda: F.col("lang").isin("en", "de", "fr", "es"),
            ),
        ]
        sn.snapshot_append_expect(
            spark,
            _docs(spark, sf_dir),
            f"{tmp}/clean",
            rules,
            on_violation="quarantine",
            quarantine_root=f"{tmp}/quarantine",
        )
        out = _STREAM_OUT_CACHE[key] = tmp
    # every metric row must exist even at ZERO count (the oracle always
    # emits 4 rows), and a violation-free run never creates the
    # quarantine table at all — scalar aggs + a static rule frame
    # left-joined with the observed tags
    if sn.current_version(f"{out}/quarantine") is not None:
        quar = sn.read_snapshot(spark, f"{out}/quarantine")
    else:
        quar = spark.createDataFrame(
            [], "_violations ARRAY<STRING>"
        )
    admitted = sn.read_snapshot(spark, f"{out}/clean").agg(
        F.count("*").alias("n")
    ).select(F.lit("admitted").alias("metric"), "n")
    quarantined = quar.agg(F.count("*").alias("n")).select(
        F.lit("quarantined").alias("metric"), "n"
    )
    tag_counts = (
        quar.select(F.explode("_violations").alias("rule"))
        .groupBy("rule")
        .agg(F.count("*").alias("n"))
    )
    per_rule = (
        spark.createDataFrame(
            [("min_chars",), ("lang_known",)], "rule STRING"
        )
        .join(tag_counts, "rule", "left")
        .select(
            F.concat(F.lit("viol:"), F.col("rule")).alias("metric"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
    )
    return admitted.unionByName(quarantined).unionByName(per_rule)
