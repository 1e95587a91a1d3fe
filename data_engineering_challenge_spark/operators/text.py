"""Text analysis operators (SURVEY.md §2.10 ✚ north-star extensions) over a
``documents(doc_id, text, ...)`` relation.

All hot-path logic is JVM-side column expressions (split / transform /
filter / md5 — whole-stage codegen, no Python UDFs), so these scale as plain
map work: no shuffle at all until an aggregation asks for one.  Each helper
returns Columns or a DataFrame with deterministic results so the DuckDB
oracles can reproduce them exactly.

Design note on hashing: every hash here is **md5 of an explicit string** —
not Spark's ``hash()``/``xxhash64`` — because md5 is identical across
engines (and across Spark versions), which makes signatures, fingerprints
and LSH buckets portable and oracle-checkable.  At 100 TB the md5-per-token
cost is real but embarrassingly parallel; swap in xxhash64 via ``hash_fn``
if cross-engine portability is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny English stopword list used by the quality/lang heuristics; must stay
#: in sync with the SQL twin in queries_text.py
EN_STOPWORDS = ("the", "a")


def tokens(text: Column | str = "text") -> Column:
    """Whitespace tokenization (the corpus is single-space separated; for
    messy corpora swap in F.split on ``\\s+``)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles; empty array when the doc has < n tokens.

    ``toks`` is bound as a lambda variable via a 1-element ``transform``
    wrapper so the token expression (typically a split) evaluates ONCE per
    row: referencing it directly would re-embed it in every ``toks[i+j]``
    element access — measured 5x slower on the shingle build.
    """

    def build(t: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(t) - n)
        return F.when(
            F.size(t) >= n,
            F.transform(
                idx, lambda i: F.concat_ws(" ", *[t[i + j] for j in range(n)])
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.transform(F.array(toks), build)[0]


def shingle_arrays(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, sh array<string>) ready to explode.

    Two plan properties, both re-measured this round (r14):

    * **no barrier shuffle is needed anymore**: on Spark 4.x the Generate
      keeps its child Projection as a separate node, so the shingle
      transform is evaluated once per document even when the explode sits
      directly on the projected column (verified by plan read and a
      1-task A/B: 0.399 s direct vs 0.423 s behind a repartition barrier).
      Earlier rounds shuffled the whole corpus by doc_id here — at scale
      that was a full-corpus exchange purely as an optimizer barrier;
      dropping it removes one corpus-sized shuffle from every shingle
      consumer (downstream groupBy(doc_id) aggregations do partial
      aggregation map-side and shuffle only per-doc partial rows).
    * **adaptive fan-out of under-split scans** (io.fan_out_scan): the
      raw (doc_id, text) rows are round-robin-redistributed only when the
      file layout gives the scan fewer splits than cores, so the shingle
      build + per-shingle hashing downstream run cluster-wide.  No-op on
      a well-split corpus.
    """
    from ..sources.io import fan_out_scan

    return fan_out_scan(documents.select("doc_id", "text")).select(
        "doc_id", shingles(tokens(), n).alias("sh")
    )


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token statistics: counts, unique counts, type-token ratio,
    average token length (single pass, no shuffle)."""
    t = tokens()
    n_tokens = F.size(t)
    n_chars = F.length("text")
    n_unique = F.size(F.array_distinct(t))
    # single-space separated => total token chars = chars - (n_tokens - 1)
    avg_token_len = (n_chars - (n_tokens - 1)) / n_tokens
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.cast("bigint").alias("n_chars_actual"),
        n_unique.alias("n_unique_tokens"),
        (n_unique / n_tokens).alias("ttr"),
        avg_token_len.alias("avg_token_len"),
    )


def stopword_count(toks: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    pred = None
    for w in stopwords:
        p = F.lit(w)
        pred = p if pred is None else pred
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality scoring (the length / stopword-ratio / lexical-
    diversity family used for LLM-corpus filtering): a [0,1] blend of
    document length, type-token ratio, and stopword rate."""
    t = tokens()
    n_tokens = F.size(t)
    n_stop = stopword_count(t)
    ttr = F.size(F.array_distinct(t)) / n_tokens
    stop_ratio = n_stop / n_tokens
    length_score = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    score = 0.4 * length_score + 0.3 * ttr + 0.3 * stop_ratio
    return documents.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("ttr"),
        score.alias("quality_score"),
    )


def language_guess(documents: DataFrame) -> DataFrame:
    """Stopword-marker language ID heuristic.  Real corpora would carry one
    marker set per language (the classic n-gram/stopword profile method);
    the synthetic corpus only contains English-like markers, so the output
    is 'en' vs 'unknown' — the *operator shape* (per-language marker score,
    argmax) is what the engine provides."""
    t = tokens()
    ratio = stopword_count(t) / F.size(t)
    return documents.select(
        "doc_id",
        "lang",
        ratio.alias("en_marker_ratio"),
        F.when(ratio > 0.05, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_guess"),
    )


def fingerprint_md5(documents: DataFrame) -> DataFrame:
    """Whole-document fingerprint: md5 of the normalized text.  The cheapest
    exact-dup detector — group or join on ``fp`` (SURVEY.md §2.10 dedup)."""
    return documents.select(
        "doc_id", F.md5(F.lower(F.col("text"))).alias("fp")
    )


def _simhash(documents: DataFrame, bits: int) -> DataFrame:
    """``bits``-wide SimHash over token frequencies (bits <= 60 so the
    packed value stays positive in a signed 64-bit BIGINT on every engine).

    Classic near-dup sketch (Charikar): each token votes +count/-count on
    every bit of its hash (md5 prefix, ceil(bits/4) hex chars); the sketch
    keeps the sign.  Implemented as explode -> per-(doc,token) count ->
    ``bits`` conditional sums -> bit pack: two shuffles on doc_id, no UDFs,
    fully parallel.  Near-dup pairs then compare by hamming distance on
    ``simhash``.
    """
    hexchars = (bits + 3) // 4
    tok = documents.select("doc_id", F.explode(tokens()).alias("token"))
    counted = tok.groupBy("doc_id", "token").agg(F.count("*").alias("cnt"))
    h = F.conv(F.substring(F.md5("token"), 1, hexchars), 16, 10).cast("bigint")
    counted = counted.withColumn("h", h)
    bit_sums = [
        F.sum(
            ((F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1) * F.col("cnt"))
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    sums = counted.groupBy("doc_id").agg(*bit_sums)
    packed = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        packed = term if packed is None else packed + term
    return sums.select("doc_id", packed.alias("simhash"))


def simhash32(documents: DataFrame) -> DataFrame:
    """32-bit SimHash fingerprint (see :func:`_simhash`)."""
    return _simhash(documents, 32)


def simhash60(documents: DataFrame) -> DataFrame:
    """60-bit SimHash — the banded near-dup join width: 4 bands x 15 bits
    gives 32k bucket values per band (vs 256 for 8-bit bands of a 32-bit
    sketch), so bucket sizes stay ~N/32k per band at corpus scale."""
    return _simhash(documents, 60)


#: conservative PII patterns (Java regex; applied in order).  Each entry is
#: (name, pattern, replacement) — extend per deployment's compliance list.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # phone LAST: its digit-run core would otherwise swallow SSNs and
    # dotted IPs before their typed placeholders apply.  Two shapes only —
    # international (+ prefix, 7-15 digits, up to TWO separator chars
    # between digit groups, so mixed forms like '+1 (555) 123-4567' redact
    # whole instead of leaking the '+1 ' prefix) or separator-delimited
    # 3-3-4 — so bare numeric runs (order ids) and ISO dates do NOT
    # false-positive; both ends are anchored against surrounding
    # word/dash/dot characters
    (
        "phone",
        r"(?<![\w.-])(?:\+\d(?:[\s().-]{0,2}\d){6,14}|\(?\d{3}\)?[\s.-]?\d{3}[\s.-]\d{4})(?![\w-])",
        "<PHONE>",
    ),
)


def pii_scrub(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction pass: each pattern family replaced by a typed
    placeholder, with per-family match counts for audit.  All
    ``regexp_replace``/``regexp_count`` column expressions — JVM-side,
    zero shuffle, scales as map work.  Patterns apply in PII_PATTERNS
    order against the progressively-scrubbed text, so specific formats
    (SSN, IP) are typed before the permissive phone pattern can swallow
    them.

    Returns the input columns plus ``{text_col}_scrubbed`` and one
    ``n_<family>`` count per pattern.
    """
    out = documents
    scrubbed = F.col(text_col)
    counts = []
    for name, pattern, repl in PII_PATTERNS:
        counts.append(
            F.regexp_count(scrubbed, F.lit(pattern)).alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pattern, repl)
    return out.select(
        "*", *counts, scrubbed.alias(f"{text_col}_scrubbed")
    )


def winnow_fingerprints(
    documents: DataFrame, k: int = 3, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
    the MOSS algorithm): hash every k-gram, slide a window of ``w``
    consecutive hashes, keep each window's MINIMUM — the selected hash
    set is the document's fingerprint, with the winnowing guarantee that
    any match of at least ``w + k - 1`` consecutive tokens between two
    documents shares at least one selected fingerprint.

    All pure column expressions: the k-gram hash is the engine-portable
    md5 bucket (DuckDB computes the identical value, so the operator is
    oracle-checkable end-to-end), window minima are a ``transform`` +
    ``array_min`` over hash slices, and the output is the DISTINCT
    (doc_id, fp_hash) relation — the window-min SET is tie-break
    invariant even though classic winnowing's positional variant must
    pick the rightmost minimum.  Map-side explode then one distinct
    shuffle; fingerprint density is ~2/(w+1) of the k-gram count, the
    paper's bound on selected fraction.

    Classic winnowing uses an O(1)-update rolling (Karp-Rabin) hash; the
    selection guarantee — the part that matters for plagiarism/overlap
    detection — depends only on hashing each k-gram, which here is one
    md5 per gram inside the same codegen stage."""
    sh = shingles(tokens(), n=k)
    grams = F.transform(
        F.array(sh),
        lambda g: F.transform(
            g,
            lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast(
                "bigint"
            ),
        ),
    )[0]
    mins = F.transform(
        F.array(grams),
        lambda h: F.when(
            F.size(h) >= w,
            F.transform(
                F.sequence(F.lit(0), F.size(h) - w),
                lambda j: F.array_min(F.slice(h, j + 1, w)),
            ),
        ).otherwise(
            # shorter than one window: the whole doc is the window
            F.when(
                F.size(h) > 0, F.array(F.array_min(h))
            ).otherwise(F.array().cast("array<bigint>"))
        ),
    )[0]
    return (
        documents.select("doc_id", F.explode(mins).alias("fp_hash"))
        .distinct()
    )


def winnow_overlap_pairs(
    documents: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 3,
    max_postings: int = 200,
) -> DataFrame:
    """Document overlap detection over winnowed fingerprints: pairs of
    docs sharing at least ``min_shared`` selected fingerprints — the MOSS
    use of :func:`winnow_fingerprints`.  Because the fingerprint relation
    is ~2/(w+1) the size of the raw shingle relation, the inverted-index
    pair generation (one grouped pass, ordered pairs exploded in-row —
    the ngram_jaccard shape) runs on a fraction of the data the full
    shingle-overlap join would touch; ``max_postings`` caps boilerplate
    fingerprints exactly like stop-shingles."""
    from .dedup import _ordered_pairs

    fps = winnow_fingerprints(documents, k=k, w=w)
    postings = (
        fps.groupBy("fp_hash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_postings))
    )
    return (
        postings.select(F.explode(_ordered_pairs(F.col("ids"))).alias("p"))
        .groupBy(F.col("p.doc_a"), F.col("p.doc_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
