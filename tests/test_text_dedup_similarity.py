"""Unit tests for the LLM-pipeline extensions: text stats, dedup family,
similarity search (SURVEY.md §2.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from data_engineering_challenge_spark.operators import dedup as dd
from data_engineering_challenge_spark.operators import similarity as sim
from data_engineering_challenge_spark.operators import text as tx


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
         for i, t in enumerate(texts)]
    )


def test_token_stats(spark):
    df = tx.token_stats(_docs(spark, ["the fast join", "a a a a"]))
    got = {r.doc_id: r for r in df.collect()}
    assert got[0].n_tokens == 3
    assert got[0].n_unique_tokens == 3
    assert got[1].n_tokens == 4
    assert got[1].n_unique_tokens == 1
    assert got[1].ttr == pytest.approx(0.25)
    assert got[0].avg_token_len == pytest.approx((13 - 2) / 3)


def test_shingles_short_doc_empty(spark):
    df = _docs(spark, ["one two", "one two three four"])
    ss = dd.shingle_sets(df, n=3).collect()
    by_doc = {}
    for r in ss:
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    assert 0 not in by_doc  # < 3 tokens -> no shingles
    assert by_doc[1] == {"one two three", "two three four"}


def test_dedup_exact_keeps_min_doc_id(spark):
    df = _docs(spark, ["same text here", "other text", "same text here"])
    got = {r.doc_id: r.n_dups for r in dd.dedup_exact(df).collect()}
    assert got == {0: 2, 1: 1}  # doc 2 deduped into doc 0


def test_ngram_jaccard_identical_docs(spark):
    df = _docs(
        spark,
        [
            "alpha beta gamma delta epsilon",
            "alpha beta gamma delta epsilon",  # identical -> jaccard 1.0
            "zeta eta theta iota kappa",
        ],
    )
    got = dd.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert len(got) == 1
    assert (got[0].doc_a, got[0].doc_b) == (0, 1)
    assert got[0].jaccard == 1.0


def test_minhash_identical_signatures_and_lsh(spark):
    df = _docs(
        spark,
        [
            "alpha beta gamma delta epsilon",
            "alpha beta gamma delta epsilon",
            "zeta eta theta iota kappa",
        ],
    )
    sigs = {r.doc_id: tuple(r[f"mh{i}"] for i in range(8))
            for r in dd.minhash_signatures(df).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]
    cands = {(r.doc_a, r.doc_b) for r in dd.minhash_lsh_candidates(df).collect()}
    assert (0, 1) in cands
    assert (0, 2) not in cands


def test_simhash_near_for_similar_docs(spark):
    df = _docs(
        spark,
        [
            "spark join merge sort filter table scan batch",
            "spark join merge sort filter table scan stream",  # 1 token differs
            "completely different words entirely unrelated content here now",
        ],
    )
    got = {r.doc_id: r.simhash for r in tx.simhash32(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(got[0], got[1]) < ham(got[0], got[2])


def test_simhash_near_dup_pairs_exact_and_guard(spark):
    df = _docs(
        spark,
        [
            "spark join merge sort filter table scan batch",
            "spark join merge sort filter table scan batch",  # exact dup -> ham 0
            "completely different words entirely unrelated content here now",
        ],
    )
    got = {(r.doc_a, r.doc_b): r.hamming for r in dd.simhash_near_dup(df).collect()}
    assert got == {(0, 1): 0}  # exact recall at hamming 0; far doc excluded
    with pytest.raises(ValueError, match="exact-recall"):
        dd.simhash_near_dup(df, bands=4, max_hamming=4)


def test_simhash_near_dup_hamming_matches_sketch_xor(spark):
    # the emitted hamming must equal popcount(xor) of the 60-bit sketches
    df = _docs(
        spark,
        [
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",  # near dup
        ],
    )
    sims = {r.doc_id: r.simhash for r in tx.simhash60(df).collect()}
    pairs = dd.simhash_near_dup(df, max_hamming=3).collect()
    for r in pairs:
        assert r.hamming == bin(sims[r.doc_a] ^ sims[r.doc_b]).count("1")
        assert r.hamming <= 3


def test_repetition_signals_flags_repeats(spark, tmp_path):
    from data_engineering_challenge_spark.queries_text import q_repetition_signals

    _docs(
        spark,
        [
            "spam spam spam spam",          # one 2-gram repeated 3x
            "alpha beta gamma delta",       # all grams unique
            "first part. first part. end",  # duplicate sentence
        ],
    ).write.parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in q_repetition_signals(spark, str(tmp_path)).collect()}
    assert got[0].n_2grams == 3 and got[0].top_2gram_cnt == 3
    assert got[0].top_2gram_frac == 1.0
    assert got[0].dup_3gram_frac == 1.0  # 'spam spam spam' twice
    assert got[1].top_2gram_frac == pytest.approx(1 / 3)  # max cnt 1 of 3
    assert got[1].dup_3gram_cnt == 0
    assert got[2].n_sent == 3 and got[2].n_uniq_sent == 2
    assert got[2].dup_sent_frac == pytest.approx(1 / 3)


def _vecs(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v], label=0)
         for i, v in enumerate(vecs)]
    )


def test_cosine_topk_exact(spark):
    emb = _vecs(
        spark,
        [
            [1.0, 0.0, 0.0],
            [1.0, 0.1, 0.0],   # closest to 0
            [0.0, 1.0, 0.0],   # orthogonal to 0
            [-1.0, 0.0, 0.0],  # opposite to 0
        ],
    )
    got = sim.cosine_topk(emb, emb.filter("vec_id = 0"), k=3).collect()
    order = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank)]
    assert order == [1, 2, 3]
    assert got[0].cos_sim == pytest.approx(1 / (1.01) ** 0.5)


def test_near_dup_pairs_threshold(spark):
    emb = _vecs(spark, [[1.0, 0.0], [1.0, 0.01], [0.0, 1.0]])
    got = {(r.id_a, r.id_b) for r in sim.near_dup_pairs(emb, threshold=0.99).collect()}
    assert got == {(0, 1)}


def test_ann_bucketed_subset_of_exact(spark):
    import random

    rng = random.Random(7)
    emb = _vecs(spark, [[rng.gauss(0, 1) for _ in range(8)] for _ in range(40)])
    q = emb.filter("vec_id < 5")
    exact = {(r.query_id, r.neighbor_id)
             for r in sim.cosine_topk(emb, q, k=3).collect()}
    approx = sim.ann_topk_bucketed(emb, q, k=3, num_bits=2, dim=8).collect()
    # ANN returns <= k per query, all scored pairs must come from real vectors
    per_q = {}
    for r in approx:
        per_q.setdefault(r.query_id, []).append(r)
    for qid, rows in per_q.items():
        assert len(rows) <= 3
        assert all(-1.0 <= r.cos_sim <= 1.0 for r in rows)
    # recall sanity: bucketed search finds at least one true neighbor overall
    assert exact & {(r.query_id, r.neighbor_id) for r in approx}


def test_ivf_topk_shape_and_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id < 10")
    exact = {(r.query_id, r.neighbor_id)
             for r in sim.cosine_topk(emb, q, k=5).collect()}
    approx = sim.ivf_topk(emb, q, k=5, n_clusters=4, n_probe=2).collect()
    per_q = {}
    for r in approx:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) <= {r[0] for r in exact} | set(range(10))
    for rows in per_q.values():
        assert len(rows) <= 5
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
    hits = exact & {(r.query_id, r.neighbor_id) for r in approx}
    # probing half the clusters should recover a reasonable share
    assert len(hits) / len(exact) > 0.2


def test_dup_clusters_connected_components(spark):
    # two components: {1,2,3,7} via a chain 1-2, 2-3, 3-7; {10,20} isolated pair
    pairs = spark.createDataFrame(
        [Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3), Row(doc_a=3, doc_b=7),
         Row(doc_a=10, doc_b=20)]
    )
    got = {r.doc_id: r.cluster_id for r in dd.dup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 20: 10}


def test_dup_clusters_long_chain_converges(spark):
    # a 12-node path graph needs multiple propagation rounds (diameter 11)
    pairs = spark.createDataFrame(
        [Row(doc_a=i, doc_b=i + 1) for i in range(12)]
    )
    got = {r.doc_id: r.cluster_id for r in dd.dup_clusters(pairs).collect()}
    assert got == {i: 0 for i in range(13)}


def test_lsh_bucket_cap_degenerate_corpus(spark):
    """All-identical docs put every doc in one bucket per band; with the
    cap the quadratic pair explosion is refused (0 candidates) — exact
    dedup is the right tool for that corpus, not pairwise LSH."""
    df = _docs(spark, ["alpha beta gamma delta epsilon"] * 30)
    capped = dd.minhash_lsh_candidates(df, max_bucket_size=10)
    assert capped.count() == 0
    uncapped = dd.minhash_lsh_candidates(df, max_bucket_size=1000)
    assert uncapped.count() == 30 * 29 // 2


def test_minhash_hash_fn_agreement(spark):
    """md5 (oracle-portable) and xxhash64 (production) LSH must find the
    same identical-doc candidate pairs; both reject unrelated docs."""
    df = _docs(
        spark,
        [
            "alpha beta gamma delta epsilon zeta",
            "alpha beta gamma delta epsilon zeta",
            "one two three four five six seven",
            "totally different words in this document here",
        ],
    )
    md5_pairs = {(r.doc_a, r.doc_b) for r in dd.minhash_lsh_candidates(df).collect()}
    xxh_pairs = {
        (r.doc_a, r.doc_b)
        for r in dd.minhash_lsh_candidates(df, hash_fn="xxhash64").collect()
    }
    assert (0, 1) in md5_pairs and (0, 1) in xxh_pairs
    assert md5_pairs == xxh_pairs
    with pytest.raises(ValueError):
        dd.minhash_signatures(df, hash_fn="fnv")


def test_ngram_jaccard_stop_shingle_cap(spark):
    """A shingle shared by every doc is dropped once over the postings
    cap: identical docs still pair via their discriminative shingles."""
    texts = [f"common prefix shingle unique{i} tail{i}" for i in range(10)]
    texts += ["common prefix shingle unique0 tail0"]  # dup of doc 0
    df = _docs(spark, texts)
    got = dd.ngram_jaccard_pairs(df, n=3, threshold=0.9, max_postings=5).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == {(0, 10)}
    assert got[0].jaccard == 1.0  # over the KEPT shingles both sets match


def test_near_dup_pairs_lsh_matches_bruteforce(spark):
    """Banded sign-LSH near-dup finds the same high-cosine pairs as the
    brute-force baseline on a corpus with clear duplicates."""
    import random

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(16)]
    near = [x + rng.gauss(0, 0.01) for x in base]
    rows = [
        Row(vec_id=0, embedding=[float(x) for x in base]),
        Row(vec_id=1, embedding=[float(x) for x in near]),
    ] + [
        Row(vec_id=i, embedding=[rng.gauss(0, 1) for _ in range(16)])
        for i in range(2, 40)
    ]
    emb = spark.createDataFrame(rows)
    brute = {
        (r.id_a, r.id_b)
        for r in sim.near_dup_pairs(emb, threshold=0.99).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in sim.near_dup_pairs_lsh(emb, threshold=0.99, dim=16).collect()
    }
    assert (0, 1) in brute
    assert lsh == brute  # at 0.99 cosine every true pair survives banding


def test_pii_scrub(spark):
    """PII redaction: typed placeholders + audit counts (corpus testdata
    carries no PII, so the operator is pinned with inline fixtures)."""
    df = _docs(
        spark,
        [
            "contact bob at bob.smith+x@example.co.uk or 415-555-0199 now",
            "ssn 123-45-6789 leaked from 10.0.0.1 yesterday",
            "clean document with no sensitive content at all",
        ],
    )
    got = {r.doc_id: r for r in tx.pii_scrub(df).collect()}
    assert got[0].n_email == 1 and got[0].n_phone == 1
    assert "<EMAIL>" in got[0].text_scrubbed and "<PHONE>" in got[0].text_scrubbed
    assert "bob.smith" not in got[0].text_scrubbed
    assert got[1].n_ssn == 1 and got[1].n_ipv4 == 1
    assert "<SSN>" in got[1].text_scrubbed and "<IP>" in got[1].text_scrubbed
    assert got[2].text_scrubbed == got[2].text
    assert got[2].n_email == got[2].n_phone == got[2].n_ssn == got[2].n_ipv4 == 0


def test_lsh_caps_bound_degenerate_corpus(spark):
    """Degenerate all-identical corpus: every doc collides into ONE bucket
    per band, so without the cap the local pair explosion is quadratic in
    the corpus.  The documented contract (dedup.py: max_bucket_size /
    max_postings) is that such mega-buckets are DROPPED — candidates stay
    bounded — and exact dedup is the tool that catches what LSH skips."""
    n = 250  # above the default max_bucket_size / max_postings of 200
    boiler = _docs(spark, ["the same boilerplate text repeated verbatim"] * n)

    assert dd.minhash_lsh_candidates(boiler).count() == 0  # mega-bucket dropped
    assert dd.ngram_jaccard_pairs(boiler).count() == 0     # stop-shingles dropped

    surv = dd.dedup_exact(boiler).collect()
    assert len(surv) == 1 and surv[0].n_dups == n  # exact dedup catches them

    # under-cap duplicate group still pairs up fully: C(5,2) candidates
    small = _docs(spark, ["another duplicated document body right here"] * 5)
    assert dd.minhash_lsh_candidates(small).count() == 10
    # and with the cap lowered below the group size, the same corpus is
    # dropped — the bound is the knob, not luck
    assert dd.minhash_lsh_candidates(small, max_bucket_size=4).count() == 0


def test_tfidf_composes_lazily(spark):
    """Building the registered tfidf query must trigger NO Spark job (the
    corpus count is a broadcast 1-row aggregate, not an eager .count())."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    entry.queries()["tfidf_top_terms"](spark, sf)  # warm the schema cache
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = entry.queries()["tfidf_top_terms"](spark, sf)  # noqa: F841
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # strictly zero jobs once schemas are cached


def test_pii_phone_no_false_positives(spark):
    """ISO dates, bare order numbers, and amounts must NOT redact as
    <PHONE>; real phone shapes (international, separator-delimited 3-3-4)
    still do."""
    df = _docs(
        spark,
        [
            "shipped 2024-01-01 order 123456789 total 1234567.89 qty 12345678",
            "call +1 415 555 0199 or (415) 555-0199 or 415.555.0199 today",
            "intl mixed +1 (555) 123-4567 and +44 (0) 20 7946 0958 done",
        ],
    )
    got = {r.doc_id: r for r in tx.pii_scrub(df).collect()}
    assert got[0].n_phone == 0
    assert got[0].text_scrubbed == got[0].text
    assert got[1].n_phone == 3
    assert "415" not in got[1].text_scrubbed
    # mixed international forms (space + paren after the country code) must
    # redact WHOLE — no digit of the number, prefix included, may leak
    assert got[2].n_phone == 2
    assert not any(ch.isdigit() for ch in got[2].text_scrubbed)


def test_para_dedup_keeps_first_occurrence_in_order(spark):
    """Intra-doc sentence dedup: repeats drop, FIRST occurrence and the
    original order survive; a doc of one repeated sentence collapses."""
    import __spark_entry__ as entry

    df = _docs(
        spark,
        [
            "alpha beta. gamma. alpha beta. delta. gamma",
            "same. same. same",
        ],
    )
    df.createOrReplaceTempView("_unused")  # keep lints quiet about df
    # drive the operator logic directly (the registered query reads parquet)
    from pyspark.sql import functions as F

    sent = df.select(
        "doc_id", F.posexplode(F.split("text", r"\. ")).alias("pos", "sentence")
    )
    first = sent.groupBy("doc_id", "sentence").agg(F.min("pos").alias("pos"))
    rebuilt = first.groupBy("doc_id").agg(
        F.concat_ws(
            ". ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sentence"))),
                lambda s: s["sentence"],
            ),
        ).alias("dedup_text")
    )
    got = {r.doc_id: r.dedup_text for r in rebuilt.collect()}
    # ["alpha beta","gamma","alpha beta","delta","gamma"] -> first
    # occurrences in original order
    assert got[0] == "alpha beta. gamma. delta"
    assert got[1] == "same"


def test_vocab_coverage_monotone_and_tie_deterministic(spark):
    """Cumulative share is strictly non-decreasing, rank is 1..k, and ties
    order by token asc (deterministic across runs/partitionings)."""
    import __spark_entry__ as entry

    rows = (
        entry.queries()["vocab_top_coverage"](spark, "/root/testdata/sf0.001")
        .orderBy("rnk")
        .collect()
    )
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    shares = [r.cum_share for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert 0 < shares[-1] <= 1.0
    for a, b in zip(rows, rows[1:]):
        assert (b.cnt, a.token) <= (a.cnt, b.token)  # cnt desc, token asc


def test_corpus_mix_plan_shares_sum_to_one(spark):
    import __spark_entry__ as entry

    rows = entry.queries()["corpus_mix_plan"](spark, "/root/testdata/sf0.001").collect()
    assert abs(sum(r.doc_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        # ratio * share == uniform target share, for every stratum
        assert abs(r.mix_ratio * r.doc_share - 1.0 / len(rows)) < 1e-9


def test_near_dup_corpus_prune_keeps_one_per_cluster(spark):
    """The pruned corpus = documents minus near-dup cluster NON-
    representatives: exactly one survivor (the min doc_id) per cluster,
    unclustered docs all retained."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    survivors = {
        r.doc_id
        for r in entry.queries()["near_dup_corpus_prune"](spark, sf).collect()
    }
    clusters = entry.queries()["dup_clusters_cc"](spark, sf).collect()
    clustered = {r.doc_id for r in clusters}
    reps = {r.cluster_id for r in clusters}
    n_docs = entry.queries()["gopher_quality_flags"](spark, sf).count()

    assert reps <= survivors                      # every rep kept
    assert not (clustered - reps) & survivors     # every non-rep dropped
    assert len(survivors) == n_docs - len(clustered - reps)


def test_semdedup_prune_keeps_lowest_id_within_cluster(spark):
    # two orthogonal cluster directions; near-dups only within a cluster
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),   # centroid A
        Row(vec_id=1, embedding=[0.0, 1.0, 0.0]),   # centroid B
        Row(vec_id=2, embedding=[0.99, 0.05, 0.0]),  # dup of 0's direction
        Row(vec_id=3, embedding=[0.0, 0.97, 0.1]),   # dup of 1's direction
        Row(vec_id=4, embedding=[0.1, 0.0, 0.99]),   # cluster A, NOT a dup
    ]
    emb = spark.createDataFrame(rows)
    out = sim.semdedup_prune(
        emb, emb.filter("vec_id < 2"), threshold=0.9
    ).collect()
    survivors = {r.vec_id: r.cluster for r in out}
    # 2 pruned by 0, 3 pruned by 1; 4 is in 0's cluster but below threshold
    assert set(survivors) == {0, 1, 4}
    assert survivors[0] == 0 and survivors[1] == 1 and survivors[4] == 0


def test_semdedup_prune_cross_cluster_dups_not_pruned(spark):
    # identical vectors that land in DIFFERENT clusters survive both —
    # the SemDeDup trade: recall bounded by the clustering, never all-pairs
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.05, 0.0]),
        Row(vec_id=1, embedding=[0.05, 1.0, 0.0]),
        # equidistant-ish pair: nearest centroid differs by construction
        Row(vec_id=2, embedding=[0.8, 0.6, 0.0]),
        Row(vec_id=3, embedding=[0.6, 0.8, 0.0]),
    ]
    emb = spark.createDataFrame(rows)
    out = sim.semdedup_prune(
        emb, emb.filter("vec_id < 2"), threshold=0.9
    ).collect()
    # cos(2,3) = 0.96 > threshold, but 2 -> cluster 0 and 3 -> cluster 1
    assert {r.vec_id for r in out} == {0, 1, 2, 3}


def test_semdedup_prune_partitioning_invariant(spark):
    emb = spark.createDataFrame(
        [
            Row(
                vec_id=i,
                embedding=[
                    float((i * 7 + d) % 5 - 2) for d in range(4)
                ],
            )
            for i in range(40)
        ]
    )
    cents = emb.filter("vec_id < 3")
    a = sorted(
        (r.vec_id, r.cluster)
        for r in sim.semdedup_prune(emb, cents, 0.8).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster)
        for r in sim.semdedup_prune(emb.repartition(7), cents, 0.8).collect()
    )
    assert a == b and len(a) > 0


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    from data_engineering_challenge_spark.operators import bloom as bl

    members = spark.createDataFrame(
        [Row(shingle=f"member {i} gram") for i in range(300)]
    )
    words = bl.build_bloom_words(members, "shingle", m_bits=1 << 14, k=5)
    assert len(words) == (1 << 14) // 64
    # every inserted member probes positive — guaranteed, and tested
    hits = members.filter(
        bl.bloom_might_contain(members["shingle"], words, k=5)
    ).count()
    assert hits == 300
    # false-positive rate on disjoint values stays near the analytic
    # (1 - e^(-kn/m))^k ~ 1e-4 for n=300, m=16384, k=5
    probes = spark.createDataFrame(
        [Row(shingle=f"outsider {i} gram") for i in range(2000)]
    )
    fp = probes.filter(
        bl.bloom_might_contain(probes["shingle"], words, k=5)
    ).count()
    assert fp / 2000 < 0.01


def test_bloom_contamination_matches_exact_join(spark):
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.operators import bloom as bl

    train = spark.createDataFrame(
        [Row(doc_id=i, shingle=f"sh {i % 40}") for i in range(200)]
    )
    bench = spark.createDataFrame(
        [Row(shingle=f"sh {i}") for i in range(0, 40, 4)]
    )
    got = sorted(
        (r.doc_id, r.n_contaminated)
        for r in bl.contaminated_docs_bloom(train, bench, m_bits=1 << 10).collect()
    )
    exact = sorted(
        (r.doc_id, r.n_contaminated)
        for r in train.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
        .collect()
    )
    assert got == exact and len(got) > 0


def test_bloom_probe_is_scan_local_prefilter(spark):
    from data_engineering_challenge_spark.operators import bloom as bl

    members = spark.createDataFrame([Row(shingle=f"m{i}") for i in range(50)])
    corpus = spark.createDataFrame(
        [Row(doc_id=i, shingle=f"c{i}") for i in range(500)]
        + [Row(doc_id=1000 + i, shingle=f"m{i}") for i in range(50)]
    )
    words = bl.build_bloom_words(members, "shingle", m_bits=1 << 12, k=5)
    cand = corpus.filter(bl.bloom_might_contain(corpus["shingle"], words, k=5))
    # the probe is a Filter with NO join/exchange: plan shape check
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    # and it prunes: candidates are a small superset of the true members
    n = cand.count()
    assert 50 <= n < 550


def test_bpe_merge_pair_expression_matches_greedy_scan(spark):
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.operators import bpe

    cases = [
        (["a", "b"], "a", "b", ["a b"]),
        (["a", "x", "b"], "a", "b", ["a", "x", "b"]),
        (["a", "a", "b"], "a", "b", ["a", "a b"]),
        (["a", "a", "a"], "a", "a", ["a a", "a"]),  # greedy overlap rule
        (["a", "b", "a", "b"], "a", "b", ["a b", "a b"]),
        (["x"], "a", "b", ["x"]),
        ([], "a", "b", []),
        (["a"], "a", "b", ["a"]),  # dangling pending flushes at finish
    ]
    df = spark.createDataFrame(
        [(i, toks) for i, (toks, _, _, _) in enumerate(cases)],
        ["i", "toks"],
    )
    for i, (toks, left, right, want) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(bpe.merge_pair(F.col("toks"), left, right).alias("m"))
            .collect()[0]["m"]
        )
        assert got == want, (toks, left, right, got, want)


def test_bpe_trainer_matches_reference_exactly(spark):
    from data_engineering_challenge_spark.operators import bpe

    texts = [
        "new york city is in new york state",
        "new york new york",
        "the city of new york",
        "york new york new",  # reversed pairs stress the tie-breaks
        "a b a b a b",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = bpe.train_bpe_merges(df, n_merges=6)
    want = bpe.reference_bpe(texts, n_merges=6)
    assert got == want
    # learned phrases stack: a later rule may merge an earlier merged token
    assert any(bpe.SEP in left or bpe.SEP in right for left, right, _ in got) or len(got) < 3


def test_bpe_encode_matches_reference_both_paths(spark):
    """encode(corpus, train(corpus)) — the round-8 corpus-encode pass —
    must reproduce the pure-Python reference encoder EXACTLY, on both
    physical strategies: chained JVM folds (small vocab) and the
    Arrow-batched pandas-UDF kernel (vocab past the expression cap)."""
    from pyspark.sql import functions as F

    from data_engineering_challenge_spark.operators import bpe

    texts = [
        "new york city is in new york state",
        "new york new york",
        "the city of new york",
        "york new york new",
        "a b a b a b",
        "a a a a",  # greedy-overlap stress
        "solo",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    rules = bpe.train_bpe_merges(df, n_merges=5)
    assert rules, "fixture must learn at least one rule"
    for cap in (64, 0):  # 0 forces the pandas-UDF path
        enc = {
            r.i: r.toks
            for r in bpe.bpe_encode(
                df, rules, expression_rule_cap=cap
            ).collect()
        }
        for i, t in enumerate(texts):
            assert enc[i] == bpe.reference_bpe_encode(t, rules), (
                cap,
                t,
                enc[i],
            )
    # rule ORDER is the contract: a later rule consumes earlier merges
    stacked = [r for r in rules if bpe.SEP in r[0] or bpe.SEP in r[1]]
    if stacked:
        got = bpe.bpe_encode(df, rules).collect()
        assert any(
            any(tok.count(bpe.SEP) >= 2 for tok in r.toks) for r in got
        ), "stacked rules must produce multi-merge tokens"


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    # winnowing guarantee: a shared run of >= w+k-1 tokens (here 6) must
    # yield at least one shared selected fingerprint
    shared = "zeta eta theta iota kappa lambda"
    df = _docs(
        spark,
        [
            f"alpha beta {shared} gamma delta",
            f"one two three {shared} four five six",
            "entirely disjoint words with nothing common here at all",
        ],
    )
    fps = {}
    for r in tx.winnow_fingerprints(df, k=3, w=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp_hash)
    assert fps[0] & fps[1]          # the guarantee
    assert not (fps[0] & fps[2])    # disjoint docs share nothing
    # short docs: below k tokens -> no fingerprints; k..k+w-2 tokens -> one
    tiny = _docs(spark, ["a b", "a b c d"])
    got = {r.doc_id: r.fp_hash
           for r in tx.winnow_fingerprints(tiny, k=3, w=4).collect()}
    assert 0 not in got             # 2 tokens < k
    assert 1 in got                 # 2 grams < w -> whole-doc window min


def test_semdedup_empty_centroids_fails_loud(spark):
    emb = _vecs(spark, [[1.0, 0.0], [0.0, 1.0]])
    with pytest.raises(ValueError, match="centroid frame is empty"):
        sim.semdedup_prune(emb, emb.filter("vec_id < 0"), 0.9)


def test_bloom_empty_member_set_rejects_everything(spark):
    from data_engineering_challenge_spark.operators import bloom as bl

    empty = spark.createDataFrame([], "shingle string")
    words = bl.build_bloom_words(empty, "shingle", m_bits=1 << 10, k=5)
    assert all(w == 0 for w in words)
    probes = spark.createDataFrame([Row(shingle=f"x{i}") for i in range(50)])
    assert probes.filter(
        bl.bloom_might_contain(probes["shingle"], words, k=5)
    ).count() == 0


def test_bpe_trainer_stops_when_nothing_repeats(spark):
    from data_engineering_challenge_spark.operators import bpe

    df = spark.createDataFrame(
        [("a b c",), ("d e f",), ("g h i",)], ["text"]
    )
    assert bpe.train_bpe_merges(df, n_merges=5) == []


def test_semdedup_with_learned_kmeans_centroids(spark):
    """The documented production composition: KMeans coarse quantizer
    (the ivf_topk trainer) supplies the centroid frame; the prune
    semantics are centroid-agnostic."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dense = emb.select("vec_id", array_to_vector("embedding").alias("features"))
    model = KMeans(k=4, seed=42, maxIter=3, featuresCol="features").fit(dense)
    cents = spark.createDataFrame(
        [
            (i, [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ],
        ["vec_id", "embedding"],
    )
    out = sim.semdedup_prune(emb, cents, threshold=0.3)
    rows = out.collect()
    assert 0 < len(rows) <= emb.count()
    # every survivor is assigned to one of the learned clusters
    assert {r.cluster for r in rows} <= set(range(4))
    # determinism given the same (seeded) centroids
    again = sim.semdedup_prune(emb, cents, threshold=0.3).collect()
    assert sorted((r.vec_id, r.cluster) for r in rows) == sorted(
        (r.vec_id, r.cluster) for r in again
    )
