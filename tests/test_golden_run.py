"""Golden end-to-end run (SURVEY.md §5.3): the flagship channel report at
sf0.001 must reproduce a pinned fingerprint — catches any semantic drift in
the journey join, attribution weights, or report math.

The fingerprint is over sorted rows with 6-decimal formatting (stable
across partitionings because the report uses decimal-exact sums)."""

from __future__ import annotations

import hashlib

GOLDEN_MD5 = "b35605a8537a155cc2a24e827308e4b2"
GOLDEN_ROWS = 150


def test_channel_report_golden(spark):
    import __spark_entry__ as e

    df = e.queries()["channel_report"](spark, "/root/testdata/sf0.001")
    rows = sorted(
        "|".join(
            [r.channel_name, r.date.isoformat()]
            + [f"{v:.6f}" for v in (r.cost, r.ihc, r.ihc_revenue, r.CPO, r.ROAS)]
        )
        for r in df.collect()
    )
    assert len(rows) == GOLDEN_ROWS
    assert hashlib.md5("\n".join(rows).encode()).hexdigest() == GOLDEN_MD5


def test_entry_smoke(spark):
    """The driver's t1 smoke: entry() runs, returns rows, stable schema."""
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.columns == [
        "channel_name", "date", "cost", "ihc", "ihc_revenue", "CPO", "ROAS",
    ]
    assert df.count() == GOLDEN_ROWS


def test_every_query_has_oracle_or_docstring(spark):
    """Registry hygiene: every queries() entry either has an oracle (the
    driver's strong check) or is an intentionally non-SQL-expressible op."""
    import __spark_entry__ as e

    # intentionally oracle-less: iterative (KMeans) / streaming execution —
    # the driver records a rows-only check for these (by design)
    NO_ORACLE = {
        "ivf_topk",  # iterative KMeans — not SQL-expressible
        "streaming_incremental_journeys",  # streaming execution under test
        "streaming_dedup_events",  # streaming state semantics under test
        "distinct_users_hll_rollup",  # sketch estimate — bounded vs exact in tests
        "theta_user_overlap",  # sketch set ops — exact-regime parity in tests
        "kll_value_quantiles",  # sketch quantiles — rank-error bounded in tests
        "minhash_lsh_candidates_xxh",  # Spark-native hash by design; md5 twin is checked
        "bpe_train_merges",  # iterative trainer — exact-parity vs Python reference in tests
        "bpe_encode_tokens",  # trained-fold composition — encode parity vs Python reference in tests
        "pq_topk",  # iterative KMeans codebooks — exactness/recall bounded in tests
    }

    qs = e.queries()
    oracles = e.oracle_sql()
    missing = set(qs) - set(oracles) - NO_ORACLE
    assert missing == set(), f"queries without oracle: {missing}"


def test_streaming_query_equals_batch(spark):
    """The streaming queries() entry must equal the batch as-of join."""
    import __spark_entry__ as e

    got = e.queries()["streaming_incremental_journeys"](
        spark, "/root/testdata/sf0.001"
    )
    batch = e.queries()["journeys_build"](spark, "/root/testdata/sf0.001")
    assert got.count() == batch.count()


def test_registry_order_lists_are_valid():
    """Every name in the emission-order lists must exist in the registry
    (a typo would silently fall back to registration order) and the
    emitted dict must cover the registry exactly once."""
    import __spark_entry__  # noqa: F401 — populates the registry

    from data_engineering_challenge_spark import queries as q

    names = set(q.queries())
    for n in q._CORE_FIRST + q._CHEAP_FIRST + q._TAIL:
        assert n in names, f"ordering list references unknown query {n!r}"
    emitted = list(q.queries())
    assert len(emitted) == len(set(emitted)) == len(names)


def test_no_canonicalizer_hostile_output_columns(spark):
    """Correctness-gate hygiene: the driver canonicalizes results with a
    pandas column sort, which cannot order array/map/struct cells — a
    query emitting one would error in the harness even with correct
    values (the round-2 multimodal_features failure).  Every registry
    query must emit scalar columns only."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    import __spark_entry__ as e

    offenders = {}
    for name, fn in e.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            offenders[name] = complex_cols
    assert offenders == {}, f"canonicalizer-hostile outputs: {offenders}"


def test_oracle_output_types_are_portable():
    """Oracle-typing lint (the round-5 `weighted_sample_systematic` red
    row): DuckDB types SUM(BIGINT) as HUGEINT, which an arrow/pandas fetch
    canonicalizes as float64 (``523459960.0``) while Spark emits BIGINT
    (``523459960``) — a guaranteed hash mismatch even when every value is
    identical.  DESCRIBE every oracle against the sf0.01 views and assert
    no output column is typed HUGEINT/UHUGEINT; oracles must CAST such
    sums to BIGINT (or DOUBLE, matching the Spark side) explicitly."""
    import os

    import duckdb

    import __spark_entry__ as e

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    offenders = {}
    for name, sql in e.oracle_sql().items():
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
        bad = [
            (cname, ctype)
            for cname, ctype, *_ in desc
            if "HUGEINT" in ctype.upper()
        ]
        if bad:
            offenders[name] = bad
    assert offenders == {}, f"non-portable oracle output types: {offenders}"


def test_duplicate_registry_name_rejected():
    import pytest as _pytest

    from data_engineering_challenge_spark.queries import register

    with _pytest.raises(ValueError, match="duplicate registry query name"):
        register("channel_report", None)(lambda spark, sf: None)
