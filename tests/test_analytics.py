"""Unit tests for queries_analytics: hand-computable fixtures for the
sweep-line concurrency and degree-oriented triangle count, plus invariant
checks for sampling / binning / drift on the sf0.001 testdata.  (Oracle
hash-parity for all seven queries is covered by scripts/verify_local.py /
the driver gate; these tests pin the SEMANTICS on inputs small enough to
verify by hand.)"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_engineering_challenge_spark import queries_analytics as qa

SF = "/root/testdata/sf0.001"


def _write_events(spark, tmp_path, rows):
    """events.parquet fixture: (event_id, user_id, ts, event_type, value)."""
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string, value double"
    ).withColumn("props", F.lit(None).cast("string"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_peak_concurrency_hand_fixture(spark, tmp_path):
    """Three users on one day: A 10:00-10:40 (two events 40 min apart are
    ONE session — gap is exactly 30 min only above 1800s, 40 min splits),
    so construct precisely:
      user 1: events 10:00, 10:20  -> one session [10:00, 10:20]
      user 2: events 10:10         -> point session [10:10, 10:10]
      user 3: events 11:00         -> [11:00, 11:00]
    Overlap at 10:10: users 1+2 -> peak 2.  Second day: single user -> 1.
    Also pins the back-to-back non-overlap rule: user 4 ends 12:00:00,
    user 5 starts 12:00:00.000001 -> never 2 concurrent then.
    """
    d1 = dt.datetime(2024, 5, 1)
    rows = [
        (1, 1, d1 + dt.timedelta(hours=10), "view", 1.0),
        (2, 1, d1 + dt.timedelta(hours=10, minutes=20), "view", 1.0),
        (3, 2, d1 + dt.timedelta(hours=10, minutes=10), "click", 1.0),
        (4, 3, d1 + dt.timedelta(hours=11), "view", 1.0),
        (5, 4, d1 + dt.timedelta(hours=12), "view", 1.0),
        (6, 5, d1 + dt.timedelta(hours=12, microseconds=1), "view", 1.0),
        (7, 6, d1 + dt.timedelta(days=1, hours=9), "view", 1.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["day"]: r["peak_concurrent"]
        for r in qa.peak_concurrency(spark, sf).collect()
    }
    assert got == {"2024-05-01": 2, "2024-05-02": 1}


def test_peak_concurrency_midnight_spanning_session(spark, tmp_path):
    """A session spanning midnight counts toward BOTH days (clipped)."""
    d = dt.datetime(2024, 5, 1, 23, 50)
    rows = [
        (1, 1, d, "view", 1.0),
        (2, 1, d + dt.timedelta(minutes=25), "view", 1.0),  # 00:15 next day
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["day"]: r["peak_concurrent"]
        for r in qa.peak_concurrency(spark, sf).collect()
    }
    assert got == {"2024-05-01": 1, "2024-05-02": 1}


def _write_lineitem(spark, tmp_path, order_parts):
    rows = [
        (ok, pk) for ok, parts in order_parts.items() for pk in parts
    ]
    df = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    df.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def test_triangles_k4_plus_star(spark, tmp_path):
    """K4 (one order with 4 parts) has C(4,3)=4 triangles and 6 edges; a
    hub star (part 100 co-ordered pairwise with 5 others, no edges among
    the leaves) adds 5 edges and 0 triangles — the shape degree
    orientation exists for."""
    orders = {1: [1, 2, 3, 4]}
    # star: hub 100 with leaves 101..105, one 2-part order each
    for i, leaf in enumerate([101, 102, 103, 104, 105]):
        orders[10 + i] = [100, leaf]
    sf = _write_lineitem(spark, tmp_path, orders)
    row = qa.copurchase_triangles(spark, sf, min_support=1).collect()[0]
    assert row["n_edges"] == 6 + 5
    assert row["n_triangles"] == 4


def test_triangles_shared_edge(spark, tmp_path):
    """Two triangles sharing an edge: {1,2,3} and {2,3,4} -> 5 edges, 2
    triangles, each counted once despite the shared (2,3) edge."""
    sf = _write_lineitem(spark, tmp_path, {1: [1, 2, 3], 2: [2, 3, 4]})
    row = qa.copurchase_triangles(spark, sf, min_support=1).collect()[0]
    assert row["n_edges"] == 5
    assert row["n_triangles"] == 2


def test_weighted_sample_pps_property(spark):
    """Systematic sampling invariants at sf0.001: per stratum, the number
    of selections equals either floor or ceil of total_weight/step, and
    every selected row's cumulative interval crosses a step boundary."""
    df = qa.weighted_sample_systematic(spark, SF)
    rows = df.collect()
    assert len(rows) > 0
    step = 1_000_000
    for r in rows:
        assert (r["cw"] // step) > ((r["cw"] - r["w"]) // step)
    from data_engineering_challenge_spark.queries_analytics import _t

    orders = _t(spark, SF, "orders")
    totals = {
        r["o_orderpriority"]: r["tw"]
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.sum(
                F.greatest(
                    F.lit(1).cast("bigint"),
                    F.floor(F.col("o_totalprice")).cast("bigint"),
                )
            ).alias("tw")
        )
        .collect()
    }
    picked: dict[str, int] = {}
    for r in rows:
        picked[r["o_orderpriority"]] = picked.get(r["o_orderpriority"], 0) + 1
    for strat, tw in totals.items():
        n = picked.get(strat, 0)
        assert tw // step <= n <= tw // step + 1, (strat, tw, n)


def test_equal_freq_bins_are_balanced(spark):
    rows = qa.equal_freq_histogram(spark, SF).collect()
    assert len(rows) == 10
    counts = [r["n"] for r in rows]
    assert max(counts) - min(counts) <= 1
    # bins tile the value domain: sorted by decile, lo/hi are monotone
    by_decile = sorted(rows, key=lambda r: r["decile"])
    for a, b in zip(by_decile, by_decile[1:]):
        assert a["hi"] <= b["lo"]


def test_value_drift_shares_sum_to_one(spark):
    rows = qa.value_drift_buckets(spark, SF).collect()
    assert sum(r["n_early"] for r in rows) > 0
    assert sum(r["n_late"] for r in rows) > 0
    assert abs(sum(r["share_early"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["share_late"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs(r["share_delta"] - (r["share_late"] - r["share_early"])) < 1e-12


def test_fuzzy_pairs_blocking_and_threshold(spark):
    rows = qa.fuzzy_name_pairs(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert r["name_a"].split(" ")[1] == r["name_b"].split(" ")[1]
        assert 1 <= r["edit_dist"] <= 3


def test_transition_matrix_rows_normalize(spark):
    rows = qa.event_transition_matrix(spark, SF).collect()
    from collections import defaultdict

    by_from = defaultdict(float)
    for r in rows:
        by_from[r["from_type"]] += r["prob"]
    for src, total in by_from.items():
        assert total == pytest.approx(1.0, abs=1e-9), src


def test_doc_chunks_cover_every_token(spark):
    """Chunking invariants at sf0.001: stride/window arithmetic drops no
    token — per doc, chunk 0 starts at token 1, consecutive chunks
    overlap by exactly 10 tokens (except a short final chunk), and the
    union of chunk spans covers [1, n_tokens]."""
    from data_engineering_challenge_spark.queries_text import (
        q_doc_chunk_windows,
        _docs,
    )

    chunks = q_doc_chunk_windows(spark, SF).collect()
    n_toks = {
        r["doc_id"]: r["n"]
        for r in _docs(spark, SF)
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    from collections import defaultdict

    by_doc = defaultdict(list)
    for r in chunks:
        by_doc[r["doc_id"]].append(r)
    assert set(by_doc) == set(n_toks)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        n = n_toks[doc_id]
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        covered_to = 0
        for r in rows:
            start = r["chunk_id"] * 30  # 0-based
            assert start <= covered_to  # no gap
            covered_to = max(covered_to, start + r["n_tokens"])
            assert r["n_tokens"] == len(r["chunk_text"].split(" "))
        assert covered_to == n  # full coverage, nothing dropped
        for r in rows[:-1]:
            assert r["n_tokens"] == 40  # only the last chunk may be short
