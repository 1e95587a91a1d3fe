"""Chunked external scoring semantics (reference api_client.py:169-219):
cap enforcement, over-cap skip, loud failure instead of silent drop."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_engineering_challenge_spark.operators import batching


def _journeys(spark, conv_sizes: dict[int, int]):
    rows = []
    t0 = datetime(2024, 1, 1)
    for cid, n in conv_sizes.items():
        for i in range(n):
            rows.append(
                Row(
                    conversion_id=cid,
                    session_id=cid * 1000 + i,
                    timestamp=t0 + timedelta(minutes=i),
                    channel_label="ads",
                    holder_engagement=0,
                    closer_engagement=0,
                    conversion=0,
                    impression_interaction=0,
                )
            )
    return spark.createDataFrame(rows)


def test_local_scorer_linear_sums_to_one(spark):
    j = _journeys(spark, {1: 4, 2: 1, 3: 7})
    out = batching.attribute_external(j)
    sums = {r.conversion_id: r.s for r in
            out.groupBy("conversion_id").agg(F.sum("ihc").alias("s")).collect()}
    assert all(abs(s - 1.0) < 1e-9 for s in sums.values())
    assert set(sums) == {1, 2, 3}


def test_over_cap_conversions_skipped(spark):
    j = _journeys(spark, {1: 3, 2: 10})
    out = batching.attribute_external(j, max_sessions_per_request=5)
    assert {r.conversion_id for r in out.select("conversion_id").distinct().collect()} == {1}
    skipped = batching.skipped_over_cap(j, 5).collect()
    assert [(r.conversion_id, r.n_sessions) for r in skipped] == [(2, 10)]


def test_sub_batches_respect_both_caps(spark):
    calls = []

    def spy(records):
        calls.append(records)
        return batching.local_linear_scorer(records)

    j = _journeys(spark, {i: 3 for i in range(10)})
    out = batching.attribute_external(
        j, score_fn=spy, max_journeys_per_request=2, max_sessions_per_request=5
    )
    assert out.count() == 30
    for call in calls:
        convs = {r["conversion_id"] for r in call}
        assert len(convs) <= 2  # journeys cap
        assert len(call) <= 5   # sessions cap (2 convs x 3 sessions would be 6)


def test_scorer_none_fails_loud(spark):
    j = _journeys(spark, {1: 2})
    out = batching.attribute_external(j, score_fn=lambda r: None)
    with pytest.raises(Exception, match="refusing to drop"):
        out.collect()


def test_attribute_external_composes_lazily(spark):
    """Composition must trigger NO Spark job (the eager distinct-count
    chunk sizing was a full extra scan at plan-construction time)."""
    j = _journeys(spark, {1: 3, 2: 5})
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    out = batching.attribute_external(j)  # noqa: F841 - compose only
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
