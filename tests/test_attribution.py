"""Attribution family: Σ ihc = 1 invariant (the reference's own runtime
check, api_client.py:92-98,254-268) + tolerance-gated normalization."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row

from data_engineering_challenge_spark.operators import attribution as attr


def _journeys(spark, convs):
    """convs: dict conversion_id -> list of (session_id, iso_ts, holder, closer)."""
    rows = []
    for cid, sess in convs.items():
        for sid, ts, h, c in sess:
            rows.append(
                Row(
                    conversion_id=cid,
                    session_id=sid,
                    timestamp=datetime.fromisoformat(ts),
                    channel_label="ads",
                    holder_engagement=h,
                    closer_engagement=c,
                    conversion=0,
                    impression_interaction=0,
                )
            )
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def journeys(spark):
    return _journeys(
        spark,
        {
            1: [
                (10, "2024-01-01T00:00:00", 1, 0),
                (11, "2024-01-02T00:00:00", 0, 1),
                (12, "2024-01-03T00:00:00", 1, 1),
            ],
            2: [(20, "2024-01-01T00:00:00", 0, 0)],
            # tie on timestamp -> session_id breaks it deterministically
            3: [
                (30, "2024-01-01T00:00:00", 0, 0),
                (31, "2024-01-01T00:00:00", 0, 0),
            ],
        },
    )


def _sums(df):
    return {r.conversion_id: r.s for r in
            df.groupBy("conversion_id").sum("ihc")
            .withColumnRenamed("sum(ihc)", "s").collect()}


@pytest.mark.parametrize(
    "fn",
    [
        attr.attribute_last_touch,
        attr.attribute_first_touch,
        attr.attribute_linear,
        attr.attribute_position_engagement,
    ],
)
def test_sum_to_one(journeys, fn):
    for cid, s in _sums(fn(journeys)).items():
        assert abs(s - 1.0) < 1e-9, (fn.__name__, cid, s)


def test_last_first_touch_pick_right_session(journeys):
    last = {r.session_id: r.ihc for r in attr.attribute_last_touch(journeys).collect()}
    assert last[12] == 1.0 and last[10] == 0.0 and last[11] == 0.0
    first = {r.session_id: r.ihc for r in attr.attribute_first_touch(journeys).collect()}
    assert first[10] == 1.0 and first[12] == 0.0
    # deterministic tie-break by session_id
    assert first[30] == 1.0 and first[31] == 0.0
    assert last[31] == 1.0 and last[30] == 0.0


def test_linear_split(journeys):
    got = {r.session_id: r.ihc for r in attr.attribute_linear(journeys).collect()}
    assert got[10] == got[11] == got[12] == pytest.approx(1 / 3)
    assert got[20] == 1.0


def test_position_engagement_shape(journeys):
    got = {
        r.session_id: r.ihc
        for r in attr.attribute_position_engagement(journeys).collect()
    }
    # conv 1: raw = first 2.0, middle 1*(1+0)=1.0 (session 11 holder=0),
    # last 2*(1+1)=4.0 -> total 7
    assert got[10] == pytest.approx(2 / 7)
    assert got[11] == pytest.approx(1 / 7)
    assert got[12] == pytest.approx(4 / 7)
    assert got[20] == 1.0  # single session takes initializer branch, normalizes to 1


def test_normalize_tolerance_semantics(spark):
    # off-by-more-than-1e-4 -> rescaled; inside tolerance -> untouched
    # (reference api_client.py:95)
    df = spark.createDataFrame(
        [
            Row(conversion_id=1, session_id=1, ihc=0.5),
            Row(conversion_id=1, session_id=2, ihc=0.47),  # sum 0.97 -> rescale
            Row(conversion_id=2, session_id=3, ihc=0.5),
            Row(conversion_id=2, session_id=4, ihc=0.50004),  # sum 1.00004 -> keep
            Row(conversion_id=3, session_id=5, ihc=0.0),  # sum 0 -> keep (guard)
        ]
    )
    got = {r.session_id: r.ihc for r in attr.normalize_ihc(df).collect()}
    assert got[1] == pytest.approx(0.5 / 0.97)
    assert got[2] == pytest.approx(0.47 / 0.97)
    assert got[3] == 0.5
    assert got[4] == 0.50004
    assert got[5] == 0.0


def test_verify_attribution(spark):
    df = spark.createDataFrame(
        [
            Row(conversion_id=1, session_id=1, ihc=0.5),
            Row(conversion_id=1, session_id=2, ihc=0.5),
            Row(conversion_id=2, session_id=3, ihc=0.9),
        ]
    )
    got = {r.conversion_id: r.is_valid for r in attr.verify_attribution(df).collect()}
    assert got == {1: 1, 2: 0}
