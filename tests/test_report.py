"""Channel report semantics (reference channel_reporter.py:33-118):
LEFT JOIN + COALESCE, inner-join drop of unattributed sessions,
cost multiplied per attribution row, CPO/ROAS zero-denominator scrub."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import Row

from data_engineering_challenge_spark.operators.report import (
    channel_report,
    report_summary,
)


@pytest.fixture(scope="module")
def inputs(spark):
    sessions = spark.createDataFrame(
        [
            Row(session_id=1, user_id="u1", ts=datetime(2024, 1, 1, 10), channel_name="ads"),
            Row(session_id=2, user_id="u1", ts=datetime(2024, 1, 1, 11), channel_name="email"),
            # session 3 has no cost row AND no attribution -> dropped by inner join
            Row(session_id=3, user_id="u2", ts=datetime(2024, 1, 2, 10), channel_name="ads"),
        ]
    )
    costs = spark.createDataFrame(
        [Row(session_id=1, cost=10.0)]  # session 2 missing -> COALESCE 0
    )
    attribution = spark.createDataFrame(
        [
            # session 1 attributed to TWO conversions -> cost counted twice
            Row(conversion_id=100, session_id=1, ihc=0.5),
            Row(conversion_id=101, session_id=1, ihc=1.0),
            Row(conversion_id=100, session_id=2, ihc=0.5),
        ]
    )
    conversions = spark.createDataFrame(
        [
            Row(conv_id=100, user_id="u1", conv_ts=datetime(2024, 1, 1, 12), revenue=200.0),
            Row(conv_id=101, user_id="u1", conv_ts=datetime(2024, 1, 1, 13), revenue=50.0),
        ]
    )
    return sessions, costs, attribution, conversions


def test_report_values(spark, inputs):
    report = channel_report(*inputs)
    got = {(r.channel_name, r.date): r for r in report.collect()}
    ads = got[("ads", date(2024, 1, 1))]
    # session 1 joined twice: cost 10+10, ihc 0.5+1.0, rev 0.5*200 + 1.0*50
    assert ads.cost == 20.0
    assert ads.ihc == 1.5
    assert ads.ihc_revenue == 150.0
    assert ads.CPO == pytest.approx(20.0 / 1.5)
    assert ads.ROAS == pytest.approx(150.0 / 20.0)
    email = got[("email", date(2024, 1, 1))]
    # session 2: cost COALESCEd to 0 -> ROAS denominator 0 -> 0 (not inf/null)
    assert email.cost == 0.0
    assert email.ihc == 0.5
    assert email.ihc_revenue == 100.0
    assert email.ROAS == 0.0
    assert email.CPO == pytest.approx(0.0 / 0.5)
    # unattributed session 3 dropped entirely
    assert ("ads", date(2024, 1, 2)) not in got


def test_cpo_zero_when_ihc_zero(spark):
    sessions = spark.createDataFrame(
        [Row(session_id=1, user_id="u", ts=datetime(2024, 1, 1), channel_name="ads")]
    )
    costs = spark.createDataFrame([Row(session_id=1, cost=5.0)])
    attribution = spark.createDataFrame([Row(conversion_id=1, session_id=1, ihc=0.0)])
    conversions = spark.createDataFrame(
        [Row(conv_id=1, user_id="u", conv_ts=datetime(2024, 1, 2), revenue=9.0)]
    )
    row = channel_report(sessions, costs, attribution, conversions).collect()[0]
    assert row.CPO == 0.0  # 5/0 -> 0, not inf/null (channel_reporter.py:111-118)


def test_date_window_filters_sessions(spark, inputs):
    sessions, costs, attribution, conversions = inputs
    report = channel_report(
        sessions, costs, attribution, conversions,
        start_date="2024-01-02", end_date="2024-01-02",
    )
    assert report.count() == 0  # all attributed sessions are on 01-01


def test_report_summary(spark, inputs):
    report = channel_report(*inputs)
    s = report_summary(report).collect()[0]
    assert s.n_rows == 2
    assert s.total_cost == 20.0
    assert s.total_ihc_revenue == 250.0
    # means over positive values only (channel_reporter.py:138-148)
    assert s.avg_cpo == pytest.approx(20.0 / 1.5)
    assert s.avg_roas == pytest.approx(7.5)


def _generic_report(spark, sf, start_date=None, end_date=None):
    from data_engineering_challenge_spark import roles
    from data_engineering_challenge_spark.operators import attribution as attr
    from data_engineering_challenge_spark.operators import journeys as jny
    from data_engineering_challenge_spark.operators import report as rpt

    events = roles.load_events(spark, sf)
    sessions = roles.sessions_from_events(events)
    conversions = roles.conversions_from_events(events)
    costs = roles.session_costs_from_events(events)
    j = jny.build_journeys(conversions, sessions)
    a = attr.attribute_position_engagement(j)
    return rpt.channel_report(
        sessions, costs, a, conversions,
        start_date=start_date, end_date=end_date, exact_sums=True,
    )


def test_fused_report_equals_generic_composition(spark):
    """The r14 fused flagship (cost/date/revenue carried through the
    attribution shuffle, report aggregated in place) must return
    bit-identical rows to the generic operator composition it replaced —
    the equivalence the fusion's correctness rests on."""
    from data_engineering_challenge_spark.queries import _report_df

    sf = "/root/testdata/sf0.001"
    fused = sorted(map(tuple, _report_df(spark, sf).collect()))
    generic = sorted(map(tuple, _generic_report(spark, sf).collect()))
    assert fused == generic


def test_fused_report_date_window_equals_generic(spark):
    """channel_report_from_attributed applies the session-date window
    AFTER attribution — same rows as the generic path's session_data
    filter (which journeys every session regardless of window)."""
    from data_engineering_challenge_spark import roles
    from data_engineering_challenge_spark.operators import attribution as attr
    from data_engineering_challenge_spark.operators import journeys as jny
    from data_engineering_challenge_spark.operators import report as rpt
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    lo, hi = "2024-01-08", "2024-01-16"
    events = roles.load_events(spark, sf)
    sessions = roles.sessions_from_events(events)
    conversions = roles.conversions_from_events(events)
    costs = roles.session_costs_from_events(events)
    sess_costed = sessions.join(costs, "session_id", "left").select(
        "session_id", "user_id", "ts", "channel_name",
        "holder_engagement", "closer_engagement", "impression_interaction",
        F.to_date(F.col("ts")).alias("date"),
        F.coalesce(F.col("cost"), F.lit(0.0)).alias("cost"),
    )
    j = jny.build_journeys(
        conversions, sess_costed,
        carry_session_cols=("date", "cost"),
        carry_conversion_cols=("revenue",),
    )
    a = attr.attribute_position_engagement(
        j, carry_cols=("channel_label", "date", "cost", "revenue")
    )
    fused = rpt.channel_report_from_attributed(
        a, start_date=lo, end_date=hi, exact_sums=True
    )
    generic = _generic_report(spark, sf, start_date=lo, end_date=hi)
    got = sorted(map(tuple, fused.collect()))
    want = sorted(map(tuple, generic.collect()))
    assert got and got == want


def test_events_event_id_unique(spark):
    """Precondition of the fused flagship's INLINE cost attach: the costs
    role left-joins on session_id = event_id, which collapses to a CASE
    over the same row only when event_id never repeats.  The testdata
    generator uses event_id as the primary key; if that ever changes,
    this must fail before the inline rewrite can diverge from the oracle."""
    for sf in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",  # the benched scale — guard where it's measured
    ):
        from data_engineering_challenge_spark import roles

        events = roles.load_events(spark, sf)
        total = events.count()
        distinct = events.select("event_id").distinct().count()
        assert total == distinct, f"duplicate event_id in {sf}"
