"""Journey-build edge semantics (FIXTURES.md 'Required edge cases' 1-4, 8, 9;
all cited to reference pipeline/cj_builder.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row

from data_engineering_challenge_spark.operators.journeys import build_journeys


def _sessions(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                session_id=r[0],
                user_id=r[1],
                ts=datetime.fromisoformat(r[2]),
                channel_name=r[3],
                holder_engagement=1,
                closer_engagement=0,
                impression_interaction=0,
            )
            for r in rows
        ]
    )


def _conversions(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                conv_id=r[0],
                user_id=r[1],
                conv_ts=datetime.fromisoformat(r[2]),
                revenue=100.0,
            )
            for r in rows
        ]
    )


def test_boundary_inclusive_and_after_excluded(spark):
    # session exactly at conversion time included (<=, cj_builder.py:90);
    # strictly after excluded
    sessions = _sessions(
        spark,
        [
            (1, "u1", "2024-01-01T10:00:00", "ads"),
            (2, "u1", "2024-01-01T10:00:01", "ads"),
        ],
    )
    conversions = _conversions(spark, [(100, "u1", "2024-01-01T10:00:00")])
    got = build_journeys(conversions, sessions).collect()
    assert [r.session_id for r in got] == [1]


def test_user_without_sessions_produces_no_rows(spark):
    # cj_builder.py:92 'if not user_sessions.empty' -> inner join
    sessions = _sessions(spark, [(1, "u1", "2024-01-01T10:00:00", "ads")])
    conversions = _conversions(spark, [(100, "u2", "2024-01-02T10:00:00")])
    assert build_journeys(conversions, sessions).count() == 0


def test_two_conversions_share_early_sessions(spark):
    # one user, 2 conversions -> earlier sessions attach to BOTH
    # (per-conversion loop, cj_builder.py:81-90)
    sessions = _sessions(
        spark,
        [
            (1, "u1", "2024-01-01T00:00:00", "ads"),
            (2, "u1", "2024-01-03T00:00:00", "email"),
        ],
    )
    conversions = _conversions(
        spark,
        [(100, "u1", "2024-01-02T00:00:00"), (200, "u1", "2024-01-04T00:00:00")],
    )
    got = build_journeys(conversions, sessions).collect()
    by_conv = {}
    for r in got:
        by_conv.setdefault(r.conversion_id, []).append(r.session_id)
    assert sorted(by_conv[100]) == [1]
    assert sorted(by_conv[200]) == [1, 2]


def test_output_shape_and_literals(spark):
    sessions = _sessions(spark, [(1, "u1", "2024-01-01T10:00:00", "ads")])
    conversions = _conversions(spark, [(100, "u1", "2024-01-02T10:00:00")])
    df = build_journeys(conversions, sessions)
    # fixed 8-column layout + carried conv_ts (cj_builder.py:103-106)
    assert df.columns == [
        "conversion_id",
        "session_id",
        "timestamp",
        "channel_label",
        "holder_engagement",
        "closer_engagement",
        "conversion",
        "impression_interaction",
        "conv_ts",
    ]
    row = df.collect()[0]
    assert row.conversion == 0  # literal, cj_builder.py:94
    assert row.channel_label == "ads"  # rename, cj_builder.py:100


def test_date_window_inclusive_both_ends(spark):
    # cj_builder.py:48-50: >= start AND <= end on the conversion date
    sessions = _sessions(spark, [(1, "u1", "2024-01-01T00:00:00", "ads")])
    conversions = _conversions(
        spark,
        [
            (100, "u1", "2024-01-10T23:59:59"),
            (200, "u1", "2024-01-11T00:00:00"),
            (300, "u1", "2024-01-20T00:00:00"),
            (400, "u1", "2024-01-21T00:00:00"),
        ],
    )
    got = build_journeys(
        conversions, sessions, start_date="2024-01-11", end_date="2024-01-20"
    ).collect()
    assert sorted(r.conversion_id for r in got) == [200, 300]


def test_lookback_bounds_sessions(spark):
    sessions = _sessions(
        spark,
        [
            (1, "u1", "2024-01-01T00:00:00", "ads"),
            (2, "u1", "2024-01-09T00:00:00", "ads"),
        ],
    )
    conversions = _conversions(spark, [(100, "u1", "2024-01-10T00:00:00")])
    got = build_journeys(conversions, sessions, lookback_days=5).collect()
    assert [r.session_id for r in got] == [2]
