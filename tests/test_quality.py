"""Data-quality expectation checks: every rule rides ONE aggregate pass."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from data_engineering_challenge_spark.operators import quality as q


def _df(spark):
    return spark.createDataFrame(
        [
            Row(event_id=1, user_id=10, event_type="view", value=5.0),
            Row(event_id=2, user_id=None, event_type="click", value=-1.0),
            Row(event_id=2, user_id=30, event_type="zzz", value=2.0),
        ]
    )


def test_expectations_report(spark):
    rows = {
        r.expectation: (r.n_violations, r.ok)
        for r in q.check_expectations(
            _df(spark),
            [
                q.expect_not_null("user_id"),
                q.expect_unique("event_id"),
                q.expect_values_in("event_type", ["view", "click", "purchase"]),
                q.expect_between("value", 0, 100),
                q.expect_row_count_min(2),
            ],
        ).collect()
    }
    assert rows["not_null(user_id)"] == (1, False)
    assert rows["unique(event_id)"] == (1, False)       # event_id=2 twice
    assert rows["values_in(event_type)"] == (1, False)  # 'zzz'
    assert rows["between(value,0,100)"] == (1, False)   # -1.0
    assert rows["row_count_min(2)"] == (0, True)


def test_expectations_single_job(spark):
    """All expectations must evaluate in ONE aggregate pass: the report is
    a union of projections over a single 1-row aggregate — exactly one
    aggregation subtree per expectation is NOT allowed to rescan the
    input (plan shows one Scan branch reused / no N-fold scan count)."""
    report = q.check_expectations(
        _df(spark),
        [q.expect_not_null("user_id"), q.expect_unique("event_id"),
         q.expect_between("value", 0, 100)],
    )
    plan = report._jdf.queryExecution().optimizedPlan().toString()
    # the union's branches all project off the SAME aggregate: exactly one
    # Aggregate node in the optimized plan
    assert plan.count("Aggregate") == 1


def test_fail_on_violations_raises_with_counts(spark):
    with pytest.raises(ValueError, match="not_null"):
        q.fail_on_violations(_df(spark), [q.expect_not_null("user_id")])
    # a clean table passes silently
    q.fail_on_violations(_df(spark), [q.expect_row_count_min(1)])


def test_expectations_pass_on_clean_table(spark):
    clean = spark.createDataFrame(
        [Row(event_id=i, user_id=i, event_type="view", value=1.0)
         for i in range(5)]
    )
    rows = q.check_expectations(
        clean,
        [q.expect_not_null("user_id"), q.expect_unique("event_id"),
         q.expect_values_in("event_type", ["view"]),
         q.expect_between("value", 0, 2), q.expect_row_count_min(5)],
    ).collect()
    assert all(r.ok and r.n_violations == 0 for r in rows)
