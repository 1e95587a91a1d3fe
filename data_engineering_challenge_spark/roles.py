"""Role-mapping of the driver's testdata onto the attribution star schema.

The reference operates on five SQLite tables (conversions, session_sources,
session_costs, attribution_customer_journey, channel_reporting — see
reference pipeline/cj_builder.py:36-72 and channel_reporter.py:37-44).  The
driver's testdata has no such tables, so we derive them from ``events``
with pure, deterministic column expressions — expressed IDENTICALLY here
(Spark) and in the DuckDB oracle SQL (``__spark_entry__.oracle_sql``), so
both engines compute the same inputs (FIXTURES.md §B).

Mapping (all from ``events(event_id, ts, user_id, event_type, value, props)``):

* session_sources: every event is a session.
    session_id   <- event_id
    ts           <- ts                  (kept as a real timestamp — the
                                         reference's TEXT date+time pair is a
                                         SQLite artifact, SURVEY.md §1.1)
    channel_name <- event_type
    holder_engagement      <- event_id % 2
    closer_engagement      <- (event_id % 3 == 0) as int
    impression_interaction <- (event_id % 5 == 0) as int
* conversions: 'purchase' events convert.
    conv_id <- event_id, conv_ts <- ts, revenue <- value
* session_costs: 90% coverage (exercises LEFT JOIN + COALESCE,
  reference channel_reporter.py:40):
    rows where event_id % 10 != 0; cost <- value * 0.1

Keeping sessions and conversions in the same table/time-domain gives the
as-of join real work: each purchase collects all earlier sessions of the
same user (reference cj_builder.py:81-109 semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, normalizing its TIMESTAMP(NANOS) column.

    Spark has no nanosecond timestamp type; ``nanosAsLong`` reads the raw
    int64 nanos, and we truncate to microseconds with INTEGER division
    (``div`` — ``/`` would be double division, which loses precision at 1e18
    magnitudes).  DuckDB truncates ns→µs the same way, so both engines see
    identical microsecond timestamps.
    """
    from .sources.io import read_parquet_cached_schema

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = read_parquet_cached_schema(spark, os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _session_role_cols() -> list:
    """The session_sources projection, single-sourced: every DataFrame
    spelling of the role formulas (plain role, fused flagship) builds
    from THIS list, so the definitions cannot silently drift apart
    (advice, round 14).  The SQL twins below stay textual by necessity —
    they are the oracle's own surface."""
    return [
        F.col("event_id").alias("session_id"),
        F.col("user_id"),
        F.col("ts"),
        F.col("event_type").alias("channel_name"),
        (F.col("event_id") % 2).cast("int").alias("holder_engagement"),
        (F.col("event_id") % 3 == 0).cast("int").alias("closer_engagement"),
        (F.col("event_id") % 5 == 0).cast("int").alias("impression_interaction"),
    ]


# the session_costs role formula, shared between the role table and the
# fused flagship's inline attach (functions, not module constants —
# Column construction needs an active SparkContext)
def _cost_covered():
    return F.col("event_id") % 10 != 0


def _cost_value():
    return F.col("value") * 0.1


def sessions_from_events(events: DataFrame) -> DataFrame:
    """session_sources role (reference pipeline/cj_builder.py:62-72)."""
    return events.select(*_session_role_cols())


def costed_sessions_from_events(events: DataFrame) -> DataFrame:
    """The fused flagship's input (r14, guide §8): the sessions role plus
    the session's ``date`` and COALESCEd ``cost`` attached from the SAME
    events row — row-for-row the session_costs LEFT JOIN + COALESCE(cost,
    0.0), valid because event_id is unique (pinned by
    tests/test_report.py::test_events_event_id_unique; a row outside the
    cost coverage joins nothing → CASE yields NULL → COALESCE 0, and a
    NULL ``value`` zeroes identically on both paths).  Formulas are
    single-sourced with the role functions above."""
    return events.select(
        *_session_role_cols(),
        F.to_date(F.col("ts")).alias("date"),
        F.coalesce(F.when(_cost_covered(), _cost_value()), F.lit(0.0)).alias(
            "cost"
        ),
    )


def conversions_from_events(events: DataFrame) -> DataFrame:
    """conversions role (reference pipeline/cj_builder.py:36-42)."""
    return events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id"),
        F.col("ts").alias("conv_ts"),
        F.col("value").alias("revenue"),
    )


def session_costs_from_events(events: DataFrame) -> DataFrame:
    """session_costs role, ~90% coverage (reference channel_reporter.py:40-44)."""
    return events.filter(_cost_covered()).select(
        F.col("event_id").alias("session_id"),
        _cost_value().alias("cost"),
    )


# The same derivations as ANSI SQL fragments for the DuckDB oracle.  These are
# CTE bodies; oracle queries embed them so both engines see identical inputs.
SQL_SESSIONS = """
    SELECT event_id AS session_id,
           user_id,
           ts,
           event_type AS channel_name,
           CAST(event_id % 2 AS INTEGER) AS holder_engagement,
           CAST(event_id % 3 = 0 AS INTEGER) AS closer_engagement,
           CAST(event_id % 5 = 0 AS INTEGER) AS impression_interaction
    FROM events
"""

SQL_CONVERSIONS = """
    SELECT event_id AS conv_id,
           user_id,
           ts AS conv_ts,
           value AS revenue
    FROM events
    WHERE event_type = 'purchase'
"""

SQL_COSTS = """
    SELECT event_id AS session_id,
           value * 0.1 AS cost
    FROM events
    WHERE event_id % 10 <> 0
"""
