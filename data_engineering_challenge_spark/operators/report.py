"""Channel reporting (SURVEY.md §2.4/§2.5) — the reference's 3-CTE SQLite
query (reference pipeline/channel_reporter.py:33-93) as a DataFrame chain.

Shape: session_data (left join costs, COALESCE 0) → attribution_data (inner
join attribution ⋈ conversions, ihc_revenue = ihc * revenue) → group by
(channel_name, date) with three sums → derived CPO/ROAS with the reference's
"denominator 0 ⇒ metric 0" scrubbing (channel_reporter.py:111-118: pandas
fillna(0) + inf→0 after the divisions).

Faithful semantics note: the reference sums ``cost`` over the JOINED rows —
a session attributed to k conversions contributes its cost k times
(channel_reporter.py:62-91).  We preserve that.

Scale: ``attribution`` and ``conversions`` join on high-cardinality keys →
shuffled joins sized by AQE; the final group-by on (channel, date) is low
cardinality → partial aggregation does almost all the work map-side.  The
costs side is usually comparable in size to sessions, so no broadcast by
default; Catalyst/AQE will broadcast it when stats say it is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def safe_ratio(num: Column, denom: Column) -> Column:
    """num/denom with the reference's scrub: 0 (not NULL/Inf/NaN) when the
    denominator is 0 (channel_reporter.py:111-118)."""
    return F.when(denom != 0.0, num / denom).otherwise(F.lit(0.0))


def session_data(
    sessions: DataFrame,
    costs: DataFrame,
    start_date: str | None = None,
    end_date: str | None = None,
) -> DataFrame:
    """First CTE (channel_reporter.py:36-56): sessions LEFT JOIN costs,
    missing cost → 0, optional inclusive date window on the session date."""
    sd = sessions
    if start_date is not None:
        sd = sd.filter(F.to_date(F.col("ts")) >= F.lit(start_date))
    if end_date is not None:
        sd = sd.filter(F.to_date(F.col("ts")) <= F.lit(end_date))
    return sd.join(costs, "session_id", "left").select(
        "session_id",
        "channel_name",
        F.to_date(F.col("ts")).alias("date"),
        F.coalesce(F.col("cost"), F.lit(0.0)).alias("cost"),
    )


def _sum(col: str, exact: bool) -> Column:
    """Plain double sum, or decimal-exact sum (order-independent across
    partitionings/engines — summing doubles is order-dependent at the last
    bits; casting to DECIMAL(28,10) makes the aggregate deterministic)."""
    if exact:
        return F.sum(F.col(col).cast("decimal(28,10)")).cast("double")
    return F.sum(col)


def channel_report(
    sessions: DataFrame,
    costs: DataFrame,
    attribution: DataFrame,
    conversions: DataFrame,
    start_date: str | None = None,
    end_date: str | None = None,
    exact_sums: bool = False,
) -> DataFrame:
    """The full report: (channel_name, date) → cost, ihc, ihc_revenue,
    CPO, ROAS (channel_reporter.py:33-118).

    ``attribution`` columns: conversion_id, session_id, ihc.
    ``conversions`` columns: conv_id, user_id, conv_ts, revenue.
    ``exact_sums``: decimal-exact aggregation (see :func:`_sum`).
    """
    sd = session_data(sessions, costs, start_date, end_date)
    attributed = (
        sd.join(attribution, "session_id")  # inner, channel_reporter.py:74
        .join(
            conversions.select(F.col("conv_id").alias("conversion_id"), "revenue"),
            "conversion_id",
        )
        .withColumn("ihc_revenue", F.col("ihc") * F.col("revenue"))
    )
    report = attributed.groupBy("channel_name", "date").agg(
        _sum("cost", exact_sums).alias("cost"),
        _sum("ihc", exact_sums).alias("ihc"),
        _sum("ihc_revenue", exact_sums).alias("ihc_revenue"),
    )
    return report.select(
        "channel_name",
        "date",
        "cost",
        "ihc",
        "ihc_revenue",
        safe_ratio(F.col("cost"), F.col("ihc")).alias("CPO"),
        safe_ratio(F.col("ihc_revenue"), F.col("cost")).alias("ROAS"),
    )


def channel_report_from_attributed(
    attributed: DataFrame,
    start_date: str | None = None,
    end_date: str | None = None,
    exact_sums: bool = False,
) -> DataFrame:
    """The report aggregation over PRE-ATTACHED attribution rows — the
    fused form of :func:`channel_report` (r14 optimization, guide §8).

    ``attributed`` must carry one row per (conversion, session) journey
    pair with ``channel_label`` (the journey name for channel_name),
    ``date`` (the session's date), ``cost`` (the session's coalesced
    cost) and ``revenue`` (the conversion's revenue) already attached —
    the journey builder's ``carry_session_cols``/``carry_conversion_cols``
    plumbing.  Row-for-row this is exactly the reference's
    ``attribution_data`` CTE (channel_reporter.py:62-91): session_data ⋈
    attribution ⋈ conversions multiplies sessions onto attribution rows,
    which ARE the journey rows — so attaching the columns before the one
    attribution shuffle and aggregating directly removes two joins, two
    scans and one shuffle from the plan while producing bit-identical
    sums (the decimal convention makes them order-independent).

    The optional date window applies to the SESSION date after
    attribution — same rows as the reference's session_data filter, and
    deliberately NOT pushed below the attribution windows (it would
    change which sessions participate in each journey's credit split).
    """
    out = attributed
    if start_date is not None:
        out = out.filter(F.col("date") >= F.lit(start_date).cast("date"))
    if end_date is not None:
        out = out.filter(F.col("date") <= F.lit(end_date).cast("date"))
    out = out.withColumn("ihc_revenue", F.col("ihc") * F.col("revenue"))
    report = out.groupBy(
        F.col("channel_label").alias("channel_name"), "date"
    ).agg(
        _sum("cost", exact_sums).alias("cost"),
        _sum("ihc", exact_sums).alias("ihc"),
        _sum("ihc_revenue", exact_sums).alias("ihc_revenue"),
    )
    return report.select(
        "channel_name",
        "date",
        "cost",
        "ihc",
        "ihc_revenue",
        safe_ratio(F.col("cost"), F.col("ihc")).alias("CPO"),
        safe_ratio(F.col("ihc_revenue"), F.col("cost")).alias("ROAS"),
    )


def report_summary(report: DataFrame) -> DataFrame:
    """Driver-side summary aggregates (channel_reporter.py:133-151): totals
    plus means of CPO/ROAS restricted to positive values (filtered mean,
    SURVEY.md §2.5)."""
    return report.agg(
        F.count("*").alias("n_rows"),
        F.sum("cost").alias("total_cost"),
        F.sum("ihc_revenue").alias("total_ihc_revenue"),
        F.avg(F.when(F.col("CPO") > 0, F.col("CPO"))).alias("avg_cpo"),
        F.avg(F.when(F.col("ROAS") > 0, F.col("ROAS"))).alias("avg_roas"),
    )
