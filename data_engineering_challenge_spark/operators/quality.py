"""Data-quality expectation checks (the dbt-tests / expectations-suite
role a production pipeline runs between every two stages).

The reference's only quality gates are empty-input aborts
(reference pipeline/pipeline.py:91-100); a pipeline feeding a 100 TB
training run needs declarative checks that run WITHOUT multiplying passes
over the data.  Design rule here: every registered expectation compiles to
a conditional aggregate inside ONE ``agg`` — a single scan-shaped job per
table regardless of how many expectations are attached (uniqueness rides
the same pass as an exact count-distinct of the key struct; at extreme
cardinality swap it for the HLL sketch variant and accept the estimate).

Usage::

    report = check_expectations(df, [
        expect_not_null("user_id"),
        expect_unique("event_id"),
        expect_values_in("event_type", ["view", "click", "purchase"]),
        expect_between("value", 0, 1e6),
        expect_row_count_min(1),
    ])
    # report: one row per expectation — name, ok, n_violations

``fail_on_violations`` turns the report into a loud gate (the posture the
corrupt-table check in streaming.overwrite_by_key established: never let
bad data flow silently downstream).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """name + a (violations, denominator) aggregate-column factory."""

    name: str
    violations: Callable[[], Column]


def expect_not_null(col: str) -> Expectation:
    return Expectation(
        f"not_null({col})",
        lambda: F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def expect_unique(*cols: str) -> Expectation:
    """Duplicate rows by key = total rows - distinct keys (one pass; exact
    count-distinct of the key struct rides the same aggregate)."""
    return Expectation(
        f"unique({','.join(cols)})",
        lambda: F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols]),
    )


def expect_values_in(col: str, allowed: list) -> Expectation:
    return Expectation(
        f"values_in({col})",
        lambda: F.sum(
            F.when(~F.col(col).isin(allowed) | F.col(col).isNull(), 1).otherwise(0)
        ),
    )


def expect_between(col: str, lo, hi) -> Expectation:
    """NULLs do not violate a range check — pair with expect_not_null."""
    return Expectation(
        f"between({col},{lo},{hi})",
        lambda: F.sum(
            F.when(
                F.col(col).isNotNull()
                & ((F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))),
                1,
            ).otherwise(0)
        ),
    )


def expect_row_count_min(n: int) -> Expectation:
    """Violation count = shortfall below the minimum (0 when satisfied)."""
    return Expectation(
        f"row_count_min({n})",
        lambda: F.greatest(F.lit(n) - F.count(F.lit(1)), F.lit(0)),
    )


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations in ONE aggregate pass; returns a tidy
    report (expectation, n_violations, ok) — still lazy, so the caller
    chooses when the single job runs.

    Tidying happens by EXPLODING an array built from the single aggregate
    row — not by unioning one projection per expectation, which Catalyst
    column-prunes into N separate aggregates over the source (N scans; the
    plan test pins the 1-Aggregate shape)."""
    aggs = [
        F.coalesce(e.violations(), F.lit(0)).cast("bigint").alias(f"_e{i}")
        for i, e in enumerate(expectations)
    ]
    pairs = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("expectation"),
                F.col(f"_e{i}").alias("n_violations"),
            )
            for i, e in enumerate(expectations)
        ]
    )
    return (
        df.agg(*aggs)
        .select(F.explode(pairs).alias("r"))
        .select(
            "r.expectation",
            "r.n_violations",
            (F.col("r.n_violations") == 0).alias("ok"),
        )
    )


def fail_on_violations(df: DataFrame, expectations: list[Expectation]) -> None:
    """Loud gate: raise with the per-expectation counts if anything failed
    (collect is one tiny report row per expectation)."""
    rows = check_expectations(df, expectations).collect()
    bad = [(r.expectation, r.n_violations) for r in rows if not r.ok]
    if bad:
        raise ValueError(f"data-quality expectations failed: {bad}")


@dataclass(frozen=True)
class RowRule:
    """Row-level validity rule: name + a predicate-column factory (TRUE =
    row passes).  The row-wise complement of :class:`Expectation`'s
    aggregate counts — rules can tag individual rows for quarantine,
    expectations can only fail a batch."""

    name: str
    passes: Callable[[], Column]


def rule_not_null(col: str) -> RowRule:
    return RowRule(f"not_null({col})", lambda: F.col(col).isNotNull())


def rule_values_in(col: str, allowed: list) -> RowRule:
    return RowRule(
        f"values_in({col})",
        lambda: F.col(col).isNotNull() & F.col(col).isin(allowed),
    )


def rule_between(col: str, lo, hi) -> RowRule:
    """NULL passes the range rule (pair with rule_not_null), matching
    expect_between's NULL semantics."""
    return RowRule(
        f"between({col},{lo},{hi})",
        lambda: F.col(col).isNull()
        | ((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))),
    )


def tag_violations(df: DataFrame, rules: list[RowRule]) -> DataFrame:
    """Append a ``_violations`` array<string> column naming every rule the
    row fails (empty array = clean row).  One projection, no shuffle —
    the filter_compact of the array of conditional rule names."""
    tags = F.filter(
        F.array(
            *[
                F.when(~r.passes(), F.lit(r.name)).otherwise(
                    F.lit(None).cast("string")
                )
                for r in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return df.withColumn("_violations", tags)
