"""Plan inspection utilities (SURVEY.md §4).

The engine ships no custom Catalyst rules — the point of the Spark-first
design is that pushdown, pruning, join selection and AQE come from the
declarative plan.  What it ships instead is *verification* that those
properties hold: helpers to read the physical plan, and assertions the
test suite (tests/test_plans.py) uses as regression guards.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (physical) plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    """`df.explain('formatted')` as a string (for logging/CI artifacts)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanFacts:
    """Structural facts a scale review cares about."""

    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    pushed_filters: list[str]
    read_schemas: list[str]

    @property
    def shuffle_free(self) -> bool:
        return self.n_exchanges == 0


def plan_facts(df: DataFrame) -> PlanFacts:
    import re

    plan = physical_plan(df)
    return PlanFacts(
        n_exchanges=plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        n_broadcast_joins=plan.count("BroadcastHashJoin"),
        n_sortmerge_joins=plan.count("SortMergeJoin"),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", plan),
        read_schemas=re.findall(r"ReadSchema: (\S+)", plan),
    )
