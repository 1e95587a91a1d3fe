"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship channel-report pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 as (Spark callable, DuckDB oracle) pairs.  The registry lives
in ``data_engineering_challenge_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_challenge_spark import queries as _q  # noqa: E402

# importing these modules populates the registry in `queries`
from data_engineering_challenge_spark import queries_analytics  # noqa: E402,F401
from data_engineering_challenge_spark import queries_relational  # noqa: E402,F401
from data_engineering_challenge_spark import queries_scale  # noqa: E402,F401
from data_engineering_challenge_spark import queries_sql  # noqa: E402,F401
from data_engineering_challenge_spark import queries_text  # noqa: E402,F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Full attribution pipeline: as-of journey join -> position/engagement
    attribution (Σ ihc = 1 per conversion) -> channel/date report with
    CPO+ROAS (reference pipeline/channel_reporter.py:33-118 semantics).
    """
    return _q.q_channel_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    non-SQL-expressible operators -> driver records rows-only check)."""
    return _q.oracle_sql()
