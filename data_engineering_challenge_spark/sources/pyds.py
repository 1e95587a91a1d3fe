"""Custom Python DataSource (the Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-events generator with partition-parallel reads.

Why the engine ships one: the reference ingests only files/SQLite; a
Spark-native platform also wants PROGRAMMATIC sources (load generators,
API paginators, fixture fabricators) that plug into the reader surface —
`spark.read.format("synthetic_events")` — instead of materializing files
first.  The Python DataSource API gives that without a JVM jar: the
planner asks `partitions()` for the split list and fans `read(partition)`
out across executors, so generation is partition-parallel like any scan.

Determinism contract: row `i` of `rows` total is a pure integer function
of `i` (no RNG, no time) — the whole relation is reproducible on any
cluster layout, and an external engine can recompute it exactly (the
`synthetic_source_agg` registry query hash-matches a DuckDB
`range()`-based oracle against this source's output).

Scale: each partition generates a contiguous `[start, end)` id range —
no shuffle, no skew (ranges are equal-width), state O(1) per task.  A
Python generator yields ~1M simple rows/s/core; for bulk fixtures beyond
that, write once with this source and read parquet thereafter.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


#: the synthetic relation, row i  (all integer arithmetic — portable):
#:   event_id = i
#:   user_id  = i mod 997                    (coprime-ish user spread)
#:   bucket   = i mod 13
#:   value_cents = (i * 31) mod 100000       (deterministic "amount")
#:   day_no   = i div 10000                  (coarse time axis)
_SCHEMA_DDL = (
    "event_id bigint, user_id bigint, bucket bigint, "
    "value_cents bigint, day_no bigint"
)


def _row(i: int) -> tuple:
    return (i, i % 997, i % 13, (i * 31) % 100000, i // 10000)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)
    .option("partitions", P).load()`` — N deterministic rows split into P
    equal ranges."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        # the SIMPLE stream API (prefetch-on-driver, offset dicts) — the
        # right fit for a generator; `streamReader` would be the
        # partition-planned variant for sources with real splits
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("partitions", 4))
        if self.rows < 0:
            raise ValueError("synthetic_events: rows must be >= 0")
        if self.num_partitions < 1:
            raise ValueError("synthetic_events: partitions must be >= 1")

    def partitions(self):
        n, p = self.rows, self.num_partitions
        step = (n + p - 1) // p if n else 0
        out = []
        for k in range(p):
            start, end = k * step, min((k + 1) * step, n)
            if start < end:
                out.append(_RangePartition(start, end))
        # always at least one (possibly empty) split so the scan plans
        return out or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)


def register_synthetic_source(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------------
# streaming variant: the same deterministic relation as a bounded stream
# ---------------------------------------------------------------------------


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batches over the synthetic relation:
    offset = {"i": next-row-index}; each batch is rows
    [i, min(i + batch_rows, total_rows)).  ``readBetweenOffsets`` replays
    EXACTLY the same rows for a given (start, end) — determinism is what
    makes checkpoint recovery exactly-once for downstream sinks."""

    def __init__(self, options):
        self.total = int(options.get("total_rows", 100))
        self.batch = int(options.get("batch_rows", 10))
        if self.batch < 1:
            raise ValueError("synthetic_events stream: batch_rows must be >= 1")

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = min(lo + self.batch, self.total)
        return iter([_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(int(start["i"]), int(end["i"]))])
