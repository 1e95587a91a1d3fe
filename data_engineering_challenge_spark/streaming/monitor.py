"""Streaming observability (SURVEY.md §2.9 operational layer): per-micro-
batch metrics via ``DataFrame.observe`` + ``StreamingQueryListener``.

Why observe() and not a second aggregation: observed metrics are computed
INSIDE the batch's existing job — accumulator-style, zero extra passes,
zero extra shuffles — and surface through the engine's progress events.
At 100 TB that is the difference between free telemetry and doubling the
pipeline's I/O to count what it just processed.  The standard uses:
row-count / bad-row-count per batch (data-quality drift alarms), sum of a
money column (reconciliation against the source ledger), watermark lag.

The reference has no streaming at all; its closest analog is the
post-write verification count (reference api_client.py:254-268), which IS
a second full query — this is that capability done scale-correctly.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming.listener import StreamingQueryListener

#: the observation name this module attaches and listens for
OBSERVATION = "batch_metrics"


def with_batch_metrics(df: DataFrame, **metrics: Column) -> DataFrame:
    """Attach named aggregate ``metrics`` (e.g. ``n_rows=F.count(F.lit(1)),
    n_bad=F.count_if(cond)``) to the stream — computed inside each
    micro-batch's job, reported through query progress, never a second
    pass."""
    return df.observe(OBSERVATION, *[c.alias(n) for n, c in metrics.items()])


class BatchMetricsListener(StreamingQueryListener):
    """Collects the OBSERVATION metrics row of every completed micro-batch.

    Listener callbacks arrive asynchronously on the listener bus; callers
    that just stopped a query should use :meth:`wait_for` rather than
    reading :attr:`batches` immediately."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (listener API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        observed = event.progress.observedMetrics
        row = observed.get(OBSERVATION)
        if row is not None and event.progress.numInputRows > 0:
            self.batches.append(
                {"batchId": event.progress.batchId, **row.asDict()}
            )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def wait_for(self, n_batches: int, timeout_s: float = 30.0) -> list[dict]:
        """Block until ``n_batches`` metric rows arrived (the bus is async
        relative to ``awaitTermination``) or raise on timeout."""
        deadline = time.monotonic() + timeout_s
        while len(self.batches) < n_batches:
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"observed {len(self.batches)}/{n_batches} batch metric "
                    f"rows within {timeout_s}s"
                )
            time.sleep(0.05)
        return self.batches
