"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.9) — the escape hatch for per-key streaming logic that
windowed aggregation can't express.

Example operator: **first-seen dedup with running counts** — for each key
(user), remember which session fingerprints were already seen and emit only
first occurrences with a running per-user sequence number.  This is the
streaming form of exact dedup (SURVEY.md §2.10): at 100 TB the state store
shards by key across executors and the watermark bounds how long state for
quiet users is retained (GroupStateTimeout).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("fingerprint", StringType(), False),
        StructField("first_seen_us", LongType(), False),
        StructField("seq_no", LongType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("seen", StringType(), True),  # '|'-joined fingerprints
        StructField("count", LongType(), True),
    ]
)


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        seen_str, count = state.get
        seen = set(seen_str.split("|")) if seen_str else set()
    else:
        seen, count = set(), 0
    out_rows = []
    # Concatenate the group's Arrow chunks BEFORE sorting: sorting chunk-by-
    # chunk would let a later-timestamp occurrence in an earlier chunk win,
    # making first_seen_us depend on chunk boundaries.  Memory is bounded by
    # one user's rows per micro-batch, the same bound applyInPandasWithState
    # already imposes on the group iterator.  The (ts_us, fingerprint) sort
    # makes the emission order — and therefore seq_no — deterministic under
    # any shuffle layout: equal-timestamp fingerprints tie-break
    # lexicographically, so the output equals MIN(ts_us) per fingerprint
    # with ROW_NUMBER over (first_seen_us, fingerprint) per user — an
    # oracle-checkable surface (see queries_text.streaming_stateful_first_seen).
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts_us", "fingerprint"], kind="mergesort"
    )
    for fp, ts in zip(pdf["fingerprint"], pdf["ts_us"]):
        if fp not in seen:
            seen.add(fp)
            count += 1
            out_rows.append((user_id, fp, int(ts), count))
    state.update(("|".join(sorted(seen)), count))
    if out_rows:
        yield pd.DataFrame(
            out_rows, columns=["user_id", "fingerprint", "first_seen_us", "seq_no"]
        )


EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("event_id", LongType(), False),
        StructField("ewma", DoubleType(), False),
    ]
)

#: (last smoothed value, #events folded so far) per user
EWMA_STATE_SCHEMA = StructType(
    [
        StructField("last", DoubleType(), True),
        StructField("n", LongType(), True),
    ]
)


def _ewma_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    e, n = state.get if state.exists else (None, 0)
    # concat-then-sort for the same reason as _dedup_fn: chunk-local sorting
    # would make the recurrence order depend on Arrow chunk boundaries
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(
        ["ts_us", "event_id"], kind="mergesort"
    )
    out = []
    for eid, x in zip(pdf["event_id"], pdf["value"]):
        # IDENTICAL expression to the batch operator (queries_scale.
        # ewma_value) and its recursive-CTE oracle: α=0.5 products are
        # exact, one IEEE addition per step — so a micro-batched run is
        # bit-identical to the batch run, which the state-carry test
        # asserts with ==
        e = x if e is None else 0.5 * x + 0.5 * e
        n += 1
        out.append((user_id, int(eid), e))
    state.update((e, n))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "event_id", "ewma"])


def streaming_ewma(events_stream: DataFrame) -> DataFrame:
    """Per-user EWMA (α=0.5) maintained ACROSS micro-batches: the batch
    operator `queries_scale.ewma_value` as a stateful stream.  Input
    stream needs ``user_id, event_id, ts_us, value``; state is ONE
    (float, count) pair per user — the minimal-state recurrence shape
    `applyInPandasWithState` exists for.

    Contract: per-user arrival order across micro-batches must follow
    ts_us (the file-source / log-compaction norm); within a batch any
    order is fine (concat-then-sort).  With that contract the micro-
    batched output is bit-identical to the batch recurrence — tested by
    splitting the feed at a time boundary and comparing with ==."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _ewma_fn,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_first_seen(events_stream: DataFrame) -> DataFrame:
    """First occurrence of each (user, fingerprint) with a per-user running
    sequence number.  Input stream needs ``user_id, fingerprint, ts_us``.

    State = the seen-set per user (string-encoded; at real scale use RocksDB
    state store + a TTL timeout so quiet users age out).
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
