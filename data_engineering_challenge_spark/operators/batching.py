"""Group-bounded batching + partition-parallel external scoring
(SURVEY.md §2.7/§2.8 ``attribute_external``).

The reference walks unique conversion ids in strides of
``max_journeys_per_request``, falls back to per-conversion requests when a
chunk exceeds ``max_sessions_per_request``, and SKIPS (with a warning) any
conversion whose journey alone exceeds the session cap
(reference pipeline/api_client.py:169-219, skip at :197-199).  It also
sleeps 1 s between requests and silently drops a chunk whose request
errored (:50-65 → None → dropped) — we make that loud instead.

Spark-native design — two layers:

1. **Distribution**: conversations are spread over ``ceil(n/max_journeys)``
   chunks by hashing the conversion id — no global sort, no driver
   loop, any number of executors.  A chunk is therefore *expected* to hold
   ``max_journeys`` conversions rather than exactly that many.
2. **Exact caps**: inside each chunk (an ``applyInPandas`` group, i.e. one
   worker-local pandas frame) journeys are re-split into sub-batches that
   respect BOTH reference caps exactly before each scorer call.

Over-cap conversions are dropped before distribution — loudly, via an
accessible DataFrame (``skipped_over_cap``), not a swallowed warning.

The scorer is any ``list[dict] -> list[dict]`` callable with the
reference's API contract (input journey records; output rows with
``conversion_id``/``session_id``/``ihc``) — an HTTP client in external
mode, or the bundled deterministic local model.  Scorer failures raise —
a failed batch fails the job rather than silently losing conversions.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

ScoreFn = Callable[[list[dict]], list[dict]]

RESULT_FIELDS = ["conversion_id", "session_id", "ihc"]

#: columns internal to this engine, never part of the scorer's journey
#: contract (reference api_client.py request body carries only the 8 journey
#: fields): the chunk key, the conversion timestamp kept for attribution
#: ordering, and the date partition column added by the pipeline's re-read
INTERNAL_COLS = ("_chunk", "conv_ts", "conv_date")


def _journey_records(batch: pd.DataFrame) -> list[dict]:
    """JSON-serializable journey records in the reference's API shape.

    Parquet-backed journeys arrive with datetime64 ``timestamp`` columns;
    ``json.dumps`` cannot serialize ``pd.Timestamp``, and the reference's
    contract sends timestamps as 'yyyy-MM-dd HH:mm:ss' TEXT (SQLite returns
    them that way), so every datetime column is formatted to that string and
    engine-internal columns are dropped before ``to_dict``."""
    batch = batch.drop(
        columns=[c for c in INTERNAL_COLS if c in batch.columns]
    )
    for c in batch.columns:
        if pd.api.types.is_datetime64_any_dtype(batch[c]):
            batch = batch.assign(**{c: batch[c].dt.strftime("%Y-%m-%d %H:%M:%S")})
    return batch.to_dict("records")


def local_linear_scorer(journeys: list[dict]) -> list[dict]:
    """Bundled scorer: linear credit (1/n per conversion).  Stands in for
    the external API in tests and offline runs."""
    counts: dict = {}
    for r in journeys:
        counts[r["conversion_id"]] = counts.get(r["conversion_id"], 0) + 1
    return [
        {
            "conversion_id": r["conversion_id"],
            "session_id": r["session_id"],
            "ihc": 1.0 / counts[r["conversion_id"]],
        }
        for r in journeys
    ]


def skipped_over_cap(journeys: DataFrame, max_sessions: int) -> DataFrame:
    """Conversions whose journey alone exceeds the session cap — the rows
    the reference skips with a print (api_client.py:197-199).  Surfaced as
    data so callers can alert/report instead of losing them silently."""
    return (
        journeys.groupBy("conversion_id")
        .agg(F.count("*").alias("n_sessions"))
        .filter(F.col("n_sessions") > max_sessions)
    )


def _sub_batches(
    pdf: pd.DataFrame, max_journeys: int, max_sessions: int
) -> Iterable[pd.DataFrame]:
    """Split one chunk into scorer calls honoring both caps exactly
    (worker-local; mirrors api_client.py:180-219 without the driver loop)."""
    sizes = pdf.groupby("conversion_id").size()
    batch_ids: list = []
    n_j = 0
    n_s = 0
    for conv_id, n in sizes.items():
        if batch_ids and (n_j + 1 > max_journeys or n_s + n > max_sessions):
            yield pdf[pdf["conversion_id"].isin(batch_ids)]
            batch_ids, n_j, n_s = [], 0, 0
        batch_ids.append(conv_id)
        n_j += 1
        n_s += n
    if batch_ids:
        yield pdf[pdf["conversion_id"].isin(batch_ids)]


def attribute_external(
    journeys: DataFrame,
    score_fn: ScoreFn = local_linear_scorer,
    max_journeys_per_request: int = 100,
    max_sessions_per_request: int = 2000,
    num_chunks: int | None = None,
) -> DataFrame:
    """Partition-parallel scoring with the reference's chunking contract.

    Returns (conversion_id, session_id, ihc).  Compose with
    ``attribution.normalize_ihc`` + ``attribution.verify_attribution`` for
    the reference's validate/verify steps (api_client.py:67-107,254-268).

    Composition is fully lazy — no Spark job runs until the result is
    acted on.  ``num_chunks`` is only a parallelism/memory knob (the exact
    request caps are enforced per-chunk in ``_sub_batches``): it defaults to
    8x the cluster parallelism, which keeps every core busy without a
    data-dependent count.  For very large inputs pass a larger value so a
    single chunk (one in-memory pandas frame) stays bounded — roughly
    ``n_conversions / max_journeys_per_request`` chunks makes each chunk one
    expected scorer call.
    """
    counts = journeys.groupBy("conversion_id").agg(F.count("*").alias("n_sessions"))
    eligible = journeys.join(
        counts.filter(F.col("n_sessions") <= max_sessions_per_request).select(
            "conversion_id"
        ),
        "conversion_id",
        "left_semi",
    )

    if num_chunks is None:
        num_chunks = journeys.sparkSession.sparkContext.defaultParallelism * 8
    chunked = eligible.withColumn(
        "_chunk", F.pmod(F.xxhash64("conversion_id"), F.lit(max(1, num_chunks)))
    )

    out_schema = StructType(
        [
            StructField("conversion_id", LongType()),
            StructField("session_id", LongType()),
            StructField("ihc", DoubleType()),
        ]
    )

    def score_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
        results = []
        for batch in _sub_batches(pdf, max_journeys_per_request, max_sessions_per_request):
            records = _journey_records(batch)
            scored = score_fn(records)
            if scored is None:
                raise RuntimeError(
                    "scorer returned None for a batch — refusing to drop "
                    f"{batch['conversion_id'].nunique()} conversions silently"
                )
            results.extend(scored)
        if not results:
            return pd.DataFrame(columns=RESULT_FIELDS)
        return pd.DataFrame(results)[RESULT_FIELDS]

    return chunked.groupBy("_chunk").applyInPandas(score_chunk, out_schema)
