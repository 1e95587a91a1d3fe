"""Native attribution operator family (SURVEY.md §2.8) + grouped
normalization (§2.5/§2.6).

The reference outsources attribution to an external HTTP API
(reference pipeline/api_client.py:26-61) whose contract is: journey rows in,
``(conv_id, session_id, ihc)`` out with **Σ ihc = 1 per conversion** — the
invariant it normalizes to (api_client.py:92-98) and re-checks
(api_client.py:133-136, 254-268).  IHC = Initializer / Holder / Closer, a
position- and engagement-weighted fractional-credit model (public
ihc-attribution.com docs).  We implement the contract natively as pure
window-function DataFrame operators — zero network dependency, fully
distributed, one shuffle on ``conversion_id``.

Every operator takes the journey relation produced by
``operators.journeys.build_journeys`` (must contain ``conversion_id,
session_id, timestamp, channel_label, holder_engagement, closer_engagement,
impression_interaction``) and returns ``conversion_id, session_id, ihc``.

Ordering within a conversion is by ``(timestamp, session_id)`` — the
reference relies on implicit source order (cj_builder.py:103-113); we make
the order explicit and deterministic so results are reproducible across
partitionings.

Scale: all of these are a single ``Window.partitionBy('conversion_id')`` —
one hash shuffle on the conversion key, no driver involvement, no joins.
Conversions are numerous and journeys per conversion are bounded, so there
is no skew concern at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: raw position/engagement scores for the IHC-like default model.  The
#: proprietary weights are not public; we reproduce the *shape* (initializer
#: and closer dominate, engagement boosts credit) and the Σ=1 invariant.
INITIALIZER_SCORE = 2.0
CLOSER_SCORE = 2.0
HOLDER_SCORE = 1.0

# Window specs are built lazily (inside functions) — constructing a Window
# requires an active SparkContext, which doesn't exist at import time.
def _ordered() -> Window:
    return Window.partitionBy("conversion_id").orderBy("timestamp", "session_id")


def _group() -> Window:
    return Window.partitionBy("conversion_id")


def _one_hot(journeys: DataFrame, rank_col) -> DataFrame:
    """ihc = 1.0 on the rank-1 row of ``rank_col``, 0.0 elsewhere."""
    return (
        journeys.withColumn("_rn", F.row_number().over(rank_col))
        .select(
            "conversion_id",
            "session_id",
            F.when(F.col("_rn") == 1, F.lit(1.0)).otherwise(F.lit(0.0)).alias("ihc"),
        )
    )


def attribute_last_touch(journeys: DataFrame) -> DataFrame:
    """All credit to the latest session at-or-before the conversion."""
    w = Window.partitionBy("conversion_id").orderBy(
        F.desc("timestamp"), F.desc("session_id")
    )
    return _one_hot(journeys, w)


def attribute_first_touch(journeys: DataFrame) -> DataFrame:
    """All credit to the earliest session."""
    return _one_hot(journeys, _ordered())


def attribute_linear(journeys: DataFrame) -> DataFrame:
    """Equal credit: ihc = 1 / n_sessions per conversion."""
    return journeys.select(
        "conversion_id",
        "session_id",
        (F.lit(1.0) / F.count("*").over(_group())).alias("ihc"),
    )


def attribute_position_engagement(
    journeys: DataFrame, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """IHC-like default: position- and engagement-weighted credit, Σ=1.

    raw score = INITIALIZER_SCORE on the first session,
                CLOSER_SCORE * (1 + closer_engagement) on the last,
                HOLDER_SCORE * (1 + holder_engagement) on middles;
    ihc = raw / Σ raw over the conversion.  A single-session journey takes
    the initializer branch and normalizes to exactly 1.0.

    ``carry_cols``: journey columns to keep on the output rows alongside
    (conversion_id, session_id, ihc).  They ride the one conversion_id
    window shuffle, so downstream consumers (the fused report) need no
    join back to the journey inputs.
    """
    # last-row test: lead(1) over the SAME ordered window is NULL exactly on
    # the partition's last row — identical to the classic rn == count(*)
    # test (a 1-session journey takes the rn == 1 branch in both spellings),
    # but it shares the row_number's window node, so the plan runs TWO
    # window passes over the journey rows instead of three (the unordered
    # count(*) pass disappears; measured r14, plan-verified node count 3→2).
    rn = F.row_number().over(_ordered())
    is_last = F.lead(F.lit(1)).over(_ordered()).isNull()
    raw = (
        F.when(rn == 1, F.lit(INITIALIZER_SCORE))
        .when(is_last, F.lit(CLOSER_SCORE) * (1.0 + F.col("closer_engagement")))
        .otherwise(F.lit(HOLDER_SCORE) * (1.0 + F.col("holder_engagement")))
    )
    df = journeys.withColumn("_raw", raw)
    return df.select(
        "conversion_id",
        "session_id",
        (F.col("_raw") / F.sum("_raw").over(_group())).alias("ihc"),
        *carry_cols,
    )


def normalize_ihc(
    attributed: DataFrame,
    group_col: str = "conversion_id",
    tolerance: float = 1e-4,
) -> DataFrame:
    """Grouped renormalization with the reference's tolerance semantics.

    The reference loops groups in a dict and rescales ihc to sum to 1 only
    when the group sum is off by more than ``tolerance``
    (reference pipeline/api_client.py:79-107, threshold at :95).  Spark-native
    this is one window — no shuffle-back join, no driver loop:

        s = sum(ihc) over (partition by conversion_id)
        ihc' = ihc / s          when |s - 1| > tol and s != 0
             = ihc              otherwise

    The ``s != 0`` guard keeps an all-zero group unchanged (the reference
    would divide by zero there; we do not reproduce that).
    """
    w = Window.partitionBy(group_col)
    s = F.sum("ihc").over(w)
    keep_cols = [c for c in attributed.columns if c != "ihc"]
    return attributed.select(
        *keep_cols,
        F.when(
            (F.abs(s - 1.0) > tolerance) & (s != 0.0), F.col("ihc") / s
        )
        .otherwise(F.col("ihc"))
        .alias("ihc"),
    )


def verify_attribution(attributed: DataFrame, tolerance: float = 1e-4) -> DataFrame:
    """Post-write verification (reference api_client.py:254-268): per-group
    ihc sums plus a conforming flag; callers aggregate for the headline count
    (``F.sum('is_valid')`` == reference's :262 conditional count)."""
    return (
        attributed.groupBy("conversion_id")
        .agg(F.sum("ihc").alias("ihc_sum"))
        .select(
            "conversion_id",
            "ihc_sum",
            (F.abs(F.col("ihc_sum") - 1.0) <= tolerance).cast("int").alias("is_valid"),
        )
    )
