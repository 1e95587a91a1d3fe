"""Customer-journey construction — the as-of/prefix join (SURVEY.md §2.4).

The reference builds journeys with a driver-side O(C*S) nested loop: for every
conversion, boolean-mask all of that user's sessions at-or-before the
conversion timestamp, tag them, and concat (reference
pipeline/cj_builder.py:81-113).  Spark-native: ONE distributed equi-join on
``user_id`` with the time bound as a range residual.  Catalyst picks
sort-merge / shuffled-hash on the equi key and applies ``s.ts <= c.ts`` as a
join-level filter — no driver materialization, scales with a shuffle on
``user_id``.

Semantics preserved exactly (reference cj_builder.py:87-106):
  * ``<=`` — a session exactly at conversion time IS included.
  * inner join — a conversion whose user has no prior sessions produces no
    rows at all (the ``if not user_sessions.empty`` guard).
  * one-to-many: EVERY prior session row is kept, not nearest-match-only
    (this is NOT an ``ASOF JOIN``).
  * a user with 2+ conversions attaches shared early sessions to each.
  * output = the fixed 8-column journey relation with ``conversion = 0``
    literal and ``channel_name`` renamed to ``channel_label``
    (cj_builder.py:94-106).

Scale notes (100 TB design point):
  * the join shuffles both sides on ``user_id``; power users (long session
    histories) are the skew risk — AQE skew-join splitting is on by default
    in session.py, and ``lookback`` bounds the blowup per conversion.
  * ``lookback`` (optional, capability-add; default None for reference
    parity) turns the residual into a band ``c.ts - lookback <= s.ts <=
    c.ts``, which also lets a range-join strategy kick in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_journeys(
    conversions: DataFrame,
    sessions: DataFrame,
    start_date: str | None = None,
    end_date: str | None = None,
    lookback_days: int | None = None,
    salt_buckets: int | None = None,
    carry_session_cols: tuple[str, ...] = (),
    carry_conversion_cols: tuple[str, ...] = (),
) -> DataFrame:
    """All sessions of a conversion's user at-or-before the conversion time.

    Args:
        conversions: ``conv_id, user_id, conv_ts, revenue`` (revenue unused
            here; carried by the report step).
        sessions: ``session_id, user_id, ts, channel_name, holder_engagement,
            closer_engagement, impression_interaction``.
        start_date / end_date: optional inclusive bounds on the CONVERSION
            date (reference cj_builder.py:45-53 pushes these into the
            conversions scan; Catalyst pushes our filter into the parquet
            scan the same way — check ``PushedFilters`` in the plan).
        lookback_days: optional bound on session age relative to the
            conversion (capability add; None = reference parity, unbounded).
        carry_session_cols / carry_conversion_cols: extra input columns to
            carry onto the journey rows (names kept as-is).  The fused
            report path uses this to attach per-session cost/date and
            per-conversion revenue BEFORE the one attribution shuffle —
            a few extra bytes per journey row through that exchange
            instead of re-joining sessions and conversions (two more
            shuffles/scans) after attribution (guide §8: move the
            payload once, decide with what is already attached).
        salt_buckets: opt-in skew mitigation (the operators.skew pattern
            applied to this join) for the power-user case AQE can't split —
            one ``user_id`` owning more session rows than a task can hold.
            Each session row is assigned ONE deterministic salt bucket
            (hash of all its columns — stable across retries/speculation)
            and the conversion side is replicated into ALL buckets, so the
            join key becomes ``(user_id, salt)`` and a hot user fans out
            across ``salt_buckets`` parallel tasks.  Every (conversion,
            session) pair still matches exactly once — rows are identical
            to the unsalted join (parity-tested under a
            one-user-owns-half-the-sessions fixture).  Cost: conversions
            shuffle ``salt_buckets``× — salt only when a key_histogram
            probe or AQE metrics show real skew.

    Returns the 8-column journey relation (reference cj_builder.py:103-106)
    plus ``conv_ts`` kept for downstream attribution ordering.
    """
    conv = conversions
    if start_date is not None:
        conv = conv.filter(F.to_date(F.col("conv_ts")) >= F.lit(start_date))
    if end_date is not None:
        conv = conv.filter(F.to_date(F.col("conv_ts")) <= F.lit(end_date))

    sess = sessions
    if salt_buckets is not None:
        sess = sessions.withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(*[F.col(col) for col in sessions.columns]),
                F.lit(salt_buckets),
            ),
        )
        conv = conv.withColumn(
            "_salt",
            F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
        )

    # NOTE (r14): a fan-out of the sessions probe side was measured and
    # REJECTED — rows re-read from the round-robin shuffle cost several
    # times the CPU of rows pipelined straight out of the columnar scan,
    # which ate the parallelism gain (attr path 0.71 s direct vs 0.82 s
    # fanned out at sf0.1; the probe+shuffle-write runs inside the scan's
    # whole-stage-codegen either way)

    # explicit aliases: conversions and sessions often derive from the same
    # scan (a self-join), which is ambiguous without qualification
    c = conv.alias("c")
    s = sess.alias("s")
    cond = (F.col("s.user_id") == F.col("c.user_id")) & (
        F.col("s.ts") <= F.col("c.conv_ts")
    )
    if salt_buckets is not None:
        cond = cond & (F.col("s._salt") == F.col("c._salt"))
    if lookback_days is not None:
        cond = cond & (
            F.col("s.ts")
            >= F.col("c.conv_ts") - F.expr(f"INTERVAL {int(lookback_days)} DAYS")
        )

    return c.join(s, cond, "inner").select(
        F.col("c.conv_id").alias("conversion_id"),
        F.col("s.session_id"),
        F.col("s.ts").alias("timestamp"),
        F.col("s.channel_name").alias("channel_label"),
        F.col("s.holder_engagement"),
        F.col("s.closer_engagement"),
        F.lit(0).alias("conversion"),  # literal on every row, cj_builder.py:94
        F.col("s.impression_interaction"),
        F.col("c.conv_ts"),
        *[F.col(f"s.{col}") for col in carry_session_cols],
        *[F.col(f"c.{col}") for col in carry_conversion_cols],
    )
