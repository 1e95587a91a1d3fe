"""Skew mitigation for hot-key joins (SURVEY.md §2.4 skew guard).

AQE's skew-join splitting (on by default in session.py) handles most skew at
runtime by splitting oversized partitions of a sort-merge join.  This module
is the *explicit* tool for the pathological case AQE can't fix: a single
join key (a power user with millions of sessions) whose matching rows
exceed one task's memory.

``salted_join`` replicates the SMALL side N ways and fans the BIG side's
hot keys across N salt buckets, so one hot key becomes N parallel tasks:

    big:   salt = pmod(xxhash64(row-unique), N)      (random-ish, stable)
    small: exploded to all N salts
    join on (key, salt)

Cost: small side is materialized N times — choose N ≈ (hot-key rows /
target-partition rows), and salt ONLY when needed (AQE metrics or a
count-by-key probe identify hot keys first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with salt fan-out.

    Row-level salt on the big side comes from hashing ALL its columns
    (stable, no RNG — deterministic retries/speculation at scale).
    """
    salt_src = F.xxhash64(*[F.col(c) for c in big.columns])
    b = big.withColumn("_salt", F.pmod(salt_src, F.lit(num_salts)))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Hot-key probe: row counts of the heaviest join keys — run this before
    deciding to salt (and to size ``num_salts``)."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .orderBy(F.desc("n_rows"))
        .limit(top)
    )


def recommend_salt(
    df: DataFrame,
    key: str,
    rows_per_task: int = 1_000_000,
    max_buckets: int = 64,
) -> int | None:
    """Probe-then-decide: the bucket count a salted join on ``key`` needs,
    or None when the data isn't skewed enough to pay the salt cost.

    Wires :func:`key_histogram` to the ``salt_buckets`` knob: the heaviest
    key's row count is measured (one aggregate over the probe side — a
    scalar result), and salting is recommended ONLY when that key alone
    exceeds ``rows_per_task`` (the rows one task should own — size it to
    executor memory / target task runtime at scale).  The bucket count
    splits the hot key back down to ~``rows_per_task`` per task, capped at
    ``max_buckets`` (each bucket replicates the small side once — the cost
    side of the trade).  Uniform data returns None: an unconditionally
    salted join multiplies shuffle volume for nothing."""
    top = key_histogram(df, key, top=1).collect()
    if not top:
        return None
    hot = top[0]["n_rows"]
    if hot <= rows_per_task:
        return None
    import math

    return min(max_buckets, math.ceil(hot / rows_per_task))
