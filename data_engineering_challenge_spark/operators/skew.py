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
