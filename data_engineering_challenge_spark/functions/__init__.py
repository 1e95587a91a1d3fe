"""Engine-level reusable column functions.

The function surface mirrors what the reference computes inline (safe
ratios, tolerance compares — SURVEY.md §2.3) plus the vector/hash helpers
the extension operators share.  Everything here is a pure Column
expression — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.report import safe_ratio  # noqa: F401  (re-export)
from ..operators.similarity import cosine, dot  # noqa: F401
from ..queries import dsum  # noqa: F401


def tolerance_eq(a: Column, b: Column | float, tol: float = 1e-4) -> Column:
    """|a - b| <= tol (the reference's Σihc≈1 check, api_client.py:95)."""
    b_col = F.lit(b) if isinstance(b, (int, float)) else b
    return F.abs(a - b_col) <= tol


def md5_int32(col: Column | str, offset: int = 1) -> Column:
    """Engine-portable 32-bit integer hash: md5 hex chunk → bigint.
    DuckDB twin: CAST(concat('0x', substring(md5(x), offset, 8)) AS BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), offset, 8), 16, 10).cast("bigint")


def null_safe_div(num: Column, denom: Column, default: float = 0.0) -> Column:
    """Division that yields ``default`` on zero/NULL denominators — the
    reference's fillna(0) + inf→0 scrub as one expression."""
    return F.when(
        denom.isNotNull() & (denom != 0.0), num / denom
    ).otherwise(F.lit(default))


__all__ = [
    "safe_ratio",
    "cosine",
    "dot",
    "dsum",
    "tolerance_eq",
    "md5_int32",
    "null_safe_div",
]
