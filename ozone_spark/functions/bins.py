"""Power-of-two histogram bin math (SURVEY.md §2.4 A1/A2).

Reference: ReconUtils.java:542-597 — `nextClosestPowerIndexOfTwo`: bin
index i is the smallest i with 2^(base+i) >= size; file-size bins start
at 2^10 (1 KiB, ReconConstants.java:86, 41 bins), container bins at 2^29
(512 MiB).  Sizes <= 2^base (incl. 0) land in bin 0; sizes above the last
bound clamp to the top bin.

ceil(log2(size / 2^base)) is bit-exact across engines at the bin
boundaries: for size = 2^k the quotient is an exact power of two whose
log2 is exact in IEEE754, and away from boundaries a 1-ulp log2
difference cannot cross the ceil threshold.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

FILE_BIN_BASE_EXP = 10   # 1 KiB
FILE_BIN_MAX_IDX = 40    # 41 bins (ReconConstants.java:86)
CONTAINER_BIN_BASE_EXP = 29  # 512 MiB
CONTAINER_BIN_MAX_IDX = 14


def size_bin_index(size: Column, base_exp: int, max_idx: int) -> Column:
    base = 1 << base_exp
    idx = F.ceil(F.log2(size.cast("double") / F.lit(float(base))))
    return (
        F.when(size <= base, F.lit(0))
        .otherwise(F.least(idx, F.lit(max_idx)))
        .cast("int")
    )


def size_bin_upper_bound(bin_index: Column, base_exp: int) -> Column:
    """Upper bound (exclusive-ish label) of a bin: 2^(base+i) bytes."""
    return F.pow(F.lit(2.0), (F.lit(base_exp) + bin_index).cast("double")).cast("long")


def bin_sql(size_expr: str, base_exp: int, max_idx: int) -> str:
    """DuckDB-dialect rendering of the same bin math (oracle side)."""
    base = 1 << base_exp
    return (
        f"CAST(CASE WHEN {size_expr} <= {base} THEN 0 "
        f"ELSE least(CAST(ceil(log2(CAST({size_expr} AS DOUBLE) / {base}.0)) AS BIGINT), {max_idx}) "
        f"END AS INT)"
    )
